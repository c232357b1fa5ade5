"""Corpus-wide line dedup vs a sequential Python oracle."""

from post_processor_spark.analytics import dedup


def _py_line_dedup(rows):
    seen = set()
    out = {}
    for i, t in sorted(rows):
        kept = []
        for line in t.split("\n"):
            line = line.strip()
            if not line:
                continue
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[i] = "\n".join(kept)
    return out


def test_dedup_lines_matches_python_oracle(spark):
    rows = [
        (1, "unique first line\nshared boilerplate\nanother unique"),
        (2, "shared boilerplate\nsecond doc line\nshared boilerplate"),
        (3, "  \nthird doc content\nsecond doc line\n"),
        (4, "shared boilerplate"),               # fully deduped away
        (5, ""),                                  # empty in, empty out
        (6, "repeat me\nrepeat me\nfresh line"),  # within-doc repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in dedup.dedup_lines(df).collect()}
    expect = _py_line_dedup(rows)
    assert out == expect
    assert out[4] == "" and out[5] == ""
    assert out[6] == "repeat me\nfresh line"


def test_dedup_lines_keeps_schema_and_rowcount(spark):
    rows = [(1, "a\nb", "x"), (2, "b\nc", "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dedup.dedup_lines(df)
    assert out.columns == df.columns
    got = {r["doc_id"]: (r["text"], r["source"]) for r in out.collect()}
    assert got == {1: ("a\nb", "x"), 2: ("c", "y")}


def test_strip_boilerplate_per_group(spark):
    """Chrome (df >= min_df within the group) vanishes from EVERY doc of
    that group — including its first occurrence, unlike dedup_lines —
    while the same line on another host below the threshold survives;
    all-chrome docs come back empty."""
    from post_processor_spark.analytics import dedup

    rows = []
    for i in range(5):  # host A: banner on all 5 docs
        rows.append((i, "A", f"BANNER\nunique {i}"))
    for i in range(5, 8):  # host B: same banner text but only 3 docs
        rows.append((i, "B", f"BANNER\nother {i}"))
    rows.append((8, "A", "BANNER"))  # all-chrome doc (6th A doc)
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_boilerplate(docs, min_df=5).collect()}
    for i in range(5):
        assert out[i] == f"unique {i}"
    for i in range(5, 8):
        assert out[i] == f"BANNER\nother {i}"  # below threshold on B
    assert out[8] == ""


def test_strip_boilerplate_identity_on_chrome_free_docs(spark):
    """A doc with no boilerplate must come back byte-identical — original
    indentation, blank lines, and trailing newline all preserved (the
    chrome KEY trims, the rebuild does not). Pins the round-4 fix."""
    from post_processor_spark.analytics import dedup

    texts = [
        "  indented line \n\nplain line",
        "one\n\n\ntwo\n",          # interior blanks + trailing newline
        "",                        # empty doc stays empty
        "\ttab lead\nend  ",       # tab indent, trailing spaces
    ]
    rows = [(i, f"h{i}", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_boilerplate(docs, min_df=2).collect()}
    for i, t in enumerate(texts):
        assert out[i] == t


def test_strip_boilerplate_trimmed_key_but_original_lines(spark):
    """Indentation variants of one banner collapse to one chrome key and
    all vanish; the surviving body lines keep their own whitespace."""
    from post_processor_spark.analytics import dedup

    rows = [
        (0, "A", "  BANNER\n  body zero"),
        (1, "A", "BANNER  \n body one "),
        (2, "A", "\tBANNER\nbody two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_boilerplate(docs, min_df=3).collect()}
    assert out == {0: "  body zero", 1: " body one ", 2: "body two"}


def test_edit_distance_verify_null_text_contract(spark):
    """NULL text on either side → dist=-1, is_dup=false, len=-1; never a
    NULL verdict. Pins the round-4 ADVICE fix."""
    from post_processor_spark.analytics import dedup

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, "hellp"), (4, None)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "id_a long, id_b long"
    )
    got = {(r["id_a"], r["id_b"]): r.asDict() for r in
           dedup.edit_distance_verify(pairs, docs, max_dist=3).collect()}
    assert got[(1, 2)]["dist"] == -1 and got[(1, 2)]["is_dup"] is False
    assert got[(1, 2)]["len_b"] == -1
    assert got[(2, 4)]["dist"] == -1 and got[(2, 4)]["is_dup"] is False
    assert got[(1, 3)]["dist"] == 1 and got[(1, 3)]["is_dup"] is True
