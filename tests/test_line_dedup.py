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
