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
