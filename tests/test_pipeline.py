"""End-to-end training-corpus recipe (analytics/pipeline.py): the
clean → dedup → decontam → sample → pack chain composes correctly and
the funnel report reflects each stage's effect."""

from post_processor_spark.analytics import pipeline


def _line(words):
    return " ".join(words)


def _corpus(spark):
    good = _line([f"word{i} alpha beta gamma delta epsilon" for i in range(1)])
    # each doc needs >= 3 surviving lines of >= 5 words ending in punctuation
    body = "\n".join(
        f"this is a perfectly normal sentence number {i}." for i in range(4)
    )
    rows = [
        (0, body, "web"),
        (1, body, "web"),                                  # exact dup of 0
        (2, body + "\nsecret benchmark sentence with thirteen tokens "
            "a b c d e f g h i j k l m.", "web"),          # contaminated
        (3, "junk\nshort\nlines", "web"),                  # killed by C4
        (4, "\n".join(
            f"another fine sentence about topic {i} with many words here."
            for i in range(4)), "books"),
    ]
    del good
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_build_training_corpus_funnel(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(0, "secret benchmark sentence with thirteen tokens "
             "a b c d e f g h i j k l m.")],
        "doc_id long, text string",
    )
    packed, stages = pipeline.build_training_corpus(
        docs, bench, decontam_n=13, pack_budget=16
    )
    report = {r["stage"]: r["n_docs"] for r in
              pipeline.corpus_report(stages).collect()}
    assert report["raw"] == 5
    assert report["cleaned"] == 4            # doc 3 killed
    assert report["deduped"] == 3            # doc 1 folded into 0
    assert report["decontaminated"] == 2     # doc 2 hit the benchmark
    assert report["packed"] == 2
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert set(rows) == {0, 4}
    assert all(r["n_chunks"] >= 1 for r in rows.values())
    # stage order is pipeline order in the report
    order = [r["stage"] for r in pipeline.corpus_report(stages).collect()]
    assert order == ["raw", "cleaned", "deduped", "decontaminated", "packed"]


def test_build_training_corpus_optional_stages(spark):
    docs = _corpus(spark)
    packed, stages = pipeline.build_training_corpus(
        docs, None, temperature_alpha=0.5, sample_budget_fraction=1.0,
        pack_budget=16,
    )
    assert "decontaminated" not in stages
    assert "sampled" in stages
    assert packed.count() >= 1


def test_build_training_corpus_half_specified_sampling_raises(spark):
    """Setting exactly one of temperature_alpha / sample_budget_fraction
    is a config error, not a silent skip (round-4 ADVICE fix)."""
    import pytest

    docs = _corpus(spark)
    with pytest.raises(ValueError, match="must be set together"):
        pipeline.build_training_corpus(docs, None, temperature_alpha=0.5)
    with pytest.raises(ValueError, match="must be set together"):
        pipeline.build_training_corpus(docs, None, sample_budget_fraction=0.5)


def test_build_training_corpus_materialize_matches_lazy(spark):
    """materialize='persist'/'checkpoint' must change the plan shape
    (each stage computes once), never the result rows."""
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(0, "secret benchmark sentence with thirteen tokens "
             "a b c d e f g h i j k l m.")],
        "doc_id long, text string",
    )
    def run(mat):
        packed, stages = pipeline.build_training_corpus(
            docs, bench, decontam_n=13, pack_budget=16, materialize=mat
        )
        rows = sorted(tuple(r) for r in packed.collect())
        for df in stages.values():
            df.unpersist()
        return rows
    lazy = run(None)
    assert run("persist") == lazy
    assert run("checkpoint") == lazy


def test_build_training_corpus_bad_materialize_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="materialize"):
        pipeline.build_training_corpus(_corpus(spark), None, materialize="disk")
