"""Deterministic-sampling tests: exact membership vs a hashlib oracle
(no RNG anywhere — the sample is a pure function of key, salt, rate)."""

import hashlib

from post_processor_spark.analytics import sampling


def _u(key, salt=""):
    return int(hashlib.md5((str(key) + salt).encode()).hexdigest()[:8], 16) / 2**32


def _docs(spark, n=400):
    langs = ["en", "de", "fr", "xx"]
    rows = [(i, langs[i % 4], f"text {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_sample_matches_hashlib_oracle(spark):
    df = _docs(spark)
    got = sorted(r["doc_id"] for r in sampling.hash_sample(df, 0.3, salt="s1").collect())
    expect = sorted(i for i in range(400) if _u(i, "s1") < 0.3)
    assert got == expect
    assert 0.2 < len(got) / 400 < 0.4  # rate lands near 0.3


def test_hash_sample_subset_monotone(spark):
    """Growing the rate at the same salt only ADDS rows."""
    df = _docs(spark)
    s10 = {r["doc_id"] for r in sampling.hash_sample(df, 0.1, salt="m").collect()}
    s25 = {r["doc_id"] for r in sampling.hash_sample(df, 0.25, salt="m").collect()}
    assert s10 <= s25


def test_stratified_sample_per_stratum_rates(spark):
    df = _docs(spark)
    fr = {"en": 1.0, "de": 0.5, "fr": 0.0}
    out = sampling.stratified_sample(df, "lang", fr, default_fraction=0.2, salt="z")
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    langs = ["en", "de", "fr", "xx"]
    expect = {
        (i, langs[i % 4])
        for i in range(400)
        if _u(i, "z") < fr.get(langs[i % 4], 0.2)
    }
    assert got == expect
    assert all(l != "fr" for _, l in got)
    assert sum(1 for _, l in got if l == "en") == 100  # rate 1.0 keeps all


def test_stratified_sample_table_matches_case_form(spark):
    df = _docs(spark)
    fr = {"en": 0.8, "de": 0.3}
    rates = spark.createDataFrame(list(fr.items()), "lang string, fraction double")
    a = sampling.stratified_sample(df, "lang", fr, default_fraction=0.1, salt="t")
    b = sampling.stratified_sample_table(df, rates, "lang", default_fraction=0.1, salt="t")
    ga = sorted(r["doc_id"] for r in a.collect())
    gb = sorted(r["doc_id"] for r in b.collect())
    assert ga == gb
    assert b.columns == df.columns  # fraction column dropped


def test_train_eval_split_partitions_exactly(spark):
    df = _docs(spark)
    train, ev = sampling.train_eval_split(df, eval_fraction=0.05, salt="h")
    tr = {r["doc_id"] for r in train.collect()}
    ho = {r["doc_id"] for r in ev.collect()}
    assert tr | ho == set(range(400)) and not (tr & ho)
    expect_ho = {i for i in range(400) if _u(i, "h") < 0.05}
    assert ho == expect_ho
