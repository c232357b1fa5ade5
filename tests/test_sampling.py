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


def _skewed_docs(spark):
    """80% en, 15% de, 4% fr, 1% xx — a head-heavy crawl mix."""
    rows = []
    for i in range(1000):
        lang = "en" if i % 100 < 80 else "de" if i % 100 < 95 else \
               "fr" if i % 100 < 99 else "xx"
        rows.append((i, lang))
    return rows, spark.createDataFrame(rows, "doc_id long, lang string")


def _temp_fractions(counts, alpha, budget_fraction):
    total = sum(counts.values())
    wsum = sum(n ** alpha for n in counts.values())
    return {
        s: min(1.0, budget_fraction * total * (n ** alpha) / (wsum * n))
        for s, n in counts.items()
    }


def test_temperature_sample_matches_hashlib_oracle(spark):
    """Exact membership: fraction formula + md5 threshold recomputed in
    pure Python."""
    rows, df = _skewed_docs(spark)
    counts = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    frac = _temp_fractions(counts, alpha=0.5, budget_fraction=0.5)
    got = sorted(
        r["doc_id"]
        for r in sampling.temperature_sample(
            df, "lang", alpha=0.5, budget_fraction=0.5, salt="t1"
        ).collect()
    )
    expect = sorted(i for i, lang in rows if _u(i, "t1") < frac[lang])
    assert got == expect


def test_temperature_sample_flattens_the_mix(spark):
    """alpha<1 must RAISE small strata's keep rate relative to big ones;
    tiny strata cap at 1.0 (kept whole); alpha=1 keeps natural
    proportions (every stratum at budget_fraction)."""
    rows, df = _skewed_docs(spark)
    counts = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    frac = _temp_fractions(counts, alpha=0.5, budget_fraction=0.5)
    assert frac["xx"] == 1.0  # 10 docs: capped, kept whole
    assert frac["fr"] > frac["de"] > frac["en"]
    # alpha=1 degenerates to uniform budget_fraction
    u1 = _temp_fractions(counts, alpha=1.0, budget_fraction=0.5)
    assert all(abs(v - 0.5) < 1e-12 for v in u1.values())
    kept = sampling.temperature_sample(
        df, "lang", alpha=0.5, budget_fraction=0.5, salt="t2"
    )
    by_lang = {
        r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()
    }
    assert by_lang["xx"] == counts["xx"]  # capped stratum kept whole


def test_temperature_sample_validations(spark):
    _, df = _skewed_docs(spark)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="alpha"):
        sampling.temperature_sample(df, "lang", alpha=-0.1)
    with _pytest.raises(ValueError, match="budget_fraction"):
        sampling.temperature_sample(df, "lang", budget_fraction=1.5)


def test_quality_gate_per_group_exact_and_approx(spark):
    """Keep-set equals the python oracle (score >= own group's median at
    rank ceil(q*n)); the approx path keeps a superset/subset within the
    sketch's rank tolerance — here exact because accuracy >> group size."""
    import math

    # 3 groups of 41 (odd → unambiguous median for BOTH the rank-ceil
    # convention and the percentile_approx sketch)
    rows = [(i, "g" + str(i % 3), (i * 37) % 101) for i in range(123)]
    # a one-row group and an all-ties group
    rows += [(1000, "solo", 5)] + [(2000 + i, "ties", 7) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")

    by_g = {}
    for _id, g, s in rows:
        by_g.setdefault(g, []).append((s, _id))
    expect = set()
    for g, vals in by_g.items():
        scores = sorted(s for s, _ in vals)
        thr = scores[math.ceil(0.5 * len(scores)) - 1]
        expect |= {i for s, i in vals if s >= thr}

    got = {
        r["doc_id"]
        for r in sampling.quality_gate_per_group(df, "grp", "score").collect()
    }
    assert got == expect
    got_approx = {
        r["doc_id"]
        for r in sampling.quality_gate_per_group(
            df, "grp", "score", approx=True
        ).collect()
    }
    assert got_approx == expect


def test_weighted_sample_matches_python_oracle(spark):
    """A-ES draw replayed sequentially: same md5 u, same ln(u)/w keys,
    same top-k — global and per-stratum forms."""
    import hashlib
    import math

    import pytest

    rows = [(i, "ab"[i % 2], float(1 + (i * 7) % 50)) for i in range(60)]
    rows.append((60, "a", 0.0))   # non-positive weight → excluded
    rows.append((61, "b", -3.0))
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    def u(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32

    scored = [(i, g, math.log(u(i)) / w) for i, g, w in rows if w > 0]

    want_global = sorted(scored, key=lambda t: (-t[2], t[0]))[:7]
    got_global = sampling.weighted_sample(df, 7, "w", key_col="doc_id").collect()
    assert [r["doc_id"] for r in got_global] == [t[0] for t in want_global]

    want_strat = set()
    for g in ("a", "b"):
        grp = sorted((t for t in scored if t[1] == g), key=lambda t: (-t[2], t[0]))
        want_strat |= {t[0] for t in grp[:5]}
    got_strat = sampling.weighted_sample(
        df, 5, "w", key_col="doc_id", strata_col="grp"
    ).collect()
    assert {r["doc_id"] for r in got_strat} == want_strat

    with pytest.raises(ValueError):
        sampling.weighted_sample(df, 0, "w")


def test_weighted_sample_favors_heavy_rows(spark):
    """Statistical sanity: one row with 1000x the weight of the rest is
    picked in (nearly) every salt's draw of k=3 from 100 rows."""
    df = spark.createDataFrame(
        [(i, 1000.0 if i == 42 else 1.0) for i in range(100)],
        "doc_id long, w double",
    )
    hits = 0
    for salt in ("s1", "s2", "s3", "s4", "s5"):
        picked = {r["doc_id"] for r in
                  sampling.weighted_sample(df, 3, "w", salt=salt).collect()}
        hits += 42 in picked
    assert hits >= 4


def test_weighted_sample_global_plans_take_ordered(spark):
    """Global A-ES top-k must plan as TakeOrderedAndProject (per-
    partition heaps + driver merge of k), never a full sort of the
    corpus."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 7) + 1).cast("double").alias("w"),
    )
    plan = (
        sampling.weighted_sample(df, 5, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
