"""Mergeable-sketch operators (analytics/sketches.py): rollup
losslessness, error-bound properties, and set-algebra sanity — the
checks the DuckDB oracle cannot express (sketch register state is not
SQL-reproducible), pinned here instead."""

import pyspark.sql.functions as F
import pytest

from post_processor_spark.analytics import sketches


def _synth(spark, n_rows, n_groups, n_distinct, seed_mult=2654435761):
    """Deterministic (grp, day, v) frame: v cycles over n_distinct values
    scrambled by a Knuth multiplier so groups see shuffled subsets."""
    return spark.range(n_rows).select(
        (F.col("id") % n_groups).alias("grp"),
        (F.col("id") % 7).alias("day"),
        ((F.col("id") * seed_mult) % n_distinct).alias("v"),
    )


def test_hll_small_groups_exact(spark):
    """Sparse-mode HLL is exact below ~2^lgK/4 distinct values — every
    group here has ≤500 distinct, so the estimate IS the exact count
    (the property the oracle-gated q_hll_rollup bound check relies on
    at sf0.01)."""
    df = _synth(spark, 20_000, 4, 500)
    got = {r["grp"]: r["distinct_est"] for r in
           sketches.hll_distinct(df, ["grp"], "v").collect()}
    exact = {r["grp"]: r["n"] for r in
             df.groupBy("grp").agg(F.countDistinct("v").alias("n")).collect()}
    assert got == exact


def test_hll_rollup_lossless_vs_direct(spark):
    """Union-merging per-(grp, day) sketches gives the same estimate as
    sketching each grp directly: HLL register max is associative, so the
    two-level rollup path loses nothing vs a raw rescan."""
    df = _synth(spark, 50_000, 4, 3_000)
    rolled = {r["grp"]: r["distinct_est"] for r in
              sketches.hll_rollup(df, ["grp", "day"], ["grp"], "v").collect()}
    direct = {r["grp"]: r["distinct_est"] for r in
              sketches.hll_distinct(df, ["grp"], "v").collect()}
    assert rolled == direct


def test_hll_large_cardinality_error_bound(spark):
    """Dense-mode estimate stays within 5 standard errors (lgK=14 →
    rse ≈ 1.04/sqrt(2^14) ≈ 0.81%) of the true 200k distinct count."""
    n_distinct = 200_000
    df = spark.range(400_000).select(
        F.lit(0).alias("grp"), (F.col("id") % n_distinct).alias("v")
    )
    est = sketches.hll_distinct(df, ["grp"], "v").collect()[0]["distinct_est"]
    assert abs(est - n_distinct) / n_distinct < 5 * 0.0081


def test_theta_overlap_exact_mode(spark):
    """Below 2^lg_nom distinct keys the theta sketches are exact, so the
    four set-algebra estimates equal the true set sizes."""
    left = spark.range(0, 3_000).select(F.col("id").alias("k"))
    right = spark.range(2_000, 6_000).select(F.col("id").alias("k"))
    row = sketches.theta_overlap(left, right, "k", lg_nom=14).collect()[0]
    assert row["n_left_est"] == 3_000
    assert row["n_right_est"] == 4_000
    assert row["n_overlap_est"] == 1_000
    assert row["n_left_only_est"] == 2_000


def test_theta_overlap_estimation_mode_bound(spark):
    """Above 2^lg_nom the sketches sample; intersection error compounds
    (union |L∪R| drives the effective theta), so allow a wider 10%
    relative band on the 100k-key overlap."""
    left = spark.range(0, 300_000).select(F.col("id").alias("k"))
    right = spark.range(200_000, 500_000).select(F.col("id").alias("k"))
    row = sketches.theta_overlap(left, right, "k", lg_nom=14).collect()[0]
    assert abs(row["n_left_est"] - 300_000) / 300_000 < 0.05
    assert abs(row["n_overlap_est"] - 100_000) / 100_000 < 0.10


def test_kll_quantiles_rank_bound(spark):
    """KLL(k=200) rank guarantee: for each returned quantile value v,
    the true rank interval [count(<v), count(<=v)]/n must intersect
    [q - eps, q + eps] with eps = 1.65% — checked against the exact
    sorted data."""
    df = _synth(spark, 30_000, 3, 10_000)
    eps = 0.0165
    out = sketches.kll_quantiles(df, ["grp"], "v", qs=(0.5, 0.9, 0.99)).collect()
    rows = df.groupBy("grp", "v").count().collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append((r["v"], r["count"]))
    for row in out:
        vals = sorted(by_grp[row["grp"]])
        n = sum(c for _, c in vals)
        assert row["n"] == n
        for q, label in [(0.5, "q0_5"), (0.9, "q0_9"), (0.99, "q0_99")]:
            v = row[label]
            below = sum(c for x, c in vals if x < v)
            at_or_below = sum(c for x, c in vals if x <= v)
            lo, hi = below / n, at_or_below / n
            assert lo <= q + eps and hi >= q - eps, (row["grp"], q, v, lo, hi)


def test_kll_quantiles_rejects_bad_rank(spark):
    df = _synth(spark, 100, 1, 10)
    with pytest.raises(ValueError):
        sketches.kll_quantiles(df, ["grp"], "v", qs=(1.5,))


def test_merge_hll_tables_incremental_equals_direct(spark):
    """Folding per-batch sketch tables (disjoint AND overlapping keys)
    matches a direct sketch over the concatenated batches: exactly at
    sparse cardinalities, within 1% in the coupon-promotion regime
    (DataSketches' union composes through HLL_8 there, so folded and
    direct register states can differ by less than the sketch's own
    error) — the incremental-state contract."""
    # sparse regime: small per-key cardinality → folded == direct == exact
    small = [
        _synth(spark, 4_000, 5, 300, seed_mult=2654435761),
        _synth(spark, 3_000, 7, 300, seed_mult=40503),  # adds keys 5, 6
    ]
    acc = sketches.hll_sketch_table(small[0], ["grp"], "v")
    acc = sketches.merge_hll_tables(
        acc, sketches.hll_sketch_table(small[1], ["grp"], "v"), ["grp"]
    )
    folded = {r["grp"]: r["distinct_est"]
              for r in sketches.hll_estimate(acc).collect()}
    whole = small[0].unionByName(small[1])
    exact = {r["grp"]: r["n"] for r in
             whole.groupBy("grp").agg(F.countDistinct("v").alias("n")).collect()}
    assert folded == exact
    assert set(folded) == set(range(7))

    # promotion regime: 3 batches, ~2k distinct per key → within 1% of direct
    big = [
        _synth(spark, 10_000, 5, 2_000, seed_mult=2654435761),
        _synth(spark, 8_000, 3, 2_000, seed_mult=40503),
        _synth(spark, 6_000, 7, 2_000, seed_mult=2147483647),
    ]
    acc = sketches.hll_sketch_table(big[0], ["grp"], "v")
    for b in big[1:]:
        acc = sketches.merge_hll_tables(
            acc, sketches.hll_sketch_table(b, ["grp"], "v"), ["grp"]
        )
    folded = {r["grp"]: r["distinct_est"]
              for r in sketches.hll_estimate(acc).collect()}
    whole = big[0].unionByName(big[1]).unionByName(big[2])
    direct = {r["grp"]: r["distinct_est"]
              for r in sketches.hll_distinct(whole, ["grp"], "v").collect()}
    assert set(folded) == set(direct)
    for g, est in folded.items():
        assert abs(est - direct[g]) / direct[g] < 0.01, (g, est, direct[g])


def test_theta_overlap_by_groups(spark):
    """Per-group set algebra: exact-mode estimates per group, zeros for
    one-sided groups."""
    left = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(50)],
        "grp string, k long",
    )
    right = spark.createDataFrame(
        [("a", i) for i in range(80, 180)] + [("c", i) for i in range(30)],
        "grp string, k long",
    )
    rows = {r["grp"]: r for r in
            sketches.theta_overlap_by(left, right, "grp", "k").collect()}
    assert rows["a"]["n_left_est"] == 100
    assert rows["a"]["n_right_est"] == 100
    assert rows["a"]["n_overlap_est"] == 20
    assert rows["b"]["n_right_est"] == 0 and rows["b"]["n_overlap_est"] == 0
    assert rows["c"]["n_left_est"] == 0 and rows["c"]["n_overlap_est"] == 0
