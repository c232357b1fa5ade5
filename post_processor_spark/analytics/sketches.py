"""Mergeable-sketch analytics (Apache DataSketches via Spark built-ins):
HLL distinct-count rollups, theta-sketch set algebra for corpus overlap,
KLL quantile sketches.

Why sketches are the 100 TB path:

- exact per-group COUNT(DISTINCT v) shuffles every distinct (group, v)
  pair and holds a full hash set per group; an HLL sketch is a fixed
  ≤2^lgK-register state that partial-aggregates map-side, so the shuffle
  carries one small binary per (partition, group) regardless of corpus
  size.
- sketches MERGE losslessly: per-shard / per-day sketches roll up to
  coarser groupings with `hll_union_agg` without rescanning raw rows —
  the incremental-maintenance pattern the frontier uses for its bloom
  deltas (seen.py), applied to cardinality metrics.
- theta sketches support intersection/difference, so train×benchmark
  overlap ("how contaminated is this corpus?") is estimable from two
  independent single-pass scans — no join, no co-shuffle of 100 TB by
  key. The exact decontaminate join (analytics/decontam.py) then runs
  only when the estimate says the overlap is material.

Reference analog: none — the reference (UTMediaCAT/post-processor)
computes only exact pandas aggregates at fixture scale; these operators
are the scale path the north_rule's 10^10-URL setting requires.

Correctness contract: sketch estimates are not SQL-reproducible (the
DuckDB oracle cannot replay DataSketches register state), so the
oracle-gated queries expose the DETERMINISTIC part exactly (group keys,
exact counts computed alongside at test scale) plus the probabilistic
part as a boolean against its published error bound — the oracle asserts
the bound holds (literal TRUE) and everything else matches bit-for-bit.
Pytest additionally pins: rollup-merge estimate equality vs the direct
coarse sketch (exact in sparse mode; within the sketch's own error band
in the HLL_8-composed dense regime) and relative-error properties at
larger synthetic cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 14
) -> DataFrame:
    """One row per group: (group..., distinct_est) — HLL distinct
    estimate of `value_col`. lgK=14 → ~0.8% relative standard error;
    sparse mode is exact below ~2^lgK/4 distinct values, so small groups
    report exact counts. One hash shuffle on the group key, fixed-size
    partial state per group."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, lgk)).alias("distinct_est")
    )


def hll_rollup(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Two-level mergeable rollup: sketch once at the fine grain
    (fine_cols ⊇ coarse_cols partitioning), then UNION-MERGE the fine
    sketches per coarse group — the coarse level never rescans raw rows.
    Union-merging loses nothing for estimation: the test pins estimate
    equality against the direct coarse sketch on the fixture (exact in
    sparse mode; see merge_hll_tables for the dense-regime caveat on
    DataSketches' HLL_8 union composition).
    Output: (coarse..., n_fine, distinct_est)."""
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias("_sk")
    )
    return fine.groupBy(*coarse_cols).agg(
        F.count("*").alias("n_fine"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("distinct_est"),
    )


def theta_overlap(
    left: DataFrame, right: DataFrame, key_col: str, lg_nom: int = 14
) -> DataFrame:
    """One-row estimate of the distinct-key set algebra of two corpora:
    (n_left_est, n_right_est, n_overlap_est, n_left_only_est) via theta
    sketches — |L|, |R|, |L ∩ R|, |L \\ R| over distinct `key_col`
    values, from one independent single-pass scan per side (no join, no
    co-shuffle). Exact below 2^lg_nom distinct keys per side, ~1%
    relative error above. The 100 TB decontamination pre-check: run this
    before paying analytics/decontam.py's exact join."""
    lsk = left.agg(F.theta_sketch_agg(key_col, lg_nom).alias("lsk"))
    rsk = right.agg(F.theta_sketch_agg(key_col, lg_nom).alias("rsk"))
    both = lsk.crossJoin(rsk)  # 1x1 — trivially broadcast
    return both.select(
        F.theta_sketch_estimate("lsk").alias("n_left_est"),
        F.theta_sketch_estimate("rsk").alias("n_right_est"),
        F.theta_sketch_estimate(F.theta_intersection("lsk", "rsk")).alias(
            "n_overlap_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("lsk", "rsk")).alias(
            "n_left_only_est"
        ),
    )


def kll_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 200,
) -> DataFrame:
    """Per-group quantiles from a KLL sketch over a BIGINT value column:
    (group..., n, q_<label> for each q). Mergeable fixed-size state like
    the HLL path (contrast stats.group_quantiles, which sorts each group
    exactly, and group_quantiles_approx, whose Greenwald-Khanna state
    Spark cannot merge across pre-aggregated frames). k=200 → normalized
    rank error ~1.65% at 99% confidence: the returned value's true rank
    r satisfies |r - q| ≤ eps, which is what the oracle-gated bound
    check and the pytest property assert."""
    sk = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.kll_sketch_agg_bigint(F.col(value_col).cast("bigint"), k).alias("_sk"),
    )
    cols = [*group_cols, "n"]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"rank must be in [0,1]: {q}")
        label = f"q{str(q).replace('.', '_')}"
        cols.append(
            F.kll_sketch_get_quantile_bigint("_sk", F.lit(float(q))).alias(label)
        )
    return sk.select(*cols)


def hll_sketch_table(
    df: DataFrame, key_cols: list[str], value_col: str, lgk: int = 14
) -> DataFrame:
    """(key..., hll binary) — one stored HLL sketch per key. The
    mergeable-STATE form of hll_distinct: persist this table per batch /
    crawl generation (it is a valid SnapshotStore append-table payload)
    and fold batches with merge_hll_tables instead of rescanning
    history — the same incremental-maintenance contract as the
    frontier's bloom deltas (seen.merge_bloom), for cardinality
    metrics."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias("hll")
    )


def merge_hll_tables(
    prev: DataFrame, delta: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Fold a new batch's sketch table into the accumulated one:
    full-outer join on the key, pairwise hll_union where both sides
    exist, pass-through otherwise. At sparse cardinalities the folded
    estimate equals the direct sketch exactly; in dense/coupon-promotion
    regimes DataSketches' union composes through HLL_8 and the folded
    estimate may differ from direct by a fraction of the sketch's own
    ~0.8% standard error (both remain within the bound) —
    test_merge_hll_tables_incremental_equals_direct pins both regimes.
    One hash shuffle on the key per fold; under a bucketed store layout
    (state.py) the exchange disappears."""
    p = prev.select(*key_cols, F.col("hll").alias("_p"))
    d = delta.select(*key_cols, F.col("hll").alias("_d"))
    joined = p.join(d, key_cols, "full_outer")
    merged = (
        F.when(F.col("_p").isNull(), F.col("_d"))
        .when(F.col("_d").isNull(), F.col("_p"))
        .otherwise(F.hll_union("_p", "_d"))
    )
    return joined.select(*key_cols, merged.alias("hll"))


def hll_estimate(table: DataFrame) -> DataFrame:
    """Read side of the sketch table: attach distinct_est."""
    return table.select(
        "*", F.hll_sketch_estimate("hll").alias("distinct_est")
    ).drop("hll")


def theta_overlap_by(
    left: DataFrame,
    right: DataFrame,
    group_col: str,
    key_col: str,
    lg_nom: int = 14,
) -> DataFrame:
    """Per-group theta set algebra: one row per group value with
    (n_left_est, n_right_est, n_overlap_est) over the distinct keys of
    each side — the grouped form of theta_overlap (per-language /
    per-source contamination estimates from one scan per side plus one
    tiny sketch-table join). A group absent from one side reports 0 for
    that side and the overlap."""
    l = left.groupBy(group_col).agg(
        F.theta_sketch_agg(key_col, lg_nom).alias("_lsk")
    )
    r = right.groupBy(group_col).agg(
        F.theta_sketch_agg(key_col, lg_nom).alias("_rsk")
    )
    j = l.join(r, group_col, "full_outer")
    est = F.theta_sketch_estimate
    both = F.col("_lsk").isNotNull() & F.col("_rsk").isNotNull()
    return j.select(
        group_col,
        F.coalesce(est("_lsk"), F.lit(0.0)).alias("n_left_est"),
        F.coalesce(est("_rsk"), F.lit(0.0)).alias("n_right_est"),
        F.when(both, est(F.theta_intersection("_lsk", "_rsk")))
        .otherwise(F.lit(0.0))
        .alias("n_overlap_est"),
    )
