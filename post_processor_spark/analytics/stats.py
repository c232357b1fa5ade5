"""Grouped distribution profiling: exact per-group order-statistic
quantiles (and the approx variant for the 100 TB path).

Why not `percentile()` / `percentile_approx()` for the oracle-checked
path: Spark's exact `percentile` buffers every value of a group in one
aggregation buffer (OOM on a hot group) and linearly interpolates with
engine-specific float arithmetic, so it neither scales nor reproduces
bit-for-bit across engines. The operator here defines the quantile as an
ORDER STATISTIC — the value at rank ceil(q·n) in the group's sort order
(quantile_disc semantics) — which is exact, engine-portable (the DuckDB
oracle computes the identical rank), and insensitive to how ties are
ordered (the value at a rank is well-defined even when rn assignment
among equal values is not).

Scale shape: ONE hash shuffle on the group key — the rank window and the
per-group aggregate share the partitioning, so Catalyst plans a single
exchange (same pattern as recrawl.estimate_change_rate; aggregate on the
original attribute, rename after). Per-group cost is a sort within the
partition, not a driver or buffer blowup. For corpora where even one
group's sort is too big, use `group_quantiles_approx` (t-digest-style
`percentile_approx`, partial-aggregable, no full sort) — same output
shape, documented error bound, not oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _plabel(q: float) -> str:
    # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
    s = f"{q * 100:g}".replace(".", "_")
    return f"p{s}"


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per group: (group, n, p<q> for each q) where p<q> is the
    value at rank ceil(q·n) in ascending `value_col` order (1-indexed;
    q must be in (0, 1]). ceil is computed in double precision on both
    engines — IEEE doubles make ceil(0.9·60)=55 on Spark AND DuckDB, so
    the oracle matches exactly.
    """
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0,1]: {q}")
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for q in qs:
        rank = F.ceil(F.lit(float(q)) * F.col("__n"))
        aggs.append(
            F.max(F.when(F.col("__rn") == rank, F.col(value_col)))
            .alias(_plabel(q))
        )
    return ranked.groupBy(group_col).agg(*aggs)


def group_quantiles_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Same shape as group_quantiles but via `percentile_approx`
    (Greenwald-Khanna sketch): partial-aggregable, bounded memory per
    group, rank error ≤ 1/accuracy — the variant to run at 100 TB when a
    single group may not fit a partition sort. Not bit-comparable to an
    oracle by construction; test it against group_quantiles with a rank
    tolerance instead.
    """
    aggs = [F.count("*").cast("long").alias("n")]
    for q in qs:
        aggs.append(
            F.percentile_approx(value_col, F.lit(float(q)), F.lit(accuracy))
            .alias(_plabel(q))
        )
    return df.groupBy(group_col).agg(*aggs)
