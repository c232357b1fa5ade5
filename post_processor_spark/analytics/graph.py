"""Graph analytics over the citation/referral edge graph.

The reference ranks sources by raw citation in-degree ("interest
output": number of referrals per source,
/root/reference/processor/post_processor/processor.py:81-97, surfaced
sorted in the archived notebook explorer). In-degree is a fine first
cut, but at web scale it is trivially gamed by one prolific referrer;
PageRank over the same referral edge set answers the question the
in-degree count approximates — which sources does the WHOLE graph point
at — and is the standard authority score a crawl scheduler feeds back
into frontier priority. No reference analog beyond the in-degree count;
this is the builder-spec scale extension (same relationship to
interest_ranking as neardup_clusters has to drop_duplicates).

Execution shape (designed for |E| >> |V| >> memory):
- out-degree shares are computed once (one shuffle over edges) and the
  per-edge contribution weight carried as a column — iterations never
  recompute degrees;
- each iteration is one equi-join of the rank frame (|V| rows) against
  the share table plus one groupBy(dst) sum with map-side partial
  aggregation — two shuffles per iteration, both keyed on node id, so
  pre-bucketing nodes and edges by id makes them exchange-free;
- the dangling-node mass (rank parked on nodes with no out-edges) is a
  one-row aggregate broadcast back into the update expression — never a
  driver-side collect;
- lineage is cut per iteration with localCheckpoint (same discipline as
  dedup.neardup_clusters: an iterative plan otherwise grows by two
  shuffles per round and re-executes from the source on every action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "rank_priority"]


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
) -> DataFrame:
    """Power-iteration PageRank with uniform teleport and dangling-mass
    redistribution.

    nodes(id_col) — one row per node (must cover every src/dst);
    edges(src, dst) — directed, parallel edges count double (a doc
    citing the same source twice contributes twice, matching the
    reference's referral list semantics before its dict.fromkeys dedupe,
    processor.py:36 — pass edges.distinct() for the deduped variant).

    Returns (id_col, rank); ranks sum to 1 every iteration (teleport
    (1-d)/N + d * (in-edge shares + dangling mass spread uniformly)).

    iterations is fixed (not convergence-tested): rank feedback for
    scheduling wants a bounded, deterministic cost — and a fixed unroll
    is what the DuckDB oracle can express (q_pagerank unrolls the same
    three rounds as chained CTEs).
    """
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col(id_col), F.lit(0.0).alias("rank"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("_outdeg"))
    shares = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_outdeg")).alias("share"))
        .persist()
    )
    has_out = outdeg.select(F.col("src").alias(id_col))
    ranks = nodes.select(id_col).withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # rank mass sitting on dangling nodes (no out-edges): one-row
        # aggregate, broadcast into the update — spread uniformly like
        # the original formulation (keeps sum(rank) == 1 exactly).
        dangling = (
            ranks.join(has_out, id_col, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contrib = (
            ranks.join(shares, ranks[id_col] == shares.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("_contrib"))
            .withColumnRenamed("dst", id_col)
        )
        ranks = (
            nodes.select(id_col)
            .join(contrib, id_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                id_col,
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    shares.unpersist()
    return ranks


def rank_priority(
    ranks: DataFrame,
    n_nodes: int | None = None,
    base: int = 5,
    lo: int = 0,
    hi: int = 9,
    id_col: str = "id",
) -> DataFrame:
    """Authority feedback into the crawl scheduler: map PageRank scores
    to frontier scheduling classes (frontier.ORDER_COLS sorts priority
    ASCENDING — lower schedules earlier; DEFAULT_PRIORITY = 5 is `base`).

    priority = clamp(base - floor(log2(rank * N)), lo, hi): a node at
    the uniform baseline rank 1/N keeps `base`; every doubling of
    authority moves it one class earlier. Assignment is by VALUE, not by
    quantile — an ntile/percent_rank assignment would funnel the whole
    rank frame through one global sort task, while this is a map-only
    expression with no shuffle at any scale, and is reproducible
    independent of partitioning (crawl-ordering determinism,
    BASELINE.json north_rule). Returns (id_col, priority int).
    """
    if n_nodes is None:
        n_nodes = ranks.count()
    ratio = F.col("rank") * F.lit(float(n_nodes))
    cls = F.lit(base) - F.floor(F.log2(ratio))
    return ranks.select(
        F.col(id_col),
        F.least(F.lit(hi), F.greatest(F.lit(lo), cls)).cast("int").alias("priority"),
    )
