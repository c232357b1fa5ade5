"""Sequence packing for LLM training: concatenate documents in a
deterministic order within each shard and chunk the token stream into
fixed-budget training sequences (the standard "concat-and-chunk"
pretraining layout). Emits, per document, its token offsets and the
chunk ids it lands in — the tokenizer stage downstream uses these to
materialize sequences without re-scanning the corpus order.

Scale design: the naive plan is one running-total window per shard
(`SUM OVER (PARTITION BY shard ORDER BY doc_id)`), which serializes
each shard onto a single task — a hot-partition bottleneck when one
shard holds billions of docs. This module computes the SAME prefix sum
in two phases, both parallel:

  1. within-bucket cumsum — window over (shard, bucket) where
     bucket = floor(order_key / bucket_size): bounded partitions,
     thousands of them, all parallel;
  2. bucket offsets — aggregate one row per (shard, bucket) (partial
     aggregation map-side), exclusive-prefix-sum that tiny relation
     with a window, broadcast-join it back.

Result is identical to the single-window plan (the oracle SQL uses the
plain window — DuckDB value-hash pins the equivalence) but no task ever
sees more than bucket_size rows of window state.

The reference repo has no packing stage (north_rule training-pipeline
surface); its deterministic-order analog is the sorted-file id
enumeration in /root/reference/processor/post_utils/utils.py:37-55.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def token_budget_cap(
    docs: DataFrame,
    budget: int,
    score_col: str,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Training-mix construction: per group (source/domain/language),
    keep the best-scoring documents until a token budget is exhausted —
    "give each domain at most B tokens, best docs first". A doc is kept
    iff the running token total through it (docs ordered by score DESC,
    id ASC) stays ≤ budget; once a doc overflows, everything after it in
    the group is dropped (concat-and-stop semantics).

    score_col must be numeric in [0,1] (e.g. text.quality_score).

    Scale shape — same hot-partition hazard as pack_sequences: a plain
    `SUM OVER (PARTITION BY group ORDER BY score DESC)` serializes each
    group onto one task. Reused trick, adapted to an ORDER BY on a value
    column: bucket = floor((1-score)·n_buckets) is monotone
    NON-INCREASING in score, so (bucket ASC, score DESC, id) is the same
    total order as (score DESC, id) — cumsum within (group, bucket)
    windows, exclusive-prefix the tiny per-bucket totals, broadcast them
    back. No task holds more than one bucket's rows of window state; the
    oracle SQL uses the plain single-window form and the DuckDB
    value-hash pins the equivalence.

    Output: group, id, score, n_tokens, cum_tokens (running total
    including self), only the kept rows.
    """
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(
            F.floor((F.lit(1.0) - F.col("score")) * n_buckets),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )

    w_in = (
        Window.partitionBy("grp", "bucket")
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_in", F.sum("n_tokens").over(w_in))

    # Bucket totals come from the WINDOWED frame (total = max running
    # total), not from re-aggregating `base`: scoring can be expensive
    # (regex-heavy quality signals), and deriving both branches from
    # `within` lets Spark reuse the scan+score+window exchange subtree
    # instead of computing the score twice. The groupBy keys equal the
    # window partitioning, so the totals aggregation adds no exchange.
    w_b = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = (
        within.groupBy("grp", "bucket")
        .agg(F.max("cum_in").alias("bucket_total"))
        .withColumn(
            "bucket_off", F.coalesce(F.sum("bucket_total").over(w_b), F.lit(0))
        )
        .select("grp", "bucket", "bucket_off")
    )

    cum = F.col("bucket_off") + F.col("cum_in")
    return (
        within.join(F.broadcast(offsets), ["grp", "bucket"])
        .filter(cum <= budget)
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "score",
            "n_tokens",
            cum.alias("cum_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    shard_col: str = "source",
    order_col: str = "doc_id",
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign every document its token span [start_off, end_off) in the
    per-shard concatenated stream (docs ordered by `order_col`, which
    must be numeric and unique within a shard) and the chunk ids that
    span covers at `budget` tokens per training sequence.

    Output columns: shard, doc_id-order key, n_tokens, start_off,
    end_off, first_chunk, last_chunk, n_chunks (chunks this doc
    touches; >1 means the doc is split across sequence boundaries).
    """
    base = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(order_col).alias("ord"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("bucket", F.floor(F.col("ord") / bucket_size))

    # phase 1: cumsum within bounded (shard, bucket) partitions
    w_in = (
        Window.partitionBy("shard", "bucket")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_in", F.sum("n_tokens").over(w_in))

    # phase 2: exclusive prefix of bucket totals — one row per bucket,
    # partial-aggregated map-side, tiny, broadcast back
    w_b = (
        Window.partitionBy("shard")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = (
        base.groupBy("shard", "bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "bucket_off", F.coalesce(F.sum("bucket_total").over(w_b), F.lit(0))
        )
        .select("shard", "bucket", "bucket_off")
    )

    packed = within.join(F.broadcast(offsets), ["shard", "bucket"])
    end = F.col("bucket_off") + F.col("cum_in")
    start = end - F.col("n_tokens")
    first_chunk = F.floor(start / budget)
    last_chunk = F.when(F.col("n_tokens") == 0, first_chunk).otherwise(
        F.floor((end - 1) / budget)
    )
    return packed.select(
        "shard",
        F.col("ord").alias(order_col),
        "n_tokens",
        start.alias("start_off"),
        end.alias("end_off"),
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks"),
    )
