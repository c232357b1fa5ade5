"""Recrawl (freshness) scheduling: estimate each URL's change rate from
its fetch history and derive the next revisit interval — the incremental
counterpart of the frontier's discovery scheduling (frontier.py schedules
NEW urls; this module decides when to come BACK). Policy follows the
classic uniform-sampling estimator (changes observed / revisit
opportunities) with a bounded inverse-rate interval: fast-changing pages
are revisited every generation, static pages back off toward
max_interval.

The reference post-processor is a one-shot batch (no revisit loop); this
is north_rule surface — a 10^10-URL crawler must prioritize refresh
against discovery or its corpus goes stale.

Scale shape: ONE hash shuffle on the url key. The per-URL history window
(lag of content hash by generation) and the per-URL aggregate share the
same partitioning, so Catalyst plans a single exchange; no state lives
on the driver. History length per URL is bounded by the retention the
caller feeds in — at 10^10 URLs you feed the last K fetches per URL
(a delta-log table, same merge-on-read layout as state.py tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def estimate_change_rate(
    history: DataFrame,
    key_col: str = "url_hash",
    gen_col: str = "generation",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change statistics from fetch history rows
    (key, generation, content_hash), one row per fetch.

    A "change" is a fetch whose content hash differs from the previous
    fetch's (first fetch is never a change). change_rate = changes per
    revisit opportunity = n_changes / (n_fetches - 1); single-fetch URLs
    get rate 0.0 (no evidence yet — the interval policy handles the
    cold-start by starting at min_interval anyway).
    """
    w = Window.partitionBy(key_col).orderBy(gen_col)
    prev = F.lag(F.col(hash_col)).over(w)
    changed = F.when(
        prev.isNotNull() & (F.col(hash_col) != prev), F.lit(1)
    ).otherwise(F.lit(0))
    # Aggregate on the ORIGINAL key attribute: renaming below the window
    # would hide the window's output partitioning from EnsureRequirements
    # and buy a second exchange (verified in test_single_exchange_plan).
    per_fetch = history.select(
        F.col(key_col),
        F.col(gen_col).alias("__gen"),
        changed.alias("__changed"),
    )
    return (
        per_fetch.groupBy(key_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("__changed").alias("n_changes"),
            F.max("__gen").alias("last_gen"),
        )
        .select(
            F.col(key_col),
            F.col("n_fetches").cast("long").alias("n_fetches"),
            F.col("n_changes").cast("long").alias("n_changes"),
            F.col("last_gen").alias("last_gen"),
            F.when(F.col("n_fetches") > 1,
                   F.col("n_changes") / (F.col("n_fetches") - 1))
             .otherwise(F.lit(0.0)).alias("change_rate"),
        )
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url_hash",
    fp_col: str = "content_hash",
) -> DataFrame:
    """Diff two crawl snapshots into per-URL change status — the batch
    companion of estimate_change_rate (that one watches a URL's history;
    this one compares two whole corpus states, e.g. last month's crawl vs
    this month's).

    Output: (key, status, old_fp, new_fp) with status ∈
    {'added', 'removed', 'changed', 'unchanged'}:
      added     — key only in `new`
      removed   — key only in `old`
      changed   — in both, fingerprints differ (null fingerprints never
                  equal anything, so null-vs-value counts as changed;
                  null-vs-null too — an unfingerprinted pair is not
                  evidence of sameness)
      unchanged — in both, fingerprints equal

    Scale shape: one full-outer sort-merge join hashed on the url key —
    both snapshots shuffle once; with both snapshots stored bucketed by
    the key (state.py layout) the exchange disappears entirely. Status
    derivation is pure column expressions; no driver state. Feed
    `changed`+`added` into the frontier as the next generation's work,
    and the per-status counts into the recrawl policy as corpus-level
    drift metrics.

    Each snapshot must be unique per key (dedupe upstream — frontier
    state already guarantees one row per url_hash).
    """
    o = old.select(
        F.col(key_col).alias("__k"),
        F.col(fp_col).alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key_col).alias("__k"),
        F.col(fp_col).alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, on="__k", how="full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    status = (
        F.when(~in_old & in_new, F.lit("added"))
        .when(in_old & ~in_new, F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("__k").alias(key_col), status.alias("status"), "old_fp", "new_fp"
    )


def schedule_recrawl(
    rates: DataFrame,
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """Attach the revisit policy: interval = clamp(floor(1 / (rate +
    1/max_interval)), min_interval, max_interval) generations — inverse
    to the observed change rate, bounded both ways (rate 0 → max backoff;
    rate 1 → revisit next generation), and next_fetch_gen = last_gen +
    interval. Pure column arithmetic, map-only over the rates frame.
    """
    if not 0 < min_interval <= max_interval:
        raise ValueError(f"bad interval bounds: [{min_interval}, {max_interval}]")
    interval = F.least(
        F.lit(max_interval).cast("long"),
        F.greatest(
            F.lit(min_interval).cast("long"),
            F.floor(F.lit(1.0) / (F.col("change_rate") + 1.0 / max_interval)),
        ),
    )
    return rates.select(
        "*",
        interval.alias("interval"),
        (F.col("last_gen") + interval).alias("next_fetch_gen"),
    )
