"""Deterministic hash-based sampling for training-data pipelines:
uniform downsample, per-stratum (domain/language) rate control, and a
stable train/eval holdout split.

No RNG anywhere: each row's sampling coordinate u ∈ [0,1) is derived
from md5(key ‖ salt), so the sample is (a) exactly reproducible across
runs, engines, and cluster sizes, (b) stable under re-partitioning and
input reordering, and (c) consistent across tables — sampling two
tables by the same key keeps them aligned. md5 (not xxhash64) keeps the
whole decision reproducible in ANSI SQL (the DuckDB oracle for
q_stratified_sample recomputes u bit-for-bit).

Scale shape: every operator here is a map-only filter — no shuffle, no
state, embarrassingly parallel at any width. Changing the salt draws an
independent sample; changing fractions keeps subset monotonicity
(fraction 0.1 ⊂ fraction 0.2 at the same salt), which is what you want
for growing a training mix without re-drawing it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 — u is the first 8 md5 hex digits scaled into [0,1)
_SCALE = float(1 << 32)


def sample_u(key: Column, salt: str = "") -> Column:
    """u ∈ [0,1): first 32 bits of md5(key ‖ salt) / 2^32."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_SCALE)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    return df.filter(sample_u(F.col(key_col), salt) < F.lit(fraction))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, key_col: str = "doc_id", salt: str = "",
) -> DataFrame:
    """Per-stratum rate control: keep a row iff u < fraction of its
    stratum (unlisted strata get default_fraction). The per-stratum
    threshold is a literal CASE chain — for thousands of strata pass the
    fractions as a broadcast-joined rates table instead; this form keeps
    the filter inside whole-stage codegen for the common few-strata mix
    (languages, source tiers)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction must be in [0,1]: {k}={v}")
    thr: Column = F.lit(float(default_fraction))
    for k, v in fractions.items():
        thr = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(thr)
    return df.filter(sample_u(F.col(key_col), salt) < thr)


def stratified_sample_table(
    df: DataFrame, rates: DataFrame, strata_col: str,
    default_fraction: float = 0.0, key_col: str = "doc_id", salt: str = "",
) -> DataFrame:
    """stratified_sample for MANY strata: rates(strata, fraction) is
    broadcast-joined (small dim by construction — one row per stratum),
    so the corpus still never shuffles."""
    r = F.broadcast(
        rates.select(F.col(strata_col), F.col("fraction").cast("double"))
    )
    joined = df.join(r, strata_col, "left")
    return joined.filter(
        sample_u(F.col(key_col), salt)
        < F.coalesce(F.col("fraction"), F.lit(float(default_fraction)))
    ).select(*df.columns)


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    budget_fraction: float = 1.0,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture sampling: re-weight strata (languages,
    domains, source tiers) so the kept corpus follows count^alpha instead
    of raw counts — the standard move for flattening a head-heavy crawl
    mix before training (alpha=1 keeps natural proportions, alpha=0
    equalizes strata, alpha≈0.5–0.7 is the usual multilingual setting).

    Each stratum s with n_s rows gets weight w_s = n_s^alpha and keep
    fraction  f_s = min(1, B·w_s / (Σw · n_s))  where B =
    budget_fraction·Σn is the target kept-row budget. Small strata cap at
    1.0 (kept whole, no renormalization pass — the budget is a target,
    not a constraint; document callers can iterate if they need exact B).

    Scale shape: one tiny aggregate over the corpus (one row per stratum,
    map-side partial combine), a broadcast of that stratum table, and a
    map-only deterministic-hash filter — the corpus itself never
    shuffles. Fully reproducible (see module docstring) and expressible
    bit-for-bit in ANSI SQL for the oracle.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0: {alpha}")
    if not 0.0 <= budget_fraction <= 1.0:
        raise ValueError(f"budget_fraction must be in [0,1]: {budget_fraction}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    totals = counts.agg(
        F.sum("__n").alias("__total"),
        F.sum(F.pow("__n", F.lit(float(alpha)))).alias("__wsum"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        F.col(strata_col),
        F.least(
            F.lit(1.0),
            F.lit(float(budget_fraction)) * F.col("__total")
            * F.pow("__n", F.lit(float(alpha)))
            / (F.col("__wsum") * F.col("__n")),
        ).alias("fraction"),
    )
    return stratified_sample_table(
        df, rates, strata_col, default_fraction=0.0, key_col=key_col, salt=salt
    )


def train_eval_split(
    df: DataFrame, eval_fraction: float = 0.01, key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """(train, eval) — a stable holdout: a row's side never changes as
    the corpus grows, because membership depends only on its own key.
    Use a different salt than any hash_sample over the same keys so the
    holdout isn't correlated with a downsample."""
    u = sample_u(F.col(key_col), salt)
    return (
        df.filter(u >= F.lit(eval_fraction)),
        df.filter(u < F.lit(eval_fraction)),
    )


def quality_gate_per_group(
    docs: DataFrame,
    group_col: str,
    score_col: str,
    q: float = 0.5,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Adaptive per-group quality gate: keep rows scoring at or above
    their OWN group's q-quantile — the per-language / per-domain
    threshold filter real curation pipelines use instead of one global
    cutoff (a global threshold empties low-resource languages and
    keeps every spammy page of the highest-scoring domain).

    Exact path: stats.group_quantiles (one row per group) broadcast back
    onto the corpus — one window pass over the grouped sort plus a
    broadcast join; deterministic under ties (the threshold VALUE at
    rank ceil(q·n) doesn't depend on tie order). approx=True swaps in
    the percentile_approx sketch (partial-aggregable, bounded memory)
    for corpora where one group outgrows a partition sort — same
    contract as stats.group_quantiles_approx: rank error ≤ 1/accuracy,
    not oracle-exact.
    """
    from . import stats

    fn = stats.group_quantiles_approx if approx else stats.group_quantiles
    kwargs = {"accuracy": accuracy} if approx else {}
    thr = fn(docs, group_col, score_col, qs=(q,), **kwargs).select(
        group_col, F.col(stats._plabel(q)).alias("_thr")
    )
    return (
        docs.join(F.broadcast(thr), group_col)
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws es_key = ln(u) / w with u = sample_u(key) and
    w = weight > 0; the k rows with the LARGEST es_key are distributed
    as a weight-proportional sample without replacement. Deterministic
    like everything in this module — u comes from md5, so the draw is
    reproducible across runs/engines and the DuckDB oracle replays it
    bit-for-bit (ties broken by key).

    Rows with weight ≤ 0 are excluded (A-ES is undefined there). A key
    whose u lands exactly on 0 (probability 2^-32 — expected ~2 keys at
    10^10 rows) gets es_key = -inf explicitly: Spark's log(0) is NULL,
    not the -inf the A-ES limit calls for, and a NULL would sort
    nulls-last yet still leak into small strata with a NULL es_key.

    Scale shape: global form is sort-free TakeOrderedAndProject
    (per-partition top-k heaps + driver merge of k·P candidates — no
    full sort, no shuffle of the corpus); per-stratum form is ONE hash
    shuffle on the stratum key + in-partition rank. The weight column
    stays arbitrary (token counts, quality scores, inverse duplication
    counts) — this is the "sample the mix by importance" primitive a
    training-data pipeline runs after scoring.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    w = F.col(weight_col).cast("double")
    u = sample_u(F.col(key_col), salt)
    es = F.when(u > 0, F.log(u) / w).otherwise(F.lit(float("-inf")))
    base = df.filter(w > 0).withColumn("es_key", es)
    if strata_col is None:
        return base.orderBy(F.desc("es_key"), key_col).limit(k)
    from pyspark.sql import Window

    win = Window.partitionBy(strata_col).orderBy(F.desc("es_key"), key_col)
    return (
        base.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
