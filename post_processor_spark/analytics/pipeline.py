"""End-to-end training-corpus construction recipe: the composition a
user of this engine actually runs, wired from the individual operators
(clean → dedup → decontaminate → sample → pack) with one declared plan —
no materialization between stages, so Catalyst sees the whole lineage
and every stage's filter folds into the single corpus scan where
semantics allow.

Reference analog: the reference's compiler.py chains its stages
imperatively over pandas frames (load → match → merge → output); this is
the same chain-of-stages idea expressed as one lazy DataFrame program
over the analytics operators.

Scale notes per stage are in the called operators' docstrings; the
composition itself adds nothing but projections. `corpus_report` folds
the per-stage cardinalities into ONE DataFrame (a union of 1-row
aggregates) so the whole report is a single collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import clean, decontam, dedup, packing, sampling


def build_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
    min_words: int = 5,
    min_lines: int = 3,
    decontam_n: int = 13,
    decontam_hash: str = "xxhash64",
    temperature_alpha: float | None = None,
    sample_budget_fraction: float | None = None,
    pack_budget: int = 2048,
    salt: str = "",
    materialize: str | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """The standard cleaning→packing chain, returned as (packed, stages):

    1. C4-style line/doc cleaning (clean.c4_clean)
    2. exact dedup on the normalized text (dedup.exact_dedup)
    3. benchmark n-gram decontamination (decontam.decontaminate),
       skipped when no benchmark is given; decontam_hash picks the gram
       hash family (engine-default xxhash64, or md5 when an external
       SQL oracle must replay the exact gram sets)
    4. temperature/mixture sampling to a corpus budget fraction
       (sampling.temperature_sample), skipped when NEITHER
       temperature_alpha nor sample_budget_fraction is set; setting
       exactly one of the two raises ValueError (a silently unsampled
       corpus is worse than a loud config error)
    5. concat-and-chunk sequence packing (packing.pack_sequences)

    `stages` maps stage name → the DataFrame AS OF that stage, for
    reporting (corpus_report) or for forking the pipeline (e.g. running
    near-dup clustering on the deduped view); with the default
    materialize=None every value is lazy — nothing is computed until an
    action runs.

    materialize: several stages consume their input TWICE (decontam
    derives gram hits from the corpus then anti-joins them back;
    sampling aggregates strata counts then filters; packing sums bucket
    offsets then joins). Left lazy, that doubling COMPOUNDS — the
    composed plan re-derives the whole upstream chain per branch,
    ~2^stages corpus scans. 'persist' (memory-and-disk cache) or
    'checkpoint' (localCheckpoint, also cuts lineage) pins each stage
    boundary so every stage computes once — linear, the shape a 100 TB
    run needs (where you would write stage outputs as tables instead;
    the stages dict is exactly that seam). Caller owns unpersist via the
    stages dict.
    """
    if materialize not in (None, "persist", "checkpoint"):
        raise ValueError(
            f"materialize must be None, 'persist' or 'checkpoint': {materialize!r}"
        )

    def _pin(df: DataFrame) -> DataFrame:
        if materialize == "persist":
            from pyspark import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK)
        if materialize == "checkpoint":
            return df.localCheckpoint(eager=False)
        return df

    stages: dict[str, DataFrame] = {"raw": docs}
    cleaned = _pin(
        clean.c4_clean(
            docs, text_col=text_col, min_words=min_words, min_lines=min_lines
        )
    )
    stages["cleaned"] = cleaned
    deduped = _pin(dedup.exact_dedup(cleaned, text_col=text_col, id_col=id_col))
    stages["deduped"] = deduped
    current = deduped
    if benchmark is not None:
        current = _pin(
            decontam.decontaminate(
                current, benchmark, text_col=text_col, id_col=id_col,
                n=decontam_n, hash=decontam_hash,
            )
        )
        stages["decontaminated"] = current
    if (temperature_alpha is None) != (sample_budget_fraction is None):
        raise ValueError(
            "temperature_alpha and sample_budget_fraction must be set together "
            "(got temperature_alpha=%r, sample_budget_fraction=%r); the sampling "
            "stage runs only when both are provided"
            % (temperature_alpha, sample_budget_fraction)
        )
    if temperature_alpha is not None and sample_budget_fraction is not None:
        current = _pin(
            sampling.temperature_sample(
                current,
                strata_col,
                alpha=temperature_alpha,
                budget_fraction=sample_budget_fraction,
                key_col=id_col,
                salt=salt,
            )
        )
        stages["sampled"] = current
    packed = packing.pack_sequences(
        current,
        budget=pack_budget,
        text_col=text_col,
        shard_col=strata_col,
        order_col=id_col,
    )
    stages["packed"] = packed
    return packed, stages


def corpus_report(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage, n_docs) — one row per pipeline stage, in pipeline order,
    as a single unioned aggregate (one collect computes the whole
    funnel). Stage order is the dict's insertion order."""
    out = None
    for i, (name, df) in enumerate(stages.items()):
        row = df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_idx")
