"""Corpus composition reporting: the per-source/domain mix table a
training-data pipeline publishes with every crawl snapshot — how many
documents and tokens each source contributes, its share of the corpus,
and its dominant language.

The reference reports per-source interest as a citation count
(/root/reference/processor/post_processor/processor.py:81-97) and its
notebook explorer eyeballs per-domain output sizes; at 100 TB the
question becomes "what is the *mix* I am about to train on" — token
share and language composition per registrable domain — and the answer
must come out of one aggregation pass, not a notebook loop.

Execution shape: one groupBy(source) with map-side partial aggregation
for the totals; the dominant language comes from a (source, lang)
count + per-source max_by — two keyed shuffles, no global window (the
corpus-wide token total is a one-row aggregate broadcast back in, never
an `over ()` window that would funnel every row through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text

__all__ = ["domain_mix_report"]


def domain_mix_report(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus mix: (group_col, n_docs, total_tokens,
    total_chars, token_share, n_langs, top_lang, top_lang_docs).

    token_share is this source's fraction of all corpus tokens (the
    number a sampling/temperature step consumes directly); top_lang is
    the language with the most documents in the source, ties broken to
    the lexicographically smallest code so the report is deterministic
    under any partitioning.
    """
    base = docs.select(
        F.col(group_col),
        F.col(lang_col),
        text.token_count(F.col(text_col)).alias("_tok"),
        F.length(text_col).alias("_chars"),
    )
    per_lang = base.groupBy(group_col, lang_col).agg(
        F.count("*").alias("_docs"),
        F.sum("_tok").alias("_tokens"),
        F.sum("_chars").alias("_c"),
    )
    # min_by on (neg docs, lang) struct = most docs, ties to smallest lang
    per_src = per_lang.groupBy(group_col).agg(
        F.sum("_docs").cast("long").alias("n_docs"),
        F.sum("_tokens").cast("long").alias("total_tokens"),
        F.sum("_c").cast("long").alias("total_chars"),
        F.count("*").cast("long").alias("n_langs"),
        F.min_by(
            F.struct(F.col(lang_col).alias("l"), F.col("_docs").alias("d")),
            F.struct((-F.col("_docs")).alias("nd"), F.col(lang_col).alias("l")),
        ).alias("_top"),
    )
    total = base.agg(F.sum("_tok").cast("double").alias("_grand"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            "total_tokens",
            "total_chars",
            F.round(F.col("total_tokens") / F.col("_grand"), 9).alias("token_share"),
            "n_langs",
            F.col("_top.l").alias("top_lang"),
            F.col("_top.d").cast("long").alias("top_lang_docs"),
        )
    )
