"""Inverted-index construction: token → posting list over the document
corpus — the web-scale retrieval structure a crawl pipeline materializes
next to the text (BM25 retrieval, decontamination probes, keyword
routing all read it).

The reference greps documents with per-row Python regex loops
(/root/reference/processor/post_processor/processor.py:99-180 scans
every document's text for every scope pattern); an inverted index is
the scale answer to the same lookup — build once, probe by key.

Execution shape: tokenize JVM-side (split + filter, no Python), then
ONE shuffle keyed on (token, doc) for per-document term frequencies and
ONE keyed on token for the posting lists — both with map-side partial
aggregation. Posting arrays are sorted for determinism and optionally
capped: a stopword's posting list is O(corpus) and no consumer wants
it — `max_df` drops tokens appearing in more than that fraction of
documents (same df-cap discipline as dedup's hot-shingle cap), and
`max_postings` truncates the stored list (df/tf stay exact) so one hot
token can never blow a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["index_tokens", "inverted_index"]


def index_tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens; empties from punctuation runs are
    dropped. Mirrors the oracle's string_split_regex exactly."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float | None = None,
    max_postings: int | None = None,
) -> DataFrame:
    """Build (token, df, tf, postings) — df = documents containing the
    token, tf = total occurrences, postings = sorted distinct doc ids.

    min_df prunes hapax noise; max_df_frac (fraction of n_docs) prunes
    stopword-grade tokens entirely; max_postings bounds the stored array
    (exact df/tf are kept so the truncation is visible to consumers).
    """
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(index_tokens(F.col(text_col))).alias("token"),
    )
    per_doc = toks.groupBy("token", "_doc").agg(F.count("*").alias("_n"))
    idx = per_doc.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("_n").cast("long").alias("tf"),
        F.sort_array(F.collect_list("_doc")).alias("postings"),
    )
    if min_df > 1:
        idx = idx.where(F.col("df") >= min_df)
    if max_df_frac is not None:
        cap = int(docs.count() * max_df_frac)
        idx = idx.where(F.col("df") <= cap)
    if max_postings is not None:
        idx = idx.withColumn("postings", F.slice("postings", 1, max_postings))
    return idx
