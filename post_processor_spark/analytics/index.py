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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["index_tokens", "inverted_index", "bm25_scores"]


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


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    round_scores: int | None = None,
) -> DataFrame:
    """BM25 ranked retrieval: top_k documents per query — what the
    inverted index exists to serve (and the relevance probe a
    decontamination or eval-leakage audit runs against the corpus).

    Uses the Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)) so
    scores stay positive, and the standard tf saturation
    tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

    Execution shape: the (doc, term, tf) frame is semi-joined to the
    DISTINCT query-term set FIRST — the per-doc aggregation only ever
    sees postings for terms someone asked about, so cost tracks the
    query load, not the corpus vocabulary. Query terms are a broadcast
    join (queries are small by construction); N and avgdl are one-row
    broadcast aggregates; the final top_k is a per-query window over
    rows already reduced to (query, doc) scores. Duplicate terms in one
    query count once (set semantics, standard for short web queries).

    round_scores rounds the score BEFORE ranking: two near-tied docs
    whose raw doubles differ only in the last ulp would otherwise rank
    nondeterministically across engines/hardware — rounding first makes
    the (rounded score desc, doc asc) order reproducible everywhere.
    """
    qterms = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(F.array_distinct(index_tokens(F.col(query_col)))).alias("_term"),
    )
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(index_tokens(F.col(text_col))).alias("_term"),
    )
    dl = toks.groupBy("_doc").agg(F.count("*").alias("_dl"))
    # queried terms only, BEFORE any term-keyed aggregation: per-term df
    # over the filtered frame is still the exact corpus df (the filter
    # keeps every doc containing the term), and the vocabulary-wide
    # shuffle never happens
    tf = (
        toks.join(F.broadcast(qterms.select("_term").distinct()), "_term")
        .groupBy("_doc", "_term")
        .agg(F.count("*").alias("_tf"))
    )
    df_ = tf.groupBy("_term").agg(F.count("*").alias("_df"))
    stats = dl.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "_term")
        .join(dl, "_doc")
        .join(df_, "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_qid",
            "_doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + F.lit(k1)
                    * (1.0 - b + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("_qid", "_doc")
        .agg(F.sum("_s").alias("_score"))
    )
    if round_scores is not None:
        scored = scored.withColumn("_score", F.round("_score", round_scores))
    w = Window.partitionBy("_qid").orderBy(
        F.col("_score").desc(), F.col("_doc").asc()
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= top_k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_doc").alias(id_col),
            F.col("_rank").alias("rank"),
            F.col("_score").alias("score"),
        )
    )
