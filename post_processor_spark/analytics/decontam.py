"""Benchmark decontamination: flag/drop training documents that share a
word n-gram with an evaluation/benchmark set (the GPT-3-appendix /
Dolma-style 13-gram rule — public methodology).

Scale shape (100 TB corpus, benchmark set ≪ corpus): the benchmark gram
set is distinct-hashed and BROADCAST, so the corpus side never shuffles
— each task streams its own grams against the broadcast hash set. The
only exchange in the whole pipeline is the per-doc hit aggregation,
which carries HIT rows only (rare by construction: a clean corpus has
~zero contaminated grams). Dropping contaminated docs is a left-anti
join against the distinct hit-id set — again only hit ids move.

Hashing contract mirrors dedup.py: the engine default hashes grams
straight from their n tokens with one multi-arg xxhash64 (no gram
string ever materialized); `hash="md5"` switches both sides to the
first 32 bits of md5(gram string) so an external ANSI-SQL engine (the
DuckDB oracle for q_decontaminate) can reproduce every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from post_processor_spark.analytics.dedup import (
    hashed_shingles,
    norm_tokens,
    shingles,
)


def _gram_hashes_df(
    df: DataFrame, text_col: str, id_col: str, n: int, hash: str
) -> DataFrame:
    """(id, _h: long) — distinct n-gram hashes per doc under either
    hashing contract. Docs shorter than n tokens still yield their one
    padded gram (same contract as dedup.hashed_shingles), so a verbatim
    short benchmark string still matches itself."""
    if hash == "md5":
        sh = shingles(df, text_col, id_col, n)
        h32 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
        return sh.select("id", h32.alias("_h"))
    if hash != "xxhash64":
        raise ValueError(f"unknown hash contract: {hash!r}")
    return hashed_shingles(df, text_col, id_col, n)


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, hash: str = "xxhash64",
) -> DataFrame:
    """(_h: long) — the DISTINCT contaminated-gram hash set across the
    whole benchmark. Small by assumption (eval sets are MBs, not TBs);
    the callers broadcast it. Distinct here so the broadcast build side
    is minimal and the per-gram join multiplicity is exactly 1."""
    return _gram_hashes_df(bench, text_col, id_col, n, hash).select("_h").distinct()


def flag_contamination(
    docs: DataFrame, bench: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 13, hash: str = "xxhash64",
) -> DataFrame:
    """docs + `contam_grams` (distinct benchmark n-grams the doc
    contains) + `contaminated` (bool). Plan: corpus grams stream against
    the broadcast benchmark set (inner broadcast join — no corpus
    shuffle), hits aggregate per doc (hit rows only), then a LEFT join
    decorates the full corpus; clean docs get contam_grams = 0."""
    grams = _gram_hashes_df(docs, text_col, id_col, n, hash)
    bset = F.broadcast(benchmark_grams(bench, text_col, "doc_id", n, hash))
    hits = (
        grams.join(bset, "_h")
        .groupBy("id")
        .agg(F.count_distinct("_h").alias("contam_grams"))
    )
    out = docs.join(hits, docs[id_col] == hits["id"], "left").drop("id")
    return out.select(
        *docs.columns,
        F.coalesce(F.col("contam_grams"), F.lit(0)).cast("long").alias("contam_grams"),
        (F.coalesce(F.col("contam_grams"), F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame, bench: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 13, hash: str = "xxhash64",
) -> DataFrame:
    """docs minus every row sharing ≥1 n-gram with the benchmark.
    Left-anti join against the distinct hit-id set — the corpus is
    filtered in place, only hit ids ever shuffle."""
    grams = _gram_hashes_df(docs, text_col, id_col, n, hash)
    bset = F.broadcast(benchmark_grams(bench, text_col, "doc_id", n, hash))
    hit_ids = grams.join(bset, "_h").select(F.col("id").alias(id_col)).distinct()
    return docs.join(hit_ids, id_col, "left_anti")


def contamination_report(
    docs: DataFrame, bench: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", bench_id_col: str = "doc_id",
    n: int = 13, hash: str = "xxhash64",
) -> DataFrame:
    """(bench_id, n_docs_hit, n_grams_hit) — per-benchmark-document
    audit: how many corpus docs and distinct grams leak each eval doc.
    The benchmark side keeps its doc ids (still broadcast-sized)."""
    bgrams = F.broadcast(
        _gram_hashes_df(bench, text_col, bench_id_col, n, hash)
        .withColumnRenamed("id", "bench_id")
        .distinct()
    )
    cgrams = _gram_hashes_df(docs, text_col, id_col, n, hash)
    joined = cgrams.join(bgrams, "_h")
    return joined.groupBy("bench_id").agg(
        F.count_distinct("id").alias("n_docs_hit"),
        F.count_distinct("_h").alias("n_grams_hit"),
    )


def _gram_hash_stats(docs, text_col, id_col, n):
    """(id, n_gram, n_distinct, top_cnt) — wordcount-shaped: explode
    NON-distinct gram hashes (token-direct multi-arg xxhash64, no gram
    string), groupBy(id, h).count, then per-id totals. Both aggregations
    partial map-side; everything stays in whole-stage codegen."""
    # token array materialized first — an inline norm_tokens inside the
    # gram lambda would re-split the doc n times per gram (see
    # dedup.shingles)
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.xxhash64(*[F.get(toks, i + j) for j in range(n)]),
    )
    exploded = base.select("id", F.explode(grams).alias("h"))
    per_gram = exploded.groupBy("id", "h").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("id").agg(
        F.sum("cnt").alias("n_gram"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )


def repetition_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style (Rae et al. 2021, public) within-document repetition
    signals, one row per doc:

      dup_word_frac   1 − distinct/total whitespace tokens
      dup_ngram_frac  1 − distinct/total word n-grams (ngram_n)
      top_ngram_frac  occurrences of the most frequent n-gram / total
      dup_line_frac   chars in lines occurring >1× / total line chars

    Shape: three wordcount-style explode → (id, key) count → per-id
    rollup pipelines (words = 1-grams, n-grams, lines), joined on id.
    All counting is on xxhash64 key hashes — no gram string is ever
    built — and every aggregation partial-combines map-side, so the
    shuffled volume is distinct-keys-per-doc, not tokens. A zero-shuffle
    variant (per-row F.aggregate run-length fold over the sorted gram
    array) was measured ~10× SLOWER at sf0.01: higher-order lambdas with
    struct state are interpreted per element, while this explode/agg
    pipeline is whole-stage-codegen — the same measured tradeoff as the
    minhash signature aggregation (dedup.minhash_signatures)."""
    words = _gram_hash_stats(docs, text_col, id_col, 1)
    grams = _gram_hash_stats(docs, text_col, id_col, ngram_n)
    lines_exploded = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
    ).select("id", F.trim("line").alias("line")).filter(F.col("line") != "")
    per_line = lines_exploded.groupBy("id", F.xxhash64("line").alias("h")).agg(
        F.count("*").alias("cnt"), F.first(F.length("line")).alias("len")
    )
    line_stats = per_line.groupBy("id").agg(
        F.sum(F.col("len") * F.col("cnt")).alias("line_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("len") * F.col("cnt")).otherwise(F.lit(0))
        ).alias("dup_line_chars"),
    )

    def frac(num, den):
        return F.round(
            F.when(den.isNull() | (den == 0), F.lit(0.0)).otherwise(
                num.cast("double") / den
            ),
            6,
        )

    w = words.withColumnsRenamed(
        {"n_gram": "n_tok", "n_distinct": "n_tok_d", "top_cnt": "_wt"}
    )
    out = (
        docs.select(F.col(id_col))
        .join(w, docs[id_col] == w["id"], "left").drop("id")
        .join(grams, docs[id_col] == grams["id"], "left").drop("id")
        .join(line_stats, docs[id_col] == line_stats["id"], "left").drop("id")
    )
    return out.select(
        F.col(id_col),
        frac(F.col("n_tok") - F.col("n_tok_d"), F.col("n_tok")).alias("dup_word_frac"),
        frac(F.col("n_gram") - F.col("n_distinct"), F.col("n_gram")).alias("dup_ngram_frac"),
        frac(F.col("top_cnt"), F.col("n_gram")).alias("top_ngram_frac"),
        frac(F.col("dup_line_chars"), F.col("line_chars")).alias("dup_line_frac"),
    )
