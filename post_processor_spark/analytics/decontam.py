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

    Zero shuffle: every signal is a per-row array expression. The mode
    (top n-gram count) folds over the SORTED gram array with one
    F.aggregate run-length pass instead of an explode+groupBy — at
    100 TB that keeps the whole profile map-only, embarrassingly
    parallel, no exchange at any width. Interpreted-lambda cost is one
    pass over each doc's grams (cheap next to the tokenize), unlike the
    minhash case where the lambda ran 32× per shingle."""
    toks = norm_tokens(F.col(text_col))
    n_tok = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tok - ngram_n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, ngram_n), " "),
    )
    n_gram = F.size(grams)
    # run-length fold over the sorted grams: state = (prev, run, best)
    top_cnt = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda st, g: F.struct(
            g.alias("prev"),
            F.when(g == st["prev"], st["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                st["best"],
                F.when(g == st["prev"], st["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda st: st["best"],
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, b: a + b
    )
    # chars in lines whose value occurs >1×: fold the sorted line array,
    # counting every char of any line equal to its predecessor PLUS the
    # first occurrence's chars exactly once (when run hits 2).
    dup_line_chars = F.aggregate(
        F.array_sort(lines),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("chars")
        ),
        lambda st, l: F.struct(
            l.alias("prev"),
            F.when(l == st["prev"], st["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                st["chars"]
                + F.when(
                    l == st["prev"],
                    F.length(l)
                    + F.when(st["run"] == 1, F.length(l)).otherwise(F.lit(0)),
                ).otherwise(F.lit(0))
            ).alias("chars"),
        ),
        lambda st: st["chars"],
    )
    frac = lambda num, den: F.round(
        F.when(den == 0, F.lit(0.0)).otherwise(num.cast("double") / den), 6
    )
    return docs.select(
        F.col(id_col),
        frac(n_tok - F.size(F.array_distinct(toks)), n_tok).alias("dup_word_frac"),
        frac(n_gram - F.size(F.array_distinct(grams)), n_gram).alias("dup_ngram_frac"),
        frac(top_cnt, n_gram).alias("top_ngram_frac"),
        frac(dup_line_chars, line_chars).alias("dup_line_frac"),
    )
