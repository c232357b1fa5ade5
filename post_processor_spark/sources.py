"""File sources & sinks with the reference's format semantics
(SURVEY.md §2.1 S1-S9) — all direct DataFrame I/O, no staging hop.

Reference behaviors re-expressed:
- S1  twitter CSV glob scan (load_input.py:135-139)
- S2  domain JSON-dir scan, one doc per file (post_utils/utils.py:37-55)
- S3  JSON→CSV staging (utils.py:46-55) — unnecessary on Spark; the JSON
      reader IS the staging. Kept only as a fixture converter.
- S4  CSV concat scan (load_input.py:273-278) — Spark unions files natively
- S7  CSV sink (create_output.py:47-51)
- S9  JSON sink (utils.py:14-21)
- P8  duplicate-header strip (scripts/cleaner/header/clean.py:33-38)
- P3/P2 output renames/drops (create_output.py:25-35)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TWITTER_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("tweet_url", T.StringType()),
        T.StructField("twitter_handle", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("citation_urls", T.StringType()),   # stringified list
        T.StructField("entities", T.StringType()),        # stringified dict
        T.StructField("public_metrics", T.StringType()),  # stringified dict
        T.StructField("author_id", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

DOMAIN_JSON_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("author_metadata", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("html_content", T.StringType()),
        T.StructField("article_text", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField(
            "found_urls",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField("url", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_twitter_csv(spark: SparkSession, glob: str) -> DataFrame:
    """S1: schema'd CSV scan; duplicate header lines inside files (P8) are
    dropped by the `id != 'id'` filter (the schema'd read makes a repeated
    header just another malformed row)."""
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(TWITTER_RAW_SCHEMA)
        .csv(glob)
    )
    return df.filter(F.col("tweet_url").isNotNull() & (F.col("tweet_url") != "tweet_url"))


def parse_twitter_raw(raw: DataFrame) -> DataFrame:
    """The reference's row-UDF normalization (load_input.py:165-207) as
    column expressions: stringified lists/dicts → real types via from_json
    (the reference uses ast.literal_eval per row — P13/P14)."""
    mentions = F.coalesce(
        F.from_json(
            F.regexp_replace("entities", "'", '"'), "struct<mentions:array<struct<username:string>>>"
        )["mentions"],
        F.array().cast("array<struct<username:string>>"),
    )
    metrics = F.from_json(
        F.regexp_replace("public_metrics", "'", '"'),
        "struct<retweet_count:long,reply_count:long,like_count:long,quote_count:long>",
    )
    found = F.coalesce(
        F.from_json(F.regexp_replace("citation_urls", "'", '"'), "array<string>"),
        F.array().cast("array<string>"),
    )
    return raw.select(
        F.col("tweet_url").alias("url"),
        F.col("twitter_handle").alias("domain"),
        F.col("created_at").alias("date"),
        F.col("text").alias("article_text"),
        found.alias("found_urls"),
        F.transform(mentions, lambda m: m["username"]).alias("mentions"),
        F.coalesce(metrics["retweet_count"], F.lit(0)).alias("retweet_count"),
        F.coalesce(metrics["reply_count"], F.lit(0)).alias("reply_count"),
        F.coalesce(metrics["like_count"], F.lit(0)).alias("like_count"),
        F.coalesce(metrics["quote_count"], F.lit(0)).alias("quote_count"),
        F.lit("").alias("author"),
    )


def read_domain_json(spark: SparkSession, path: str) -> DataFrame:
    """S2: one JSON document per file (multiLine); doc id is derived from
    the url downstream (uuid5), not the filename."""
    return spark.read.schema(DOMAIN_JSON_SCHEMA).option("multiLine", True).json(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S7: header CSV sink. single_file=True mirrors the reference's
    repartition(1) (create_output.py:47) — fixture-size outputs only;
    at scale leave partitioned."""
    out = df.coalesce(1) if single_file else df
    # arrays are stringified for CSV parity with the reference's
    # str(list) columns (processor_domain.py:89)
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """S9: JSON sink (state checkpoints live in state.SnapshotStore)."""
    df.write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str) -> None:
    """S5."""
    df.write.mode("overwrite").parquet(path)


def reshape_hit_record(normalized_tweets: DataFrame) -> DataFrame:
    """P22: the Mini-Processor 'Hit Record' layout
    (archived/Mini-Processor.py:35-58) — pure projection with literal
    source injection ('@'+handle)."""
    return normalized_tweets.select(
        F.col("url").alias("URL to article/Tweet"),
        F.when(
            F.col("domain").startswith("@"), F.col("domain")
        ).otherwise(F.concat(F.lit("@"), F.col("domain"))).alias("Source"),
        F.lit("Twitter Handle").alias("Hit Type"),
        F.col("author").alias("Authors"),
        F.col("article_text").alias("Plain Text of Article or Tweet"),
        F.col("date").alias("Date"),
        F.col("mentions").alias("Mentions"),
        F.col("found_urls").alias("Found URL"),
    )
