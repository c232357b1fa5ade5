"""Deterministic fixtures + scalable synthetic generator.

§1: the golden MediaCAT mini-fixture (4 tweets + 1 article + scope),
values mirroring the reference's checked-in goldens
(archived/Post-Processor/TwitterOutput/testers.csv:2-5 and
DomainOutput/bfeafb47-bd03-55d8-99c9-b28e04b2876f.json) per FIXTURES.md §5.

§2: a seeded, wall-clock-free scaled generator for bench/skew tests:
hosts ~ Zipf-ish with an optional mega-host, outlinks/doc uniform-ish —
built entirely from Spark column expressions over spark.range(n), so it
generates in parallel at any scale (no driver-side materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import SCOPE


# ---------------------------------------------------------------- golden

def golden_scope(spark: SparkSession) -> DataFrame:
    rows = [
        # (scope_seq, source, name, type, publisher, tags, aliases, handles)
        (0, "https://www.aljazeera.com/", "Al Jazeera English", "News Source",
         "Al Jazeera Media Network", "news", ["Al Jazeera", "AlJazeera"], []),
        (1, "@IsraelinIndia", "Israel in India", "Twitter Handle",
         "", "Twitter Journalists", [], ["@IsraelinIndia"]),
        (2, "@a_zionist", "((A. Zionist))", "Twitter Handle",
         "", "Twitter Journalists", [], ["@a_zionist"]),
    ]
    return spark.createDataFrame(rows, SCOPE)


def golden_domain_raw(spark: SparkSession) -> DataFrame:
    """Raw domain-crawler doc (FIXTURES.md §3/§5, article A)."""
    rows = [
        {
            "seq": 0,
            "url": "https://www.aljazeera.com/somelink",
            "title": "WarnerMedia News & Sports Privacy Policy - Second",
            "author": "",
            "date": "",
            "html_content": (
                '<p>some text here with <a href="https://twitter.com/a_zionist/status/4">testing</a>'
                ' and <a href="https://twitter.com/IsraelinIndia/status/1"> </a></p>'
            ),
            "article_text": "some text here",
            "domain": "https://www.aljazeera.com/",
            "found_urls": [
                {"title": "testing", "url": "https://twitter.com/a_zionist/status/4"},
                {"title": " ", "url": "https://twitter.com/IsraelinIndia/status/1"},
            ],
        }
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "seq long, url string, title string, author string, date string,"
            " html_content string, article_text string, domain string,"
            " found_urls array<struct<title:string,url:string>>"
        ),
    )


def golden_twitter_raw(spark: SparkSession) -> DataFrame:
    """Raw tweets (FIXTURES.md §4/§5, tweets 1-4)."""
    rows = [
        {
            "seq": 1,
            "url": "https://twitter.com/IsraelinIndia/status/1",
            "domain": "@IsraelinIndia",
            "author": "Israel in India",
            "date": "2017-07-04",
            "article_text": "Al Jazeera said ...",
            "found_urls": ["https://www.aljazeera.com/second_url"],
            "mentions": [],
            "retweet_count": 0, "reply_count": 0, "like_count": 0, "quote_count": 0,
        },
        {
            "seq": 2,
            "url": "https://twitter.com/a_zionist/status/2",
            "domain": "@a_zionist",
            "author": "((A. Zionist))",
            "date": "2017-07-04",
            "article_text": "Israeli PM",
            "found_urls": ["https://www.aljazeera.com/somelink"],
            "mentions": [],
            "retweet_count": 0, "reply_count": 0, "like_count": 0, "quote_count": 0,
        },
        {
            "seq": 3,
            "url": "https://twitter.com/IsraelinIndia/status/3",
            "domain": "@IsraelinIndia",
            "author": "",
            "date": "2017-07-04",
            "article_text": "",
            "found_urls": ["https://twitter.com/a_zionist/status/2"],
            "mentions": [],
            "retweet_count": 0, "reply_count": 0, "like_count": 0, "quote_count": 0,
        },
        {
            "seq": 4,
            "url": "https://twitter.com/a_zionist/status/4",
            "domain": "@a_zionist",
            "author": "((A. Zionist))",
            "date": "2017-07-04",
            "article_text": "hello @IsraelinIndia",
            "found_urls": [],
            "mentions": ["IsraelinIndia"],
            "retweet_count": 0, "reply_count": 0, "like_count": 0, "quote_count": 0,
        },
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "seq long, url string, domain string, author string, date string,"
            " article_text string, found_urls array<string>, mentions array<string>,"
            " retweet_count long, reply_count long, like_count long, quote_count long"
        ),
    )


# ------------------------------------------------------------- synthetic

def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int = 100,
    mega_host_share: float = 0.0,
    links_per_doc_max: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """documents(doc_id, spans) at scale, fully Spark-side & deterministic.

    Host assignment: Zipf-flavored via squared-uniform hash; if
    mega_host_share>0, that fraction of docs lands on host0 (skew testing,
    SURVEY.md §5.4). Each doc gets a text span + k link spans pointing at
    synthetic URLs on hashed hosts (some intra-corpus so referral joins
    have matches) + an occasional mention span (alias-injection analog).
    """
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    # squared-uniform → density ~ 1/(2*sqrt(x)) on [0,1): low host ids get
    # disproportionate mass (Zipf-flavored head)
    u = (h % 1_000_000) / 1_000_000.0
    zipf_host = F.floor(F.pow(u, F.lit(2.0)) * n_hosts).cast("long")
    if mega_host_share > 0:
        is_mega = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % 100) < int(
            mega_host_share * 100
        )
        host_id = F.when(is_mega, F.lit(0)).otherwise(zipf_host)
    else:
        host_id = zipf_host
    host = F.concat(F.lit("host"), host_id.cast("string"), F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/doc/"), F.col("id").cast("string"))

    k = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 2))) % (links_per_doc_max + 1)).cast("int")
    # deterministic targets: mix of intra-corpus docs and fresh URLs
    # (sequence(1, 0) would yield a DESCENDING [1,0] — guard k=0 to empty)
    link_spans = F.transform(
        F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.lit("link").alias("kind"),
            F.concat(F.lit("anchor "), i.cast("string")).alias("text"),
            F.concat(
                F.lit("https://host"),
                (
                    F.abs(F.xxhash64(F.col("id"), i, F.lit(seed + 3)))
                    % F.lit(n_hosts * 2)
                ).cast("string"),
                F.lit(".example.com/doc/"),
                (
                    F.abs(F.xxhash64(F.col("id"), i, F.lit(seed + 4)))
                    % F.lit(n_docs * 2)
                ).cast("string"),
            ).alias("media_ref"),
            (i).cast("int").alias("offset"),
        ),
    )
    text_span = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("synthetic body of doc "), F.col("id").cast("string")).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
    )
    mention_span = F.when(
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 5))) % 20) == 0,
        F.array(
            F.struct(
                F.lit("mention").alias("kind"),
                F.lit("").alias("text"),
                F.concat(
                    F.lit("@user"),
                    (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 6))) % 50).cast("string"),
                ).alias("media_ref"),
                (k + 1).cast("int").alias("offset"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))

    return base.select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        F.concat(text_span, link_spans, mention_span).alias("spans"),
        url.alias("url"),
        host.alias("host"),
        F.col("id").alias("seq"),
    )


def synthetic_seed_frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 100,
    mega_host_share: float = 0.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seed URL list (url, priority, seq) — frontier generation 0 input."""
    base = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    u = (h % 1_000_000) / 1_000_000.0
    zipf_host = F.floor(F.pow(u, F.lit(2.0)) * n_hosts).cast("long")
    if mega_host_share > 0:
        is_mega = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % 100) < int(
            mega_host_share * 100
        )
        host_id = F.when(is_mega, F.lit(0)).otherwise(zipf_host)
    else:
        host_id = zipf_host
    host = F.concat(F.lit("host"), host_id.cast("string"), F.lit(".example.com"))
    return base.select(
        F.concat(F.lit("https://"), host, F.lit("/seed/"), F.col("id").cast("string")).alias("url"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 7))) % 10).cast("int").alias("priority"),
        F.col("id").alias("seq"),
    )
