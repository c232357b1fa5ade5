"""Canonical schemas (explicit StructType everywhere — the reference is
stringly-typed with ast.literal_eval round-trips
(processor/post_utils/utils.py:24-35); we use real nested types)."""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint canonical table
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),   # text|link|media|mention|handle
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# companion metadata produced at ingest (reference columns:
# load_input.py:291-293 for domain, 195-207 for twitter)
DOCS_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), False),  # 'article'|'twitter'
        T.StructField("domain", T.StringType(), True),     # url-domain or '@handle'
        T.StructField("seq", T.LongType(), False),         # load order
        T.StructField("title", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("article_text", T.StringType(), True),
        # raw markup match surface: the reference scans the WHOLE
        # html_content string for aliases/handles — tags and attributes
        # included (processor_domain.py:67-76,79-87). Carried on the meta
        # row so the span table stays the canonical input_hint shape.
        T.StructField("html_content", T.StringType(), True),
        T.StructField("retweet_count", T.LongType(), True),
        T.StructField("reply_count", T.LongType(), True),
        T.StructField("like_count", T.LongType(), True),
        T.StructField("quote_count", T.LongType(), True),
    ]
)

# scope dimension (FIXTURES.md §2; reference load_input.py:24-80)
SCOPE = T.StructType(
    [
        T.StructField("scope_seq", T.IntegerType(), False),  # scope-file order
        T.StructField("source", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("tags", T.StringType(), True),
        T.StructField("aliases", T.ArrayType(T.StringType()), True),
        T.StructField("twitter_handles", T.ArrayType(T.StringType()), True),
    ]
)

# frontier tables (FIXTURES.md §6)
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("generation", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # pending|scheduled|done
        T.StructField("not_before", T.TimestampType(), True),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("generation", T.IntegerType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("generation", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("filtered_seen", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)
