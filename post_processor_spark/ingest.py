"""Ingest: reference-format crawler outputs → canonical documents(doc_id, spans)
+ docs_meta.

Replaces the reference's JSON→CSV staging + dask load
(processor/post_input/load_input.py:142-217,245-300) with direct DataFrame
reads, and hoists the per-(doc × scope) anchor regex of
processor/post_processor/processor_domain.py:51-53 into a single vectorized
span-extraction pass at ingest: anchors are parsed ONCE per document into
`link` spans; citation matching later is an equality join on registrable
domain, not a regex per scope entry.

All heavy lifting is Arrow-batched pandas (`mapInPandas`,
pd.Series.str.extractall) — no per-row Python loops over Spark rows.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import DOCS_META, DOCUMENTS, SPAN

# one compiled pass over html_content; reference pattern
# (processor_domain.py:51-52) is per-scope-domain — ours captures every
# anchor and defers scope filtering to a join.
_ANCHOR_RE = r"""(?is)<a\s+href=["']([^"']+)["'][^>]*>(.*?)</a>"""


def _aslist(v) -> list:
    """Arrow hands array columns to pandas as numpy arrays — normalize."""
    if v is None:
        return []
    if isinstance(v, float):  # NaN
        return []
    return list(v)


def _uuid5(series: pd.Series) -> pd.Series:
    # uuid5(NAMESPACE_DNS, url) ids, as the reference derives them
    # (load_input.py:130-132). List-comp inside the Arrow batch only.
    return pd.Series(
        [str(uuid.uuid5(uuid.NAMESPACE_DNS, u)) for u in series.astype(str)],
        index=series.index,
    )


def _domain_spans_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch of raw domain docs → (doc_id, spans).

    Span order per FIXTURES.md §3: article_text first, then anchors in
    html_content document order, then found_urls entries not already seen
    as anchors (order preserved)."""
    html = pdf["html_content"].fillna("").astype(str)
    anchors = html.str.extractall(_ANCHOR_RE)  # vectorized across the batch
    # (url, anchor_text) list per source row — grouped assembly, no
    # per-match iterrows
    if len(anchors):
        a_lists = {
            idx: list(zip(g[0].tolist(), g[1].tolist()))
            for idx, g in anchors.groupby(level=0)
        }
    else:
        a_lists = {}
    ids = _uuid5(pdf["url"]).tolist()
    texts = (
        pdf["article_text"].fillna("").astype(str).tolist()
        if "article_text" in pdf
        else [""] * len(pdf)
    )
    fus = pdf["found_urls"].tolist() if "found_urls" in pdf else [None] * len(pdf)
    out_spans = []
    for row_idx, text, fu_list in zip(pdf.index, texts, fus):
        spans = []
        off = 0
        if text:
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
            off += 1
        seen_urls = set()
        for u, t in a_lists.get(row_idx, ()):
            spans.append({"kind": "link", "text": t, "media_ref": u, "offset": off})
            seen_urls.add(u)
            off += 1
        for fu in _aslist(fu_list):
            u = fu["url"]
            t = fu.get("title", "") if isinstance(fu, dict) else (fu["title"] or "")
            if u not in seen_urls:
                spans.append({"kind": "link", "text": t, "media_ref": u, "offset": off})
                off += 1
        out_spans.append(spans)
    return pd.DataFrame({"doc_id": ids, "spans": out_spans})


def _twitter_spans_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Tweet rows → spans: text, then found_urls order, then mentions
    (FIXTURES.md §4; reference field order load_input.py:108-127,200)."""
    ids = _uuid5(pdf["url"]).tolist()
    texts = (
        pdf["article_text"].fillna("").astype(str).tolist()
        if "article_text" in pdf
        else [""] * len(pdf)
    )
    fus = pdf["found_urls"].tolist() if "found_urls" in pdf else [None] * len(pdf)
    mns = pdf["mentions"].tolist() if "mentions" in pdf else [None] * len(pdf)
    out_spans = []
    for text, fu_list, m_list in zip(texts, fus, mns):
        spans = []
        off = 0
        if text:
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
            off += 1
        for u in _aslist(fu_list):
            spans.append({"kind": "link", "text": "", "media_ref": str(u), "offset": off})
            off += 1
        for m in _aslist(m_list):
            spans.append(
                {"kind": "mention", "text": "", "media_ref": "@" + str(m), "offset": off}
            )
            off += 1
        out_spans.append(spans)
    return pd.DataFrame({"doc_id": ids, "spans": out_spans})


def domain_docs_to_documents(raw: DataFrame) -> DataFrame:
    """raw: url,title,author,date,html_content,article_text,domain,
    found_urls(array<struct<title,url>>) → canonical documents."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _domain_spans_batch(pdf)

    return raw.mapInPandas(gen, schema=DOCUMENTS)


def twitter_docs_to_documents(raw: DataFrame) -> DataFrame:
    """raw: url,article_text,found_urls(array<string>),mentions(array<string>)
    → canonical documents."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _twitter_spans_batch(pdf)

    return raw.mapInPandas(gen, schema=DOCUMENTS)


def domain_docs_meta(raw: DataFrame) -> DataFrame:
    """Normalized metadata row per domain doc (load_input.py:276-295
    semantics: type='article', zeroed counts, fillna(''))."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": _uuid5(pdf["url"]),
                    "url": pdf["url"].astype(str),
                    "doc_type": "article",
                    "domain": pdf.get("domain", "").fillna(""),
                    "seq": pdf["seq"],
                    "title": pdf.get("title", "").fillna(""),
                    "author": pdf.get("author", "").fillna(""),
                    "date": pdf.get("date", "").fillna(""),
                    "article_text": pdf.get("article_text", "").fillna(""),
                    "html_content": pdf.get("html_content", "").fillna(""),
                    "retweet_count": 0,
                    "reply_count": 0,
                    "like_count": 0,
                    "quote_count": 0,
                }
            )
            yield out

    return raw.mapInPandas(gen, schema=DOCS_META)


def twitter_docs_meta(raw: DataFrame) -> DataFrame:
    """Normalized metadata per tweet (load_input.py:165-207: type='twitter',
    empty title/author, domain='@handle')."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": _uuid5(pdf["url"]),
                    "url": pdf["url"].astype(str),
                    "doc_type": "twitter",
                    "domain": pdf.get("domain", "").fillna(""),
                    "seq": pdf["seq"],
                    "title": "",
                    "author": pdf.get("author", "").fillna(""),
                    "date": pdf.get("date", "").fillna(""),
                    "article_text": pdf.get("article_text", "").fillna(""),
                    "html_content": "",
                    "retweet_count": pdf.get("retweet_count", 0).fillna(0).astype("int64"),
                    "reply_count": pdf.get("reply_count", 0).fillna(0).astype("int64"),
                    "like_count": pdf.get("like_count", 0).fillna(0).astype("int64"),
                    "quote_count": pdf.get("quote_count", 0).fillna(0).astype("int64"),
                }
            )
            yield out

    return raw.mapInPandas(gen, schema=DOCS_META)


def dedupe_by_url(docs_meta: DataFrame) -> DataFrame:
    """drop_duplicates(subset=['url']) keeping first by load order
    (load_input.py:294). Expressed as a window, not dropDuplicates, so
    'first' is deterministic under parallelism."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("seq")
    return (
        docs_meta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
