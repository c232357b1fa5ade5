"""HTML main-text extraction (boilerplate removal) and anchor/outlink
analytics — all JVM-side expressions (map-only, zero shuffle for the
extraction itself; whole-stage codegen end-to-end).

A 100 TB crawl corpus arrives as raw HTML; before any text-quality
gate (clean.c4_clean, text.profile) runs, the markup has to become
main text. The reference keeps the raw `html_content` string and runs
per-row BeautifulSoup/regex Python over it
(/root/reference/processor/post_processor/processor_domain.py:67-87);
here the whole extraction is columnar string algebra:

1. scrub: drop <script>/<style> elements and <!-- comments --> (their
   contents are never text),
2. split the document into blocks on block-level tag boundaries
   (p/div/li/h1-6/tr/..., <br>),
3. per block, strip inline tags, decode the common entities, collapse
   whitespace, and count words + <a anchors,
4. keep blocks that clear a word-count floor and a link-density
   ceiling (readability-style boilerplate heuristic: nav bars and
   link farms are word-sparse and anchor-dense),
5. main text = surviving blocks joined by newline.

Every step is a higher-order array expression over one string column —
no shuffle, no UDF, linear in corpus bytes, and embarrassingly
parallel at any cluster width. Each expression has an exact DuckDB
analog (string_split_regex / list_transform / list_filter /
regexp_extract_all), so the driver's oracle gate can value-hash the
operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level boundaries: opening or closing forms, any attributes; <br>
# in all its spellings. (?i) inline flag works in both Java regex and RE2.
BLOCK_SPLIT_RE = (
    r"(?i)<(?:/?(?:p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|"
    r"section|article|header|footer|nav|aside|blockquote|title|body|html|"
    r"head|figure|figcaption|pre|form)\b[^>]*|br\s*/?)>"
)

# linked-anchor extractor: group 1 = href value, group 2 = inner HTML.
# No escaped quotes inside classes so the same literal runs under RE2.
ANCHOR_RE = (
    "(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"
)

# decode order matters: named entities first, &amp; LAST, so the pass is
# single-decode ("&amp;lt;" -> "&lt;", never "<").
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def scrub_html(col: Column) -> Column:
    """Remove <script>/<style> elements (with their contents) and HTML
    comments. Lazy quantifiers keep each removal local; (?is) makes the
    match case-insensitive and newline-crossing."""
    c = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    return F.regexp_replace(c, r"(?s)<!--.*?-->", " ")


def strip_tags(col: Column) -> Column:
    """Inline-tag strip + entity decode + whitespace collapse + trim.
    Assumes scrub_html already ran (script/style contents are NOT text)."""
    txt = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def _word_count(text: Column) -> Column:
    # text is already collapsed+trimmed; empty -> 0, else 1 + #spaces
    return F.when(text == "", F.lit(0)).otherwise(F.size(F.split(text, " ")))


def main_text_blocks(
    col: Column, min_words: int = 3, max_link_density: float = 0.34
) -> Column:
    """Array of surviving block texts, in document order. A block
    survives iff it has >= min_words words AND its linked-anchor count
    per word stays under max_link_density (nav bars / link farms are
    anchor-dense and word-sparse)."""
    blocks = F.split(scrub_html(col), BLOCK_SPLIT_RE)
    infos = F.transform(
        blocks,
        lambda b: F.struct(
            strip_tags(b).alias("text"),
            F.size(
                F.regexp_extract_all(b, F.lit(r"(?i)<a\b"), F.lit(0))
            ).alias("n_anchors"),
        ),
    )
    # second pass materializes the word count into the struct: the keep
    # predicate reads it twice, and computing _word_count inline there
    # would re-split the block text per reference
    counted = F.transform(
        infos,
        lambda s: F.struct(
            s["text"].alias("text"),
            s["n_anchors"].alias("n_anchors"),
            _word_count(s["text"]).alias("n_words"),
        ),
    )
    kept = F.filter(
        counted,
        lambda s: (s["n_words"] >= F.lit(int(min_words)))
        & (
            s["n_anchors"].cast("double")
            <= s["n_words"].cast("double") * F.lit(float(max_link_density))
        ),
    )
    return F.transform(kept, lambda s: s["text"])


def main_text(
    docs: DataFrame,
    html_col: str = "html",
    min_words: int = 3,
    max_link_density: float = 0.34,
) -> DataFrame:
    """Boilerplate removal: input columns plus `main_text` (surviving
    blocks joined by newline) and `n_blocks_kept`. Map-only — one
    projection, no shuffle; at 100 TB this is a pure scan-transform
    stage that fuses with the downstream quality gates."""
    kept = main_text_blocks(
        F.col(html_col), min_words=min_words, max_link_density=max_link_density
    )
    return docs.withColumns(
        {
            "main_text": F.array_join(kept, "\n"),
            "n_blocks_kept": F.size(kept),
        }
    )


def extract_anchors(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """One row per linked anchor: (id_col, anchor_idx, href,
    anchor_text) in document order. Anchor inner HTML is tag-stripped
    and entity-decoded like any text block. Map + explode — no shuffle;
    the explode fan-out is bounded by anchors-per-page, so partitions
    stay balanced without a repartition."""
    scrubbed = scrub_html(F.col(html_col))
    pairs = F.arrays_zip(
        F.regexp_extract_all(scrubbed, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(scrubbed, F.lit(ANCHOR_RE), F.lit(2)).alias("inner"),
    )
    return docs.select(
        F.col(id_col), F.posexplode(pairs).alias("anchor_idx", "a")
    ).select(
        id_col,
        "anchor_idx",
        F.col("a.href").alias("href"),
        strip_tags(F.col("a.inner")).alias("anchor_text"),
    )


def anchor_profile(anchors: DataFrame) -> DataFrame:
    """Per-target link profile over extract_anchors output: inlink
    count, distinct linking docs, and the dominant anchor text
    (most frequent; ties break to the lexicographically smallest so the
    result is deterministic). The web's anchor-text profile is the
    classic relevance/spam signal a crawler feeds back into priorities.

    Scale shape: one partial-agg groupBy on (href, anchor_text) — the
    skew-safe key — then a tiny per-href max_by reduction; distinct-doc
    counting rides the same two-level aggregation. No window over the
    raw anchor stream."""
    per_text = anchors.groupBy("href", "anchor_text").agg(F.count("*").alias("n"))
    tops = per_text.groupBy("href").agg(
        F.sum("n").alias("n_links"),
        # min over (-n, text): most-frequent anchor, smallest text on
        # ties — deterministic without a window over the anchor stream
        F.min_by(
            F.col("anchor_text"),
            F.struct((-F.col("n")).alias("neg_n"), F.col("anchor_text")),
        ).alias("top_anchor"),
    )
    n_docs = anchors.groupBy("href").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return tops.join(n_docs, "href").select(
        "href", "n_links", "n_docs", "top_anchor"
    )
