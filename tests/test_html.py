"""HTML main-text extraction + anchor analytics (analytics/html.py).

The reference keeps raw `html_content` and runs per-row Python over it
(/root/reference/processor/post_processor/processor_domain.py:67-87);
these tests pin the columnar re-expression: scrub → block split →
per-block strip/decode → word-floor + link-density gate, and the
anchor extractor/profile. A sequential pure-Python oracle re-implements
the same contract for a randomized corpus.
"""

import random
import re

import pytest

from post_processor_spark.analytics import html as H

from pyspark.sql import functions as F


PAGE = (
    '<html><head><title>Doc 1</title><style>p{color:red}</style>'
    '<script>var x=1; if(x<2){x++;}</script></head><body>'
    '<nav><a href="https://a.com/">home</a> <a href="https://a.com/x">about</a></nav>'
    '<h1>Greetings dear reader</h1>'
    '<p>This is the main body of the page with many words in it.</p>'
    '<!-- hidden <p>comment block that would otherwise be kept -->'
    '<div class="footer">Contact &amp; imprint: <a href="mailto:x@a.com">mail me</a></div>'
    '</body></html>'
)


def _extract(spark, pages, **kw):
    df = spark.createDataFrame(pages, "doc_id int, html string")
    out = H.main_text(df, **kw).select("doc_id", "main_text", "n_blocks_kept")
    return {r.doc_id: (r.main_text, r.n_blocks_kept) for r in out.collect()}


def test_main_text_drops_boilerplate_keeps_content(spark):
    got = _extract(spark, [(1, PAGE)])
    text, n = got[1]
    assert n == 3
    assert text.split("\n") == [
        "Greetings dear reader",
        "This is the main body of the page with many words in it.",
        "Contact & imprint: mail me",  # entity decoded, anchor text kept
    ]


def test_main_text_gates(spark):
    pages = [
        # word floor: 2-word paragraph dropped, 3-word kept
        (1, "<p>too short</p><p>exactly three words</p>"),
        # link density: 3 words 2 anchors dropped; 7 words 2 anchors kept
        (2, '<p><a href="/a">x</a> <a href="/b">y</a> z</p>'
            '<p><a href="/a">one two</a> and also <a href="/b">three four</a></p>'),
        # script/style/comment contents never leak even with block tags inside
        (3, "<script>keep out of the main text entirely</script>"
            "<style>div { some words here too }</style>"
            "<!-- not actual page text at all --><p>only this line survives here</p>"),
        # empty page
        (4, ""),
    ]
    got = _extract(spark, pages)
    assert got[1] == ("exactly three words", 1)
    assert got[2] == ("one two and also three four", 1)
    assert got[3] == ("only this line survives here", 1)
    assert got[4] == ("", 0)


def test_entity_decode_is_single_pass(spark):
    # "&amp;lt;" must decode to "&lt;", never double-decode to "<"
    got = _extract(spark, [(1, "<p>a &amp;lt; b and x &lt; y</p>")])
    assert got[1][0] == "a &lt; b and x < y"


def test_extract_anchors_contract(spark):
    df = spark.createDataFrame(
        [
            (1, '<a href="/one">first</a> <a name="no-href">skipped</a>'
                "<script>var s = '<a href=\"/fake\">never</a>';</script>"
                '<a href="/two"><b>bold</b> text</a>'),
        ],
        "doc_id int, html string",
    )
    rows = H.extract_anchors(df).orderBy("anchor_idx").collect()
    assert [(r.anchor_idx, r.href, r.anchor_text) for r in rows] == [
        (0, "/one", "first"),
        (1, "/two", "bold text"),  # inner markup stripped
    ]


def test_anchor_profile_counts_and_tiebreak(spark):
    # href "/t": texts b,b,a,a -> tie on count, smallest text wins
    rows = [(d, f'<a href="/t">{t}</a>') for d, t in
            [(1, "b"), (1, "b"), (2, "a"), (3, "a")]]
    df = spark.createDataFrame(
        [(d, "".join(h for dd, h in rows if dd == d)) for d in (1, 2, 3)],
        "doc_id int, html string",
    )
    prof = H.anchor_profile(H.extract_anchors(df)).collect()
    assert len(prof) == 1
    r = prof[0]
    assert (r.href, r.n_links, r.n_docs, r.top_anchor) == ("/t", 4, 3, "a")


# ---------------------------------------------------------------------------
# sequential oracle over a randomized corpus
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(H.BLOCK_SPLIT_RE)
_ENT = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _py_strip(block: str) -> str:
    t = re.sub(r"<[^>]*>", " ", block)
    for e, c in _ENT:
        t = t.replace(e, c)
    return re.sub(r"\s+", " ", t).strip()


def _py_main_text(page: str, min_words=3, max_link_density=0.34):
    page = re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", page)
    page = re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", page)
    page = re.sub(r"(?s)<!--.*?-->", " ", page)
    kept = []
    for b in _BLOCK_RE.split(page):
        t = _py_strip(b)
        w = len(t.split(" ")) if t else 0
        a = len(re.findall(r"(?i)<a\b", b))
        if w >= min_words and a <= w * max_link_density:
            kept.append(t)
    return "\n".join(kept), len(kept)


def _random_page(rng: random.Random) -> str:
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    parts = []
    for _ in range(rng.randint(1, 8)):
        kind = rng.choice(["p", "div", "li", "nav", "script", "comment"])
        body = []
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.3:
                body.append(
                    f'<a href="/{rng.choice(words)}">{rng.choice(words)}</a>'
                )
            else:
                body.append(rng.choice(words + ["&amp;", "&lt;x&gt;"]))
        inner = " ".join(body)
        if kind == "script":
            parts.append(f"<script>{inner}</script>")
        elif kind == "comment":
            parts.append(f"<!-- {inner} -->")
        else:
            parts.append(f"<{kind}>{inner}</{kind}>")
    return "".join(parts)


def test_main_text_matches_python_oracle(spark):
    rng = random.Random(42)
    pages = [(i, _random_page(rng)) for i in range(120)]
    got = _extract(spark, pages)
    for i, page in pages:
        assert got[i] == _py_main_text(page), f"doc {i}: {page!r}"
