"""URL canonicalization — pure JVM-side Spark column expressions.

Reference behavior being re-expressed (studied, not copied):
- registrable-domain extraction via tldextract.extract(url) joined as
  subdomain.domain.suffix (processor/post_processor/processor_domain.py:40-50,
  processor_twitter.py:38-43). tldextract is not available in this sandbox,
  so we emulate it with a pinned public-suffix snapshot (the multi-label
  suffixes that matter for tests + the default single-label rule). This is
  the documented fallback from SURVEY.md §7.4.
- URL→domain by path-strip (archived/Post-Processor/processor.py:746-762) →
  `url_host` below.

Everything here is built from pyspark.sql.functions so it stays inside
whole-stage codegen — no Python in the hot path. Hashing uses xxhash64
(JVM, same at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned snapshot of multi-label public suffixes (public-suffix list is
# public data; this subset covers the common ccTLD second-level registries).
# Single-label TLDs fall through to the default rule (last label).
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "net.za", "gov.za",
    "com.mx", "org.mx", "net.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "co.kr", "or.kr", "co.il", "org.il", "gov.il", "ac.il",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng", "co.ke",
    "com.ua", "com.ru", "com.pl", "com.gr", "com.pt", "com.es",
]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):(//)?"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme ('' if none)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host: strips scheme, userinfo, port, path/query/frag.

    Equivalent intent to the reference's urlparse-based domain derivation
    (archived/Post-Processor/processor.py:746-762) but well-defined for
    userinfo/ports.
    """
    authority = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 3)
    no_user = F.regexp_replace(authority, r"^[^@]*@", "")
    no_port = F.regexp_replace(no_user, r":\d+$", "")
    return F.lower(no_port)


def _host_labels(host: Column) -> Column:
    return F.split(host, r"\.")


def _suffix_len(host: Column) -> Column:
    """1 or 2: number of labels belonging to the public suffix."""
    labels = _host_labels(host)
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    two = F.lit(_TWO_LEVEL_SUFFIXES)
    return F.when((n >= 3) & F.array_contains(two, last2), F.lit(2)).otherwise(
        F.lit(1)
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1: 'news.bbc.co.uk' → 'bbc.co.uk'; 'www.aljazeera.com' →
    'aljazeera.com'. Hosts with < suffix_len+1 labels return the host."""
    labels = _host_labels(host)
    n = F.size(labels)
    k = _suffix_len(host) + 1
    start = F.greatest(n - k + 1, F.lit(1))
    return F.concat_ws(".", F.slice(labels, start, k))


def tld_triple(url: Column) -> Column:
    """Emulates the reference's tldextract join: 'sub.domain.suffix' when a
    subdomain exists, else 'domain.suffix'
    (processor_domain.py:47-50). For matching purposes this equals the
    full lower-cased host, which is exactly what '.'.join(ext) produces —
    kept as its own function to document the parity point."""
    return url_host(url)


def tld_parts(url: Column) -> Column:
    """struct(sub, dom, suf) — mirrors tldextract.ExtractResult equality
    used for the self-citation skip (processor_domain.py:43-45)."""
    host = url_host(url)
    labels = _host_labels(host)
    n = F.size(labels)
    slen = _suffix_len(host)
    suf = F.concat_ws(".", F.slice(labels, F.greatest(n - slen + 1, F.lit(1)), slen))
    dom = F.when(n > slen, F.element_at(labels, -(slen + 1))).otherwise(F.lit(""))
    nsub = F.greatest(n - slen - 1, F.lit(0))
    sub = F.when(nsub > 0, F.concat_ws(".", F.slice(labels, 1, nsub))).otherwise(
        F.lit("")
    )
    return F.struct(sub.alias("sub"), dom.alias("dom"), suf.alias("suf"))


def canonical_url(url: Column) -> Column:
    """Canonical form: lower scheme+host, strip fragment, strip default
    port, drop trailing '?' ; path/query preserved byte-for-byte. The
    reference dedupes on raw url strings (load_input.py:294); we dedupe on
    this canonical form and keep the raw url alongside."""
    trimmed = F.trim(url)
    no_frag = F.regexp_replace(trimmed, r"#.*$", "")
    scheme = url_scheme(no_frag)
    host = url_host(no_frag)
    rest = F.regexp_replace(no_frag, _SCHEME_RE + r"[^/?#]*", "")
    rest = F.regexp_replace(rest, r"\?$", "")
    has_scheme = scheme != F.lit("")
    canon = F.when(
        has_scheme, F.concat(scheme, F.lit("://"), host, rest)
    ).otherwise(F.concat(host, rest))
    return canon


def url_hash(canon: Column) -> Column:
    """64-bit key for seen-set membership / shuffle keys (JVM xxhash64)."""
    return F.xxhash64(canon)


def host_hash(host: Column) -> Column:
    return F.xxhash64(host)


def with_canonical(df, url_col: str = "url", prefix: str = ""):
    """Attach canonical_url/host/registrable_domain/url_hash/host_hash.

    Staged so each regex over the raw URL runs ONCE (intermediate columns
    reused) — a naive composition re-evaluates the authority extraction
    per derived column and regex is the dominant per-row cost."""
    u = F.col(url_col)
    no_frag = F.regexp_replace(F.trim(u), r"#.*$", "")
    staged = df.withColumn("_nf", no_frag).withColumn(
        "_auth", F.regexp_extract(F.col("_nf"), _SCHEME_RE + r"([^/?#]*)", 3)
    )
    host = F.lower(
        F.regexp_replace(F.regexp_replace(F.col("_auth"), r"^[^@]*@", ""), r":\d+$", "")
    )
    staged = staged.withColumn(prefix + "host", host)
    scheme = F.lower(F.regexp_extract(F.col("_nf"), _SCHEME_RE, 1))
    rest = F.regexp_replace(
        F.regexp_replace(F.col("_nf"), _SCHEME_RE + r"[^/?#]*", ""), r"\?$", ""
    )
    canon = F.when(
        scheme != "", F.concat(scheme, F.lit("://"), F.col(prefix + "host"), rest)
    ).otherwise(F.concat(F.col(prefix + "host"), rest))
    staged = (
        staged.withColumn(prefix + "canonical_url", canon)
        .withColumn(
            prefix + "registrable_domain", registrable_domain(F.col(prefix + "host"))
        )
        .withColumn(prefix + "url_hash", url_hash(F.col(prefix + "canonical_url")))
        .withColumn(prefix + "host_hash", host_hash(F.col(prefix + "host")))
    )
    return staged.drop("_nf", "_auth")
