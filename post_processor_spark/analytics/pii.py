"""PII detection and redaction over document text — pure JVM regex
expressions (whole-stage codegen, zero Python, zero shuffle: map-only,
so it scales linearly and composes with any scan).

A training-data pipeline runs this between quality filtering and
tokenization. The reference repo has no PII pass (its closest analog is
the regex URL/handle extraction in
/root/reference/processor/post_processor/processor_domain.py:51-66);
this module is north_rule training-pipeline surface, built on the same
regex machinery the citation matchers use.

Pattern notes: every pattern is deliberately RE2-compatible (no
lookbehind, no backreferences) so the exact same string runs in Spark
(Java regex) and DuckDB (RE2) — that is what lets the driver's oracle
gate value-hash these operators instead of trusting a rows-only check.
Redaction order is CARD before PHONE/SSN so a 4x4-digit card number is
never partially consumed as a phone number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name → (pattern, replacement token). Dict order IS redaction order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "card": (
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CARD>",
    ),
    "ssn": (
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    "phone": (
        r"\b\d{3}-\d{3}-\d{4}\b",
        "<PHONE>",
    ),
    "ipv4": (
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type match counts for one text column (regexp_count is a
    codegen expression in Spark 3.5+)."""
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact(col: Column) -> Column:
    """Replace every PII match with its type token, in PII_PATTERNS
    order (card before phone/ssn — see module docstring)."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII profile: one count column per type plus a
    has_pii flag. Map-only; Catalyst fuses all five regexp_count calls
    into one codegen stage over a single scan of the column."""
    c = F.col(text_col)
    counts = pii_counts(c)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return docs.select(
        "*",
        *[col.alias(f"n_{name}") for name, col in counts.items()],
        (total > 0).alias("has_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Return docs with `text_col` redacted in place. Map-only."""
    return docs.withColumn(text_col, redact(F.col(text_col)))
