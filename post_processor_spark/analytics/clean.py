"""C4-style corpus cleaning: per-line structural filters, document-level
gates, and a token-blocklist filter — all higher-order array expressions
(map-only, zero shuffle, whole-stage codegen; scales linearly with the
corpus and composes with any scan).

Re-expresses the public C4 (Raffel et al., 2020, §2.2) cleaning recipe:
keep only lines that end in terminal punctuation and have >= min_words
words, drop lines mentioning javascript, drop whole documents that
mention "lorem ipsum" or contain a curly brace, and require a minimum
number of surviving lines. The reference repo's closest analog is the
record cleaner's drop-by-predicate loop
(/root/reference/scripts/cleaner/record/clean.py:41-52), done here as
columnar expressions instead of per-row Python.

Every expression has an exact DuckDB equivalent (string_split +
list_filter + regexp_matches), so the driver's oracle gate value-hashes
this operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# terminal punctuation a kept line must end with (C4 uses . ! ? ")
TERMINAL_PUNCT_RE = r'[.!?"]$'
LINE_BLOCKWORD = "javascript"
DOC_BLOCK_SUBSTRINGS = ["lorem ipsum", "{"]


def _line_words(line: Column) -> Column:
    t = F.trim(line)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def kept_lines(col: Column, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line filters, trimmed, in
    document order.

    Predicate cost ordering: the terminal-punct check is a last-char set
    test (no regex — an empty trimmed line yields '' which is in no
    set), the blockword check is a plain substring scan, and only lines
    passing both pay the word-run count (one simple \\S+ regexp_count —
    equivalent to size(split(trim, '\\s+')) on a trimmed line, without
    materializing the token array)."""
    lines = F.transform(F.split(col, "\n"), lambda x: F.trim(x))
    return F.filter(
        lines,
        lambda x: F.right(x, F.lit(1)).isin(".", "!", "?", '"')
        & ~F.contains(F.lower(x), F.lit(LINE_BLOCKWORD))
        & (F.regexp_count(x, F.lit(r"\S+")) >= min_words),
    )


def doc_blocked(col: Column) -> Column:
    """True when the whole document must be dropped (lorem ipsum /
    curly-brace code leak), regardless of its lines."""
    low = F.lower(col)
    out = F.lit(False)
    for s in DOC_BLOCK_SUBSTRINGS:
        out = out | F.contains(low, F.lit(s))
    return out


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """Apply the C4 recipe: rebuild each doc from its surviving lines,
    drop blocked docs and docs with fewer than min_lines survivors.
    Output keeps the input columns with `text_col` rewritten, plus
    n_kept_lines. Map-only (one filter + one projection)."""
    c = F.col(text_col)
    kept = kept_lines(c, min_words=min_words)
    # The keep/drop decision is the EXPLODE of a 0/1-element array, not a
    # Filter over a derived column: predicate pushdown substitutes a
    # filtered alias's full expression tree into the pushed predicate
    # (no cost check), so a Filter(size(__kept) >= n) over a
    # Project(__kept = kept_lines(text)) re-evaluates the whole line
    # filter — and, transitively, whatever expression produced text_col
    # in the projection below — on both sides of the pushdown. Measured
    # on the benched q_c4_clean plan: 36 `split(` occurrences vs 4 with
    # the explode form. Here the line filter is bound exactly once (the
    # 1-element transform gives `kept` a lambda name), blocked docs
    # short-circuit before it via the when(), and a single Generate both
    # filters and carries the (text, n_kept_lines) struct.
    out_type = "array<struct<text:string,n_kept_lines:int>>"
    packed = F.when(
        doc_blocked(c), F.array().cast(out_type)
    ).otherwise(
        F.transform(
            F.filter(F.array(kept), lambda k: F.size(k) >= min_lines),
            lambda k: F.struct(
                F.array_join(k, "\n").alias("text"),
                F.size(k).alias("n_kept_lines"),
            ),
        )
    )
    return (
        docs.select("*", F.explode(packed).alias("__c4"))
        .withColumn(text_col, F.col("__c4.text"))
        .withColumn("n_kept_lines", F.col("__c4.n_kept_lines"))
        .drop("__c4")
    )


def badwords_filter(
    docs: DataFrame,
    badwords: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Drop documents containing any blocklisted token (exact
    whitespace-token match after lowercasing, NOT substring — 'class'
    must not trip a 'ass' entry). The blocklist is a literal array
    (broadcast by value inside the plan); membership is
    exists(tokens, t -> array_contains(list, t)) — map-only."""
    bw = F.lit([w.lower() for w in badwords])
    toks = _line_words(F.lower(F.col(text_col)))
    return docs.filter(~F.exists(toks, lambda t: F.array_contains(bw, t)))
