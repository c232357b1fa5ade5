"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting — all JVM-side expressions
(whole-stage codegen; zero Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small pinned English stopword list (public knowledge)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be",
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization after trim; empty string → empty array."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


_ALNUM_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored proxy: word pieces + individual non-alnum chars — a
    deterministic stand-in for a real tokenizer.

    Equivalent to splitting at every alnum/non-alnum boundary (which
    yields maximal alnum runs plus each non-alnum char alone) and
    counting non-empty pieces, but WITHOUT the lookaround-regex split
    that formulation needs: count = (# maximal alnum runs via ONE simple
    regexp_count) + (# non-alnum chars via translate — a char-map scan,
    no NFA). The lookaround split was the dominant cost of the one-pass
    text profile."""
    t = F.trim(col)
    alnum_runs = F.regexp_count(t, F.lit(r"[a-zA-Z0-9]+"))
    non_alnum_chars = F.length(F.translate(t, _ALNUM_CHARS, ""))
    return alnum_runs + non_alnum_chars


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.lit(stopwords or EN_STOPWORDS)
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(sw, t)))


def stopword_ratio(col: Column) -> Column:
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(col) / n)


# every ASCII printable that is neither alnum nor space — exactly the
# [!-/:-@\[-`{-~] class the regex formulation used
_PUNCT_CHARS = "".join(
    chr(c) for c in range(0x21, 0x7F) if not chr(c).isalnum()
)


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    # count class members by what translate REMOVES — a char-map scan
    # instead of a per-char regex NFA over the whole document
    punct = n - F.length(F.translate(col, _PUNCT_CHARS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite [0,1] heuristic: rewards mid-length docs with normal
    stopword density and low punctuation noise."""
    n = token_count(col)
    len_score = F.least(n.cast("double") / 100.0, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.least(F.abs(sw - 0.4) * 2.5, F.lit(1.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round((len_score + sw_score + p_score) / 3.0, 4)


# ASCII letters + the exact regex-\s set ([ \t\n\x0B\f\r])
_ASCII_LETTER_WS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ \t\n\x0b\x0c\r"
)


def lang_id(col: Column, threshold: float = 0.08) -> Column:
    """n-gram-free heuristic: English iff stopword ratio clears the bar
    and the text is mostly ASCII letters. The [a-zA-Z\\s] count is a
    translate char-map scan (the class is enumerable), not a regex."""
    n_kept = F.length(col) - F.length(F.translate(col, _ASCII_LETTER_WS, ""))
    ascii_ratio = F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        n_kept.cast("double") / F.length(col)
    )
    return F.when(
        (stopword_ratio(col) >= threshold) & (ascii_ratio >= 0.6), F.lit("en")
    ).otherwise(F.lit("other"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text
    (lower, collapse whitespace) — engine-portable (same value in any
    SQL engine with md5)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def rolling_hash_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min xxhash64 over character
    k-grams — robust to local edits, all JVM-side. The normalized
    string is bound ONCE through a 1-element transform: referencing the
    regexp_replace expression inside the per-gram lambda would re-run
    the whole-document regex once per character position."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.get(
        F.transform(
            F.array(norm),
            lambda nrm: F.array_min(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(nrm) - window + 1, F.lit(1))
                    ),
                    lambda i: F.xxhash64(nrm.substr(i, F.lit(window))),
                )
            ),
        ),
        0,
    )


def profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile used by quality filtering pipelines."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_pieces"),
        F.round(stopword_ratio(c), 4).alias("stop_ratio"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Hashed-linear classifier (fasttext-style model-based quality filter)
# ---------------------------------------------------------------------------

_HASH_MULT = 2654435761  # Knuth multiplicative constant
_HASH_MOD = 2147483648   # 2^31


def hashed_bucket(token: Column, dim: int, salt: str = "") -> Column:
    """Feature hashing: token → bucket in [0, dim) via the first 32 bits
    of md5(token ‖ salt) — engine-portable (the DuckDB oracle recomputes
    it bit-for-bit), deterministic, no vocabulary table."""
    h = F.conv(F.substring(F.md5(F.concat(token, F.lit(salt))), 1, 8), 16, 10)
    return h.cast("long") % dim


def hashed_linear_score(
    col: Column,
    weights: list[float] | None = None,
    dim: int = 4096,
    bias: float = 0.0,
    salt: str = "",
) -> Column:
    """fasttext-style linear text classifier, all JVM expressions:
    score = sigmoid(bias + mean over tokens of w[bucket(token)]).

    This is the shape of the model-based quality filters
    (CCNet/DataComp-style) a training pipeline runs corpus-wide: hashed
    bag-of-words, linear weights, sigmoid. `weights` is the trained
    weight vector, folded into the plan as a literal array (fine up to
    ~64k buckets; for bigger models broadcast-join a (bucket, weight)
    dim instead). With weights=None each bucket gets a deterministic
    pseudo-weight in [-1, 1) ((b·2654435761 mod 2^31)/2^31·2−1) — a
    fixture model that keeps the whole classifier expressible in the
    DuckDB oracle with no side table.

    Scale shape: map-only higher-order-function fold per row — no
    shuffle, no Python, no model file I/O on executors. Empty docs score
    sigmoid(bias) (no token evidence).
    """
    if dim <= 0:
        raise ValueError(f"dim must be > 0: {dim}")
    if weights is not None and len(weights) != dim:
        raise ValueError(f"weights length {len(weights)} != dim {dim}")
    toks = F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != "")
    bucket = lambda t: hashed_bucket(t, dim, salt)  # noqa: E731
    if weights is None:
        w = lambda b: (  # noqa: E731
            ((b * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)).cast("double")
            / F.lit(float(_HASH_MOD)) * 2.0 - 1.0
        )
    else:
        arr = F.lit([float(x) for x in weights])
        # element_at is 1-indexed
        w = lambda b: F.element_at(arr, (b + 1).cast("int"))  # noqa: E731
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + w(bucket(t))
    )
    n = F.size(toks)
    logit = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


# ---------------------------------------------------------------------------
# Collocation mining (adjacent-bigram PMI)
# ---------------------------------------------------------------------------


def collocations(
    docs: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Corpus-level collocation mining: adjacent word bigrams scored by
    pointwise mutual information. Output one row per bigram with
    n_pair ≥ min_count:

        (w1, w2, n_pair, n_w1, n_w2, pmi)

    pmi = ln( (n_pair / N_bigrams) / ((n_w1 / N_tokens) · (n_w2 / N_tokens)) )

    computed in exactly that division order (the DuckDB oracle mirrors
    the tree; round(pmi, 6) absorbs last-ulp libm differences).

    Scale shape: two hash aggregations with map-side combine (unigrams
    keyed by token, bigrams by (w1, w2) — the min_count filter prunes
    the long tail before the scoring joins), two 1-row total aggregates
    joined by broadcast-able cross join, and two token-keyed joins to
    attach unigram counts. No windows, no corpus self-join; the bigram
    explode is the only row expansion (×(len-1) per doc). Hot-token
    skew lands on single aggregation keys (combine-heavy), never on a
    single partition's window.
    """
    # filter the split's edge artifacts: Spark trim() strips SPACES only,
    # so text ending in '\n' or '\t' yields a trailing '' token (and a
    # leading one for '\n'-prefixed text) — without the filter every
    # newline-terminated doc emits a bogus (last_word, '') bigram
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = docs.select(toks.alias("_tk")).filter(F.size("_tk") > 0)
    uni = base.select(F.explode("_tk").alias("w")).groupBy("w").agg(
        F.count("*").alias("nw")
    )
    # sequence(1, 0) DESCENDS in Spark, so a single-token doc must short-
    # circuit to an empty array before the transform ever indexes
    pairs = F.when(
        F.size("_tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_tk") - 1),
            lambda i: F.struct(
                F.element_at("_tk", i).alias("w1"),
                F.element_at("_tk", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = base.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    totals = uni.agg(F.sum("nw").alias("n_tok")).crossJoin(
        bc.agg(F.sum("n_pair").alias("n_big"))
    )
    scored = (
        bc.filter(F.col("n_pair") >= min_count)
        .crossJoin(F.broadcast(totals))
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("nw", "n_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("nw", "n_w2"), "w2")
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("n_big"))
        / (
            (F.col("n_w1").cast("double") / F.col("n_tok"))
            * (F.col("n_w2").cast("double") / F.col("n_tok"))
        )
    )
    return scored.select(
        "w1", "w2", "n_pair", "n_w1", "n_w2", F.round(pmi, 6).alias("pmi")
    )


# ---------------------------------------------------------------------------
# Unicode script profiling (writing-system detection)
# ---------------------------------------------------------------------------

# Codepoint ranges per script class, expressed as literal range pairs so
# BOTH engines compile the same character class: Spark (java.util.regex)
# sees [Ѐ-ӿ]-style classes, the DuckDB oracle (RE2) the
# equivalent [\x{0400}-\x{04FF}]. Coverage is the major blocks a crawl
# actually hits, not all of Unicode (extend the table, not the logic).
SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "latin": [(0x0041, 0x005A), (0x0061, 0x007A), (0x00C0, 0x024F)],
    "cyrillic": [(0x0400, 0x04FF)],
    "greek": [(0x0370, 0x03FF)],
    "arabic": [(0x0600, 0x06FF), (0x0750, 0x077F)],
    "hebrew": [(0x0590, 0x05FF)],
    "devanagari": [(0x0900, 0x097F)],
    "cjk": [(0x4E00, 0x9FFF), (0x3040, 0x30FF), (0xAC00, 0xD7AF)],
}


def _script_class(ranges: list[tuple[int, int]]) -> str:
    return "[" + "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in ranges) + "]"


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-system profile: one count column per script
    class in SCRIPT_RANGES (`n_<script>`), total letter count, and the
    dominant script (`script` — max count, ties broken by the table
    order above; 'unknown' when no class matches, e.g. digits-only).

    Map-only regexp_count expressions, one codegen stage, no Python —
    the scale profile of a 100 TB pass is the scan itself. Feeds
    lang-ID (text.lang_id assumes Latin stopwords; route non-Latin
    scripts to their own detector) and corpus-mix reporting."""
    c = F.col(text_col)
    counts = {
        name: F.regexp_count(c, F.lit(_script_class(ranges)))
        for name, ranges in SCRIPT_RANGES.items()
    }
    total = None
    for expr in counts.values():
        total = expr if total is None else total + expr
    # greatest(...) needs a deterministic tie-break: walk the table in
    # order and keep the first class achieving the max
    best = F.lit("unknown")
    best_n = F.lit(0)
    for name in SCRIPT_RANGES:  # insertion order = priority order
        is_better = counts[name] > best_n
        best = F.when(is_better, F.lit(name)).otherwise(best)
        best_n = F.when(is_better, counts[name]).otherwise(best_n)
    return docs.select(
        "*",
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_RANGES],
        total.alias("n_scripted"),
        best.alias("script"),
    )
