"""Decontamination + repetition-signal tests, each against a sequential
Python oracle over the same corpus (test-only oracle code, mirroring the
published n-gram-overlap methodology — never in the engine path)."""

import hashlib

from post_processor_spark.analytics import decontam


def _norm(s):
    return " ".join(s.lower().split())


def _grams(s, n):
    toks = _norm(s).split(" ")
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _corpus(spark):
    rows = [
        ("c1", "alpha beta gamma delta epsilon zeta eta theta"),
        ("c2", "the quick brown fox jumps over the lazy dog tonight"),
        ("c3", "one two three four five six seven eight nine ten"),
        ("c4", "alpha beta gamma delta but then it diverges entirely here"),
        ("c5", "totally clean document with no overlap at all whatsoever"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _bench(spark):
    rows = [
        ("b1", "quick brown fox jumps over the lazy"),
        ("b2", "alpha beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_contam_counts(corpus_rows, bench_rows, n):
    bset = set()
    for _, t in bench_rows:
        bset |= _grams(t, n)
    return {
        i: len(_grams(t, n) & bset)
        for i, t in corpus_rows
    }


def test_flag_contamination_matches_python_oracle(spark):
    n = 4
    corpus, bench = _corpus(spark), _bench(spark)
    crows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    brows = [(r["doc_id"], r["text"]) for r in bench.collect()]
    expect = _py_contam_counts(crows, brows, n)
    for h in ("xxhash64", "md5"):
        out = decontam.flag_contamination(corpus, bench, n=n, hash=h)
        got = {r["doc_id"]: r["contam_grams"] for r in out.collect()}
        assert got == expect, (h, got, expect)
        flags = {r["doc_id"]: r["contaminated"] for r in out.collect()}
        assert flags == {k: v > 0 for k, v in expect.items()}


def test_md5_gram_hash_matches_hashlib(spark):
    """The md5 contract is exactly first-32-hex-bits of md5(gram) — the
    same value hashlib (and DuckDB's md5()) computes."""
    corpus = _corpus(spark).limit(1)
    df = decontam._gram_hashes_df(corpus, "text", "doc_id", 3, "md5")
    got = {r["_h"] for r in df.collect()}
    text = corpus.collect()[0]["text"]
    expect = {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
        for g in _grams(text, 3)
    }
    assert got == expect


def test_decontaminate_drops_exactly_the_hit_docs(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    out = decontam.decontaminate(corpus, bench, n=4)
    kept = sorted(r["doc_id"] for r in out.collect())
    # c1 and c4 share "alpha beta gamma delta", c2 shares the fox grams
    assert kept == ["c3", "c5"]
    assert out.columns == corpus.columns


def test_contamination_report(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    rep = {
        r["bench_id"]: (r["n_docs_hit"], r["n_grams_hit"])
        for r in decontam.contamination_report(corpus, bench, n=4).collect()
    }
    crows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    for bid, btext in [(r["doc_id"], r["text"]) for r in bench.collect()]:
        bg = _grams(btext, 4)
        docs_hit = {i for i, t in crows if _grams(t, 4) & bg}
        grams_hit = set().union(*[_grams(t, 4) & bg for i, t in crows]) if docs_hit else set()
        if docs_hit:
            assert rep[bid] == (len(docs_hit), len(grams_hit))
        else:
            assert bid not in rep


def _py_repetition(text, n):
    toks = _norm(text).split(" ")
    if len(toks) <= n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    from collections import Counter

    gc, lc = Counter(grams), Counter(lines)
    dup_word = 1 - len(set(toks)) / len(toks) if toks else 0.0
    dup_gram = 1 - len(gc) / len(grams) if grams else 0.0
    top_gram = max(gc.values()) / len(grams) if grams else 0.0
    line_chars = sum(len(l) for l in lines)
    dup_line_chars = sum(len(l) * c for l, c in lc.items() if c > 1)
    dup_line = dup_line_chars / line_chars if line_chars else 0.0
    return (
        round(dup_word, 6), round(dup_gram, 6),
        round(top_gram, 6), round(dup_line, 6),
    )


def test_repetition_profile_matches_python_oracle(spark):
    rows = [
        ("r1", "spam spam spam spam spam spam"),
        ("r2", "the cat sat on the mat and the cat sat again"),
        ("r3", "all words here are entirely unique tokens friend"),
        ("r4", "line one\nline two\nline one\nline three\nline one"),
        ("r5", "a b a b a b a b c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: (
            r["dup_word_frac"], r["dup_ngram_frac"],
            r["top_ngram_frac"], r["dup_line_frac"],
        )
        for r in decontam.repetition_profile(df, ngram_n=2).collect()
    }
    for i, t in rows:
        exp = _py_repetition(t, 2)
        got = out[i]
        for a, b in zip(got, exp):
            assert abs(a - b) < 1e-9, (i, got, exp)
