"""PII redaction, C4 cleaning, and sequence packing vs sequential
Python oracles (re / hand-computed expectations / plain cumsum)."""

import re

from pyspark.sql import functions as F

from post_processor_spark.analytics import clean, packing, pii


# ---------------------------------------------------------------- PII

PII_DOC = (
    "reach me at jane.doe+spam@sub.example.co.uk or 415-555-0199, "
    "ssn 078-05-1120, card 4111-1111-1111-1111, host 192.168.0.1 done"
)


def test_pii_stats_counts(spark):
    df = spark.createDataFrame(
        [(0, PII_DOC), (1, "no pii here at all"), (2, "two mails a@b.io c@d.org")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii.pii_stats(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_phone"], rows[0]["n_ssn"],
            rows[0]["n_card"], rows[0]["n_ipv4"]) == (1, 1, 1, 1, 1)
    assert rows[0]["has_pii"] and not rows[1]["has_pii"]
    assert rows[1]["n_email"] == 0
    assert rows[2]["n_email"] == 2


def test_redact_matches_python_re(spark):
    docs = [
        (0, PII_DOC),
        (1, "plain text, nothing to strip."),
        (2, "a@b.io then 10.0.0.1 then 123-45-6789"),
        (3, "date 12-31-2024 is not a phone; 1234-5678 is not a card"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in pii.redact_pii(df).collect()}
    for i, text in docs:
        expect = text
        for pat, token in pii.PII_PATTERNS.values():
            expect = re.sub(pat, token, expect)
        assert got[i] == expect, (i, got[i], expect)
    # the card number must become ONE <CARD>, not partial phone/ssn hits
    assert "<CARD>" in got[0] and "1111" not in got[0]
    # m-d-y dates and 4-4 digit pairs survive (word-boundary anchoring)
    assert got[3] == "date 12-31-2024 is not a phone; 1234-5678 is not a card"


# ------------------------------------------------------------- C4 clean

def test_c4_clean_line_and_doc_filters(spark):
    good = ("alpha beta gamma delta epsilon zeta.\n"     # kept
            "too short line!\n"                           # < 5 words
            "five words but no terminal punct\n"          # no punct
            "please enable javascript to continue here.\n"  # javascript
            "another perfectly fine sentence right here?\n"  # kept
            'a quoted closing sentence of six words."')   # kept (quote)
    lorem = good + "\nlorem ipsum dolor sit amet wins."
    brace = good + "\nfunction f() { code leak here }."
    thin = "alpha beta gamma delta epsilon zeta.\nshort!"  # 1 kept < 3
    df = spark.createDataFrame(
        [(0, good), (1, lorem), (2, brace), (3, thin)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in clean.c4_clean(df).collect()}
    assert set(out) == {0}
    assert out[0]["n_kept_lines"] == 3
    assert out[0]["text"] == (
        "alpha beta gamma delta epsilon zeta.\n"
        "another perfectly fine sentence right here?\n"
        'a quoted closing sentence of six words."'
    )


def test_badwords_filter_exact_token_not_substring(spark):
    df = spark.createDataFrame(
        [(0, "the class is in session."),       # 'ass' must NOT match 'class'
         (1, "what an Ass he was."),             # case-insensitive token hit
         (2, "assassin is a different token.")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in clean.badwords_filter(df, ["ass"]).collect())
    assert kept == [0, 2]


# ------------------------------------------------------------- packing

def test_pack_sequences_matches_plain_cumsum(spark):
    # two shards, skewed; ord ids sparse to cross bucket boundaries
    docs = []
    for i in range(200):
        docs.append((i * 3, "a", "w " * ((i * 7) % 40)))  # 0..39 tokens
    for i in range(20):
        docs.append((i, "b", "x " * (i % 5)))
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = packing.pack_sequences(df, budget=64, bucket_size=16)
    got = {(r["shard"], r["doc_id"]): r for r in out.collect()}

    # sequential oracle: plain per-shard cumsum in doc_id order
    for shard in ("a", "b"):
        rows = sorted((d, t) for d, s, t in docs if s == shard)
        off = 0
        for doc_id, text in rows:
            n = len(text.split())
            r = got[(shard, doc_id)]
            assert (r["start_off"], r["end_off"]) == (off, off + n), (shard, doc_id)
            assert r["first_chunk"] == off // 64
            last = off // 64 if n == 0 else (off + n - 1) // 64
            assert r["last_chunk"] == last
            assert r["n_chunks"] == last - off // 64 + 1
            off += n
    assert len(got) == len(docs)


def test_pack_sequences_two_phase_matches_single_window(spark):
    """The two-phase prefix sum equals the naive single-window plan."""
    from pyspark.sql import Window
    docs = [(i, "s", "t " * (i % 9)) for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = packing.pack_sequences(df, budget=100, bucket_size=32)
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from post_processor_spark.analytics.text import token_count
    naive = df.select(
        "doc_id",
        F.sum(token_count(F.col("text"))).over(w).alias("end_off"),
    )
    expect = {r["doc_id"]: r["end_off"] for r in naive.collect()}
    for r in out.collect():
        assert r["end_off"] == expect[r["doc_id"]]


def test_token_budget_cap_matches_sequential_oracle(spark):
    """token_budget_cap (two-phase, score-bucketed) vs a sequential
    Python oracle: per group, order by (score desc, id), keep while the
    running total stays <= budget; once a doc overflows nothing after
    it survives (concat-and-stop)."""
    import random

    rng = random.Random(3)
    docs = []
    for i in range(400):
        grp = f"g{rng.randrange(6)}"
        score = round(rng.random(), 4)
        docs.append((i, grp, score, "w " * rng.randrange(0, 30)))
    df = spark.createDataFrame(docs, "doc_id long, source string, score double, text string")
    budget = 150
    out = packing.token_budget_cap(
        df, budget=budget, score_col="score", group_col="source", n_buckets=16
    )
    got = {(r["source"], r["doc_id"]): r["cum_tokens"] for r in out.collect()}

    want = {}
    for grp in {d[1] for d in docs}:
        rows = sorted((d for d in docs if d[1] == grp), key=lambda d: (-d[2], d[0]))
        cum = 0
        for doc_id, _, _, text in rows:
            cum += len(text.split())
            if cum <= budget:
                want[(grp, doc_id)] = cum
    assert got == want


def test_token_budget_cap_overflow_doc_blocks_tail(spark):
    """A giant best-scoring doc exhausts the budget: nothing in its
    group is kept, even later tiny docs (running total never recovers)."""
    df = spark.createDataFrame(
        [(0, "g", 0.9, "w " * 100), (1, "g", 0.5, "w w"), (2, "h", 0.1, "w w w")],
        "doc_id long, source string, score double, text string",
    )
    out = packing.token_budget_cap(df, budget=10, score_col="score", group_col="source")
    kept = {(r["source"], r["doc_id"]) for r in out.collect()}
    assert kept == {("h", 2)}
