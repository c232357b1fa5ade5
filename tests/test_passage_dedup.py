"""Cross-document duplicated-passage detection (dedup.duplicate_passages).

Passage-level complement to line dedup / MinHash: windows of k tokens
that occur in more than one document, reported as merged per-doc token
spans. A sequential pure-Python oracle re-implements the contract for
randomized corpora.
"""

import random
import re
from collections import defaultdict

from post_processor_spark.analytics import dedup as D


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = D.duplicate_passages(df, **kw).collect()
    return {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in rows}


def _py_passages(docs, k, stride, within_doc=False):
    toks = {
        i: [t for t in re.split(r"\s+", txt.lower().strip()) if t]
        for i, txt in docs
    }
    wins = []
    for i, ts in toks.items():
        for p in range(1, len(ts) - k + 2, stride):
            wins.append((i, p, " ".join(ts[p - 1 : p - 1 + k])))
    byk = defaultdict(list)
    for i, _, kk in wins:
        byk[kk].append(i)
    dup = {
        kk
        for kk, ids in byk.items()
        if len(set(ids)) > 1 or (within_doc and len(ids) > 1)
    }
    spans = defaultdict(list)
    for i, p, kk in wins:
        if kk in dup:
            spans[i].append(p)
    out = set()
    for i, ps in spans.items():
        cur = None
        for p in sorted(ps):
            if cur is not None and p <= cur[1]:
                cur[1] = max(cur[1], p + k)
                cur[2] += 1
            else:
                if cur is not None:
                    out.add((i, cur[0], cur[1], cur[2]))
                cur = [p, p + k, 1]
        if cur is not None:
            out.add((i, cur[0], cur[1], cur[2]))
    return out


def test_shared_passage_is_found_at_different_offsets(spark):
    shared = "one two three four five six seven eight"
    docs = [
        (1, "intro words here " + shared + " trailing stuff"),
        (2, shared + " completely different ending text here"),
        (3, "nothing in common with the others at all whatsoever today"),
    ]
    got = _run(spark, docs, k=8, stride=1)
    # doc 1: shared passage starts at token 4 -> span [4, 12)
    # doc 2: starts at token 1 -> span [1, 9)
    assert got == {(1, 4, 12, 1), (2, 1, 9, 1)}


def test_short_docs_and_no_dups_emit_nothing(spark):
    docs = [(1, "too short"), (2, "also tiny"), (3, "a b c d e f g h")]
    assert _run(spark, docs, k=8, stride=1) == set()


def test_within_doc_flag(spark):
    rep = "alpha beta gamma delta eps zeta eta theta"
    docs = [(1, rep + " filler words in between " + rep)]
    assert _run(spark, docs, k=8, stride=1) == set()  # cross-doc only
    got = _run(spark, docs, k=8, stride=1, within_doc=True)
    assert got == {(1, 1, 9, 1), (1, 13, 21, 1)}


def test_adjacent_and_overlapping_spans_merge(spark):
    # doc 1 and doc 2 share two OVERLAPPING 4-token windows -> one span
    docs = [
        (1, "a b c d e f zz yy"),
        (2, "a b c d e f qq ww"),
    ]
    got = _run(spark, docs, k=4, stride=1)
    assert got == {(1, 1, 7, 3), (2, 1, 7, 3)}


def test_matches_python_oracle_randomized(spark):
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(12)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 12)))
        for _ in range(4)
    ]
    docs = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        if rng.random() < 0.5:
            ins = rng.choice(passages).split()
            at = rng.randint(0, len(words))
            words = words[:at] + ins + words[at:]
        docs.append((i, " ".join(words)))
    for k, stride in [(6, 1), (6, 2), (8, 3)]:
        got = _run(spark, docs, k=k, stride=stride)
        want = _py_passages(docs, k, stride)
        assert got == want, f"k={k} stride={stride}"
        gotw = _run(spark, docs, k=k, stride=stride, within_doc=True)
        wantw = _py_passages(docs, k, stride, within_doc=True)
        assert gotw == wantw, f"within k={k} stride={stride}"
