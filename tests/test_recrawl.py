"""Recrawl scheduling (recrawl.py) vs a sequential Python oracle:
change-rate estimation from fetch history, interval policy bounds, and
the one-exchange plan contract."""

import random

import pytest
from pyspark.sql import functions as F

from post_processor_spark import recrawl


@pytest.fixture(scope="module")
def history(spark):
    rng = random.Random(11)
    rows = []
    for url in range(40):
        n = rng.randrange(1, 12)
        h = "A"
        for gen in range(1, n + 1):
            if rng.random() < 0.3:
                h = chr(ord("A") + rng.randrange(4))
            rows.append((url, gen, h))
    df = spark.createDataFrame(
        rows, "url_hash long, generation long, content_hash string"
    )
    return rows, df


def _brute(rows):
    per = {}
    for url, gen, h in sorted(rows):
        per.setdefault(url, []).append((gen, h))
    out = {}
    for url, seq in per.items():
        changes = sum(
            1 for (_, a), (_, b) in zip(seq, seq[1:]) if a != b
        )
        n = len(seq)
        rate = changes / (n - 1) if n > 1 else 0.0
        out[url] = (n, changes, seq[-1][0], rate)
    return out


def test_change_rate_matches_sequential(history):
    rows, df = history
    got = {
        r["url_hash"]: (r["n_fetches"], r["n_changes"], r["last_gen"], r["change_rate"])
        for r in recrawl.estimate_change_rate(df).collect()
    }
    want = _brute(rows)
    assert set(got) == set(want)
    for url in want:
        gn, gc, gl, gr = got[url]
        wn, wc, wl, wr = want[url]
        assert (gn, gc, gl) == (wn, wc, wl), url
        assert abs(gr - wr) < 1e-12, url


def test_schedule_bounds_and_monotonicity(history):
    _, df = history
    out = recrawl.schedule_recrawl(
        recrawl.estimate_change_rate(df), min_interval=2, max_interval=32
    ).collect()
    by_rate = sorted(out, key=lambda r: r["change_rate"])
    for r in out:
        assert 2 <= r["interval"] <= 32
        assert r["next_fetch_gen"] == r["last_gen"] + r["interval"]
    # interval is non-increasing in change_rate
    for a, b in zip(by_rate, by_rate[1:]):
        assert a["interval"] >= b["interval"]
    # rate 0 → max backoff; a single-fetch URL starts at max too (rate 0)
    static = [r for r in out if r["change_rate"] == 0.0]
    assert all(r["interval"] == 32 for r in static)


def test_bad_bounds_raise(history):
    _, df = history
    rates = recrawl.estimate_change_rate(df)
    with pytest.raises(ValueError):
        recrawl.schedule_recrawl(rates, min_interval=0)
    with pytest.raises(ValueError):
        recrawl.schedule_recrawl(rates, min_interval=8, max_interval=4)


def test_single_exchange_plan(history):
    """Window and aggregate share the url partitioning — the whole
    change-rate + policy plan must contain exactly one hash exchange."""
    _, df = history
    plan = (
        recrawl.schedule_recrawl(recrawl.estimate_change_rate(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# snapshot_delta
# ---------------------------------------------------------------------------

def test_snapshot_delta_statuses(spark):
    """All four statuses, plus the null-fingerprint rules: null vs value
    and null vs null both read as 'changed' (no evidence of sameness)."""
    from post_processor_spark.recrawl import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, None)],
        "url_hash long, content_hash string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "x"), (5, None), (6, "f")],
        "url_hash long, content_hash string",
    )
    got = {
        r["url_hash"]: (r["status"], r["old_fp"], r["new_fp"])
        for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        1: ("unchanged", "a", "a"),
        2: ("changed", "b", "B"),
        3: ("removed", "c", None),
        4: ("changed", None, "x"),
        5: ("changed", None, None),
        6: ("added", None, "f"),
    }


def test_snapshot_delta_single_join_plan(spark):
    """One sort-merge full-outer join, no BNLJ/Cartesian."""
    from post_processor_spark.recrawl import snapshot_delta

    old = spark.range(100).select(
        F.col("id").alias("url_hash"), F.md5(F.col("id").cast("string")).alias("content_hash")
    )
    new = spark.range(50, 150).select(
        F.col("id").alias("url_hash"), F.md5(F.col("id").cast("string")).alias("content_hash")
    )
    plan = snapshot_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1, plan
