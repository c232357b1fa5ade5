"""Grouped order-statistic quantiles (analytics/stats.py) vs a pure-
Python oracle, plus the single-exchange plan contract and the approx
variant's rank-error bound."""

import random

import pytest
from pyspark.sql import functions as F

from post_processor_spark.analytics import stats


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(13)
    rows = [
        (f"g{rng.randrange(5)}", rng.randrange(0, 10_000))
        for _ in range(3_000)
    ]
    # one tiny group (n=1) and one group full of ties
    rows += [("solo", 42)] + [("ties", 7)] * 50
    return rows, spark.createDataFrame(rows, "g string, v long")


def _oracle(rows, qs):
    import math

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        out[g] = tuple(vs[math.ceil(q * len(vs)) - 1] for q in qs)
    return out


def test_group_quantiles_matches_oracle(corpus):
    rows, df = corpus
    qs = (0.5, 0.9, 0.99)
    got = {
        r["g"]: (r["p50"], r["p90"], r["p99"])
        for r in stats.group_quantiles(df, "g", "v", qs).collect()
    }
    assert got == _oracle(rows, qs)


def test_group_quantiles_edge_quantiles(corpus):
    """q=1.0 is the max; a single-row group returns its value at every q;
    an all-ties group returns the tie value."""
    rows, df = corpus
    got = {
        r["g"]: (r["n"], r["p1"], r["p100"])
        for r in stats.group_quantiles(df, "g", "v", qs=(0.01, 1.0)).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        assert got[g][0] == len(vs)
        assert got[g][2] == max(vs)
    assert got["solo"] == (1, 42, 42)
    assert got["ties"][1:] == (7, 7)


def test_group_quantiles_validations(corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="quantiles"):
        stats.group_quantiles(df, "g", "v", qs=(0.0,))
    with pytest.raises(ValueError, match="quantiles"):
        stats.group_quantiles(df, "g", "v", qs=(1.1,))


def test_group_quantiles_single_exchange_plan(corpus):
    """Window rank + per-group aggregate share the hash partitioning:
    exactly one exchange."""
    _, df = corpus
    plan = (
        stats.group_quantiles(df, "g", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_group_quantiles_approx_within_rank_error(corpus):
    """percentile_approx with accuracy A has rank error <= n/A; at
    A=10000 and n~600 the sketch is exact, so values must land within one
    rank of the exact order statistic."""
    rows, df = corpus
    qs = (0.5, 0.9)
    exact = _oracle(rows, qs)
    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in stats.group_quantiles_approx(df, "g", "v", qs).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        for i, q in enumerate(qs):
            import math

            rank = math.ceil(q * len(vs)) - 1
            lo = vs[max(0, rank - 1)]
            hi = vs[min(len(vs) - 1, rank + 1)]
            assert lo <= got[g][i] <= hi, (g, q, got[g][i], exact[g])
