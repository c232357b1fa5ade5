"""As-of join (analytics/temporal.py) vs a brute-force Python oracle:
backward and forward directions, inclusive-equality semantics, tolerance
nulling, and no-match → null payload. Randomized but seeded corpora."""

import random

import pytest
from pyspark.sql import functions as F

from post_processor_spark.analytics import temporal


def _brute_asof(left, right, direction, tolerance_s=None):
    """left: [(key, t, lid)], right: [(key, t, payload)] → {lid: payload|None}.
    Ties on right (key, t) are pre-deduped by the caller, matching the
    operator's documented determinism contract."""
    out = {}
    for key, t, lid in left:
        if direction == "backward":
            cands = [(rt, p) for (rk, rt, p) in right if rk == key and rt <= t]
            best = max(cands) if cands else None
        else:
            cands = [(rt, p) for (rk, rt, p) in right if rk == key and rt >= t]
            best = min(cands) if cands else None
        if best is not None and tolerance_s is not None and abs(best[0] - t) > tolerance_s:
            best = None
        out[lid] = None if best is None else best[1]
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)
    left = [(rng.randrange(8), float(rng.randrange(0, 1000)), i) for i in range(300)]
    # dedupe right on (key, t): keep max payload, the documented contract
    seen = {}
    for _ in range(200):
        k, t = rng.randrange(10), float(rng.randrange(0, 1000))
        p = rng.randrange(10**6)
        seen[(k, t)] = max(seen.get((k, t), -1), p)
    right = [(k, t, p) for (k, t), p in seen.items()]
    ldf = spark.createDataFrame(left, "key int, t double, lid int")
    rdf = spark.createDataFrame(right, "rkey int, rt double, payload int")
    return left, right, ldf, rdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_brute_force(corpora, direction):
    left, right, ldf, rdf = corpora
    got = {
        r["lid"]: r["payload"]
        for r in temporal.asof_join(
            ldf, rdf, "key", "rkey", "t", "rt", ["payload"], direction=direction
        ).collect()
    }
    assert got == _brute_asof(left, right, direction)


def test_asof_join_inclusive_at_equal_ts(spark):
    ldf = spark.createDataFrame([(1, 10.0, 0)], "key int, t double, lid int")
    rdf = spark.createDataFrame([(1, 10.0, 99)], "rkey int, rt double, payload int")
    for direction in ("backward", "forward"):
        rows = temporal.asof_join(
            ldf, rdf, "key", "rkey", "t", "rt", ["payload"], direction=direction
        ).collect()
        assert rows[0]["payload"] == 99, direction


def test_asof_join_tolerance_and_matched_ts(corpora):
    left, right, ldf, rdf = corpora
    out = temporal.asof_join(
        ldf, rdf, "key", "rkey", "t", "rt", ["payload"],
        direction="backward", tolerance_s=50.0, matched_ts_col="matched_rt",
    )
    got = {r["lid"]: (r["payload"], r["matched_rt"]) for r in out.collect()}
    want = _brute_asof(left, right, "backward", tolerance_s=50.0)
    assert {k: v[0] for k, v in got.items()} == want
    for lid, (p, mrt) in got.items():
        assert (p is None) == (mrt is None)


def test_asof_join_no_match_is_null_and_left_preserved(corpora):
    left, right, ldf, rdf = corpora
    out = temporal.asof_join(
        ldf, rdf, "key", "rkey", "t", "rt", ["payload"]
    )
    assert out.count() == len(left)
    assert out.columns == ["key", "t", "lid", "payload"]
    # a key absent from the right side yields null payload
    only_left = temporal.asof_join(
        ldf.withColumn("key", F.col("key") + 1000), rdf,
        "key", "rkey", "t", "rt", ["payload"],
    )
    assert only_left.filter(F.col("payload").isNotNull()).count() == 0


def test_asof_join_single_shuffle_plan(corpora):
    """The plan must contain exactly one hashpartitioning exchange on the
    key (the window exchange) and no BroadcastNestedLoop/Cartesian —
    that's the whole point vs a range-join encoding."""
    _, _, ldf, rdf = corpora
    plan = temporal.asof_join(
        ldf, rdf, "key", "rkey", "t", "rt", ["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
