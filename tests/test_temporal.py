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


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def _brute_range(points, intervals):
    """points: [(pid, key, t)], intervals: [(iid, key, s, e)] →
    {(pid, iid)} for s <= t <= e on matching key."""
    return {
        (pid, iid)
        for (pid, pk, t) in points
        for (iid, ik, s, e) in intervals
        if pk == ik and s <= t <= e
    }


@pytest.fixture(scope="module")
def range_corpora(spark):
    rng = random.Random(11)
    points = [(i, rng.randrange(6), float(rng.randrange(0, 2000))) for i in range(400)]
    intervals = []
    for i in range(120):
        s = float(rng.randrange(0, 2000))
        # mix of short, long, zero-length, and inverted (empty) intervals
        length = rng.choice([0.0, 5.0, 37.0, 250.0, -10.0])
        intervals.append((i, rng.randrange(6), s, s + length))
    pdf = spark.createDataFrame(points, "pid int, pkey int, t double")
    idf = spark.createDataFrame(intervals, "iid int, ikey int, s double, e double")
    return points, intervals, pdf, idf


@pytest.mark.parametrize("bin_width", [7.0, 64.0, 1000.0, 10000.0])
def test_range_join_matches_brute_force(range_corpora, bin_width):
    """Pair set is exact for any bin width — width is a physical knob
    (blowup vs bin population), never a semantics knob."""
    points, intervals, pdf, idf = range_corpora
    got = {
        (r["pid"], r["iid"])
        for r in temporal.range_join(
            pdf, idf, "t", "s", "e", bin_width,
            point_key="pkey", interval_key="ikey",
        ).collect()
    }
    assert got == _brute_range(points, intervals)


def test_range_join_keyless_matches_brute_force(range_corpora):
    points, intervals, pdf, idf = range_corpora
    pts = [(pid, 0, t) for (pid, _, t) in points][:80]
    ivs = [(iid, 0, s, e) for (iid, _, s, e) in intervals][:40]
    pdf2 = pdf.limit(0).sparkSession.createDataFrame(pts, "pid int, pkey int, t double")
    idf2 = idf.limit(0).sparkSession.createDataFrame(ivs, "iid int, ikey int, s double, e double")
    got = {
        (r["pid"], r["iid"])
        for r in temporal.range_join(
            pdf2.drop("pkey"), idf2.drop("ikey"), "t", "s", "e", 50.0
        ).collect()
    }
    assert got == _brute_range(pts, ivs)


def test_range_join_no_bnlj_plan(range_corpora):
    """The whole point: a non-equi time predicate that still plans as a
    hash equi-join — no BroadcastNestedLoopJoin, no CartesianProduct."""
    _, _, pdf, idf = range_corpora
    plan = temporal.range_join(
        pdf, idf, "t", "s", "e", 64.0, point_key="pkey", interval_key="ikey"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_validations(range_corpora):
    _, _, pdf, idf = range_corpora
    with pytest.raises(ValueError, match="bin_width_s"):
        temporal.range_join(pdf, idf, "t", "s", "e", 0.0)
    with pytest.raises(ValueError, match="set together"):
        temporal.range_join(pdf, idf, "t", "s", "e", 10.0, point_key="pkey")
    with pytest.raises(ValueError, match="collide"):
        temporal.range_join(
            pdf, idf.withColumnRenamed("iid", "pid"), "t", "s", "e", 10.0
        )
