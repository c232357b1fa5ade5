"""SnapshotStore contract: snapshot vs append modes, versioned dirs,
same-generation merges, mode safety (SURVEY.md §2.1 S10 / north_rule
checkpointing)."""

import tempfile

import pytest

from post_processor_spark.state import SnapshotStore


def _df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "v long")


def test_snapshot_mode_replaces(spark):
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write("t", _df(spark, [1, 2]), 0)
        s.write("t", _df(spark, [3]), 1)
        assert sorted(r["v"] for r in s.read(spark, "t").collect()) == [3]
        assert sorted(r["v"] for r in s.read(spark, "t", 0).collect()) == [1, 2]


def test_append_mode_unions_deltas(spark):
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write_append("t", _df(spark, [1]), 0)
        s.write_append("t", _df(spark, [2]), 1)
        s.write_append("t", _df(spark, [3]), 2)
        assert sorted(r["v"] for r in s.read(spark, "t").collect()) == [1, 2, 3]
        # time travel: generation 1 excludes later deltas
        assert sorted(r["v"] for r in s.read(spark, "t", 1).collect()) == [1, 2]


def test_append_same_generation_merges(spark):
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write_append("t", _df(spark, [1]), 0)
        s.write_append("t", _df(spark, [2]), 0)
        assert sorted(r["v"] for r in s.read(spark, "t", 0).collect()) == [1, 2]


def test_mode_mismatch_raises(spark):
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write("t", _df(spark, [1]), 0)
        with pytest.raises(ValueError):
            s.write_append("t", _df(spark, [2]), 1)


def test_snapshot_rewrite_keeps_lazy_reader_valid(spark):
    """A lazy plan over generation g stays readable after g is rewritten
    (dirs are never overwritten — the streaming merge path relies on it)."""
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write("t", _df(spark, [1, 2]), 0)
        lazy = s.read(spark, "t", 0)  # not collected yet
        s.write("t", lazy.unionByName(_df(spark, [3])), 0)
        assert sorted(r["v"] for r in s.read(spark, "t", 0).collect()) == [1, 2, 3]
