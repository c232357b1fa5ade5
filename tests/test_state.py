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


def test_double_rewrite_same_generation_never_reuses_dir(spark):
    """Two consecutive rewrites of the SAME generation must use fresh dirs:
    deriving the suffix from the referenced-dir count regenerated the same
    path on the second rewrite and overwrote the dir a lazy reader of the
    first rewrite still held."""
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write("t", _df(spark, [1]), 0)
        s.write("t", _df(spark, [1, 2]), 0)  # rewrite #1
        lazy = s.read(spark, "t", 0)
        s.write("t", _df(spark, [9]), 0)  # rewrite #2 — must not clobber #1's dir
        assert sorted(r["v"] for r in lazy.collect()) == [1, 2]
        assert sorted(r["v"] for r in s.read(spark, "t", 0).collect()) == [9]


def test_compaction_then_write_never_reuses_dir(spark):
    """Compaction shrinks the referenced-dir set; a later append must still
    get a fresh dir (monotone next_id, not a count-derived suffix)."""
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write_append("t", _df(spark, [1]), 0)
        s.write_append("t", _df(spark, [2]), 1)
        merged = s.read(spark, "t")
        s.write_many([("t", merged, 1, "compact")])
        lazy = s.read(spark, "t")
        s.write_append("t", _df(spark, [3]), 1)
        assert sorted(r["v"] for r in lazy.collect()) == [1, 2]
        assert sorted(r["v"] for r in s.read(spark, "t").collect()) == [1, 2, 3]


def test_write_many_all_or_nothing(spark):
    """A failure on any entry of a multi-table transaction must leave NO
    table advanced (one manifest commit at the end)."""
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write("a", _df(spark, [1]), 0)
        s.write("b", _df(spark, [1]), 0)
        with pytest.raises(ValueError):
            # second entry violates b's snapshot mode -> whole txn aborts
            s.write_many(
                [
                    ("a", _df(spark, [2]), 1, "snapshot"),
                    ("b", _df(spark, [2]), 1, "append"),
                ]
            )
        assert s.current_generation("a") == 0
        assert s.current_generation("b") == 0
        assert sorted(r["v"] for r in s.read(spark, "a").collect()) == [1]


def test_write_many_commits_together(spark):
    with tempfile.TemporaryDirectory() as d:
        s = SnapshotStore(d)
        s.write_many(
            [
                ("a", _df(spark, [1]), 0, "snapshot"),
                ("b", _df(spark, [9]), 0, "append"),
            ]
        )
        assert s.current_generation("a") == 0 and s.current_generation("b") == 0
        assert [r["v"] for r in s.read(spark, "b").collect()] == [9]
