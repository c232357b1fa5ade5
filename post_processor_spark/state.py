"""Snapshot store: parquet tables + a JSON manifest implementing the
Iceberg-snapshot contract (generation-versioned tables, atomic commit,
exact resume). The north_rule asks for Iceberg; the sandbox has no
Iceberg runtime jar, so this is the documented fallback (SURVEY.md §7.4)
behind one storage interface — swapping in `df.writeTo(table)` +
`VERSION AS OF` is a one-class change.

Reference analog: the saved/ parquet + JSON checkpoints and
read_from_memory resume (archived/Post-Processor/processor.py:854-866,
960-975; processor/post_input/load_input.py:213,296).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Versioned parquet tables under root/: <table>/gen=<n>.<k>/ dirs
    referenced by a manifest (Iceberg manifest pattern). Two table modes:
    snapshot (each generation dir is the full table) and append (each
    generation dir is a delta; reads union all deltas <= generation).

    Commit protocol: write a FRESH parquet dir, then atomically replace
    manifest.json (tmp + rename). A crash between the two leaves the
    previous manifest pointing at the previous snapshot — exact resume
    semantics. Dirs are never overwritten, so lazy readers of the old
    version stay valid during a rewrite.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _new_dir(self, manifest: dict, table: str, generation: int) -> str:
        """Fresh, never-reused directory for one write: gen=<g>.<k>.
        Writes NEVER overwrite an existing dir — a same-generation rewrite
        while a reader holds a lazy plan over the old dir would otherwise
        destroy the data under it. Old dirs are simply unreferenced by the
        manifest (Iceberg-style; GC is a separate concern)."""
        t = manifest["tables"].setdefault(
            table, {"current": None, "history": [], "mode": None, "dirs": {}}
        )
        # Monotone per-table write counter. Deriving the suffix from the
        # number of currently-referenced dirs is NOT monotone: a snapshot
        # rewrite replaces a reference without growing the count, and
        # compaction shrinks it — either can regenerate an in-use path and
        # overwrite data a lazy reader still holds. Older manifests lack
        # next_id; seed it past every suffix ever referenced.
        if "next_id" not in t:
            seen = [
                int(os.path.basename(p).rsplit(".", 1)[1])
                for ds in t["dirs"].values()
                for p in ds
            ]
            # Dereferenced dirs (post-compaction) are still on disk and may
            # still be lazily read — seed past those too.
            tdir = os.path.join(self.root, table)
            if os.path.isdir(tdir):
                for d in os.listdir(tdir):
                    if d.startswith("gen=") and "." in d:
                        try:
                            seen.append(int(d.rsplit(".", 1)[1]))
                        except ValueError:
                            pass
            t["next_id"] = (max(seen) + 1) if seen else 0
        k = t["next_id"]
        t["next_id"] = k + 1
        return os.path.join(self.root, table, f"gen={generation}.{k}")

    # ---------------------------------------------------------- manifest
    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"tables": {}}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    # --------------------------------------------------------------- api
    def write(self, table: str, df: DataFrame, generation: int) -> None:
        """Full-snapshot write: generation dir holds the complete table."""
        self._write(table, df, generation, mode="snapshot")

    def write_append(self, table: str, df: DataFrame, generation: int) -> None:
        """Append-table write: generation dir holds only this generation's
        DELTA rows; read() returns the union of all deltas <= generation.
        This is the Iceberg append pattern — essential for monotone tables
        (seen set, metrics/lineage): a full rewrite would cost O(table)
        I/O per generation, which at a 10^10-row seen set is the whole
        job's budget."""
        self._write(table, df, generation, mode="append")

    def _write(self, table: str, df: DataFrame, generation: int, mode: str) -> None:
        self.write_many([(table, df, generation, mode)])

    def write_many(
        self, writes: list[tuple[str, DataFrame, int, str]]
    ) -> None:
        """Multi-table transaction: all parquet dirs are written first,
        then ONE manifest commit makes every table's new version visible
        atomically. A crash mid-way leaves the previous manifest intact —
        no table can be observed at generation g while a sibling is still
        at g-1 (the cross-table consistency Iceberg transactions give;
        run_generation commits frontier+seen+metrics this way)."""
        manifest = self._read_manifest()
        for table, df, generation, mode in writes:
            table_mode = "append" if mode == "compact" else mode
            t = manifest["tables"].setdefault(
                table, {"current": None, "history": [], "mode": table_mode, "dirs": {}}
            )
            if t.get("mode") is None:
                t["mode"] = table_mode
            if t["mode"] != table_mode:
                raise ValueError(
                    f"table {table!r} is {t['mode']}-mode; cannot {mode}-write"
                )
            path = self._new_dir(manifest, table, generation)
            df.write.mode("overwrite").parquet(path)
            g = str(generation)
            if mode == "snapshot":
                t["dirs"][g] = [path]  # replaces the reference, not the old dir
            elif mode == "compact":
                # append-table compaction: the written df IS the merged
                # state; all prior deltas are dereferenced (Iceberg
                # snapshot-expiry analog — time travel before the
                # compaction point is gone, by design)
                t["dirs"] = {g: [path]}
                t["history"] = []
            else:
                t["dirs"].setdefault(g, []).append(path)
            t["current"] = generation
            if generation not in t["history"]:
                t["history"].append(generation)
        self._commit_manifest(manifest)

    def read(
        self, spark: SparkSession, table: str, generation: int | None = None
    ) -> DataFrame:
        manifest = self._read_manifest()
        t = manifest["tables"].get(table)
        if t is None:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        gen = t["current"] if generation is None else generation
        if gen not in t["history"]:
            raise FileNotFoundError(f"table {table!r} has no generation {gen}")
        if t.get("mode", "snapshot") == "append":
            paths = [
                p
                for g in sorted(t["history"])
                if g <= gen
                for p in t["dirs"][str(g)]
            ]
        else:
            paths = t["dirs"][str(gen)]
        return spark.read.parquet(*paths)

    def current_generation(self, table: str) -> int | None:
        t = self._read_manifest()["tables"].get(table)
        return None if t is None else t["current"]

    def generations(self, table: str) -> list[int]:
        t = self._read_manifest()["tables"].get(table)
        return [] if t is None else sorted(t["history"])
