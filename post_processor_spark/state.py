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
    """Versioned parquet tables under root/: <table>/gen=<n>/ + manifest.

    Commit protocol: write parquet dir for the new generation, then
    atomically replace manifest.json (tmp + rename). A crash between the
    two leaves the previous manifest pointing at the previous snapshot —
    exact resume semantics.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _table_dir(self, table: str, generation: int) -> str:
        return os.path.join(self.root, table, f"gen={generation}")

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
        path = self._table_dir(table, generation)
        df.write.mode("overwrite").parquet(path)
        manifest = self._read_manifest()
        t = manifest["tables"].setdefault(table, {"current": None, "history": []})
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
        return spark.read.parquet(self._table_dir(table, gen))

    def current_generation(self, table: str) -> int | None:
        t = self._read_manifest()["tables"].get(table)
        return None if t is None else t["current"]

    def generations(self, table: str) -> list[int]:
        t = self._read_manifest()["tables"].get(table)
        return [] if t is None else sorted(t["history"])
