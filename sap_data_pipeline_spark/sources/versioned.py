"""Versioned Parquet table: manifest-tracked snapshots with time travel.

The plain sinks overwrite in place (readers see only "now"); warehouse
operations also need WHEN — audit a yesterday's report, diff two loads,
roll back a bad batch, feed incremental consumers.  Table formats
(Iceberg/Delta) solve this with a metadata layer over immutable files;
this module implements that layer's core on plain Parquet:

* data files are IMMUTABLE and uuid-named under ``data/``;
* a JSON manifest maps version → explicit FILE LIST (+ lineage);
* commits write files first, then swap the manifest pointer atomically
  (``os.replace``) — a reader that already loaded a manifest keeps a
  consistent snapshot regardless of concurrent commits (snapshot
  isolation, until ``vacuum`` physically removes unreferenced files);
* ``append`` SHARES all previous files (no rewrite — the 100 TB
  ingest path); ``merge`` rewrites into a fresh file set (document-level
  upsert; the production refinement is partition-level sharing, as in
  ``ParquetMergeTable``'s dynamic overwrite);
* ``changes_since`` reads ONLY files added after a version — the
  incremental-consumer contract (downstream jobs process deltas, not
  the table);
* ``rollback`` commits a new version whose file list is an old one's
  (history stays linear and auditable — no destructive pointer moves);
* ``vacuum`` deletes files unreferenced by the kept versions.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    # --- manifest -----------------------------------------------------

    def _load_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"current": 0, "versions": {}}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict, files: list[str], op: str) -> int:
        version = manifest["current"] + 1
        manifest["versions"][str(version)] = {
            "files": files,
            "op": op,
            "parent": manifest["current"],
            "ts": time.time(),
        }
        manifest["current"] = version
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap
        return version

    def _files_of(self, version: int | None) -> list[str]:
        m = self._load_manifest()
        v = m["current"] if version is None else version
        if v == 0:
            return []
        entry = m["versions"].get(str(v))
        if entry is None:
            raise ValueError(f"version {v} unknown (vacuumed or never committed)")
        return entry["files"]

    @property
    def current_version(self) -> int:
        return self._load_manifest()["current"]

    # --- writes -------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        batch_dir = os.path.join(self.data_dir, uuid.uuid4().hex[:12])
        df.write.mode("error").parquet(batch_dir)
        return sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(batch_dir)
            for f in fs
            if f.endswith(".parquet")
        )

    def append(self, df: DataFrame) -> int:
        """Append-only commit: new files + ALL previous files — zero
        rewrite, the shape corpus ingest needs."""
        m = self._load_manifest()
        prev = self._files_of(None)
        return self._commit(m, prev + self._write_files(df), "append")

    def merge(self, source: DataFrame, keys: list[str]) -> int:
        """Keyed upsert commit: merged content lands in a FRESH file
        set (previous versions keep their files — time travel across
        merges works)."""
        from sap_data_pipeline_spark.operators.merge import merge_upsert_frames

        m = self._load_manifest()
        current = self.read() if m["current"] else None
        merged = (
            source.dropDuplicates(keys)
            if current is None
            else merge_upsert_frames(current, source, keys)
        )
        return self._commit(m, self._write_files(merged), "merge")

    def rollback(self, to_version: int) -> int:
        """Commit a NEW version pointing at an old version's files —
        the bad batch stays in history for audit, but readers see the
        restored state."""
        m = self._load_manifest()
        return self._commit(m, self._files_of(to_version), f"rollback:{to_version}")

    # --- reads --------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        files = self._files_of(version)
        if not files:
            raise ValueError("table has no committed data")
        return self.spark.read.parquet(*files)

    def changes_since(self, version: int) -> DataFrame:
        """Rows in files added AFTER ``version`` — the incremental
        consumer reads the delta, never the table.  Exact for append
        lineage; a merge commit's delta is its whole (rewritten)
        snapshot, which is the honest answer for upserts without
        row-level change tracking."""
        old = set(self._files_of(version))
        new = [f for f in self._files_of(None) if f not in old]
        if not new:
            return self.read().limit(0)
        return self.spark.read.parquet(*new)

    # --- maintenance --------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> int:
        """Drop manifest entries older than the last ``keep_last``
        versions and delete data files no kept version references.
        Ends snapshot isolation for vacuumed versions — run it with the
        retention your slowest reader needs.  Returns files deleted."""
        m = self._load_manifest()
        keep = {
            v for v in m["versions"]
            if int(v) > m["current"] - keep_last
        }
        referenced: set[str] = set()
        for v in keep:
            referenced.update(m["versions"][v]["files"])
        all_files = {
            os.path.join(dp, f)
            for dp, _, fs in os.walk(self.data_dir)
            for f in fs
            if f.endswith(".parquet")
        }
        doomed = all_files - referenced
        for f in doomed:
            os.remove(f)
        m["versions"] = {v: e for v, e in m["versions"].items() if v in keep}
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.manifest_path)
        return len(doomed)
