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


class CommitConflict(Exception):
    """Another writer claimed the next version first — re-read the
    manifest and retry (appends commute; merges must re-merge)."""


class VersionedParquetTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    # --- manifest -----------------------------------------------------

    def _claim_path(self, version: int) -> str:
        return os.path.join(self.root, f"_manifest-v{version}.json")

    def _load_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            m = {"current": 0, "versions": {}}
        else:
            with open(self.manifest_path) as f:
                m = json.load(f)
        # crash roll-forward: a committer that claimed version N+1 and
        # died before the pointer swap leaves an orphan claim file whose
        # data files are fully written (files-first commit order) —
        # adopt it, otherwise every later commit would conflict forever
        while True:
            claim = self._claim_path(m["current"] + 1)
            if not os.path.exists(claim) or os.path.getsize(claim) == 0:
                break
            with open(claim) as f:
                m = json.load(f)
            tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.replace(tmp, self.manifest_path)
        return m

    def _commit(self, manifest: dict, files: list, op: str) -> int:
        """Optimistic-concurrency commit: atomically CLAIM the next
        version id with ``O_CREAT|O_EXCL`` (exactly one writer per
        version id — the compare-and-swap Iceberg does against its
        catalog), write the full manifest into the claim file, then
        swap the pointer.  A lost claim raises :class:`CommitConflict`
        instead of silently clobbering the winner's commit."""
        version = manifest["current"] + 1
        manifest["versions"][str(version)] = {
            "files": files,
            "op": op,
            "parent": manifest["current"],
            "ts": time.time(),
        }
        manifest["current"] = version
        try:
            fd = os.open(
                self._claim_path(version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already claimed by another writer"
            ) from e
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
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

    def _write_files(self, df: DataFrame, partition_by: str | None = None) -> list:
        """Write ``df`` into immutable files under a fresh batch dir and
        return manifest entries.  With ``partition_by``, each partition
        value gets its own subdirectory and the column STAYS IN THE
        DATA (unlike Spark's ``partitionBy`` hive layout, which strips
        it — path-list reads would lose the column); the per-value
        write loop is bounded by partitions-per-batch, the same
        driver-side bound ``ParquetMergeTable`` accepts."""
        from pyspark.sql import functions as F

        batch_dir = os.path.join(self.data_dir, uuid.uuid4().hex[:12])

        def walk(d: str, part: str | None) -> list:
            return sorted(
                (
                    {"path": os.path.join(dp, f), "partition": part}
                    for dp, _, fs in os.walk(d)
                    for f in fs
                    if f.endswith(".parquet")
                ),
                key=lambda e: e["path"],
            )

        if partition_by is None:
            df.write.mode("error").parquet(batch_dir)
            return walk(batch_dir, None)
        out: list = []
        vals = [r[0] for r in df.select(partition_by).distinct().collect()]
        for i, v in enumerate(sorted(vals, key=str)):
            sub = os.path.join(batch_dir, f"p{i}")
            df.filter(F.col(partition_by).eqNullSafe(F.lit(v))).write.mode(
                "error"
            ).parquet(sub)
            out.extend(walk(sub, str(v)))
        return out

    def append(self, df: DataFrame, *, partition_by: str | None = None,
               max_retries: int = 5, op: str = "append") -> int:
        """Append-only commit: new files + ALL previous files — zero
        rewrite, the shape corpus ingest needs.  ``partition_by``
        records each new file's partition value in the manifest so
        later merges can share untouched partitions.  Appends COMMUTE,
        so a :class:`CommitConflict` auto-retries against the fresh
        manifest — the already-written data files are reused, only the
        metadata commit repeats.  ``op`` tags the commit in the
        manifest lineage (see :meth:`append_once`)."""
        new = self._write_files(df, partition_by)
        for _ in range(max_retries):
            m = self._load_manifest()
            prev = self._files_of(None)
            try:
                return self._commit(m, prev + new, op)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"append lost the commit race {max_retries} times — "
            "pathological writer contention"
        )

    def _token_committed(self, op_token: str) -> bool:
        """True if a committed version carries ``op_token`` — including
        versions vacuum() has since pruned (their op strings are retired
        into the manifest, so exactly-once survives retention)."""
        m = self._load_manifest()
        if any(v.get("op") == op_token for v in m["versions"].values()):
            return True
        return op_token in m.get("retired_ops", [])

    def append_once(self, df: DataFrame, *, op_token: str,
                    partition_by: str | None = None) -> int | None:
        """Idempotent append: commit tagged ``op_token``; if a committed
        version already carries that token, no-op and return ``None``.

        This is the exactly-once handshake for at-least-once producers
        (Structured Streaming ``foreachBatch`` redelivers a batch after
        a crash between the sink write and the checkpoint commit): the
        token — e.g. ``stream-append:<stream_id>:<batch_id>`` — rides
        the manifest, so a redelivered batch finds its own commit and
        skips.  The check-then-commit pair assumes one writer per
        ``op_token`` stream (the Structured Streaming execution model —
        a query's batches retry serially, never concurrently); unrelated
        writers on other tokens race safely via the version claims.
        """
        if self._token_committed(op_token):
            return None
        return self.append(df, partition_by=partition_by, op=op_token)

    def merge_once(self, source: DataFrame, keys: list[str], *,
                   op_token: str, partition_by: str | None = None) -> int | None:
        """Idempotent keyed upsert: the :meth:`append_once` handshake for
        MERGE batches.  A replayed merge batch is already CONTENT-equal
        (upserting the same rows twice converges), but it would still
        commit a spurious extra version; the token check skips it, so
        ``changes_since``/``diff`` consumers never see a phantom delta
        and history stays one version per logical batch.  Same
        single-writer-per-token assumption as :meth:`append_once`."""
        if self._token_committed(op_token):
            return None
        return self.merge(source, keys, partition_by=partition_by, op=op_token)

    def merge(self, source: DataFrame, keys: list[str], *,
              partition_by: str | None = None, op: str = "merge") -> int:
        """Keyed upsert commit.  With ``partition_by``, only files of
        partitions the source touches are rewritten; every other file
        is SHARED with the previous version by reference — the
        Iceberg-style sharing that keeps time travel viable on a
        years-deep fact (a full-rewrite merge would copy 100 TB per
        batch).  Files lacking partition metadata (unpartitioned
        commits) always rewrite.  Without ``partition_by``, the merged
        content lands in a fresh full file set."""
        from pyspark.sql import functions as F

        from sap_data_pipeline_spark.operators.merge import merge_upsert_frames

        m = self._load_manifest()
        current_files = self._files_of(None)
        if not current_files:
            first = source.dropDuplicates(keys)
            return self._commit(m, self._write_files(first, partition_by), op)

        if partition_by is None:
            merged = merge_upsert_frames(self.read(), source, keys)
            return self._commit(m, self._write_files(merged), op)

        touched = {
            str(r[partition_by])
            for r in source.select(partition_by).distinct().collect()
        }
        shared = [
            e for e in current_files
            if e["partition"] is not None and e["partition"] not in touched
        ]
        affected_paths = [e["path"] for e in current_files if e not in shared]
        if affected_paths:
            affected = self.spark.read.parquet(*affected_paths).filter(
                F.col(partition_by).isin(*touched)
            )
            # rows of affected files OUTSIDE touched partitions (only
            # possible for unpartitioned legacy files) must survive too
            bystanders = self.spark.read.parquet(*affected_paths).filter(
                ~F.col(partition_by).isin(*touched)
            )
            merged = merge_upsert_frames(affected, source, keys).unionByName(
                bystanders
            )
        else:
            merged = source.dropDuplicates(keys)
        new_files = self._write_files(merged, partition_by)
        return self._commit(m, shared + new_files, op)

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
        return self.spark.read.parquet(*[e["path"] for e in files])

    def changes_since(self, version: int) -> DataFrame:
        """Rows in files added AFTER ``version`` — the incremental
        consumer reads the delta, never the table.  Exact for append
        lineage; a merge commit's delta is the rewritten file set of
        the partitions it touched (shared untouched files are not
        re-delivered), which is the honest answer for upserts without
        row-level change tracking."""
        old = {e["path"] for e in self._files_of(version)}
        new = [e["path"] for e in self._files_of(None) if e["path"] not in old]
        if not new:
            return self.read().limit(0)
        return self.spark.read.parquet(*new)

    def diff(self, keys: list[str], from_version: int,
             to_version: int | None = None) -> DataFrame:
        """Row-level semantic diff between two snapshots — the change
        data feed ``changes_since`` can't give (that method returns the
        raw rewritten-file delta, which over-delivers for merges and
        says nothing about deletes).

        Returns one row per changed key: the key columns plus
        ``change_type`` ('insert' | 'update' | 'delete') and the
        per-side row counts ``n_from`` / ``n_to`` (under unique-key
        merge lineage both are 0/1; duplicate-key append lineage is
        reported honestly as multiset counts).

        Scale shape: snapshots share immutable files, so the diff first
        prunes to files NOT referenced by both versions — rows living
        only in shared files are bit-identical on both sides and never
        scanned.  Candidate keys come from those changed files alone;
        each full snapshot is then key-pruned (semi-join; the candidate
        frame is small after a merge batch and broadcasts) before the
        multiset compare.  On an append-only lineage the from-side
        changed set is empty and the whole diff reduces to a scan of
        the appended files.
        """
        from pyspark.sql import functions as F

        from_files = {e["path"] for e in self._files_of(from_version)}
        to_files = {e["path"] for e in self._files_of(to_version)}
        only_from = sorted(from_files - to_files)
        only_to = sorted(to_files - from_files)
        empty = (
            self.read(to_version)
            .limit(0)
            .select(*keys)
            .withColumn("change_type", F.lit(""))
            .withColumn("n_from", F.lit(0).cast("long"))
            .withColumn("n_to", F.lit(0).cast("long"))
        )
        if not only_from and not only_to:
            return empty

        def read_paths(paths: list[str]) -> DataFrame | None:
            return self.spark.read.parquet(*paths) if paths else None

        # every join below goes through a single `_k` STRUCT surrogate:
        # struct equality treats NULL fields as equal, so NULL-keyed rows
        # diff like any other (bare multi-column equi-joins would drop
        # them silently — NULL != NULL)
        kstruct = F.struct(*[F.col(k) for k in keys]).alias("_k")
        cand_parts = [
            d.select(kstruct) for d in (read_paths(only_from), read_paths(only_to))
            if d is not None
        ]
        cand = cand_parts[0]
        for p in cand_parts[1:]:
            cand = cand.unionByName(p)
        cand = cand.distinct()

        def side(version: int | None) -> DataFrame:
            snap = self.read(version).withColumn("_k", kstruct)
            snap = snap.join(F.broadcast(cand), "_k", "left_semi")
            cols = sorted(c for c in snap.columns if c != "_k")
            h = F.md5(F.to_json(F.struct(*cols)))
            return snap.groupBy("_k", h.alias("_h")).agg(
                F.count(F.lit(1)).alias("_n")
            )

        a = side(from_version)
        b = side(to_version)
        delta = (
            a.withColumnRenamed("_n", "_na")
            .join(b.withColumnRenamed("_n", "_nb"), ["_k", "_h"], "full_outer")
            .filter(
                F.coalesce(F.col("_na"), F.lit(0)) != F.coalesce(F.col("_nb"), F.lit(0))
            )
            .select("_k")
            .distinct()
        )
        pres_a = a.groupBy("_k").agg(F.sum("_n").alias("n_from"))
        pres_b = b.groupBy("_k").agg(F.sum("_n").alias("n_to"))
        return (
            delta.join(pres_a, "_k", "left")
            .join(pres_b, "_k", "left")
            .select(
                *[F.col(f"_k.{k}").alias(k) for k in keys],
                F.when(F.col("n_from").isNotNull() & F.col("n_to").isNotNull(), "update")
                .when(F.col("n_to").isNotNull(), "insert")
                .otherwise("delete")
                .alias("change_type"),
                F.coalesce(F.col("n_from"), F.lit(0)).cast("long").alias("n_from"),
                F.coalesce(F.col("n_to"), F.lit(0)).cast("long").alias("n_to"),
            )
        )

    # --- maintenance --------------------------------------------------

    def optimize(self, *, target_file_bytes: int = 128 * 1024 * 1024,
                 min_files_to_compact: int = 2) -> int:
        """Bin-pack the CURRENT version's small files into
        ~``target_file_bytes`` files, committed as a new version — the
        versioned twin of ``sinks.compact_parquet_table`` (streaming
        appends accrete a file per micro-batch; scans shouldn't pay a
        file-open per batch forever).  Partition groups already within
        budget are SHARED by reference, over-budget groups rewrite;
        older versions keep reading their original files until vacuum.
        Returns the new version id, or the current one when everything
        was already compact (no empty commit)."""
        import math

        m = self._load_manifest()
        entries = self._files_of(None)
        if not entries:
            return m["current"]
        groups: dict[str | None, list[dict]] = {}
        for e in entries:
            groups.setdefault(e["partition"], []).append(e)

        batch_dir = os.path.join(self.data_dir, uuid.uuid4().hex[:12])
        new_entries: list = []
        rewrote = False
        for gi, (part, es) in enumerate(sorted(groups.items(), key=lambda kv: str(kv[0]))):
            sizes = sum(os.path.getsize(e["path"]) for e in es)
            n_target = max(1, math.ceil(sizes / target_file_bytes))
            if len(es) < max(min_files_to_compact, n_target + 1):
                new_entries.extend(es)  # already compact: share by reference
                continue
            rewrote = True
            sub = os.path.join(batch_dir, f"g{gi}")
            (
                self.spark.read.parquet(*[e["path"] for e in es])
                .repartition(n_target)
                .write.mode("error")
                .parquet(sub)
            )
            new_entries.extend(
                {"path": os.path.join(dp, f), "partition": part}
                for dp, _, fs in os.walk(sub)
                for f in fs
                if f.endswith(".parquet")
            )
        if not rewrote:
            return m["current"]
        return self._commit(m, sorted(new_entries, key=lambda e: e["path"]), "optimize")

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
            referenced.update(e["path"] for e in m["versions"][v]["files"])
        all_files = {
            os.path.join(dp, f)
            for dp, _, fs in os.walk(self.data_dir)
            for f in fs
            if f.endswith(".parquet")
        }
        doomed = all_files - referenced
        for f in doomed:
            os.remove(f)
        retired = m.get("retired_ops", [])
        retired += [
            e["op"] for v, e in m["versions"].items() if v not in keep
        ]
        m["retired_ops"] = retired  # keeps *_once tokens valid post-vacuum
        m["versions"] = {v: e for v, e in m["versions"].items() if v in keep}
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.manifest_path)
        for v in range(1, m["current"] - keep_last + 1):  # stale claim files
            claim = self._claim_path(v)
            if os.path.exists(claim):
                os.remove(claim)
        return len(doomed)
