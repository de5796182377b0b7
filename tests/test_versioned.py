"""Versioned table: time travel, incremental consumption, rollback, vacuum."""

from __future__ import annotations

import pytest

from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_append_time_travel_and_changes(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    assert t.current_version == 0
    v1 = t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    v2 = t.append(spark.createDataFrame([("b", 2)], "k string, v int"))
    v3 = t.append(spark.createDataFrame([("c", 3)], "k string, v int"))
    assert (v1, v2, v3) == (1, 2, 3)

    # time travel: every version readable as it was
    assert _rows(t.read(1)) == [("a", 1)]
    assert _rows(t.read(2)) == [("a", 1), ("b", 2)]
    assert _rows(t.read()) == [("a", 1), ("b", 2), ("c", 3)]

    # incremental consumer: only the delta since its checkpoint
    assert _rows(t.changes_since(1)) == [("b", 2), ("c", 3)]
    assert t.changes_since(3).count() == 0


def test_merge_versions_and_rollback(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt2"))
    t.merge(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), ["k"])
    t.merge(spark.createDataFrame([("b", 99), ("c", 3)], "k string, v int"), ["k"])
    assert _rows(t.read()) == [("a", 1), ("b", 99), ("c", 3)]
    assert _rows(t.read(1)) == [("a", 1), ("b", 2)]  # pre-merge snapshot intact

    # rollback restores v1's content as a NEW auditable version
    v3 = t.rollback(1)
    assert v3 == 3
    assert _rows(t.read()) == [("a", 1), ("b", 2)]
    assert _rows(t.read(2)) == [("a", 1), ("b", 99), ("c", 3)]  # history kept


def test_snapshot_isolation_until_vacuum(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt3"))
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    reader_pin = t.read(1)  # reader loads the v1 snapshot
    t.merge(spark.createDataFrame([("a", 100)], "k string, v int"), ["k"])
    # concurrent commit does not disturb the pinned snapshot
    assert _rows(reader_pin) == [("a", 1)]

    # vacuum keeps the last 1 version -> v1's files go away
    deleted = t.vacuum(keep_last=1)
    assert deleted > 0
    assert _rows(t.read()) == [("a", 100)]
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(1)


def test_vacuum_never_touches_referenced_files(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt4"))
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    t.append(spark.createDataFrame([("b", 2)], "k string, v int"))
    t.append(spark.createDataFrame([("c", 3)], "k string, v int"))
    # keep_last=2 keeps v2 and v3; v1's files are SHARED by v2/v3
    # (append lineage) so nothing is deletable
    assert t.vacuum(keep_last=2) == 0
    assert _rows(t.read()) == [("a", 1), ("b", 2), ("c", 3)]
    assert _rows(t.read(2)) == [("a", 1), ("b", 2)]


def test_streaming_producer_incremental_consumer(spark, tmp_path):
    """The full incremental pipeline: a file stream appends a version
    per micro-batch; a consumer job checkpoints the version it has
    processed and reads ONLY the delta files on each run."""
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.streaming.ingest import stream_file_source

    watch = tmp_path / "in"
    watch.mkdir()
    (watch / "b1.csv").write_text("k\tv\na\t1\nb\t2\n")
    (watch / "b2.csv").write_text("k\tv\nc\t3\n")

    t = VersionedParquetTable(spark, str(tmp_path / "vt5"))
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("v", T.IntegerType())])
    stream = stream_file_source(spark, str(watch), schema, fmt="csv")
    q = (stream.writeStream
         .foreachBatch(lambda batch, _bid: t.append(batch))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert t.current_version == 2

    # consumer run 1: processes everything, checkpoints version 2
    seen = _rows(t.changes_since(0))
    assert seen == [("a", 1), ("b", 2), ("c", 3)]
    consumer_ckpt = t.current_version

    # new micro-batch arrives; consumer run 2 sees ONLY the delta
    (watch / "b3.csv").write_text("k\tv\nd\t4\n")
    stream2 = stream_file_source(spark, str(watch), schema, fmt="csv")
    q2 = (stream2.writeStream
          .foreachBatch(lambda batch, _bid: t.append(batch))
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert _rows(t.changes_since(consumer_ckpt)) == [("d", 4)]


def test_partitioned_merge_shares_untouched_files(spark, tmp_path):
    """Iceberg-style sharing: a merge touching one partition must reuse
    every other partition's files BY REFERENCE (identical paths across
    versions), and old versions must still read correctly."""
    t = VersionedParquetTable(spark, str(tmp_path / "vt6"))
    base = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("b", "2024-01-02", 2), ("c", "2024-01-03", 3)],
        "k string, d string, v int",
    )
    t.merge(base, ["k", "d"], partition_by="d")
    v1_files = {e["path"]: e["partition"] for e in t._files_of(1)}
    assert set(v1_files.values()) == {"2024-01-01", "2024-01-02", "2024-01-03"}

    batch = spark.createDataFrame(
        [("b", "2024-01-02", 99), ("x", "2024-01-02", 7)], "k string, d string, v int"
    )
    t.merge(batch, ["k", "d"], partition_by="d")
    v2_files = {e["path"]: e["partition"] for e in t._files_of(2)}

    shared = set(v1_files) & set(v2_files)
    assert {v1_files[p] for p in shared} == {"2024-01-01", "2024-01-03"}
    assert all(v2_files[p] == "2024-01-02"
               for p in set(v2_files) - shared)

    got = {(r["k"], r["d"]): r["v"] for r in t.read().collect()}
    assert got == {("a", "2024-01-01"): 1, ("b", "2024-01-02"): 99,
                   ("c", "2024-01-03"): 3, ("x", "2024-01-02"): 7}
    # time travel to v1 still exact
    old = {(r["k"], r["d"]): r["v"] for r in t.read(1).collect()}
    assert old == {("a", "2024-01-01"): 1, ("b", "2024-01-02"): 2,
                   ("c", "2024-01-03"): 3}
    # delta since v1 = only the rewritten partition's rows
    assert {(r["k"], r["v"]) for r in t.changes_since(1).collect()} == \
        {("b", 99), ("x", 7)}


def test_optimize_compacts_as_new_version(spark, tmp_path):
    """Many micro-batch appends -> optimize bin-packs into few files as
    a NEW version; the pre-optimize version still reads its original
    files; a second optimize no-ops (no empty commits)."""
    t = VersionedParquetTable(spark, str(tmp_path / "vt7"))
    for i in range(6):
        t.append(spark.createDataFrame([(f"k{i}", i)], "k string, v int"))
    assert t.current_version == 6
    n_files_before = len(t._files_of(None))
    assert n_files_before >= 6

    v = t.optimize(target_file_bytes=1 << 20)
    assert v == 7
    assert len(t._files_of(None)) < n_files_before
    assert _rows(t.read()) == [(f"k{i}", i) for i in range(6)]
    assert _rows(t.read(6)) == [(f"k{i}", i) for i in range(6)]  # time travel

    assert t.optimize(target_file_bytes=1 << 20) == 7  # already compact

    # vacuum after optimize drops the small pre-compaction files
    assert t.vacuum(keep_last=1) > 0
    assert _rows(t.read()) == [(f"k{i}", i) for i in range(6)]


def test_commit_conflict_never_clobbers_the_winner(spark, tmp_path):
    """Lost-update protection: a committer holding a STALE manifest must
    get CommitConflict, not silently overwrite the winner's version."""
    import pytest

    from sap_data_pipeline_spark.sources.versioned import CommitConflict

    t = VersionedParquetTable(spark, str(tmp_path / "vt8"))
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))

    stale = t._load_manifest()  # writer B reads...
    t.append(spark.createDataFrame([("b", 2)], "k string, v int"))  # A wins v2

    files = t._write_files(spark.createDataFrame([("c", 3)], "k string, v int"))
    with pytest.raises(CommitConflict):
        t._commit(stale, stale["versions"]["1"]["files"] + files, "append")
    # the winner's commit is intact
    assert _rows(t.read()) == [("a", 1), ("b", 2)]

    # append()'s auto-retry resolves the race: all three rows land
    t2 = VersionedParquetTable(spark, str(tmp_path / "vt8"))
    t2.append(spark.createDataFrame([("c", 3)], "k string, v int"))
    assert _rows(t2.read()) == [("a", 1), ("b", 2), ("c", 3)]


def test_crash_roll_forward_adopts_orphan_claim(spark, tmp_path):
    """A committer that died between claim and pointer swap leaves an
    orphan claim file; the next reader adopts it instead of conflicting
    forever (its data files were fully written before the claim)."""
    import json
    import os

    t = VersionedParquetTable(spark, str(tmp_path / "vt9"))
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))

    # simulate the crash: claim v2 exists, pointer still at v1
    files = t._write_files(spark.createDataFrame([("b", 2)], "k string, v int"))
    m = t._load_manifest()
    m["versions"]["2"] = {"files": m["versions"]["1"]["files"] + files,
                          "op": "append", "parent": 1, "ts": 0}
    m["current"] = 2
    with open(t._claim_path(2), "w") as f:
        json.dump(m, f)
    # pointer NOT updated — a fresh handle must roll forward to v2
    t2 = VersionedParquetTable(spark, str(tmp_path / "vt9"))
    assert t2.current_version == 2
    assert _rows(t2.read()) == [("a", 1), ("b", 2)]
    # and the next commit proceeds normally as v3
    t2.append(spark.createDataFrame([("c", 3)], "k string, v int"))
    assert t2.current_version == 3


def _diff_rows(df):
    return sorted(
        (r["k"], r["change_type"], r["n_from"], r["n_to"]) for r in df.collect()
    )


def test_diff_insert_update_delete(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int"),
        ["k"],
    )
    # v2: update b, delete c (merge has no delete — simulate via a
    # fresh-content merge), insert d
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 20), ("d", 4)], "k string, v int"),
        ["k"],
    )
    got = _diff_rows(t.diff(["k"], 1, 2))
    # unpartitioned merge rewrites everything, but 'a' is identical on
    # both sides and must NOT appear
    assert got == [
        ("b", "update", 1, 1),
        ("d", "insert", 0, 1),
    ]
    # same version on both sides: empty diff, stable schema
    empty = t.diff(["k"], 2, 2)
    assert empty.count() == 0
    assert empty.columns == ["k", "change_type", "n_from", "n_to"]


def test_diff_append_lineage_counts_duplicates(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    got = _diff_rows(t.diff(["k"], 1, 2))
    # duplicate-key append: 'a' now has TWO identical rows — honest
    # multiset answer is an update with n 1→2; 'b' is a plain insert
    assert got == [
        ("a", "update", 1, 2),
        ("b", "insert", 0, 1),
    ]


def test_diff_sees_through_rollback_and_shares_files(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"),
        ["k"], partition_by="k",
    )
    t.merge(
        spark.createDataFrame([("b", 20)], "k string, v int"),
        ["k"], partition_by="k",
    )
    assert _diff_rows(t.diff(["k"], 1, 2)) == [("b", "update", 1, 1)]
    # deleting via rollback: diff(2 -> 3) must report b's value restored
    t.rollback(1)
    assert _diff_rows(t.diff(["k"], 2, 3)) == [("b", "update", 1, 1)]
    # and v1 vs v3 are file-identical: zero changed files, empty diff
    assert t.diff(["k"], 1, 3).count() == 0


def test_merge_once_skips_replayed_batch(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    b1 = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    assert t.merge_once(b0, ["k"], op_token="cdc:0") == 1
    assert t.merge_once(b1, ["k"], op_token="cdc:1") == 2
    # replay of batch 1: content-equal but must not mint a version
    assert t.merge_once(b1, ["k"], op_token="cdc:1") is None
    assert t.current_version == 2
    assert _rows(t.read()) == [("a", 1), ("b", 20), ("c", 3)]
    # diff across the batches reflects exactly one logical change set
    assert _diff_rows(t.diff(["k"], 1, 2)) == [
        ("b", "update", 1, 1),
        ("c", "insert", 0, 1),
    ]


def test_append_once_token_survives_vacuum(spark, tmp_path):
    """Exactly-once must outlive retention: vacuum prunes the version
    that carried a stream batch's token, yet the replayed batch still
    no-ops (tokens are retired into the manifest, not dropped)."""
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    b = spark.createDataFrame([("a", 1)], "k string, v int")
    assert t.append_once(b, op_token="stream-append:s:0") == 1
    for i in range(3):  # push the token's version out of retention
        t.append(spark.createDataFrame([(f"x{i}", i)], "k string, v int"))
    t.vacuum(keep_last=2)
    assert t.append_once(b, op_token="stream-append:s:0") is None
    assert t.read().count() == 4  # no duplicate rows


def test_diff_handles_null_keys(spark, tmp_path):
    """NULL-keyed rows must appear in the diff like any other (plain
    equi-joins would silently drop them: NULL != NULL)."""
    t = VersionedParquetTable(spark, str(tmp_path / "vt"))
    t.append(spark.createDataFrame([(None, 1), ("a", 1)], "k string, v int"))
    t.append(spark.createDataFrame([(None, 2)], "k string, v int"))
    got = _diff_rows(t.diff(["k"], 1, 2))
    assert got == [(None, "update", 1, 2)]
