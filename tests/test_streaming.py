"""Structured-Streaming ingestion: watch folder → foreachBatch MERGE,
exactly-once via checkpoint, windowed agg parity with batch."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_data_pipeline_spark.operators.merge import ParquetMergeTable
from sap_data_pipeline_spark.streaming.ingest import (
    sessionize,
    stream_file_source,
    stream_merge_sink,
    windowed_event_agg,
)

SCHEMA = T.StructType([
    T.StructField("Article", T.StringType()),
    T.StructField("Site", T.StringType()),
    T.StructField("Qty", T.DoubleType()),
])


def _write_csv(path, rows):
    path.write_text("Article\tSite\tQty\n" + "\n".join("\t".join(map(str, r)) for r in rows) + "\n")


def test_stream_merge_ingestion(spark, tmp_path):
    watch = tmp_path / "watch"
    watch.mkdir()
    _write_csv(watch / "f1.csv", [("a", "s1", 1.0), ("b", "s1", 2.0)])
    _write_csv(watch / "f2.csv", [("a", "s1", 9.0)])  # re-delivery: upserts

    table = ParquetMergeTable(spark, str(tmp_path / "fact"), keys=["Article", "Site"])
    stream = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q = stream_merge_sink(stream, table, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    rows = {(r["Article"], r["Site"]): r["Qty"] for r in table.read().collect()}
    assert rows[("b", "s1")] == 2.0
    assert rows[("a", "s1")] in (1.0, 9.0)  # file order decides survivor
    n_after_first = table.read().count()

    # restart with same checkpoint: no files re-processed (exactly-once)
    stream2 = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q2 = stream_merge_sink(stream2, table, checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    assert table.read().count() == n_after_first

    # new file arrives → picked up incrementally
    _write_csv(watch / "f3.csv", [("c", "s2", 7.0)])
    stream3 = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q3 = stream_merge_sink(stream3, table, checkpoint_dir=str(tmp_path / "ckpt"))
    q3.awaitTermination(60)
    rows = {(r["Article"], r["Site"]): r["Qty"] for r in table.read().collect()}
    assert rows[("c", "s2")] == 7.0


def test_windowed_event_agg_batch_parity(spark, star):
    """The streaming agg plan, applied to the batch events table, matches a
    plain groupBy — watermark is a no-op on batch input."""
    streamed_shape = windowed_event_agg(star.events)
    expected = (
        star.events.groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert streamed_shape.count() == expected


def test_sessionize_semantics(spark):
    """Events within the gap chain into one session; a gap >= 6h splits.
    session_end = last event + gap."""
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 03:00:00", 2.0),   # +3h → same session
        (1, "2024-01-01 10:00:00", 4.0),   # +7h → new session
        (2, "2024-01-01 00:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["user_id"], str(r["session_start"])): r
        for r in sessionize(df, gap="6 hours").collect()
    }
    s1 = out[(1, "2024-01-01 00:00:00")]
    assert s1["n_events"] == 2 and s1["total_value"] == 3.0
    assert str(s1["session_end"]) == "2024-01-01 09:00:00"
    s2 = out[(1, "2024-01-01 10:00:00")]
    assert s2["n_events"] == 1
    assert len(out) == 3


def test_sessionize_on_stream_with_watermark(spark, star, tmp_path):
    """sessionize runs as a real streaming query with a watermark."""
    src = tmp_path / "sess_src"
    star.events.limit(300).write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .parquet(str(src))
    )
    q = (
        sessionize(stream, gap="6 hours", watermark="12 hours")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) AS n FROM sessions").collect()[0]["n"] > 0


def test_windowed_event_agg_on_stream(spark, star, tmp_path):
    """Same plan on a real stream via a parquet file source."""
    src = tmp_path / "events_src"
    star.events.limit(200).write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .parquet(str(src))
    )
    agg = windowed_event_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM win_agg").collect()[0]["n"]
    assert got > 0


def test_running_totals_stateful(spark, star, tmp_path):
    """applyInPandasWithState running totals: streaming result equals the
    batch groupBy over the same input."""
    from sap_data_pipeline_spark.streaming.stateful import running_totals

    src = tmp_path / "rt_src"
    sample = star.events.select("user_id", "ts", "value").limit(400)
    sample.write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update-mode memory sink appends every emitted update; the final
    # state per key is the last emission — compare against batch truth
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn FROM running_totals)
               WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_interval_join_matches_batch(spark, star, tmp_path):
    """Stream-stream interval join (purchases × prior clicks within 1h)
    equals the same join run as a plain batch query."""
    from sap_data_pipeline_spark.streaming.ingest import stream_interval_join

    ev = star.events.select("event_id", "user_id", "ts", "event_type", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    psrc, csrc = tmp_path / "p_src", tmp_path / "c_src"
    purchases.write.parquet(str(psrc))
    clicks.write.parquet(str(csrc))

    pstream = spark.readStream.schema(purchases.schema).parquet(str(psrc))
    cstream = spark.readStream.schema(clicks.schema).parquet(str(csrc))
    joined = stream_interval_join(
        pstream, cstream, ["user_id"], left_ts="p_ts", right_ts="c_ts", within="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["p_id"], r["c_id"])
        for r in spark.sql("SELECT p_id, c_id FROM ssjoin").collect()
    }
    want = {
        (r["p_id"], r["c_id"])
        for r in stream_interval_join(
            purchases, clicks, ["user_id"], left_ts="p_ts", right_ts="c_ts", within="1 hour"
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_interval_join_payload_collision_rejected(spark, star):
    """Shared non-key payload names would emit duplicate output columns;
    the join must refuse them up front (same contract as asof_join)."""
    import pytest

    from sap_data_pipeline_spark.streaming.ingest import stream_interval_join

    ev = star.events.select("user_id", "ts", "value")
    with pytest.raises(ValueError, match="collision"):
        stream_interval_join(
            ev, ev, ["user_id"], left_ts="ts", right_ts="ts", within="1 hour"
        )


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Re-delivered event ids within the watermark window must reach an
    append-only sink exactly once; state stays bounded by the watermark."""
    import json

    from pyspark.sql import types as T

    from sap_data_pipeline_spark.streaming.ingest import dedup_stream_within_watermark

    src = tmp_path / "events_in"
    src.mkdir()
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T10:01:00", "value": 2.0},
        {"event_id": 1, "ts": "2024-01-01T10:00:00", "value": 1.0},  # dup
        {"event_id": 3, "ts": "2024-01-01T10:05:00", "value": 3.0},
        {"event_id": 2, "ts": "2024-01-01T10:01:00", "value": 2.0},  # dup
    ]
    (src / "batch.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.format("json").schema(schema).load(str(src))
    )
    deduped = dedup_stream_within_watermark(stream, ["event_id"])
    out = tmp_path / "events_out"
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 3]


def test_stream_curate_corpus(spark, tmp_path):
    """Streaming curation: low-quality docs gated out, re-delivered
    content (same normalized text, different doc_id) lands exactly once,
    and a later micro-batch adds only new content."""
    import json

    from sap_data_pipeline_spark.streaming.ingest import stream_curate_corpus

    watch = tmp_path / "corpus_in"
    watch.mkdir()
    good = ("the quick brown fox jumps over the lazy dog near the river "
            "bank with many common words appearing throughout this text")
    other = ("completely different content about machine learning and "
             "the data pipelines that process it for training models")
    rows = [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": "  THE quick  brown fox jumps over the lazy dog near the river bank with many common words appearing throughout this text"},  # re-delivery: normalizes equal to doc 1
        {"doc_id": 3, "text": "!!!! ????"},  # quality-gated
        {"doc_id": 4, "text": other},
    ]
    (watch / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    out = tmp_path / "curated_stream"
    q = stream_curate_corpus(
        spark, str(watch), schema, str(out),
        checkpoint_dir=str(tmp_path / "ckpt_cur"), min_quality=0.5,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(out))
    fps = [r["fingerprint"] for r in got.collect()]
    assert len(fps) == len(set(fps)) == 2        # docs 1/2 collapsed, 3 gated
    ids = {r["doc_id"] for r in got.collect()}
    assert 3 not in ids and 4 in ids and (1 in ids or 2 in ids)

    # second batch: one duplicate of doc 4's content + one new doc
    (watch / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 5, "text": other.upper()},    # dup within watermark
        {"doc_id": 6, "text": "yet another entirely new document with plenty of the usual filler words inside it"},
    ]))
    q2 = stream_curate_corpus(
        spark, str(watch), schema, str(out),
        checkpoint_dir=str(tmp_path / "ckpt_cur"), min_quality=0.5,
    )
    q2.awaitTermination(120)
    final = spark.read.parquet(str(out))
    assert final.count() == 3                    # only doc 6 added
    assert {r["doc_id"] for r in final.collect()} >= {6}


def test_stream_curate_incremental_signature_store(spark, tmp_path):
    """Incremental near-dedup: batch 2 must drop a NEAR-dup of a batch-1
    doc by probing the accumulated signature store (no corpus re-LSH),
    drop an exact re-delivery via the stored fingerprints, and accept
    genuinely new content."""
    import json

    from sap_data_pipeline_spark.streaming.ingest import (
        stream_curate_corpus_incremental,
    )

    watch = tmp_path / "inc_in"
    watch.mkdir()
    good = ("the quick brown fox jumps over the lazy dog near the river "
            "bank with many common words appearing throughout this text")
    other = ("completely different content about machine learning and "
             "the data pipelines that process it for training models")
    near = ("the quick brown fox jumps over the lazy dog near the river "
            "bank with many common words appearing throughout this story")
    fresh = ("yet another entirely new document with plenty of the usual "
             "filler words inside it for the quality gate to accept")
    (watch / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": other},
    ]))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    out, store = tmp_path / "inc_out", tmp_path / "inc_store"
    kwargs = dict(
        checkpoint_dir=str(tmp_path / "ckpt_inc"),
        signature_store=str(store), min_quality=0.5,
    )
    q = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out), **kwargs)
    q.awaitTermination(120)
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1, 2}
    n_store_rows = spark.read.parquet(str(store)).count()
    assert n_store_rows > 0

    (watch / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 3, "text": near},            # near-dup of doc 1 → store probe drops
        {"doc_id": 4, "text": good.upper()},    # exact re-delivery → fingerprint drops
        {"doc_id": 5, "text": fresh},           # genuinely new → accepted
    ]))
    q2 = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out), **kwargs)
    q2.awaitTermination(120)
    final = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert final == {1, 2, 5}
    # store grew only by the accepted doc's banded entries
    store_ids = {r["doc_id"] for r in spark.read.parquet(str(store)).collect()}
    assert store_ids == {1, 2, 5}

    # full replay (fresh checkpoint, same files): the fingerprint probe
    # against the store must drop every re-delivered doc — corpus and
    # store row counts are unchanged (exactly-once under replay)
    n_out = spark.read.parquet(str(out)).count()
    n_store = spark.read.parquet(str(store)).count()
    q3 = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out),
        checkpoint_dir=str(tmp_path / "ckpt_inc_replay"),
        signature_store=str(store), min_quality=0.5,
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == n_out
    assert spark.read.parquet(str(store)).count() == n_store


def test_stream_deletion_sink_erasure_requests(spark, tmp_path):
    """GDPR-stream: forget-list files arriving in a watch folder delete
    their keys from the corpus table, exactly once, incrementally."""
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.streaming.ingest import stream_deletion_sink

    table = ParquetMergeTable(spark, str(tmp_path / "corpus"), keys=["doc_id"])
    table.merge(spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"))

    watch = tmp_path / "erasures"
    watch.mkdir()
    (watch / "req1.csv").write_text("doc_id\n3\n7\n")

    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    stream = stream_file_source(spark, str(watch), schema, fmt="csv")
    q = stream_deletion_sink(stream, table,
                             checkpoint_dir=str(tmp_path / "ckpt_del"))
    q.awaitTermination(120)
    assert {r["doc_id"] for r in table.read().collect()} == \
        set(range(10)) - {3, 7}

    # restart with same checkpoint: request not re-applied (and would
    # no-op anyway); a new request is picked up incrementally
    (watch / "req2.csv").write_text("doc_id\n0\n3\n")  # 3 already gone
    stream2 = stream_file_source(spark, str(watch), schema, fmt="csv")
    q2 = stream_deletion_sink(stream2, table,
                              checkpoint_dir=str(tmp_path / "ckpt_del"))
    q2.awaitTermination(120)
    assert {r["doc_id"] for r in table.read().collect()} == \
        set(range(10)) - {0, 3, 7}
    assert table.history[-1]["deleted"] == 1  # idempotent on the re-sent key


def test_stream_enrich_dims_broadcast_join(spark, tmp_path):
    """Stream-static enrichment: each micro-batch joins the static dim
    map-side; left join keeps dim-miss rows with NULLs (late-registered
    keys are backfillable, never silently dropped)."""
    from sap_data_pipeline_spark.streaming.ingest import stream_enrich_dims

    watch = tmp_path / "watch_enrich"
    watch.mkdir()
    _write_csv(watch / "f1.csv", [("a", "s1", 1.0), ("b", "s2", 2.0), ("x", "s9", 3.0)])

    dim = spark.createDataFrame(
        [("s1", "west"), ("s2", "east")], ["Site", "Region"]
    )
    stream = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    enriched = stream_enrich_dims(stream, dim, "Site")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["Article"]: r["Region"]
        for r in spark.sql("SELECT * FROM enriched_sink").collect()
    }
    assert rows == {"a": "west", "b": "east", "x": None}


def test_stream_versioned_append_exactly_once(spark, tmp_path):
    """Streaming → versioned table: one version per micro-batch, shared
    prior files, and a redelivered batch (at-least-once foreachBatch)
    commits NOTHING the second time."""
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_versioned_append_sink,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    _write_csv(watch / "f1.csv", [("a", "s1", 1.0), ("b", "s1", 2.0)])
    _write_csv(watch / "f2.csv", [("c", "s2", 3.0)])

    table = VersionedParquetTable(spark, str(tmp_path / "vt"))
    stream = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q = stream_versioned_append_sink(
        stream, table, checkpoint_dir=str(tmp_path / "ckpt"), stream_id="s"
    )
    q.awaitTermination(120)

    # one file per trigger → two versions, both time-travelable
    assert table.current_version == 2
    assert table.read().count() == 3
    assert table.read(1).count() in (1, 2)  # batch order decides

    # redelivery of an already-committed batch: no-op, version unmoved
    batch0 = spark.createDataFrame([("a", "s1", 1.0)], "Article string, Site string, Qty double")
    assert table.append_once(batch0, op_token="stream-append:s:0") is None
    assert table.current_version == 2
    assert table.read().count() == 3

    # incremental consumer sees only the delta; restart processes nothing
    assert table.changes_since(1).count() == table.read().count() - table.read(1).count()
    stream2 = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q2 = stream_versioned_append_sink(
        stream2, table, checkpoint_dir=str(tmp_path / "ckpt"), stream_id="s"
    )
    q2.awaitTermination(60)
    assert table.current_version == 2


def test_stream_curate_incremental_versioned_sink(spark, tmp_path):
    """versioned=True: each surviving micro-batch is one time-travelable
    version of the curated corpus, committed exactly-once."""
    import json

    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_curate_corpus_incremental,
    )

    watch = tmp_path / "vc_in"
    watch.mkdir()
    d1 = ("the quick brown fox jumps over the lazy dog near the river "
          "bank with many common words appearing throughout this text")
    d2 = ("completely different content about machine learning and "
          "the data pipelines that process it for training models")
    (watch / "b1.jsonl").write_text(json.dumps({"doc_id": 1, "text": d1}))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    out = tmp_path / "vc_out"
    kwargs = dict(
        checkpoint_dir=str(tmp_path / "vc_ckpt"),
        signature_store=str(tmp_path / "vc_store"),
        min_quality=0.5, versioned=True,
    )
    q = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out), **kwargs)
    q.awaitTermination(120)
    t = VersionedParquetTable(spark, str(out))
    assert t.current_version == 1
    assert {r["doc_id"] for r in t.read().collect()} == {1}

    (watch / "b2.jsonl").write_text(json.dumps({"doc_id": 2, "text": d2}))
    q2 = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out), **kwargs)
    q2.awaitTermination(120)
    assert t.current_version == 2
    assert {r["doc_id"] for r in t.read(1).collect()} == {1}      # time travel
    assert {r["doc_id"] for r in t.read().collect()} == {1, 2}
    assert _diff_rows_docs(t.diff(["doc_id"], 1, 2)) == [(2, "insert")]

    # replay with a fresh checkpoint: fingerprint probe empties the
    # batch, merge_once backstops — no phantom versions either way
    q3 = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out),
        checkpoint_dir=str(tmp_path / "vc_ckpt_replay"),
        signature_store=str(tmp_path / "vc_store"),
        min_quality=0.5, versioned=True)
    q3.awaitTermination(120)
    assert t.current_version == 2


def _diff_rows_docs(df):
    return sorted((r["doc_id"], r["change_type"]) for r in df.collect())


def test_stream_interval_join_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """leftOuter stream-stream interval join: a purchase with no prior
    click must surface with NULL click columns — but only once the
    watermark has passed its eviction bound (pushed here by a later
    sentinel row), which is exactly the bounded-state outer-join
    semantics."""
    import datetime as dt

    from sap_data_pipeline_spark.streaming.ingest import stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    psrc, csrc = tmp_path / "po_src", tmp_path / "co_src"
    spark.createDataFrame(
        [(1, t0, 101), (1, t0 + dt.timedelta(minutes=30), 102)],
        "user_id long, p_ts timestamp, p_id long",
    ).write.parquet(str(psrc))
    spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=10), 201)],
        "user_id long, c_ts timestamp, c_id long",
    ).write.parquet(str(csrc))
    # purchase 101 matches click 201 (10 min prior); purchase 102 has no
    # click within the hour BEFORE it?  201 is 40 min prior → matches too;
    # so use a third purchase far outside any click window:
    spark.createDataFrame(
        [(2, t0 + dt.timedelta(minutes=5), 103)],
        "user_id long, p_ts timestamp, p_id long",
    ).write.mode("append").parquet(str(psrc))

    out = tmp_path / "outer_out"

    def run():
        pstream = spark.readStream.schema(
            "user_id long, p_ts timestamp, p_id long").parquet(str(psrc))
        cstream = spark.readStream.schema(
            "user_id long, c_ts timestamp, c_id long").parquet(str(csrc))
        joined = stream_interval_join(
            pstream, cstream, ["user_id"], left_ts="p_ts", right_ts="c_ts",
            within="1 hour", left_watermark="10 minutes",
            right_watermark="10 minutes", how="leftOuter",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {
            (r["p_id"], r["c_id"])
            for r in spark.read.parquet(str(out)).select("p_id", "c_id").collect()
        }

    got1 = run()
    assert (101, 201) in got1 and (102, 201) in got1  # inner matches emit

    # future sentinels on BOTH streams: the join's watermark is the MIN
    # of the two inputs, so both must advance before 103's state evicts
    spark.createDataFrame(
        [(9, t0 + dt.timedelta(hours=6), 999)],
        "user_id long, p_ts timestamp, p_id long",
    ).write.mode("append").parquet(str(psrc))
    spark.createDataFrame(
        [(9, t0 + dt.timedelta(hours=6), 998)],
        "user_id long, c_ts timestamp, c_id long",
    ).write.mode("append").parquet(str(csrc))
    got2 = run()
    assert (103, None) in got1 | got2  # the unmatched purchase surfaced


def test_stream_versioned_append_crash_window_redelivery(spark, tmp_path):
    """THE at-least-once crash window: foreachBatch's append_once
    SUCCEEDED but the query died before the streaming checkpoint
    recorded batch 0.  Simulated by committing batch 0's token directly
    (sink effect, no checkpoint), then starting the stream on a cold
    checkpoint — Structured Streaming redelivers batch 0, and the token
    handshake must mint NO phantom version and show incremental
    consumers each batch exactly once."""
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_file_source,
        stream_versioned_append_sink,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    _write_csv(watch / "f1.csv", [("a", "s1", 1.0), ("b", "s1", 2.0)])

    table = VersionedParquetTable(spark, str(tmp_path / "vt"))
    # crash-window state: the batch-0 commit exists, the checkpoint doesn't
    pre = spark.createDataFrame(
        [("a", "s1", 1.0), ("b", "s1", 2.0)],
        "Article string, Site string, Qty double",
    )
    assert table.append_once(pre, op_token="stream-append:s:0") == 1

    # restart from the cold checkpoint: batch 0 (= f1) is redelivered
    stream = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q = stream_versioned_append_sink(
        stream, table, checkpoint_dir=str(tmp_path / "ckpt"), stream_id="s"
    )
    q.awaitTermination(120)
    assert table.current_version == 1          # no phantom version
    assert table.read().count() == 2           # no duplicate rows
    assert table.changes_since(0).count() == 2  # batch seen exactly once

    # the stream continues normally past the healed batch
    _write_csv(watch / "f2.csv", [("c", "s2", 3.0)])
    stream2 = stream_file_source(spark, str(watch), SCHEMA, fmt="csv")
    q2 = stream_versioned_append_sink(
        stream2, table, checkpoint_dir=str(tmp_path / "ckpt"), stream_id="s"
    )
    q2.awaitTermination(120)
    assert table.current_version == 2
    assert table.read().count() == 3
    assert {r["Article"] for r in table.changes_since(1).collect()} == {"c"}


def test_stream_curate_crash_between_merge_and_signature_write(spark, tmp_path):
    """The curation sink's two writes can't commit atomically; this pins
    the worst crash window: merge_once COMMITTED, the signature-store
    append and the streaming checkpoint both lost.  On redelivery the
    fingerprint probe finds nothing (store has no trace), survivors are
    recomputed in full — and the stream-curate token must still prevent
    a phantom version while the signature store heals."""
    import json

    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_curate_corpus_incremental,
    )

    watch = tmp_path / "cw_in"
    watch.mkdir()
    text = ("the quick brown fox jumps over the lazy dog near the river "
            "bank with many common words appearing throughout this text")
    (watch / "b1.jsonl").write_text(json.dumps({"doc_id": 1, "text": text}))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    out = tmp_path / "cw_out"
    store = tmp_path / "cw_store"

    # crash-window state: the version exists (merge_once succeeded for
    # batch 0 of stream 'curate'), but neither the signature store nor
    # the checkpoint recorded anything
    t = VersionedParquetTable(spark, str(out))
    from sap_data_pipeline_spark.functions import text as X

    pre = spark.createDataFrame([(1, text)], "doc_id long, text string") \
        .withColumn("fingerprint", X.md5_fingerprint("text"))
    t.merge_once(pre, ["doc_id"], op_token="stream-curate:curate:0")
    assert t.current_version == 1

    q = stream_curate_corpus_incremental(
        spark, str(watch), schema, str(out),
        checkpoint_dir=str(tmp_path / "cw_ckpt"),
        signature_store=str(store),
        min_quality=0.5, versioned=True)
    q.awaitTermination(120)

    assert t.current_version == 1                       # no phantom version
    assert {r["doc_id"] for r in t.read().collect()} == {1}
    # the signature store healed: redelivery minted the missing entries
    sigs = spark.read.parquet(str(store))
    assert sigs.filter(F.col("doc_id") == 1).count() > 0


def test_cusum_drift_alarms_stateful(spark, tmp_path):
    """CUSUM drift detector: a key whose metric shifts up mid-stream
    alarms 'high' exactly when the one-sided sum crosses threshold; a
    stable key never alarms; the streaming fold equals a plain Python
    CUSUM over the same per-key sequence."""
    import pandas as pd

    from sap_data_pipeline_spark.streaming.stateful import cusum_drift_alarms

    # key 1: 10 on-target values then 10 shifted (+3); key 2: stable
    rows = []
    for i in range(10):
        rows.append((1, i, 10.0))
        rows.append((2, i, 10.0))
    for i in range(10, 20):
        rows.append((1, i, 13.0))
        rows.append((2, i, 10.0))
    src = tmp_path / "cusum_src"
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    # one file per phase so the alarm lands in a later micro-batch
    df.filter("seq < 10").coalesce(1).write.parquet(str(src / "a"))
    df.filter("seq >= 10").coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema("user_id long, seq long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        cusum_drift_alarms(stream, target=10.0, slack=0.5, threshold=5.0,
                           value_col="value")
        .writeStream.format("memory")
        .queryName("cusum")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cusum").collect()
    alarms = {(r["user_id"], r["alarm"]) for r in out}
    assert (1, "high") in alarms            # shifted key alarms high
    assert not any(a in ("high", "low") for k, a in alarms if k == 2)

    # python-fold parity on the final state of the stable key
    shi = slo = 0.0
    for x in [10.0] * 20:
        shi = max(0.0, shi + (x - 10.0 - 0.5))
        slo = max(0.0, slo + (10.0 - x - 0.5))
    final2 = max((r for r in out if r["user_id"] == 2),
                 key=lambda r: r["n_seen"])
    assert (final2["s_hi"], final2["s_lo"]) == (shi, slo)
    assert final2["n_seen"] == 20


def test_cusum_batch_twin_matches_python_fold(spark):
    """The catalog's events_cusum_alarms (array_sort + higher-order
    aggregate batch twin of cusum_drift_alarms) must equal an
    independent Python CUSUM fold over the same ts-ordered per-key
    history — same restart-on-alarm semantics, same final state and
    alarm counts."""
    import pandas as pd

    from sap_data_pipeline_spark.plans.catalog import QUERIES
    from sap_data_pipeline_spark.plans.catalog_ext import (
        _CUSUM_SLACK, _CUSUM_TARGET, _CUSUM_THRESHOLD,
    )

    got = {
        r["user_id"]: r
        for r in QUERIES["events_cusum_alarms"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    T, S, TH = _CUSUM_TARGET, _CUSUM_SLACK, _CUSUM_THRESHOLD
    for uid, g in ev.sort_values(["ts", "value"]).groupby("user_id"):
        shi = slo = 0.0
        nhigh = nlow = 0
        for x in g["value"]:
            shi = max(0.0, shi + (x - T - S))
            slo = max(0.0, slo + (T - x - S))
            if shi > TH:
                nhigh += 1
                shi = slo = 0.0
            elif slo > TH:
                nlow += 1
                shi = slo = 0.0
        r = got[uid]
        assert r["n_seen"] == len(g), uid
        assert (r["s_hi"], r["s_lo"]) == (shi, slo), uid
        assert (r["n_high"], r["n_low"]) == (nhigh, nlow), uid
    assert sum(r["n_high"] + r["n_low"] for r in got.values()) > 0


def test_windowed_approx_distinct_batch_accuracy(spark, star):
    """Batch parity + error gate: per (window, type), the HLL estimate
    must sit within 5% of the exact distinct-user count (the sketch's
    1.6% theoretical rsd at lg_k=12, with slack), and n_events must be
    exact."""
    from sap_data_pipeline_spark.streaming.ingest import windowed_approx_distinct

    got = {
        (str(r["window_start"]), r["event_type"]): r
        for r in windowed_approx_distinct(star.events).collect()
    }
    exact = {
        (str(r["ws"]), r["event_type"]): r
        for r in star.events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("d"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "d")
        .collect()
    }
    assert set(got) == set(exact) and got
    for k, e in exact.items():
        g = got[k]
        assert g["n_events"] == e["n"]
        assert abs(g["approx_distinct"] - e["d"]) <= max(1, 0.05 * e["d"]), (
            k, g["approx_distinct"], e["d"],
        )


def test_windowed_approx_distinct_on_stream(spark, star, tmp_path):
    """Runs as a REAL streaming aggregation (file source, memory sink,
    complete mode): the sketch agg merges across micro-batches and the
    final estimates match the batch run of the same operator."""
    from sap_data_pipeline_spark.streaming.ingest import windowed_approx_distinct

    src = tmp_path / "hll_src"
    star.events.limit(400).repartition(4).write.parquet(str(src))
    batch_df = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)  # force multi-batch merging
        .parquet(str(src))
    )
    q = (
        windowed_approx_distinct(stream)
        .writeStream.format("memory")
        .queryName("hll_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): r["approx_distinct"]
        for r in spark.sql("SELECT * FROM hll_windows").collect()
    }
    want = {
        (str(r["window_start"]), r["event_type"]): r["approx_distinct"]
        for r in windowed_approx_distinct(batch_df).collect()
    }
    assert got == want and got


def test_heavy_hitters_error_bound_and_state_cap(spark, star, tmp_path):
    """Misra-Gries guarantees, asserted against exact batch counts on a
    REAL multi-batch streaming run: every item with true frequency
    > N/(k+1) surfaces; estimates never overcount and undercount by at
    most N/(k+1); and the summary honors the k-counter state cap
    (emit_top=k rows max per key)."""
    from sap_data_pipeline_spark.streaming.stateful import heavy_hitters

    src = tmp_path / "hh_src"
    star.events.limit(600).repartition(3).write.parquet(str(src))
    batch_df = spark.read.parquet(str(src))
    k = 8
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        heavy_hitters(stream, k=k, emit_top=k)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh_out").collect()
    assert rows
    # final summary per key = the emission with the max n_seen
    final: dict = {}
    for r in rows:
        cur = final.setdefault(r["event_type"], {})
        if not cur or r["n_seen"] > next(iter(cur.values()))[1]:
            final[r["event_type"]] = {}
            cur = final[r["event_type"]]
        if r["n_seen"] >= (next(iter(cur.values()))[1] if cur else 0):
            cur[r["item"]] = (r["est_count"], r["n_seen"])

    exact = {
        (r["event_type"], str(r["user_id"])): r["cnt"]
        for r in batch_df.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    totals: dict = {}
    for (et, _), c in exact.items():
        totals[et] = totals.get(et, 0) + c

    for et, counters in final.items():
        assert len(counters) <= k
        bound = totals[et] / (k + 1)
        for item, (est, _) in counters.items():
            true = exact.get((et, item), 0)
            assert est <= true, (et, item, est, true)  # never overcounts
            assert est >= true - bound, (et, item, est, true, bound)
        # every guaranteed-frequent item surfaced
        for (et2, item), c in exact.items():
            if et2 == et and c > bound:
                assert item in counters, (et, item, c, bound)


def test_misra_gries_batch_matches_streaming_and_guarantee(spark, tmp_path):
    """The batch twin replays the EXACT streaming fold: on a one-batch
    stream the final streaming emission and misra_gries_batch produce
    identical counter tables; and the Misra-Gries guarantee holds — the
    item with true frequency > N/(k+1) surfaces in both, with its
    estimate undercounting by at most N/(k+1)."""
    import pandas as pd

    from sap_data_pipeline_spark.streaming.stateful import (
        heavy_hitters,
        misra_gries_batch,
    )

    # skewed single-key stream: user 7 appears 50 times amid 20
    # interleaved singletons; N=70, k=4 -> guarantee bound N/(k+1)=14
    ts = pd.Timestamp("2024-01-01")
    rows = []
    n_singles = 0
    for i in range(70):
        if i % 3 == 2 and n_singles < 20:
            uid = 100 + n_singles
            n_singles += 1
        else:
            uid = 7
        rows.append((ts + pd.Timedelta(seconds=i), "click", uid))
    pdf = pd.DataFrame(rows, columns=["ts", "event_type", "user_id"])
    src = tmp_path / "mg_src"
    src.mkdir()
    pdf.to_parquet(src / "part0.parquet")  # ONE file -> one micro-batch
    batch_df = spark.read.parquet(str(src))

    k = 4
    q = (
        heavy_hitters(
            spark.readStream.schema(batch_df.schema).parquet(str(src)),
            k=k, emit_top=k,
        )
        .writeStream.format("memory")
        .queryName("mg_parity_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["event_type"], r["item"], r["est_count"], r["n_seen"], r["rank"])
        for r in spark.sql("SELECT * FROM mg_parity_out").collect()
    }
    batch_rows = {
        tuple(r) for r in misra_gries_batch(
            batch_df, key_cols=("event_type",), item_col="user_id",
            k=k, emit_top=k,
        ).collect()
    }
    assert stream_rows == batch_rows

    true_freq = 70 - 20
    bound = 70 / (k + 1)
    assert true_freq > bound
    hh = {r[1]: r[2] for r in batch_rows}
    assert "7" in hh  # the guaranteed-frequent item surfaced
    assert true_freq - bound <= hh["7"] <= true_freq  # never overcounts


def test_heavy_hitters_empty_counter_table_emits_nothing(spark, tmp_path):
    """k=1 with all-distinct items: the decrement-all step empties the
    counter table every second item; those batches must emit NO rows —
    never a NULL-item placeholder a max-n_seen consumer would surface
    as a phantom heavy hitter."""
    import pandas as pd

    from sap_data_pipeline_spark.streaming.stateful import heavy_hitters

    src = tmp_path / "hh_empty_src"
    src.mkdir()
    # two single-row files → two micro-batches: batch 1 installs {u1:1},
    # batch 2's distinct item decrements it away (counter table empty)
    for i, user in enumerate(["u1", "u2"]):
        pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01"]).tz_localize(None),
             "event_type": ["click"], "user_id": [user]}
        ).to_parquet(src / f"part{i}.parquet")
    batch_df = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        heavy_hitters(stream, k=1, emit_top=1)
        .writeStream.format("memory")
        .queryName("hh_empty_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh_empty_out").collect()
    assert all(r["item"] is not None for r in rows)
    assert len(rows) == 1 and rows[0]["item"] == "u1"


def test_hll_batch_twin_differential_and_error(spark):
    """events_windowed_distinct_hll (the deterministic batch twin of
    windowed_approx_distinct) must equal an independent Python replay of
    the whole sketch — hash64 bucketing, rank extraction, register
    max-merge, integer harmonic denominator, literal linear-counting
    table — and its estimates must sit within HLL error of the exact
    counts.  Run at sf0.01, where the day-grain cardinalities exercise
    BOTH estimator branches (sf0.001 is all-linear-counting)."""
    import hashlib
    from collections import defaultdict

    import pandas as pd

    from sap_data_pipeline_spark.plans.catalog import QUERIES
    from sap_data_pipeline_spark.plans.catalog_ext import (
        _HLL_LIN, _HLL_M, _HLL_NUMER, _HLL_P, _HLL_SCALE, _HLL_SEED,
    )

    got = {
        (r["day"], r["event_type"]): r
        for r in QUERIES["events_windowed_distinct_hll"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }

    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet")
    groups: dict = defaultdict(list)
    for ts, et, uid in zip(ev["ts"], ev["event_type"], ev["user_id"]):
        groups[(ts.strftime("%Y-%m-%d"), et)].append(uid)

    assert set(got) == set(groups)
    n_lin = n_raw = 0
    rel_errs = []
    for key, uids in groups.items():
        regs: dict[int, int] = {}
        xs = set()
        for uid in uids:
            h = int(
                hashlib.md5(f"s{_HLL_SEED}:{uid}".encode()).hexdigest()[:15],
                16,
            )
            j, x = h & (_HLL_M - 1), h >> _HLL_P
            xs.add((j, x))
            rho = _HLL_SCALE if x == 0 else _HLL_SCALE - x.bit_length()
            regs[j] = max(regs.get(j, 0), rho)
        v = _HLL_M - len(regs)
        denom = sum(1 << (_HLL_SCALE - m) for m in regs.values()) + v * (
            1 << _HLL_SCALE
        )
        e_raw = _HLL_NUMER / denom
        if e_raw <= 2.5 * _HLL_M and v > 0:
            est, n_lin = _HLL_LIN[v - 1], n_lin + 1
        else:
            est, n_raw = e_raw, n_raw + 1
        r = got[key]
        assert r["n_events"] == len(uids), key
        assert r["exact_distinct"] == len(xs) == len(set(uids)), key
        assert r["v_zero"] == v, key
        assert abs(r["approx_distinct"] - est) <= 6e-4, (key, est)
        rel_errs.append(abs(est - len(set(uids))) / len(set(uids)))

    assert n_lin > 0 and n_raw > 0, (n_lin, n_raw)
    # m=16 -> rsd ~1.04/4 = 26%; gate the replayed estimates loosely
    # per-row and tightly in aggregate.
    assert max(rel_errs) <= 1.0
    assert sum(rel_errs) / len(rel_errs) <= 0.35


def test_stream_drift_monitor_psi_per_batch(spark, tmp_path):
    """Streaming drift gate: each micro-batch (one file) is PSI-scored
    against the frozen reference counts; the batch matching the
    reference mix scores ~0, the flipped-mix batch scores high, and a
    restart with the same checkpoint re-scores nothing."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.operators.quality import (
        drift_psi,
        feature_bucket_counts,
    )
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_drift_monitor,
        stream_file_source,
    )

    # reference: 80% en / 20% de, materialized once as bucket counts
    ref = spark.createDataFrame(
        [(i, "en" if i % 5 else "de") for i in range(100)],
        "doc_id long, lang string",
    )
    features = {"lang": F.col("lang")}
    ref_counts = [
        (r["feature"], r["bucket"], r["cnt"])
        for r in feature_bucket_counts(ref, features).collect()
    ]

    watch = tmp_path / "drift_watch"
    watch.mkdir()
    # batch 0 ≈ reference mix; batch 1 = flipped mix
    (watch / "a.csv").write_text(
        "doc_id\tlang\n" + "".join(
            f"{i}\t{'en' if i % 5 else 'de'}\n" for i in range(50)
        )
    )
    (watch / "b.csv").write_text(
        "doc_id\tlang\n" + "".join(
            f"{i}\t{'de' if i % 5 else 'en'}\n" for i in range(50)
        )
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ])
    out = str(tmp_path / "drift_reports")
    q = stream_drift_monitor(
        stream_file_source(spark, str(watch), schema),
        ref_counts, features,
        out_dir=out, checkpoint_dir=str(tmp_path / "ckpt_drift"),
    )
    q.awaitTermination(120)

    reports = spark.read.parquet(out)
    got = {r["batch_id"]: r["psi"] for r in reports.collect()}
    assert len(got) == 2
    low, high = sorted(got.values())
    assert low < 0.01       # reference-mix batch is stable
    assert high > 0.25      # flipped batch crosses the investigate line

    # the streamed scores equal the batch operator on the same slices
    batch_a = spark.createDataFrame(
        [(i, "en" if i % 5 else "de") for i in range(50)],
        "doc_id long, lang string",
    )
    expect_a = drift_psi(ref, batch_a, features).collect()[0]["psi"]
    assert low == expect_a

    # restart on the same checkpoint: nothing re-scored, reports stable
    q2 = stream_drift_monitor(
        stream_file_source(spark, str(watch), schema),
        ref_counts, features,
        out_dir=out, checkpoint_dir=str(tmp_path / "ckpt_drift"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_stream_drift_monitor_cumulative_equals_batch_twin(spark, tmp_path):
    """r10 verdict #7: the incremental monitor's batch-N report must
    equal the batch twin (`drift_psi`, the kernel behind the oracled
    `source_drift_psi`) evaluated on the CUMULATIVE data 0..N — the
    streaming-equals-batch pattern already pinned for heavy hitters and
    CUSUM.  Three micro-batches with shifting language mix; every
    batch's cumulative PSI is checked exactly, and a checkpoint restart
    re-scores nothing."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.operators.quality import (
        drift_psi,
        feature_bucket_counts,
    )
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_drift_monitor,
        stream_file_source,
    )

    ref = spark.createDataFrame(
        [(i, "en" if i % 5 else "de") for i in range(100)],
        "doc_id long, lang string",
    )
    features = {"lang": F.col("lang")}
    ref_counts = [
        (r["feature"], r["bucket"], r["cnt"])
        for r in feature_bucket_counts(ref, features).collect()
    ]

    def rows(n, flip):
        return [(i, ("de" if i % 5 else "en") if flip
                 else ("en" if i % 5 else "de")) for i in range(n)]

    watch = tmp_path / "cum_watch"
    watch.mkdir()
    slices = [rows(50, False), rows(40, True), rows(30, False)]
    for j, sl in enumerate(slices):
        (watch / f"{chr(97 + j)}.csv").write_text(
            "doc_id\tlang\n" + "".join(f"{i}\t{s}\n" for i, s in sl)
        )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ])
    out = str(tmp_path / "cum_reports")
    q = stream_drift_monitor(
        stream_file_source(spark, str(watch), schema),
        ref_counts, features,
        out_dir=out, checkpoint_dir=str(tmp_path / "ckpt_cum"),
        cumulative=True,
    )
    q.awaitTermination(180)

    got = {r["batch_id"]: r["psi"]
           for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [0, 1, 2]

    # exact equality with the batch twin on each cumulative prefix
    for n in range(3):
        cum = [r for sl in slices[: n + 1] for r in sl]
        cum_df = spark.createDataFrame(cum, "doc_id long, lang string")
        expect = drift_psi(ref, cum_df, features).collect()[0]["psi"]
        assert got[n] == expect, (n, got[n], expect)

    # the mix-flipped batch raises cumulative drift; the stable batch 2
    # pulls it back toward the reference mix
    assert got[1] > got[0]
    assert got[2] < got[1]

    # restart on the same checkpoint: nothing re-scored
    q2 = stream_drift_monitor(
        stream_file_source(spark, str(watch), schema),
        ref_counts, features,
        out_dir=out, checkpoint_dir=str(tmp_path / "ckpt_cum"),
        cumulative=True,
    )
    q2.awaitTermination(180)
    assert {r["batch_id"] for r in spark.read.parquet(out).collect()} \
        == {0, 1, 2}


def test_stream_frontier_gate_bloom_admission(spark, tmp_path):
    """Streaming crawl-frontier admission through the Bloom gate:
    batch-0 URLs admit; batch 1 re-offers half of them (rejected — no
    false negatives, ever) plus new ones (admitted); batch 2 re-offers
    EVERYTHING admitted so far (all rejected).  A restart on the same
    checkpoint admits nothing new, and the per-batch state/output dirs
    make replay idempotent by set-union structure."""
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.streaming.ingest import (
        stream_file_source,
        stream_frontier_gate,
    )

    watch = tmp_path / "frontier_watch"
    watch.mkdir()

    def write_batch(name, urls):
        (watch / name).write_text("url\n" + "".join(u + "\n" for u in urls))

    b0 = [f"http://h{i}.com/p" for i in range(100)]
    b1 = b0[:50] + [f"http://n{i}.com/q" for i in range(60)]
    b2 = b0 + [f"http://n{i}.com/q" for i in range(60)]
    write_batch("a.csv", b0)
    write_batch("b.csv", b1)
    write_batch("c.csv", b2)

    schema = T.StructType([T.StructField("url", T.StringType())])
    out = str(tmp_path / "admitted")
    q = stream_frontier_gate(
        stream_file_source(spark, str(watch), schema),
        url_col="url", out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt_frontier"),
        m_bits=1 << 14, k=4,
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    admitted = {}
    for r in rows:
        admitted.setdefault(r["batch_id"], set()).add(r["url"])
    # batch 0: everything new -> all admitted
    assert admitted[0] == set(b0)
    # batch 1: the 50 re-offers rejected (no false negatives); the 60
    # new URLs admitted except documented-rate false positives
    assert not (admitted.get(1, set()) & set(b0))
    assert len(admitted.get(1, set())) >= 55
    # batch 2: every URL was offered before -> nothing admitted except
    # none (all seen; FPs only SHRINK admission, never grow it)
    assert 2 not in admitted or admitted[2] == set()

    # the same URL never admits twice across the whole run
    all_urls = [r["url"] for r in rows]
    assert len(all_urls) == len(set(all_urls))

    # batch parity (r11 verdict #6): each batch-N streaming verdict set
    # equals the batch url_seen_bloom twin — bloom_probe against a
    # bitmap built from the CUMULATIVE admitted frontier before batch N
    # (same m/k/seed).  The streaming state is a set-union of admitted
    # URLs' bit positions, so the bitmaps are identical by construction
    # and the gate verdicts must match bit-for-bit.
    from sap_data_pipeline_spark.operators.corpus import (
        bloom_bitmap,
        bloom_probe,
    )

    for n, offered in ((1, b1), (2, b2)):
        seen = set().union(*(admitted.get(i, set()) for i in range(n)))
        bitmap = bloom_bitmap(
            spark.createDataFrame([(u,) for u in sorted(seen)], "url string"),
            "url", m_bits=1 << 14, k=4,
        )
        twin = {
            r["url"]
            for r in bloom_probe(
                spark.createDataFrame(
                    [(u,) for u in sorted(set(offered))], "url string"),
                bitmap, "url", m_bits=1 << 14, k=4,
            ).filter(~F.col("maybe_seen")).collect()
        }
        assert twin == admitted.get(n, set()), f"batch {n} twin mismatch"

    # restart on the same checkpoint: no new output
    q2 = stream_frontier_gate(
        stream_file_source(spark, str(watch), schema),
        url_col="url", out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt_frontier"),
        m_bits=1 << 14, k=4,
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == len(all_urls)


def test_stream_frontier_gate_corrupt_state_fails_batch(spark, tmp_path):
    """r11 ADVICE: a corrupt (non-first-batch-missing) bloom-state read
    must FAIL the micro-batch so it retries — never silently reset the
    seen-set and re-admit previously admitted URLs."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from sap_data_pipeline_spark.streaming.ingest import (
        stream_file_source,
        stream_frontier_gate,
    )

    watch = tmp_path / "frontier_watch2"
    watch.mkdir()
    (watch / "a.csv").write_text("url\nhttp://x.com/1\n")
    out = tmp_path / "admitted2"
    state = out / "_bloom"
    state.mkdir(parents=True)
    (state / "batch_id=0").mkdir()
    (state / "batch_id=0" / "garbage.parquet").write_bytes(b"\x00not parquet")

    schema = T.StructType([T.StructField("url", T.StringType())])
    q = stream_frontier_gate(
        stream_file_source(spark, str(watch), schema),
        url_col="url", out_dir=str(out),
        checkpoint_dir=str(tmp_path / "ckpt_frontier2"),
        m_bits=1 << 14, k=4,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    # nothing was admitted off the reset-to-empty path
    import os
    assert not any(p.startswith("batch_id=") for p in os.listdir(out))


def test_stream_centroid_monitor_equals_batch_twin(spark, tmp_path):
    """Streaming-equals-batch for the centroid monitor: batch-N
    published centroids equal group_centroids() on the concatenation of
    batches 0..N exactly (integer micro-unit state is additive, so the
    equality is bit-for-bit, not approximate)."""
    from sap_data_pipeline_spark.operators.similarity import group_centroids
    from sap_data_pipeline_spark.streaming.ingest import (
        stream_centroid_monitor,
    )

    watch = tmp_path / "vec_watch"
    watch.mkdir()
    batches = []
    for b in range(3):
        rows = [
            (b * 100 + i, f"s{i % 3}",
             [float((b + 1) * (i + 1)) / 7.0, float(i - b) / 3.0])
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, src string, embedding array<double>"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(watch / f"b{b}.parquet")
        )
        batches.append(df)

    schema = "vec_id long, src string, embedding array<double>"
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(watch) + "/*")
    )
    out = str(tmp_path / "centroids")
    q = stream_centroid_monitor(
        stream, "src", out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt_cent"),
    )
    q.awaitTermination(180)

    import os
    published = sorted(
        int(p.split("=")[1]) for p in os.listdir(out)
        if p.startswith("batch_id=")
    )
    assert len(published) == 3
    # batch order is file order here (one file per trigger), but the
    # additive state makes the CUMULATIVE result order-insensitive —
    # compare the FINAL snapshot exactly and every prefix by n_members
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    twin = {r["src"]: r for r in group_centroids(union, "src").collect()}
    got = {r["src"]: r for r in
           spark.read.parquet(f"{out}/batch_id={published[-1]}").collect()}
    assert set(got) == set(twin)
    for srcname, tr in twin.items():
        assert got[srcname]["centroid"] == tr["centroid"], srcname
        assert got[srcname]["n_members"] == tr["n_members"]
    # prefix snapshots grow by one batch's membership each trigger
    sizes = [
        sum(r["n_members"] for r in
            spark.read.parquet(f"{out}/batch_id={n}").collect())
        for n in published
    ]
    assert sizes == sorted(sizes) and sizes[-1] == 36


def test_stream_recrawl_gate_equals_batch_twin(spark, tmp_path):
    """Streaming-equals-batch for the recrawl gate: batch-N's
    published plan equals http_revalidation_plan over keep-latest of
    batches 0..N exactly — URLs re-fetched in a later batch flip from
    stale to fresh (new max-age observation wins), never-refetched
    URLs keep their old verdict."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.operators.temporal import (
        http_revalidation_plan,
    )
    from sap_data_pipeline_spark.streaming.ingest import stream_recrawl_gate

    NOW = 1_700_050_000
    cols = ("url string, fetched_at long, etag string, "
            "last_modified string, cache_control string, "
            "expires string, date string")
    watch = tmp_path / "fetch_watch"
    watch.mkdir()
    batches = []
    rowsets = [
        # batch 0: u1 stale (max-age 10), u2 no headers
        [("u1", NOW - 5_000, '"a"', None, "max-age=10", None, None),
         ("u2", NOW - 9_000, None, None, None, None, None)],
        # batch 1: u1 REFETCHED fresh (max-age 99999), u3 appears
        [("u1", NOW - 100, '"b"', None, "max-age=99999", None, None),
         ("u3", NOW - 50, None, None, "no-store", None, None)],
        # batch 2: u1 duplicate of an OLDER fetch (must lose to the
        # batch-1 record), u2 refetched with an ETag
        [("u1", NOW - 4_000, '"c"', None, "max-age=1", None, None),
         ("u2", NOW - 200, '"d"', None, "max-age=50", None, None)],
    ]
    for b, rows in enumerate(rowsets):
        df = spark.createDataFrame(rows, cols)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(watch / f"b{b}.parquet")
        )
        batches.append(df)

    stream = (
        spark.readStream.format("parquet").schema(cols)
        .option("maxFilesPerTrigger", 1)
        .load(str(watch) + "/*")
    )
    out = str(tmp_path / "plans")
    q = stream_recrawl_gate(
        stream, now=NOW, out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt_gate"),
    )
    q.awaitTermination(180)

    import os
    published = sorted(
        int(p.split("=")[1]) for p in os.listdir(out)
        if p.startswith("batch_id=")
    )
    assert len(published) == 3
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    rec = F.struct("fetched_at", "etag", "last_modified",
                   "cache_control", "expires", "date")
    latest = union.groupBy("url").agg(F.max_by(rec, rec).alias("_r")).select(
        "url", "_r.*"
    )
    twin = {r["url"]: r for r in
            http_revalidation_plan(latest, now=NOW).collect()}
    got = {r["url"]: r for r in
           spark.read.parquet(f"{out}/batch_id={published[-1]}").collect()}
    assert set(got) == {"u1", "u2", "u3"} == set(twin)
    for u in twin:
        for c in ("freshness_lifetime_sec", "fresh_until",
                  "is_fresh", "mode"):
            assert got[u][c] == twin[u][c], (u, c)
    # semantics spot checks: the batch-1 refetch wins over batch-2's
    # stale duplicate; no-store is unconditional
    assert got["u1"]["is_fresh"] and got["u1"]["mode"] == "fresh"
    assert got["u3"]["mode"] == "unconditional"
    assert got["u2"]["mode"] == "if-none-match"
