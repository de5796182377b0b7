"""Structured-Streaming ingestion — the watch-folder loop, idiomatically.

Reference mechanism (SURVEY §2.9): a glob loop processes one file per
batch (``pipelines/etl_zmb51.py:21-33``), a done-ledger gives exactly-once
(``sap_scripts/sap_utils.py:20-31``), processed files move to an archive
(``etl_zmb51.py:107-115``), and the keyed MERGE makes re-delivery
idempotent (``common/loader.py:69-78``).

Spark mapping, 1:1:
  glob loop + BATCH_SIZE=1  → file source, ``maxFilesPerTrigger=1``
  done-ledger               → checkpoint WAL
  move-to-processed         → ``cleanSource=archive`` + ``sourceArchiveDir``
  idempotent keyed upsert   → ``foreachBatch`` → ParquetMergeTable.merge
  weekly rollup             → event-time window + watermark (late data)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from sap_data_pipeline_spark.operators.merge import ParquetMergeTable


def _is_missing_path(spark: SparkSession, exc: AnalysisException,
                     path: str) -> bool:
    """True iff ``exc`` means ``path`` does not exist — the cold-start
    condition the stateful sinks may treat as "first batch".  Checks
    the STABLE error condition (``PATH_NOT_FOUND``) rather than the
    Spark-version-brittle message text; if the exception carries no
    condition at all, asks the Hadoop FileSystem directly (the state
    path is gone ⇒ cold start; present ⇒ a real read failure that must
    propagate)."""
    for name in ("getCondition", "getErrorClass"):
        get = getattr(exc, name, None)
        if callable(get):
            try:
                cond = get()
            except Exception:
                continue
            if cond is not None:
                return cond == "PATH_NOT_FOUND"
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return not fs.exists(jpath)


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (with local time zone).

    Parquet written with the NTZ logical type reads back as
    ``TIMESTAMP_NTZ``, which ``withWatermark`` rejects
    (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``).  Watermark-taking
    operators call this first so both batch parquet and stream sources
    work regardless of how the file was written.  The cast reinterprets
    the wall-clock value in the session time zone (UTC in this engine),
    so event-time semantics are unchanged.
    """
    field = df.schema[ts_col].dataType
    if isinstance(field, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast(T.TimestampType()))
    return df


def stream_file_source(
    spark: SparkSession,
    watch_dir: str,
    schema: T.StructType,
    *,
    fmt: str = "csv",
    sep: str = "\t",
    max_files_per_trigger: int = 1,
    archive_dir: str | None = None,
) -> DataFrame:
    """File-watch source: one file per micro-batch, archival after commit."""
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("header", "true")
        .option("sep", sep)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.load(watch_dir)


def stream_merge_sink(
    stream: DataFrame,
    table: ParquetMergeTable,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch → keyed MERGE: the reference's idempotent upsert loop.

    ``Trigger.AvailableNow`` drains the backlog then stops — the batch
    semantics of the reference's scheduled runs; drop it for a live query.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(batch_df)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_deletion_sink(
    stream: DataFrame,
    table: ParquetMergeTable,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch → forget-list DELETE: the erasure-request pipeline
    (GDPR/takedown).  Deletion requests arrive as a file stream of key
    rows; each micro-batch applies :meth:`ParquetMergeTable.delete_keys`
    — broadcast key probe, partition-pruned rewrite — so compliance
    latency is per-batch, not per-table-scan-schedule.  Replaying a
    batch (restart between write and commit) re-deletes the same keys,
    which matches nothing: the sink is idempotent by construction.
    """

    def erase(batch_df: DataFrame, batch_id: int) -> None:
        table.delete_keys(batch_df)

    writer = stream.writeStream.foreachBatch(erase).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "6 hours",
    user_col: str = "user_id",
    watermark: str | None = None,
    value_agg: F.Column | None = None,
) -> DataFrame:
    """Session-window aggregation per user — Spark's native stateful
    session operator (``F.session_window``), no custom state UDF needed.

    A session extends while consecutive events arrive within ``gap``;
    ``session_end`` = last event + gap (Spark's window.end).  Batch and
    streaming share this plan; pass ``watermark`` for a live stream so
    state for quiet users is eventually evicted — without it a streaming
    session-window agg would hold state forever.
    """
    events = ensure_event_time(events, ts_col)
    df = events.withWatermark(ts_col, watermark) if watermark else events
    if value_agg is None:
        value_agg = F.sum("value").alias("total_value")
    return (
        df.groupBy(F.col(user_col), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), value_agg)
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_event_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Event-time tumbling-window aggregation with a late-data watermark.

    Streaming counterpart of the weekly rollup: event-time windows (the
    fiscal-week dim join stays for calendar semantics; this covers the
    ``events`` stream).  Works identically on batch DataFrames (watermark
    is a no-op there), which is how the oracle checks it.
    """
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: rows pair when their keys
    match and the right event happened within ``within`` *before* the
    left event (``left_ts - within <= right_ts <= left_ts``).

    The time bound is what makes this run forever: with watermarks on
    BOTH inputs and the join condition constraining both event times,
    Spark can prove when a buffered row can never match again and evicts
    it — state is bounded by (rate × (watermark + within)), independent
    of stream age.  An unbounded equi-join of two streams would buffer
    both in full.  Works identically on batch frames (watermarks no-op),
    which is how tests compare it to ground truth.
    """
    overlap = (set(left.columns) - set(on)) & (set(right.columns) - set(on))
    if overlap:
        # mirror asof_join's contract (operators/temporal.py): shared
        # non-key payload names would yield duplicate output columns
        raise ValueError(f"left/right payload column collision: {sorted(overlap)}")
    l = ensure_event_time(left, left_ts).alias("l")
    r = ensure_event_time(right, right_ts).alias("r")
    lw = l.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(right_ts, right_watermark)
    key_cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    time_cond = [
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") - F.expr(f"interval {within}"),
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"),
    ]
    cond = key_cond + time_cond
    joined = lw.join(rw, reduce_and(cond), how)
    # project: keys once, then both payloads
    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]
    return joined.select(
        *[F.col(f"l.{k}").alias(k) for k in on],
        *[F.col(f"l.{c}").alias(c) for c in lcols],
        *[F.col(f"r.{c}").alias(c) for c in rcols],
    )


def reduce_and(conds: Sequence[F.Column]) -> F.Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once on a business key with bounded state.

    The reference gets re-delivery idempotency from the keyed MERGE at
    the sink (``common/loader.py:69-78``); for append-only streaming
    sinks (no upsert), duplicates must die *before* the sink instead.
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — state is bounded by (keys arriving within the
    watermark window), not by stream history, which is what makes this
    run forever at 100 TB/day where a plain ``dropDuplicates`` on a
    stream grows state without bound.
    """
    return (
        ensure_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def stream_curate_corpus(
    spark: SparkSession,
    watch_dir: str,
    schema: T.StructType,
    out_path: str,
    *,
    checkpoint_dir: str,
    min_quality: float = 0.3,
    fingerprint_watermark: str = "24 hours",
    ts_col: str = "ingest_ts",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``etl.curate_corpus``: a JSONL watch folder is
    curated as documents ARRIVE instead of in nightly batches.

        file stream → quality gate (native exprs, map-side) →
        exact-dup drop on the content fingerprint (bounded state via
        watermark) → append parquet sink

    The exact-dedup stage keys on ``md5(normalized text)`` — the same
    fingerprint as the batch flow — through
    ``dropDuplicatesWithinWatermark``, so re-delivered or re-scraped
    documents inside the watermark window land exactly once while state
    stays bounded by (docs per watermark window), not stream history.
    Near-dup clustering stays a batch pass over the accumulated corpus
    (the LSH band join + connected components need corpus-wide shuffles
    a micro-batch cannot see); run ``curate_corpus`` periodically over
    this sink's output for the full policy.

    Scale shape: the gate and fingerprint are codegen expressions inside
    the stream scan; the only stateful operator is the keyed dedup.
    """
    from sap_data_pipeline_spark.functions import text as X

    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .load(watch_dir)
        .withColumn(ts_col, F.current_timestamp())
    )
    gated = stream.filter(X.quality_score("text") >= min_quality).withColumn(
        "fingerprint", X.md5_fingerprint("text")
    )
    deduped = dedup_stream_within_watermark(
        gated, ["fingerprint"], ts_col=ts_col, watermark=fingerprint_watermark
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate_corpus_incremental(
    spark: SparkSession,
    watch_dir: str,
    schema: T.StructType,
    out_path: str,
    *,
    checkpoint_dir: str,
    signature_store: str,
    min_quality: float = 0.3,
    id_col: str = "doc_id",
    available_now: bool = True,
    versioned: bool = False,
    stream_id: str = "curate",
) -> StreamingQuery:
    """Incremental NEAR-dup curation: each micro-batch probes an
    accumulated LSH signature store instead of re-clustering the corpus.

    ``versioned=True`` lands survivors in a
    :class:`~sap_data_pipeline_spark.sources.versioned.VersionedParquetTable`
    at ``out_path`` instead of a plain merge table: every surviving
    micro-batch becomes one time-travelable version (committed
    exactly-once under a ``stream-curate:<stream_id>:<batch_id>`` token,
    so replays mint no phantom versions) and downstream consumers
    diff/follow the curated corpus incrementally.  Batch-id tokens are
    scoped to a CHECKPOINT lineage: if the checkpoint directory is ever
    recreated, pass a fresh ``stream_id`` too — a recycled (stream,
    batch) pair would skip commits for genuinely new data.

    ``stream_curate_corpus`` defers near-dedup to a periodic batch pass
    whose cost is O(corpus) every time it runs.  This flow keeps a
    parquet SIGNATURE STORE — one (id, fingerprint, band, bkey) row per
    banded minhash entry of every accepted document — and per batch:

      1. quality gate + exact keep-first within the batch (min id);
      2. exact probe: anti-join the batch's fingerprints against the
         store's (re-delivered / re-scraped content drops here, which
         also makes checkpoint replays of a batch idempotent);
      3. within-batch near-dup: LSH pairs → connected components →
         min-id survivor (the batch is micro, so this is O(batch));
      4. store probe: the batch's banded signatures — BROADCAST, they
         are micro-batch-sized — hash-join the store's (band, bkey)
         entries; any band collision means a near-dup of an already
         accepted doc, and the earlier doc wins;
      5. survivors MERGE into the corpus sink (keyed on ``id_col``) and
         their banded signatures append to the store.

    Per-batch compute is O(batch) signature work plus one map-side
    broadcast probe over a two-column pruned scan of the store — no
    corpus-wide LSH shuffle ever re-runs.  The drop policy at the store
    probe is band-collision (LSH candidate = drop, no Jaccard verify):
    deliberately recall-biased for dedup, where a false drop costs one
    near-identical doc but a full verify would need the stored TEXTS,
    reintroducing the O(corpus) read this flow exists to avoid.

    Replay semantics (two sinks cannot commit atomically): the corpus
    sink is a keyed MERGE, so a batch replayed after a crash between
    the two writes upserts the same rows (exactly-once corpus); the
    signature store may then hold duplicate band rows, which is benign —
    both probes read it through ``distinct``.  The fingerprint probe
    additionally drops fully-replayed batches before any work.
    """
    from pyspark.sql.window import Window

    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators import dedup as D

    def curate(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        gated = batch_df.filter(X.quality_score("text") >= min_quality).withColumn(
            "fingerprint", X.md5_fingerprint("text")
        )
        w = Window.partitionBy("fingerprint").orderBy(id_col)
        gated = (
            gated.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        try:
            store = sp.read.parquet(signature_store)
        except Exception:  # first batch: no store yet
            store = None
        if store is not None:
            gated = gated.join(
                store.select("fingerprint").distinct(), "fingerprint", "left_anti"
            )
        gated = gated.localCheckpoint(eager=True)  # reused 4×; tiny (one micro-batch)
        if not gated.take(1):
            return
        sig = D.minhash_signature(gated, "text", id_col)
        bands = D._banded(sig, id_col, D.NUM_PERM, D.BAND_SIZE).localCheckpoint(
            eager=True
        )
        cc = D.connected_components(
            gated.select(id_col), D.bucketed_pairs(bands, id_col), id_col=id_col
        )
        survivors = gated.join(
            cc.filter(F.col(id_col) == F.col("cluster_id")).select(id_col), id_col
        )
        if store is not None:
            hit_ids = (
                store.select("band", "bkey")
                .join(F.broadcast(bands), ["band", "bkey"])
                .select(id_col)
                .distinct()
            )
            survivors = survivors.join(hit_ids, id_col, "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        if not survivors.take(1):
            return
        if versioned:
            from sap_data_pipeline_spark.sources.versioned import (
                VersionedParquetTable,
            )

            VersionedParquetTable(sp, out_path).merge_once(
                survivors, [id_col],
                op_token=f"stream-curate:{stream_id}:{batch_id}",
            )
        else:
            ParquetMergeTable(sp, out_path, keys=[id_col]).merge(survivors)
        (
            bands.join(survivors.select(id_col, "fingerprint"), id_col)
            .select(id_col, "fingerprint", "band", "bkey")
            .write.mode("append")
            .parquet(signature_store)
        )

    stream = spark.readStream.format("json").schema(schema).load(watch_dir)
    writer = stream.writeStream.foreachBatch(curate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_enrich_dims(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    *,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a live stream against a
    batch dimension table — the streaming twin of the reference's
    fact→dim joins (every micro-batch re-resolves the dim, so slowly
    changing dims are picked up without restarting the query).

    Stream-static joins never buffer stream state (each micro-batch is
    joined as a batch); the static side is broadcast when under the
    threshold, so the enrichment is map-side per batch.  Left join
    keeps late-registered keys (dim miss → NULLs to backfill) instead
    of silently dropping events; pass ``how='inner'`` to gate instead.
    Stream-STREAM joins with time bounds live in
    :func:`stream_interval_join`.
    """
    return stream.join(F.broadcast(dim), on, how)


def stream_versioned_append_sink(
    stream: DataFrame,
    table,
    *,
    checkpoint_dir: str,
    stream_id: str = "stream",
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch → :meth:`VersionedParquetTable.append_once`: streaming
    ingest into the time-travel table with EXACTLY-ONCE commits.

    ``foreachBatch`` is at-least-once (a crash between the sink write
    and the checkpoint commit redelivers the batch); each batch commits
    under the token ``stream-append:<stream_id>:<batch_id>``, so the
    redelivery finds its own commit in the manifest lineage and no-ops
    — no duplicate rows, no orphan version.  Every micro-batch becomes
    one table version sharing all prior files (zero rewrite), and
    downstream incremental consumers follow via ``changes_since`` /
    ``diff`` — the streaming-producer side of the versioned-table
    contract.
    """

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        table.append_once(
            batch_df, op_token=f"stream-append:{stream_id}:{batch_id}"
        )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_approx_distinct(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = ("event_type",),
    distinct_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Windowed approximate-cardinality monitor: distinct
    ``distinct_col`` per event-time window via mergeable Apache
    DataSketches HLL (``hll_sketch_agg``) — the streaming DAU/unique-
    visitors counter.

    Why a sketch and not ``count_distinct``: exact distinct in a
    streaming aggregation must hold EVERY key per open window in state,
    so state grows with cardinality and a hot window OOMs the store;
    the HLL register array is a fixed 2^lg_k bytes per (window, group)
    regardless of cardinality, and merges associatively across
    micro-batches and shuffle partials (the same property
    ``corpus.approx_profile`` exploits across shards).  Estimate error
    ~1.04/sqrt(2^lg_k) ≈ 1.6% at the default — the batch-parity test
    gates it.

    Works identically on batch input (watermark is a no-op), which is
    how the parity test and any backfill use it.
    """
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(
            F.hll_sketch_agg(
                F.col(distinct_col).cast("string"), F.lit(lg_k)
            ).alias("_sk"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            F.hll_sketch_estimate("_sk").cast("long").alias("approx_distinct"),
        )
    )


def stream_drift_monitor(
    stream: DataFrame,
    ref_counts: Sequence[tuple],
    features: dict[str, "F.Column"],
    *,
    out_dir: str,
    checkpoint_dir: str,
    eps: float = 1e-6,
    available_now: bool = True,
    cumulative: bool = False,
) -> StreamingQuery:
    """foreachBatch → per-micro-batch PSI vs a frozen reference: the
    streaming arm of :func:`operators.quality.drift_psi` — every
    arriving slice of corpus is scored for distribution drift against
    the admitted reference BEFORE it reaches the training mix, so a
    crawler regression (language mix flips, length distribution
    collapses) alarms within one micro-batch instead of at the next
    full-corpus audit.

    ``ref_counts`` is the PRE-AGGREGATED reference distribution — rows
    of (feature, bucket, ref_cnt) as produced by
    ``feature_bucket_counts(ref, features)`` and materialized ONCE
    (``.collect()`` of a bucket-cardinality-sized frame).  At 100 TB
    the reference is never rescanned per batch: scoring a micro-batch
    costs one pass over the batch plus a bucket-sized join.

    Each batch writes its per-feature report to
    ``{out_dir}/batch_id={id}/`` with ``mode=overwrite`` — a replayed
    batch (restart between write and checkpoint commit) rewrites the
    same directory, so the sink is idempotent and reading ``out_dir``
    yields exactly one report row per (batch, feature) with
    ``batch_id`` recovered as a partition column.

    ``cumulative=True`` switches from scoring each slice in isolation
    to scoring EVERYTHING ADMITTED SO FAR: batch N's report is exactly
    the batch twin (:func:`operators.quality.drift_psi`) evaluated on
    the concatenation of batches 0..N — per-batch bucket counts are
    persisted under ``{out_dir}/_counts/batch_id={id}/`` (overwrite →
    idempotent under replay, same argument as the report sink) and the
    cumulative distribution is their bucket-wise sum.  State is
    bucket-cardinality-sized parquet, never corpus-sized: at 100 TB a
    batch pays one pass over itself plus a sum over #batches tiny
    count files — the reference and prior corpus are never rescanned.
    """
    from sap_data_pipeline_spark.operators.quality import (
        feature_bucket_counts,
        psi_from_counts,
    )

    def score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        ref = spark.createDataFrame(
            list(ref_counts), "feature string, bucket string, ref_cnt long"
        )
        cur = feature_bucket_counts(batch_df, features)
        if cumulative:
            cur.coalesce(1).write.mode("overwrite").parquet(
                f"{out_dir}/_counts/batch_id={batch_id}"
            )
            # batches commit in order, so every dir present is ≤ this
            # batch_id (a replayed uncommitted batch just overwrote its
            # own dir) — the sum IS the cumulative distribution
            cur = (
                spark.read.parquet(f"{out_dir}/_counts")
                .groupBy("feature", "bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        cur = cur.withColumnRenamed("cnt", "cur_cnt")
        psi_from_counts(ref, cur, eps=eps).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(score).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_frontier_gate(
    stream: DataFrame,
    *,
    url_col: str = "url",
    out_dir: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 18,
    k: int = 4,
    seed: int = 7,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming crawl-frontier admission through the Bloom seen-set
    gate (the incremental arm of the batch ``url_seen_bloom`` path):
    each micro-batch's URLs are probed MAP-SIDE against the bitmap of
    everything admitted so far; unseen URLs are admitted and their bit
    positions persisted.

    Exactly-once is STRUCTURAL here, not checkpoint-dependent: the
    per-batch position files land under ``{out_dir}/_bloom/batch_id=``
    with overwrite, and a Bloom bitmap is a SET UNION of positions —
    re-adding the same bits is the identity, so a crash-replayed batch
    converges to the identical bitmap (the admitted-rows sink is the
    same overwrite-per-batch-dir pattern as the drift monitor).  State
    read per batch is ≤ m/64 words after the union — bounded by the
    filter size, never by how many URLs have ever been admitted, which
    is the entire reason a frontier uses a Bloom gate instead of an
    exact anti-join at 100 TB.

    False positives (rate documented on :func:`corpus.bloom_probe`)
    skip a never-fetched URL; false negatives are impossible, so a URL
    is never admitted twice.
    """
    from sap_data_pipeline_spark.operators.corpus import (
        _bloom_hash,
        bloom_probe,
    )

    n_words = m_bits // 64

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        state = f"{out_dir}/_bloom"
        try:
            words = spark.read.parquet(state).groupBy("w").agg(
                F.expr("bit_or(bits)").alias("bits")
            ).collect()
        except AnalysisException as exc:
            # Only the first batch (state dir not created yet) may start
            # from an empty bitmap.  Any OTHER read failure — corrupt
            # state, transient IO — must propagate so the micro-batch
            # retries; swallowing it would silently reset the seen-set
            # and re-admit every previously admitted URL, breaking the
            # "never admitted twice" guarantee.
            if not _is_missing_path(spark, exc, state):
                raise
            words = []
        bitmap = [0] * n_words
        for r in words:
            bitmap[r["w"]] = r["bits"]
        batch = batch_df.dropDuplicates([url_col])
        admitted = bloom_probe(
            batch, bitmap, url_col, m_bits=m_bits, k=k, seed=seed
        ).filter(~F.col("maybe_seen")).drop("bloom_hits", "maybe_seen")
        admitted.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )
        e = F.col(url_col)
        pos = admitted.select(
            F.explode(F.array(*[
                _bloom_hash(e, i, m_bits, seed) for i in range(k)
            ])).alias("p")
        )
        (
            pos.select(
                (F.col("p") / F.lit(64)).cast("long").alias("w"),
                F.pmod(F.col("p"), F.lit(64)).cast("int").alias("bit"),
            )
            .select("w", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("b"))
            .groupBy("w")
            .agg(F.expr("bit_or(b)").alias("bits"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{state}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_centroid_monitor(
    stream: DataFrame,
    group_col: str,
    *,
    vec_col: str = "embedding",
    out_dir: str,
    checkpoint_dir: str,
    scale: int = 1_000_000_000,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming per-group embedding-centroid maintenance — the
    incremental arm of :func:`operators.similarity.group_centroids`:
    every micro-batch of admitted vectors updates each group's running
    centroid, so domain-profile drift ("source X's embeddings moved")
    alarms while the corpus is still ingesting instead of at the next
    full-corpus pass.  This is also exactly the statistics-accumulation
    half of one distributed KMeans update step, maintained online.

    State is ADDITIVE and integer-exact: each batch persists its own
    (group, dim, sum-of-micro-units, count) partial under
    ``{out_dir}/_sums/batch_id={id}/`` with overwrite — a crash-
    replayed batch rewrites the same directory, and a sum of per-batch
    partials is insensitive to replay order, so batch N's published
    centroids equal the batch twin (``group_centroids``) evaluated on
    the concatenation of batches 0..N exactly (the same
    streaming-equals-batch contract as the drift/heavy-hitter/CUSUM
    monitors, test-pinned).  State size is groups×dims rows per batch —
    never corpus-sized; the prior corpus is never rescanned.

    Each batch publishes the cumulative (group, centroid, n_members)
    snapshot to ``{out_dir}/batch_id={id}/``.
    """
    def update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sums_dir = f"{out_dir}/_sums"
        v = F.col(vec_col).cast("array<double>")
        partial = (
            batch_df.select(
                F.col(group_col).alias("grp"),
                F.posexplode(v).alias("dim", "x"),
            )
            .select("grp", "dim",
                    F.round(F.col("x") * scale).cast("long").alias("xq"))
            .groupBy("grp", "dim")
            .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        partial.coalesce(1).write.mode("overwrite").parquet(
            f"{sums_dir}/batch_id={batch_id}"
        )
        try:
            acc = spark.read.parquet(sums_dir)
        except AnalysisException as exc:
            # first batch just wrote it; any read failure is real
            if not _is_missing_path(spark, exc, sums_dir):
                raise
            acc = partial
        cum = acc.groupBy("grp", "dim").agg(
            F.sum("s").alias("s"), F.sum("n").alias("n")
        )
        snapshot = (
            cum.groupBy("grp")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "s", "n"))),
                    lambda t: t["s"].cast("double")
                    / (t["n"].cast("double") * F.lit(float(scale))),
                ).alias("centroid"),
                F.max("n").cast("long").alias("n_members"),
            )
            .withColumnRenamed("grp", group_col)
        )
        snapshot.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    writer = stream.writeStream.foreachBatch(update).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_recrawl_gate(
    stream: DataFrame,
    *,
    now: int,
    out_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming recrawl planning — the incremental arm of
    :func:`operators.temporal.http_revalidation_plan`: every
    micro-batch of fetch results (URL + caching headers) updates a
    per-URL latest-response state, and the batch publishes the
    CUMULATIVE revalidation plan — so the frontier scheduler always
    reads current conditional-GET decisions instead of waiting for the
    next full fetch-log pass.

    State is keep-latest and replay-safe: each batch persists its own
    per-URL latest records under ``{out_dir}/_latest/batch_id={id}/``
    with overwrite (a crash-replayed batch rewrites the same
    directory), and the cumulative reduce is ``max_by`` over the
    deterministic (fetched_at, full-record) struct — insensitive to
    replay order and to which batch a record arrived in, so batch N's
    published plan equals the batch twin (``http_revalidation_plan``
    over keep-latest of batches 0..N) EXACTLY — the
    streaming-equals-batch contract of the centroid/drift monitors,
    test-pinned.  State size is distinct-URLs rows, never
    fetch-log-sized; ``now`` is pinned by the caller so planning is
    deterministic (a wall-clock ``now`` would tear replay parity).

    Each batch publishes (url, freshness_lifetime_sec, fresh_until,
    is_fresh, mode) to ``{out_dir}/batch_id={id}/``.
    """
    from sap_data_pipeline_spark.operators.temporal import (
        http_revalidation_plan,
    )

    HEADERS = ["fetched_at", "etag", "last_modified", "cache_control",
               "expires", "date"]

    def latest_per_url(df: DataFrame) -> DataFrame:
        rec = F.struct(F.col("fetched_at"), *[F.col(c) for c in HEADERS[1:]])
        return df.groupBy(url_col).agg(
            F.max_by(rec, rec).alias("_r")
        ).select(url_col, *[F.col(f"_r.{c}").alias(c) for c in HEADERS])

    def update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        latest_dir = f"{out_dir}/_latest"
        partial = latest_per_url(batch_df.select(url_col, *HEADERS))
        partial.coalesce(1).write.mode("overwrite").parquet(
            f"{latest_dir}/batch_id={batch_id}"
        )
        try:
            acc = spark.read.parquet(latest_dir)
        except AnalysisException as exc:
            # first batch just wrote it; any other read failure is real
            if not _is_missing_path(spark, exc, latest_dir):
                raise
            acc = partial
        cum = latest_per_url(acc)
        plan = http_revalidation_plan(cum, now=now, url_col=url_col)
        plan.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    writer = stream.writeStream.foreachBatch(update).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
