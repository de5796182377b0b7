"""Sinks: Parquet writers with the reference's operational guarantees.

The reference's sinks are SQL Server tables written via append / replace /
staged-MERGE with before/after row-count audits and retries
(``common/loader.py:10-38,41-153``).  Here the warehouse is Parquet
directories; the MERGE operator itself lives in ``operators.merge``.
``write_parquet_atomic`` provides the transactional "replace" the
reference got from ``engine.begin()``: write to a temp dir, fsync-free
atomic rename swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_parquet_atomic(df: DataFrame, target_dir: str, *, partition_by: list[str] | None = None) -> int:
    """Overwrite ``target_dir`` with ``df`` atomically; return rows written.

    Equivalent of the reference's transactional replace
    (``common/loader.py:83`` ``engine.begin()``).  POSIX cannot atomically
    exchange two directories, so the swap is a rename PAIR
    (target→``.__old__``, tmp→target) with a microsecond window where the
    target path is absent; a crash inside the window leaves the previous
    table intact at the STABLE ``{target}.__old__`` name — recovery is one
    rename back, never data loss.  Any stale ``.__old__`` from a previous
    crash is cleared before the swap.

    The returned row count comes from write-side metrics
    (``df.observe``), not a post-write re-read — audit parity with
    ``common/loader.py`` at zero extra table scans.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    counted = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    tmp = f"{target_dir}.__tmp__{uuid.uuid4().hex[:8]}"
    writer = counted.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{target_dir}.__old__"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a crashed previous swap
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)
    return int(obs.get["rows"])


def append_parquet(df: DataFrame, target_dir: str, *, partition_by: list[str] | None = None) -> None:
    """Append (reference ``upload_to_sql(..., if_exists='append')``)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target_dir)


def export_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """File export sink (reference ``df.to_csv``/``to_excel``,
    ``pipelines/etl_weekly_sales.py:69``, ``etl_StoreRP.py:213``).

    Excel is a driver-side concern for small result sets; CSV covers the
    engine's export surface.
    """
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Hash-bucketed table write for co-located joins/aggs (SCALE.md layout).

    Two facts bucketed by the same keys into the same bucket count join
    WITHOUT a shuffle: the bucketed scan already satisfies the join's
    hash-distribution requirement, so at 100 TB the recurring
    fact-×-fact joins (movements × billing on Article, events × events
    on user) pay the shuffle ONCE at write time instead of per query.
    ``sort_by`` additionally pre-sorts within buckets so sort-merge
    joins skip their sort.  The table registers in the session catalog
    (external, data at ``path``); read back with ``spark.table(name)``.
    Pinned by ``tests/test_plans.py::test_bucketed_join_has_no_exchange``.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def compact_parquet_table(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> tuple[int, int]:
    """Bin-pack a Parquet directory's small files into ~``target_file_bytes``
    files; returns (files_before, files_after).

    Incremental sinks (streaming ``foreachBatch``, per-batch MERGE,
    frequent appends) accrete small files; at 100 TB that turns every
    scan into millions of file opens and starves the scheduler with
    tiny tasks.  Compaction = read + ``repartition(ceil(bytes/target))``
    + atomic swap (readers never see a half-compacted table).  No-op
    when the table is already within budget, so it's safe to run on a
    schedule after ingest — the pattern OPTIMIZE/bin-packing implements
    in table formats, expressed on plain Parquet.
    """
    import math

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    if len(files) < max(min_files_to_compact, n_target + 1):
        return len(files), len(files)
    df = spark.read.parquet(path).repartition(n_target)
    write_parquet_atomic(df, path)
    after = sum(
        1 for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    return len(files), after


def write_clustered(
    df: DataFrame,
    target_dir: str,
    *,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """Range-cluster rows by ``cluster_by`` before writing so each file
    covers a narrow key range (CLUSTER BY / Z-order-lite on one axis).

    Parquet footers record per-file min/max; a clustered layout makes
    those statistics selective, so point/range predicates on the
    cluster keys skip whole files at planning time instead of reading
    100 TB to filter it.  ``repartitionByRange`` + ``sortWithinPartitions``
    keeps it one shuffle; the atomic-swap writer preserves reader
    isolation.
    """
    clustered = df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)
    return write_parquet_atomic(clustered, target_dir, partition_by=partition_by)


def write_zordered(
    df: DataFrame,
    target_dir: str,
    *,
    zorder_by: list[str],
    bits: int = 8,
    n_files: int | None = None,
    relative_error: float = 0.001,
) -> int:
    """Z-order (Morton-curve) clustered write over TWO OR MORE numeric
    columns — multi-dimensional file skipping, where
    :func:`write_clustered` only narrows one axis (its secondary sort
    keys cycle through their full range inside every primary-key file,
    so their min/max stats prune nothing).

    Each column is quantized to a ``2^bits`` grid via approx-percentile
    cutpoints (rank-space quantization — one sketch aggregate per
    column; raw values would let one skewed column dominate the curve),
    the grid cells' bits are interleaved into the Morton key, and rows
    range-partition + sort on that key.  Files then cover small
    HYPERCUBES of the key space: per-file min/max footer stats are
    narrow on EVERY z-ordered column, so predicates on any of them skip
    files at planning time — the Delta/Iceberg ``OPTIMIZE ZORDER``
    layout, built from one extra shuffle.
    """
    if len(zorder_by) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_clustered for one")
    if bits * len(zorder_by) > 63:
        raise ValueError(f"bits={bits} x {len(zorder_by)} cols exceeds a signed long")
    n_bins = 1 << bits
    qs = [i / n_bins for i in range(1, n_bins)]
    z = F.lit(0).cast("long")
    for ci, col in enumerate(zorder_by):
        cuts = df.agg(
            F.percentile_approx(
                F.col(col).cast("double"), F.lit(qs), F.lit(int(1.0 / relative_error))
            ).alias("c")
        ).collect()[0]["c"]
        bin_id: Column = F.lit(n_bins - 1)
        for b in range(n_bins - 2, -1, -1):
            bin_id = F.when(F.col(col).cast("double") <= F.lit(cuts[b]), F.lit(b)).otherwise(bin_id)
        bin_id = bin_id.cast("long")
        # interleave: bit i of this column's bin lands at position
        # i * n_cols + ci of the Morton key
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bin_id, i).bitwiseAND(F.lit(1)),
                i * len(zorder_by) + ci,
            )
    clustered = (
        df.withColumn("_zorder", z)
        .repartitionByRange(*([n_files] if n_files else []), "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    return write_parquet_atomic(clustered, target_dir)


def pd_isna(v) -> bool:
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):  # arrays/lists: never NA as a whole
        return False


def export_excel(df: DataFrame, path: str, *, max_rows: int = 1_000_000) -> int:
    """Excel export for small report results (reference ``df.to_excel``,
    ``pipelines/etl_StoreRP.py:204-213``, ``etl_zmmidr_oun.py:78-79``).

    Driver-side by design (SURVEY §7.4): Excel is a human-report format,
    never a distributed concern.  ``max_rows`` guards against collecting
    a fact table to the driver by accident; the engine-side export path
    for big results is :func:`export_csv`.  Written with the stdlib
    SpreadsheetML codec (``sources.xlsx`` — no Excel engine needed for
    the string/number subset reports use).
    """
    from sap_data_pipeline_spark.sources.xlsx import write_xlsx

    head = df.limit(max_rows + 1).toPandas()
    if len(head) > max_rows:
        raise ValueError(
            f"refusing driver-side Excel export of >{max_rows} rows; "
            "use export_csv for engine-scale results"
        )
    rows = [
        [None if pd_isna(v) else v for v in rec]
        for rec in head.itertuples(index=False, name=None)
    ]
    write_xlsx(path, [str(c) for c in head.columns], rows)
    return len(head)


def export_jsonl_sharded(
    df: DataFrame,
    target_dir: str,
    *,
    docs_per_shard: int,
    order_key: str,
) -> int:
    """Export a curated corpus as sharded JSONL — the handoff format
    tokenizer/training-loader pipelines consume (one JSON document per
    line, shards sized for loader parallelism).

    Sharding is DETERMINISTIC: rows are range-partitioned and ordered
    by ``order_key`` with ``ceil(n / docs_per_shard)`` shards, so a
    re-export of the same corpus produces byte-identical shard
    contents (loaders checkpoint by shard+offset; a nondeterministic
    export invalidates resume points).  One range shuffle; each task
    streams its shard as a single JSON-lines file.  Returns row count.
    """
    import math

    n = df.count()
    if n == 0:
        raise ValueError("refusing to export an empty corpus")
    n_shards = math.ceil(n / docs_per_shard)
    (
        df.repartitionByRange(n_shards, F.col(order_key))
        .sortWithinPartitions(order_key)
        .select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.mode("overwrite")
        .text(target_dir)
    )
    return n


def export_orc(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> None:
    """ORC export — the columnar interchange format for Hive/Presto-side
    consumers (reference analog: the SQL-Server handoff's "write where
    the other system reads"; Spark's ORC writer is native/vectorized,
    no extra dependency)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan (predicate pushdown + column pruning work as with
    parquet — ORC carries the same min/max stripe statistics)."""
    return spark.read.orc(path)


def write_epoch_shards(
    df: DataFrame,
    key: str,
    target_dir: str,
    *,
    epoch: int = 0,
    seed: int = 17,
    n_shards: int = 8,
) -> int:
    """Materialize one training epoch as ORDERED parquet shards — the
    sink half of ``operators.sampling.epoch_shuffle``: the training
    loader then reads ``shard=i/part-*.parquet`` sequentially and
    round-robins across shards to replay the epoch's global order, with
    no shuffle or sort at read time (parquet preserves row order within
    a file; ``pos_in_shard`` is written so a resumed epoch can seek).

    Plan shape: the epoch_shuffle exchange already hash-co-locates every
    row of a shard in ONE task and its window sort already ordered them
    by (shard, pos) — this sink adds NO second shuffle; the explicit
    ``sortWithinPartitions`` is belt-and-braces (Catalyst elides it as
    satisfied) and ``partitionBy("shard")`` splits each task's output
    into per-shard directories, so every shard is exactly one ordered
    file.  Tasks hold ≈ n_shards/shuffle-partitions shards each (hash
    placement) — size ``spark.sql.shuffle.partitions`` ≥ ``n_shards``
    and each task sorts ~corpus_bytes/n_shards.

    Returns the row count written (the caller's audit number, same
    contract as ``write_parquet_atomic``); an empty input writes an
    empty target and returns 0 (the read-back pins the schema, which
    parquet cannot infer from zero files).
    """
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    ordered = epoch_shuffle(
        df, key, epoch=epoch, seed=seed, n_shards=n_shards
    ).sortWithinPartitions("shard", "pos_in_shard")
    ordered.write.mode("overwrite").partitionBy("shard").parquet(target_dir)
    spark = df.sparkSession
    return spark.read.schema(ordered.schema).parquet(target_dir).count()
