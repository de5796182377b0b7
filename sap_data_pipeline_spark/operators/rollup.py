"""Continuous aggregate (hypertable-style rollup) over an event stream.

The pattern: maintain a bucketed pre-aggregate table incrementally — each
new batch of events folds into the affected time buckets only (additive
MERGE), and coarser-grain queries read the small rollup instead of
re-scanning raw events.  This is the TimescaleDB continuous-aggregate /
materialized-rollup idea expressed with Spark primitives: a windowed
aggregation + an accumulate-on-match MERGE.

Why additive MERGE and not replace-MERGE: late events for an existing
bucket must *add into* it, not overwrite it — exactly the accumulation
contract the reference's weekly fact has (store RP re-aggregates
fact_TawaSales_Weekly because loads accumulate, etl_StoreRP.py:114-123).

Scale: refresh cost is O(batch + touched buckets); queries over the
rollup scan |buckets| rows, not |events|.  At 100 TB of events with
hourly buckets the rollup is ~6 orders of magnitude smaller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators.merge import ParquetMergeTable


def merge_accumulate_frames(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """MERGE with additive matched-update: matched rows get
    ``t.c + s.c`` for every measure, unmatched rows insert.

    The whenMatchedUpdate(expr) variant of the replace-MERGE in
    ``operators.merge`` (reference builds the analogous UPDATE SET from
    its column list, common/loader.py:69-78).
    """
    keys = list(keys)
    sum_cols = list(sum_cols)
    src = source.select(*target.columns)
    t = target.alias("t")
    s = src.alias("s")
    joined = t.join(s, keys, "full_outer")
    out = [F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        tc, sc = F.col(f"t.{c}"), F.col(f"s.{c}")
        if c in sum_cols:
            expr = F.when(tc.isNull(), sc).when(sc.isNull(), tc).otherwise(tc + sc)
        else:
            expr = F.coalesce(sc, tc)  # non-additive attrs: source wins
        out.append(expr.alias(c))
    return joined.select(*out)


class ContinuousAggregate:
    """An incrementally-maintained bucketed rollup of an event stream.

    ``refresh(batch)`` folds a batch of raw events into the rollup table;
    ``read()`` returns the rollup; ``rollup_to(grain)`` re-buckets the
    stored grain to a coarser one (hour → day …) — cheap, it scans the
    rollup.  Use from ``foreachBatch`` for streaming or call per batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        bucket: str = "1 hour",
        ts_col: str = "ts",
        group_cols: Sequence[str] = ("event_type",),
        value_col: str = "value",
    ) -> None:
        self.spark = spark
        self.bucket = bucket
        self.ts_col = ts_col
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.keys = ["bucket_start", *self.group_cols]
        self.table = ParquetMergeTable(spark, path, keys=self.keys)

    def _aggregate(self, events: DataFrame) -> DataFrame:
        return (
            events.groupBy(
                F.window(self.ts_col, self.bucket).alias("w"), *self.group_cols
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(self.value_col).alias("total_value"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                *self.group_cols,
                "n_events",
                "total_value",
            )
        )

    def refresh(self, batch: DataFrame) -> dict:
        """Fold one batch of raw events into the rollup (additive)."""
        delta = self._aggregate(batch)
        if not self.table.exists():
            from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

            rows = write_parquet_atomic(delta, self.table.path)
            audit = {"op": "rollup-init", "rows_after": rows}
            self.table.history.append(audit)
            return audit
        merged = merge_accumulate_frames(
            self.table.read(), delta, self.keys, ["n_events", "total_value"]
        )
        from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

        rows = write_parquet_atomic(merged, self.table.path)
        audit = {"op": "rollup-refresh", "rows_after": rows}
        self.table.history.append(audit)
        return audit

    def read(self) -> DataFrame:
        return self.table.read()

    def rollup_to(self, grain: str) -> DataFrame:
        """Coarser-grain view served from the rollup, never raw events."""
        return (
            self.read()
            .groupBy(F.window("bucket_start", grain).alias("w"), *self.group_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                *self.group_cols,
                "n_events",
                "total_value",
            )
        )
