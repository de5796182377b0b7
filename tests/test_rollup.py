"""Continuous aggregate: incremental refresh (incl. late data for an
existing bucket) must equal the one-shot aggregation of all raw events."""

from __future__ import annotations

from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators.rollup import (
    ContinuousAggregate,
    merge_accumulate_frames,
)


def test_merge_accumulate_adds_on_match(spark):
    t = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    s = spark.createDataFrame([(2, 5.0), (3, 7.0)], ["k", "v"])
    got = {r["k"]: r["v"] for r in merge_accumulate_frames(t, s, ["k"], ["v"]).collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 7.0}


def test_continuous_aggregate_incremental_equals_full(spark, star, tmp_path):
    events = star.events.select("ts", "event_type", "value")
    batch1 = events.filter(F.dayofmonth("ts") <= 10)
    batch2 = events.filter(F.dayofmonth("ts") > 10)
    # late data: replay part of batch1's window after batch2
    late = events.filter(F.dayofmonth("ts") == 3)

    agg = ContinuousAggregate(spark, str(tmp_path / "rollup_hourly"))
    agg.refresh(batch1)
    agg.refresh(batch2)
    agg.refresh(late)

    got = {
        (str(r["bucket_start"]), r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in agg.read().collect()
    }
    want_raw = events.unionByName(late)  # late events counted twice by design
    want = {
        (str(r["w"]["start"]), r["event_type"]): (r["n"], round(r["s"], 6))
        for r in want_raw.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want

    # coarser grain served from the rollup matches too
    day = {
        (str(r["bucket_start"]), r["event_type"]): r["n_events"]
        for r in agg.rollup_to("1 day").collect()
    }
    want_day = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in want_raw.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert day == want_day
