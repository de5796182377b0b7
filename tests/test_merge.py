"""MERGE upsert contract tests (reference common/loader.py:41-153):
matched ⇒ update all non-key columns, unmatched ⇒ insert, idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators.merge import ParquetMergeTable, merge_upsert_frames


def test_merge_frames_update_and_insert(spark):
    target = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0)], "k string, d int, v double"
    )
    source = spark.createDataFrame(
        [("b", 1, 99.0), ("c", 1, 30.0)], "k string, d int, v double"
    )
    out = merge_upsert_frames(target, source, ["k", "d"])
    rows = {(r["k"], r["d"]): r["v"] for r in out.collect()}
    assert rows == {("a", 1): 10.0, ("b", 1): 99.0, ("c", 1): 30.0}


def test_parquet_merge_table_lifecycle(spark, tmp_path):
    path = str(tmp_path / "fact")
    t = ParquetMergeTable(spark, path, keys=["k"])

    first = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    audit = t.merge(first)
    assert audit["rows_before"] == 0 and audit["rows_after"] == 2

    second = spark.createDataFrame([("b", 5.0), ("c", 3.0)], "k string, v double")
    audit = t.merge(second)
    assert audit["rows_after"] == 3
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {"a": 1.0, "b": 5.0, "c": 3.0}

    # idempotency: replaying the same batch changes nothing
    audit = t.merge(second)
    assert audit["rows_after"] == 3
    assert {r["k"]: r["v"] for r in t.read().collect()} == rows


def test_merge_source_dedup_keep_last(spark, tmp_path):
    path = str(tmp_path / "fact2")
    t = ParquetMergeTable(spark, path, keys=["k"])
    batch = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 9.0, 2)], "k string, v double, seq int"
    )
    t.merge(batch, order_by=[F.col("seq")])
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {"a": 9.0}


def test_update_from(spark, tmp_path):
    path = str(tmp_path / "fact3")
    t = ParquetMergeTable(spark, path, keys=["k"])
    t.merge(spark.createDataFrame([("a", 1.0, None), ("b", 2.0, None)],
                                  "k string, v double, mch string"))
    dim = spark.createDataFrame([("a", "M1")], "k string, mch string")
    t.update_from(dim, set_cols=["mch"])
    rows = {r["k"]: r["mch"] for r in t.read().collect()}
    assert rows == {"a": "M1", "b": None}
