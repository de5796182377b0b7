"""Unit tests for the SAP cleaning expression library (SURVEY §2.8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_data_pipeline_spark.functions import cleaning as C


def _vals(spark, expr, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr.alias("out")).collect()]


def test_fast_numeric_trailing_minus(spark):
    out = _vals(
        spark,
        C.fast_numeric("v", "double"),
        [("1234.5-",), ("1,234",), ("12.25",), ("junk",), (None,)],
    )
    assert out == [-1234.5, 1234.0, 12.25, None, None]


def test_fast_numeric_decimal(spark):
    out = _vals(spark, C.fast_numeric("v", "decimal(18,6)"), [("1,000.25-",)])
    assert str(out[0]) == "-1000.250000"


def test_strip_leading_zeros(spark):
    out = _vals(spark, C.strip_leading_zeros("v"), [("000123",), ("0",), ("00",), ("12",)])
    assert out == ["123", "0", "0", "12"]


def test_dash_to_null(spark):
    out = _vals(spark, C.dash_to_null("v"), [("-",), ("a",), (None,)])
    assert out == [None, "a", None]


def test_collapse_whitespace(spark):
    out = _vals(spark, C.collapse_whitespace("v"), [("  a \t b\n c ",)])
    assert out == ["a b c"]


def test_strip_dot_zero_suffix_anchored(spark):
    # the reference's replace('.0','') corrupts '1.05'; ours is anchored
    out = _vals(spark, C.strip_dot_zero_suffix("v"), [("12.0",), ("1.05",), ("3.00",)])
    assert out == ["12", "1.05", "3.00"]


def test_parse_and_format_date(spark):
    out = _vals(spark, C.format_iso_date(C.parse_sap_date("v")), [("03/15/2024",), ("junk",)])
    assert out == ["2024-03-15", None]


def test_week_range(spark):
    df = spark.createDataFrame([("2024-01-01", "2024-01-29")], "a string, b string")
    out = df.select(
        F.size(C.week_range(F.col("a").cast("date"), F.col("b").cast("date"))).alias("n")
    ).collect()
    assert out[0]["n"] == 5


def test_cast_to_schema(spark):
    schema = T.StructType([
        T.StructField("Article", T.StringType()),
        T.StructField("Qty", T.DecimalType(18, 6)),
        T.StructField("Date", T.DateType()),
        T.StructField("Missing", T.IntegerType()),
    ])
    df = spark.createDataFrame(
        [(" A1 ", "1,234.5-", "03/15/2024")], "Article string, Qty string, Date string"
    )
    out = C.cast_to_schema(df, schema).collect()[0]
    assert out["Article"] == "A1"
    assert float(out["Qty"]) == -1234.5
    assert str(out["Date"]) == "2024-03-15"
    assert out["Missing"] is None


def test_cast_to_schema_strict_raises(spark):
    schema = T.StructType([T.StructField("nope", T.StringType())])
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError):
        C.cast_to_schema(df, schema, strict=True)


def test_rename_canonical(spark):
    df = spark.createDataFrame([(1, 2)], "`Pstng Date ` int, ` Quantity i` int")
    out = C.rename_canonical(df, {"Pstng Date": "Date", "Quantity i": "Quantity"})
    assert out.columns == ["Date", "Quantity"]
