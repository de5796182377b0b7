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


def test_max_run_chars_hand_computed(spark):
    """max over distinct elements of count*len — 'aa bb' x3 beats 'cc' x4."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.functions import text as X

    df = spark.createDataFrame(
        [(["aa bb", "cc", "aa bb", "cc", "aa bb", "cc", "cc"],), ([],)],
        "arr array<string>",
    )
    got = [r["m"] for r in df.select(X.max_run_chars(F.col("arr")).alias("m")).collect()]
    # 'aa bb': 3*5=15 vs 'cc': 4*2=8 -> 15; empty -> 0
    assert got == [15, 0]


def test_dup_line_stats_multiline(spark):
    """Line-level Gopher repetition metrics on a crafted multi-line doc:
    5 non-blank lines, 'dup' twice + 'same line' twice -> dup_line_frac
    2/5, dup chars (2*3 + 2*9) / total (3+3+9+9+6)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.functions import text as X

    text = "dup\n  dup  \nsame line\nsame line\n\n   \nunique"
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *X.dup_line_stats(X.line_array("text"))
    ).collect()[0]
    assert row["n_lines"] == 5
    assert row["dup_line_frac"] == pytest.approx(2 / 5, abs=1e-6)
    assert row["dup_line_char_frac"] == pytest.approx((6 + 18) / 30, abs=1e-6)


def test_gopher_quality_gates_trigger(spark):
    """Each Gopher gate trips on its crafted violation while a normal
    document passes all of them (line gates included — the catalog
    testdata is single-line, so this is their semantic pin)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.plans import catalog_ext  # noqa: F401
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    good = ("the data pipeline reads the table and writes the result for "
            "the next stage with many plain words that keep every ratio "
            "inside the gopher bounds and is long enough to pass the "
            "minimum word count gate easily " + "word " * 20)
    bullets = "\n".join(f"- item {i} in the listing" for i in range(10)) \
        + "\nthe only prose line"
    elly = "\n".join(f"line {i} trails off..." for i in range(8)) \
        + "\nplain closing line"
    symbols = ("# " * 40) + "the and of to in is that for with was " * 5
    docs = spark.createDataFrame(
        [(0, good), (1, bullets), (2, elly), (3, symbols)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("documents")

    toks = X.tokens("text")
    lines = X.line_array("text")
    # reuse the registered catalog builder through a fake star
    class FakeStar:
        documents = docs
    out = {r["doc_id"]: r for r in
           catalog_ext.gopher_quality_flags(FakeStar).collect()}

    assert out[0]["keep"] == 1
    assert out[1]["flag_bullets"] == 0 and out[1]["bullet_line_frac"] > 0.9
    assert out[2]["flag_ellipsis"] == 0 and out[2]["ellipsis_line_frac"] > 0.3
    assert out[3]["flag_symbols"] == 0 and out[3]["symbol_word_ratio"] > 0.1
