"""read_sap_export: banner rows, empty col-0, totals row, string typing."""

from __future__ import annotations

from sap_data_pipeline_spark.sources.readers import read_dim_table, read_sap_export

SAP_FILE = (
    "Dynamic List Display\n"
    "\n"
    "\tSite\tArticle\tQuantity i\n"
    "\t1000\t000123\t1,234.5-\n"
    "\t1001\t456\t99\n"
)

SAP_FILE_TOTALS = SAP_FILE + "\t\t\t1,333.5-\n"


def test_read_sap_export_basic(spark, tmp_path):
    p = tmp_path / "ZMB51_1.txt"
    p.write_text(SAP_FILE)
    df = read_sap_export(spark, str(p))
    assert df.columns[:3] == ["Site", "Article", "Quantity i"]
    rows = sorted(df.select("Site", "Article").collect())
    assert [(r[0], r[1]) for r in rows] == [("1000", "000123"), ("1001", "456")]


def test_read_sap_export_totals_row_dropped(spark, tmp_path):
    p = tmp_path / "ZMMIDR_1.txt"
    p.write_text(SAP_FILE_TOTALS)
    df = read_sap_export(spark, str(p), drop_trailing_totals=True)
    assert df.count() == 2


def test_read_sap_export_multifile(spark, tmp_path):
    (tmp_path / "ZMB51_1.txt").write_text(SAP_FILE)
    (tmp_path / "ZMB51_2.txt").write_text(SAP_FILE)
    df = read_sap_export(spark, str(tmp_path / "ZMB51_*.txt"))
    assert df.count() == 4
    # provenance columns present for keep-last dedup ordering
    assert "_source_file" in df.columns and "_source_line" in df.columns


def test_read_sap_export_header_drift_rejected(spark, tmp_path):
    """Column-order drift between files in one glob must fail loudly —
    splitting all bodies by one arbitrary file's header would silently
    misalign every column of the drifted files."""
    import pytest

    (tmp_path / "Z_1.txt").write_text(SAP_FILE)
    drifted = SAP_FILE.replace("\tSite\tArticle\t", "\tArticle\tSite\t")
    (tmp_path / "Z_2.txt").write_text(drifted)
    with pytest.raises(ValueError, match="header mismatch"):
        read_sap_export(spark, str(tmp_path / "Z_*.txt")).collect()


def test_read_sap_export_empty_fields_null(spark, tmp_path):
    p = tmp_path / "Z.txt"
    p.write_text("x\n\n\tA\tB\n\t\tv\n")
    row = read_sap_export(spark, str(p)).collect()[0]
    assert row["A"] is None and row["B"] == "v"


def test_read_dim_table_csv(spark, tmp_path):
    """Dim loader: driver-side pandas → all-string DataFrame; totals row
    dropped; empty cells become NULL."""
    p = tmp_path / "dim_store.csv"
    p.write_text("Site,Name,Qty\n0001,Store A,5\n0002,,7\nTotal,,12\n")
    df = read_dim_table(spark, str(p), drop_trailing_totals=True)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["Site"] == "0001" and rows[1]["Name"] is None
