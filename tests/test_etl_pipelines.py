"""End-to-end pipeline replays (SURVEY §5.2): dirty SAP export fixtures →
read → clean → aggregate → MERGE → re-MERGE idempotency; ledger gives
batch exactly-once."""

from __future__ import annotations

from sap_data_pipeline_spark.etl import etl_inventory_snapshot, etl_movements
from sap_data_pipeline_spark.operators.merge import ParquetMergeTable
from sap_data_pipeline_spark.sources.ledger import ProcessedLedger

BANNER = "ZMB51 export\t\t\t\t\t\t\n13.08.2026 some banner\t\t\t\t\t\t\n"


def _zmb51_file(path, rows):
    """Tab export: 2 banner rows, empty first column, dirty values."""
    header = "\tArticle\tSite\tPstng Date\tQuantity i\tAmount LC\tBUn\n"
    body = "".join(
        "\t" + "\t".join(r) + "\n" for r in rows
    )
    path.write_text(BANNER + header + body)


def test_etl_movements_end_to_end(spark, tmp_path):
    watch = tmp_path / "watch"
    watch.mkdir()
    # file 1: one article over two lines (sums), trailing-minus + commas
    _zmb51_file(watch / "ZMB51_001.txt", [
        ("0001234", "1000", "01/15/2024", "1,000.5-", "200-", "EA"),
        ("0001234", "1000", "01/15/2024", "500-", "100-", "EA"),
        ("0009999", "2000", "01/16/2024", "10", "5", "CS"),
    ])
    # facts partition by Date — the documented default posture, so each
    # daily batch rewrites only the partitions it touches (VERDICT r1 §3)
    table = ParquetMergeTable(
        spark, str(tmp_path / "fact_mv"), keys=["Article", "Site", "Date"],
        partition_by=["Date"], retry_delay_s=0.0,
    )
    ledger = ProcessedLedger(str(tmp_path / "zmb51_done.txt"))

    audit = etl_movements(spark, str(watch / "ZMB51_*.txt"), table, ledger=ledger)
    assert audit["files"] == 1

    rows = {(r["Article"], r["Site"]): r for r in table.read().collect()}
    got = rows[("1234", "1000")]  # leading zeros stripped
    # trailing-minus parsed, commas stripped, sign inverted, summed:
    # -(-1000.5) + -(-500) = 1500.5 ; cost -(-200)+-(-100) = 300
    assert float(got["Quantity"]) == 1500.5
    assert float(got["Cost"]) == 300.0
    assert str(got["Date"]) == "2024-01-15"
    assert float(rows[("9999", "2000")]["Quantity"]) == -10.0  # issues negate

    # re-run: ledger skips everything, table unchanged
    assert etl_movements(spark, str(watch / "ZMB51_*.txt"), table, ledger=ledger) == {"files": 0}

    # re-delivery WITHOUT ledger (re-downloaded file): MERGE is idempotent
    before = sorted(map(tuple, table.read().collect()))
    etl_movements(spark, str(watch / "ZMB51_*.txt"), table)
    assert sorted(map(tuple, table.read().collect())) == before

    # late file arrives: only it is processed, new key upserts — and the
    # merge is partition-pruned: the batch touches only Date=2024-01-15,
    # so the 2024-01-16 partition's files must not be rewritten
    import glob as g
    import os

    untouched = {
        f: os.path.getmtime(f)
        for f in g.glob(str(tmp_path / "fact_mv" / "Date=2024-01-16" / "*.parquet"))
    }
    assert untouched, "expected a Date=2024-01-16 partition"
    _zmb51_file(watch / "ZMB51_002.txt", [
        ("0001234", "1000", "01/15/2024", "2,000-", "400-", "EA"),
    ])
    audit = etl_movements(spark, str(watch / "ZMB51_*.txt"), table, ledger=ledger)
    assert audit["files"] == 1
    got = {(r["Article"], r["Site"]): r for r in table.read().collect()}[("1234", "1000")]
    assert float(got["Quantity"]) == 2000.0  # matched key UPDATEd to new batch
    for f, mtime in untouched.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mtime, \
            f"untouched partition rewritten: {f}"


def _zmmidr_file(path, rows, totals=("Total", "", "99,999")):
    header = "\tArticle No\tMCH\tUnrestricted-Use Stock\n"
    body = "".join("\t" + "\t".join(r) + "\n" for r in list(rows) + [totals])
    path.write_text(BANNER + header + body)


def test_etl_inventory_snapshot_keep_last(spark, tmp_path):
    watch = tmp_path / "idr"
    watch.mkdir()
    # same article twice within the file: LAST line wins (file order);
    # totals row must be dropped
    _zmmidr_file(watch / "ZMMIDR_001.txt", [
        ("0777", "106AB", "1,5"),
        ("0777", "106AB", "42"),
        ("0888", "107CD", "7-"),
    ])
    table = ParquetMergeTable(
        spark, str(tmp_path / "fact_idr"), keys=["Date", "DC", "Article"],
        retry_delay_s=0.0,
    )
    audit = etl_inventory_snapshot(
        spark, str(watch / "ZMMIDR_*.txt"), table, dc="9891"
    )
    assert audit["files"] == 1
    rows = {r["Article"]: r for r in table.read().collect()}
    assert set(rows) == {"777", "888"}          # totals row gone, zeros stripped
    assert float(rows["777"]["Stock"]) == 42.0  # keep-last survivor
    assert float(rows["888"]["Stock"]) == -7.0  # trailing minus
    assert rows["777"]["DC"] == "9891"


def _zrssale_file(path, rows):
    header = "\tBill.Doc.\tItem\tArticle\tBill. Date\tMTyp\tBill.qty\tSales Amou\n"
    body = "".join("\t" + "\t".join(r) + "\n" for r in rows)
    path.write_text(BANNER + header + body)


def test_etl_billing_lines_filter_and_doc_pk(spark, tmp_path):
    from sap_data_pipeline_spark.etl import etl_billing_lines

    watch = tmp_path / "zrs"
    watch.mkdir()
    _zrssale_file(watch / "ZRSSALE_001.txt", [
        ("900001", "10", "0123", "02/01/2024", "ZTTG", "5", "1,000.5"),
        ("900001", "20", "0456", "02/01/2024", "ZXXX", "1", "10"),   # filtered
        ("900002", "10", "0123", "02/02/2024", "ZTTG", "2-", "50-"),
    ])
    table = ParquetMergeTable(
        spark, str(tmp_path / "fact_zrs"), keys=["Bill_Doc", "Item"],
        retry_delay_s=0.0,
    )
    audit = etl_billing_lines(spark, str(watch / "ZRSSALE_*.txt"), table)
    rows = {(r["Bill_Doc"], r["Item"]): r for r in table.read().collect()}
    assert set(rows) == {("900001", "10"), ("900002", "10")}  # ZXXX gone
    assert float(rows[("900002", "10")]["Quantity"]) == -2.0
    assert float(rows[("900001", "10")]["Amt"]) == 1000.5
    assert audit["rows_after"] == 2

    # corrected re-billing of doc 900001/10 updates in place
    _zrssale_file(watch / "ZRSSALE_002.txt", [
        ("900001", "10", "0123", "02/01/2024", "ZTTG", "7", "1,400"),
    ])
    etl_billing_lines(spark, str(watch / "ZRSSALE_*.txt"), table)
    rows = {(r["Bill_Doc"], r["Item"]): r for r in table.read().collect()}
    assert float(rows[("900001", "10")]["Quantity"]) == 7.0
    assert len(rows) == 2


def _zmmidr_dry_file(path, rows, totals=("Total", "", "99,999", "9,999")):
    header = "\tArticle No\tMCH\tUnrestricted-Use Stock\tOn order Stock\n"
    body = "".join("\t" + "\t".join(r) + "\n" for r in list(rows) + [totals])
    path.write_text(BANNER + header + body)


def test_etl_inventory_consolidated_dry(spark, tmp_path):
    """ZMMIDR dry flow: EC region-merge, NoDC surrogate, Dept substring,
    NaN→0.0 measure policy, dry-goods (Dept 106) export subset."""
    import csv

    from sap_data_pipeline_spark.etl import etl_inventory_consolidated

    folder = tmp_path / "zmmidr_dry"
    folder.mkdir()
    # standalone regions
    _zmmidr_dry_file(folder / "Zmmidr_9801.txt", [
        ("0100", "106AB", "10", "1"),
        ("0200", "107CD", "5", ""),       # empty OnOrder → 0.0 policy
    ])
    _zmmidr_dry_file(folder / "Zmmidr_9900.txt", [
        ("0100", "106AB", "20", "2"),
    ])
    # EC regions: article 0300 appears in all three → summed, MCH first-wins
    _zmmidr_dry_file(folder / "Zmmidr_9905.txt", [
        ("0300", "106XY", "7", "1"),
    ])
    _zmmidr_dry_file(folder / "Zmmidr_9901.txt", [
        ("0300", "106ZZ", "3", "2"),      # MCH loses to 9905's (priority order)
        ("0400", "108QQ", "1", "bad"),    # unparseable OnOrder → 0.0
    ])
    _zmmidr_dry_file(folder / "Zmmidr_9902.txt", [
        ("0300", "106WW", "2.5", "0"),
    ])
    out = tmp_path / "zmmidr_tbl"
    dry_csv = tmp_path / "dry_out"
    audit = etl_inventory_consolidated(
        spark,
        {r: str(folder / f"Zmmidr_{r}.txt") for r in
         ("9801", "9900", "9905", "9901", "9902")},
        str(out),
        dry_export_path=str(dry_csv),
    )
    assert audit["files"] == 5

    rows = {(r["Region"], r["Article"]): r
            for r in spark.read.parquet(str(out)).collect()}
    # standalone regions pass through; same article in two standalone
    # regions stays two rows (only EC merges)
    assert ("9801", "100") in rows and ("9900", "100") in rows
    # EC merge: one row, measures summed, MCH from highest-priority region
    ec = rows[("EC", "300")]
    assert float(ec["Stock"]) == 12.5 and float(ec["OnOrder"]) == 3.0
    assert ec["MCH"] == "106XY"
    assert ec["Dept"] == "106"
    # NaN→0.0 policy (dry cleaner diverges from the NULL-preserving flows)
    assert float(rows[("9900", "100")]["OnOrder"]) == 2.0
    assert float(rows[("9801", "200")]["OnOrder"]) == 0.0
    assert float(rows[("EC", "400")]["OnOrder"]) == 0.0
    # the NoDC surrogate is an export concern, dropped from the warehouse
    assert "Article_NoDC" not in spark.read.parquet(str(out)).columns

    # dry export: Dept==106 only, with the NoDC surrogate key
    files = [p for p in dry_csv.iterdir() if p.suffix == ".csv"]
    got = []
    for p in files:
        with open(p) as fh:
            got.extend(csv.DictReader(fh))
    assert audit["dry_rows"] == len(got)
    by_key = {r["Article_NoDC"]: r for r in got}
    assert set(by_key) == {"9801100", "9900100", "EC300"}  # 107/108 out
    assert float(by_key["EC300"]["Stock"]) == 12.5

    # replace semantics: re-running replaces, not appends
    audit2 = etl_inventory_consolidated(
        spark,
        {"9801": str(folder / "Zmmidr_9801.txt")},
        str(out),
    )
    assert audit2["rows"] == 2
    assert spark.read.parquet(str(out)).count() == 2


def _zmmidr_wide_file(path, rows):
    """ZMMIDR export with the reference's full column set (subset):
    attributes + a summed-but-not-cleaned measure (Allocation Qty)."""
    header = ("\tArticle No\tMCH\tArticle Description\tPack size"
              "\tUnrestricted-Use Stock\tOn order Stock\tAllocation Qty\n")
    body = "".join("\t" + "\t".join(r) + "\n" for r in list(rows) + [
        ("Total", "", "", "", "99,999", "9,999", "9,999")])
    path.write_text(BANNER + header + body)


def test_etl_inventory_consolidated_full_columns(spark, tmp_path):
    """All source columns survive to the warehouse (etl_zmmidr_dry.py:48-66):
    attribute first-wins skips NULLs (pandas GroupBy.first), EC priority is
    pinned to ec_regions order — not region_globs dict order — and
    sum_measures are summed without the NaN→0.0 policy."""
    from sap_data_pipeline_spark.etl import etl_inventory_consolidated

    folder = tmp_path / "zmmidr_wide"
    folder.mkdir()
    _zmmidr_wide_file(folder / "Zmmidr_9801.txt", [
        # Allocation Qty empty → NULL preserved (no clean_number on it),
        # while empty OnOrder still becomes 0.0
        ("0100", "106AB", "Rice", "5kg", "10", "", ""),
    ])
    # EC articles: 9905 has NULL MCH but a description; 9901 has MCH but
    # no description; 9902 has both.  Priority must be 9905 > 9901 > 9902.
    _zmmidr_wide_file(folder / "Zmmidr_9905.txt", [
        ("0300", "", "From9905", "", "7", "1", "5"),
    ])
    _zmmidr_wide_file(folder / "Zmmidr_9901.txt", [
        ("0300", "106ZZ", "", "12pk", "3", "2", ""),
    ])
    _zmmidr_wide_file(folder / "Zmmidr_9902.txt", [
        ("0300", "106WW", "From9902", "6pk", "2.5", "0", "2"),
    ])
    out = tmp_path / "zmmidr_wide_tbl"
    snap = tmp_path / "zmmidr_snapshot"
    # region_globs dict deliberately ordered 9901 < 9902 < 9905: the EC
    # winner must still follow ec_regions = (9905, 9901, 9902)
    audit = etl_inventory_consolidated(
        spark,
        {r: str(folder / f"Zmmidr_{r}.txt") for r in
         ("9901", "9902", "9905", "9801")},
        str(out),
        sum_measures=("Allocation Qty",),
        snapshot_path=str(snap),
    )
    assert audit["files"] == 4

    tbl = spark.read.parquet(str(out))
    rows = {(r["Region"], r["Article"]): r for r in tbl.collect()}
    ec = rows[("EC", "300")]
    # null-skipping first-wins in priority order: 9905's NULL MCH is
    # skipped (9901 wins); 9905's non-null description wins outright
    assert ec["MCH"] == "106ZZ"
    assert ec["Article Description"] == "From9905"
    assert ec["Pack size"] == "12pk"        # 9905 empty → 9901 wins
    assert ec["Dept"] == "106"              # derived from first-wins MCH
    # measures: cleaned ones sum with NaN→0.0; sum_measures skip NULLs
    assert float(ec["Stock"]) == 12.5 and float(ec["OnOrder"]) == 3.0
    assert float(ec["Allocation Qty"]) == 7.0
    # standalone region: attribute passthrough, NULL-preserving sum measure
    solo = rows[("9801", "100")]
    assert solo["Article Description"] == "Rice"
    assert float(solo["OnOrder"]) == 0.0            # cleaned measure
    assert solo["Allocation Qty"] is None           # un-cleaned measure
    # second sink (etl_zmmidr_dry.py:116,137): same rows, DateTime stamp
    snap_df = spark.read.parquet(str(snap))
    assert snap_df.count() == tbl.count()
    assert dict(snap_df.dtypes)["Snapshot_Date"] == "timestamp"
    assert dict(tbl.dtypes)["Snapshot_Date"] == "date"


def _zmachk_file(path, rows):
    header = ("\tStatus\tArticle\tArticle Description\tMerchandise Category"
              "\tValid-From Date\tDOH Target\n")
    body = "".join("\t" + "\t".join(r) + "\n" for r in rows)
    path.write_text(BANNER + header + body)


def test_etl_article_master_only_new(spark, tmp_path):
    from sap_data_pipeline_spark.etl import etl_article_master

    watch = tmp_path / "machk"
    watch.mkdir()
    _zmachk_file(watch / "ZMACHK_001.txt", [
        ("Y", "0100", "Rice 5kg", "101AA", "01/01/2024", "14"),
        ("N", "0200", "Inactive", "101AA", "01/01/2024", "7"),   # gated
        ("Y", "0300", "Soy Sauce", "102BB", "01/05/2024", "-"),  # '-' → NULL
        ("Y", "0100", "Rice 5kg DUP", "101AA", "01/01/2024", "14"),  # dedup
    ])
    table = ParquetMergeTable(
        spark, str(tmp_path / "dim_article"), keys=["Article"], retry_delay_s=0.0,
    )
    etl_article_master(spark, str(watch / "ZMACHK_*.txt"), table)
    rows = {r["Article"]: r for r in table.read().collect()}
    assert set(rows) == {"100", "300"}
    assert rows["300"]["DOH_Target"] is None
    assert str(rows["100"]["Valid_From_Date"]) == "2024-01-01"

    # only_new mode: existing 100 keeps its description, 400 inserts
    _zmachk_file(watch / "ZMACHK_002.txt", [
        ("Y", "0100", "Rice RENAMED", "101AA", "01/01/2024", "14"),
        ("Y", "0400", "New Article", "103CC", "03/01/2024", "3"),
    ])
    etl_article_master(spark, str(watch / "ZMACHK_*.txt"), table, only_new=True)
    rows = {r["Article"]: r for r in table.read().collect()}
    assert set(rows) == {"100", "300", "400"}
    assert rows["100"]["Article_Description"] == "Rice 5kg"  # untouched
    assert rows["400"]["Article_Description"] == "New Article"


def _zstpromo_file(path, rows):
    header = "\tArticle\tPayer\tBill. Date\tSales Amou\tBill.qty\tCost\tSU\n"
    body = "".join("\t" + "\t".join(r) + "\n" for r in rows)
    path.write_text(BANNER + header + body)


def test_etl_promo_billing_agg_and_merge(spark, tmp_path):
    from sap_data_pipeline_spark.etl import etl_promo_billing

    watch = tmp_path / "promo"
    watch.mkdir()
    _zstpromo_file(watch / "ZSTPROMO_001.txt", [
        ("0111", "3001", "03/01/2024", "1,200.5", "10", "900", "EA"),
        ("0111", "3001", "03/01/2024", "300.5-", "2-", "100-", "EA"),  # sums in
        ("0111", "", "03/01/2024", "99", "1", "1", "EA"),              # null key dropped
        ("0222", "3002", "03/02/2024", "50", "5", "40", "CS"),
    ])
    table = ParquetMergeTable(
        spark, str(tmp_path / "fact_promo"), keys=["Article", "Site", "Date"],
        retry_delay_s=0.0,
    )
    audit = etl_promo_billing(spark, str(watch / "ZSTPROMO_*.txt"), table)
    rows = {(r["Article"], r["Site"]): r for r in table.read().collect()}
    # ZSTPROMO keeps article numbers verbatim (no lstrip in the reference)
    assert set(rows) == {("0111", "3001"), ("0222", "3002")}
    assert float(rows[("0111", "3001")]["Amt"]) == 900.0
    assert float(rows[("0111", "3001")]["Quantity"]) == 8.0
    assert audit["rows_after"] == 2

    # replay is idempotent at the PK grain
    audit2 = etl_promo_billing(spark, str(watch / "ZSTPROMO_*.txt"), table)
    assert audit2["rows_after"] == 2


def test_etl_load_dims_config_driven(spark, tmp_path):
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.etl import etl_load_dims

    dims = tmp_path / "dims"
    dims.mkdir()
    (dims / "Calendar.csv").write_text(
        "Date,Wkday,AcctWk,Year\n"
        "2024-01-01,Mon,202401,2024\n"
        "2024-01-02,Tue,202401,2024\n"
        "2024-01-02,XXX,202401,2024\n"   # dup PK: keep-first
        ",Wed,202401,2024\n"             # null PK: dropped
    )
    (dims / "Division.csv").write_text("Division,Description\n1,Grocery\n2,Produce\n")
    configs = {
        "Calendar.csv": {
            "table": "dim_Calendar", "pk": ["Date"],
            "schema": T.StructType([
                T.StructField("Date", T.DateType()),
                T.StructField("Wkday", T.StringType()),
                T.StructField("AcctWk", T.StringType()),
                T.StructField("Year", T.IntegerType()),
            ]),
        },
        "Division.csv": {
            "table": "Map_Division", "pk": ["Division"],
            "schema": T.StructType([
                T.StructField("Division", T.IntegerType()),
                T.StructField("Description", T.StringType()),
            ]),
        },
        "Missing.csv": {"table": "dim_Nope", "pk": ["x"],
                        "schema": T.StructType([T.StructField("x", T.StringType())])},
    }
    results = etl_load_dims(spark, str(dims), configs, str(tmp_path / "warehouse"))
    assert set(results) == {"dim_Calendar", "Map_Division"}
    assert results["dim_Calendar"]["rows_after"] == 2
    cal = {str(r["Date"]): r for r in spark.read.parquet(
        str(tmp_path / "warehouse" / "dim_Calendar")).collect()}
    assert cal["2024-01-02"]["Wkday"] == "Tue"  # keep-first survivor
    assert results["Map_Division"]["rows_after"] == 2


def test_etl_weekly_sales_build_and_backfill(spark, tmp_path):
    from sap_data_pipeline_spark.etl import etl_weekly_sales

    sf = "/root/testdata/sf0.001"
    table = ParquetMergeTable(
        spark, str(tmp_path / "fact_weekly"), keys=["Article", "AcctWk", "Site"],
        retry_delay_s=0.0,
    )
    csv_out = str(tmp_path / "weekly.csv")
    audit = etl_weekly_sales(spark, sf, table, export_csv_path=csv_out)
    assert audit["rows_after"] > 0
    exported = spark.read.option("header", "true").csv(csv_out)
    assert exported.count() == audit["rows_after"]

    # backfilling a window replaces in place: full re-run adds nothing
    audit2 = etl_weekly_sales(spark, sf, table)
    assert audit2["rows_after"] == audit["rows_after"]


def test_etl_store_rp_export(spark, tmp_path):
    from sap_data_pipeline_spark.etl import etl_store_rp_export

    out = str(tmp_path / "store_rp.csv")
    audit = etl_store_rp_export(spark, "/root/testdata/sf0.001", out)
    written = spark.read.option("header", "true").csv(out)
    assert written.count() == audit["rows"]
    assert "Change" in written.columns and "New_ReOdr" in written.columns


def test_curate_corpus_flow(spark, tmp_path):
    from sap_data_pipeline_spark.etl import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
            (3, "the quick brown fox jumps over the lazy dog near the river edge"),  # near dup
            (4, "completely different text about machine learning and data with many words"),
            (5, "!!!! ???? ...."),  # low quality
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "curated")
    audit = curate_corpus(docs, out, min_quality=0.5)
    assert audit["rows_raw"] == 5
    assert audit["rows_after_quality"] == 4           # junk gated
    assert audit["rows_after_exact_dedup"] == 3       # dup 2 collapsed into 1
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 4 in kept and 1 in kept
    assert 2 not in kept                              # exact dup loser
    assert 3 not in kept                              # near-dup cluster loser
    assert 5 not in kept                              # quality loser
    assert audit["rows_final"] == len(kept)


def test_build_training_corpus_end_to_end(spark, tmp_path, star):
    """Full pretraining pipeline on real fixture docs: every stage's
    audit is monotone non-increasing, bins respect the split boundary,
    and a known leaked n-gram is surgically excised, not doc-dropped."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import build_training_corpus

    docs = star.documents.filter(F.col("doc_id") < 200)
    bench = star.documents.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 210)
    )
    out = str(tmp_path / "corpus")
    audit = build_training_corpus(
        docs,
        out,
        benchmark=bench,
        min_quality=0.1,
        target_mix={"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
        pack_budget=256,
        n_shards=4,
    )
    assert (
        audit["rows_raw"]
        >= audit["rows_after_quality"]
        >= audit["rows_after_exact_dedup"]
        >= audit["rows_after_near_dedup"]
        >= audit["rows_after_mixture"]
        == audit["rows_final"]
        > 0
    )
    assert audit["tokens_removed_decontamination"] >= 0

    packed = spark.read.parquet(out)
    assert {"doc_id", "text", "split", "shard", "bin", "n_tokens",
            "start_offset"} <= set(packed.columns)
    # a shard never mixes splits (bins cannot straddle the boundary)
    mixed = (
        packed.groupBy("shard")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert mixed == 0
    # offsets restart per shard and are cumulative in doc order
    first = packed.groupBy("shard").agg(F.min("start_offset").alias("m")).collect()
    assert all(r["m"] == 0 for r in first)


def test_build_training_corpus_decontaminates_spans_not_docs(spark, tmp_path):
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import build_training_corpus

    docs = spark.createDataFrame(
        [(1, "unique prefix words here leaked secret answer key and an "
             "ordinary long tail of perfectly good tokens to keep around "
             "for training the model on useful content")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    bench = spark.createDataFrame(
        [(99, "leaked secret answer key material")], "doc_id long, text string"
    ).withColumn("lang", F.lit("en"))
    out = str(tmp_path / "c2")
    audit = build_training_corpus(
        docs, out, benchmark=bench, min_quality=0.0, pack_budget=64, n_shards=1
    )
    assert audit["rows_final"] == 1  # the doc SURVIVES
    assert audit["tokens_removed_decontamination"] > 0
    text = spark.read.parquet(out).collect()[0]["text"]
    assert "leaked secret answer" not in text
    assert "useful content" in text


def test_refresh_packed_corpus_incremental(spark, tmp_path):
    """Incremental repack: only shards holding changed docs rewrite;
    untouched shard files stay byte-identical; the refreshed layout
    equals a from-scratch repack of the new version."""
    import os

    from sap_data_pipeline_spark.etl import refresh_packed_corpus_incremental
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    def digest(root):
        out = {}
        for dp, _, fs in os.walk(root):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    shard = [x for x in p.split(os.sep) if x.startswith("shard=")][0]
                    with open(p, "rb") as fh:
                        out.setdefault(shard, []).append(hash(fh.read()))
        return {k: sorted(v) for k, v in out.items()}

    docs = [(i, f"document number {i} with some text tokens " * 3) for i in range(40)]
    t = VersionedParquetTable(spark, str(tmp_path / "corpus"))
    t.merge(spark.createDataFrame(docs, "doc_id long, text string"), ["doc_id"])

    out = str(tmp_path / "packed")
    a0 = refresh_packed_corpus_incremental(t, out, n_shards=4, pack_budget=64)
    base = digest(out)
    assert len(base) > 1

    # change ONE doc
    t.merge(spark.createDataFrame(
        [(7, "a completely rewritten document body with new tokens " * 3)],
        "doc_id long, text string"), ["doc_id"])
    a1 = refresh_packed_corpus_incremental(
        t, out, from_version=a0["to_version"], n_shards=4, pack_budget=64)
    assert a1["n_changed_docs"] == 1
    assert a1["n_affected_shards"] == 1
    after = digest(out)
    changed = {s for s in base if base[s] != after.get(s)}
    assert changed == {f"shard={a1['shards_written'][0]}"}

    # parity: incremental result == full repack of the same version
    ref = str(tmp_path / "packed_ref")
    refresh_packed_corpus_incremental(t, ref, n_shards=4, pack_budget=64)
    ref_rows = spark.read.parquet(ref + "/shard=*").drop("shard")
    inc_rows = spark.read.parquet(out + "/shard=*").drop("shard")
    assert inc_rows.exceptAll(ref_rows).count() == 0
    assert ref_rows.exceptAll(inc_rows).count() == 0

    # no changes → nothing touched
    a2 = refresh_packed_corpus_incremental(
        t, out, from_version=a1["to_version"], n_shards=4, pack_budget=64)
    assert a2["n_affected_shards"] == 0


def test_refresh_packed_corpus_many_changed_docs_audit(spark, tmp_path):
    """Near-full rewrite: the diff audit must stay a single aggregate
    row (count + bounded shard set), never a per-doc collect — r9
    verdict #4.  Audit numbers equal the old per-row implementation's."""
    from sap_data_pipeline_spark.etl import refresh_packed_corpus_incremental
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    docs = [(i, f"document number {i} body tokens " * 3) for i in range(200)]
    t = VersionedParquetTable(spark, str(tmp_path / "corpus"))
    t.merge(spark.createDataFrame(docs, "doc_id long, text string"), ["doc_id"])
    out = str(tmp_path / "packed")
    a0 = refresh_packed_corpus_incremental(t, out, n_shards=4, pack_budget=64)

    # rewrite 190 of the 200 docs — every shard is affected
    t.merge(spark.createDataFrame(
        [(i, f"rewritten body {i} with entirely new words " * 3)
         for i in range(190)],
        "doc_id long, text string"), ["doc_id"])
    a1 = refresh_packed_corpus_incremental(
        t, out, from_version=a0["to_version"], n_shards=4, pack_budget=64)
    import os

    assert a1["n_changed_docs"] == 190
    # 190/200 docs touched ⇒ every (split, shard) cell is affected
    on_disk = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert a1["n_affected_shards"] == len(on_disk)
    # result parity with a from-scratch repack of the same version
    ref = str(tmp_path / "packed_ref")
    refresh_packed_corpus_incremental(t, ref, n_shards=4, pack_budget=64)
    ref_rows = spark.read.parquet(ref + "/shard=*").drop("shard")
    inc_rows = spark.read.parquet(out + "/shard=*").drop("shard")
    assert inc_rows.exceptAll(ref_rows).count() == 0
    assert ref_rows.exceptAll(inc_rows).count() == 0


def test_refresh_packed_corpus_full_rebuild_removes_stale_layout(spark, tmp_path):
    """A full rebuild with a different shard count must not leave the old
    layout's dirs behind (stale dirs double-serve documents)."""
    import os

    from sap_data_pipeline_spark.etl import refresh_packed_corpus_incremental
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    docs = [(i, f"doc {i} body tokens here") for i in range(20)]
    t = VersionedParquetTable(spark, str(tmp_path / "corpus"))
    t.merge(spark.createDataFrame(docs, "doc_id long, text string"), ["doc_id"])
    out = str(tmp_path / "packed")
    refresh_packed_corpus_incremental(t, out, n_shards=8, pack_budget=64)
    n8 = {d for d in os.listdir(out) if d.startswith("shard=")}
    refresh_packed_corpus_incremental(t, out, n_shards=2, pack_budget=64)
    n2 = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert len(n2) < len(n8)
    total = spark.read.parquet(out + "/shard=*").count()
    assert total == 20  # every doc exactly once — no stale double-serving


def test_refresh_packed_corpus_layout_sidecar_forces_full_repack(spark, tmp_path):
    """An INCREMENTAL call whose layout params differ from the on-disk
    layout (recorded in _layout.json) must degrade to a full repack:
    affected shards computed under the new layout would otherwise leave
    old-layout dirs double-serving documents."""
    import os

    from sap_data_pipeline_spark.etl import refresh_packed_corpus_incremental
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    docs = [(i, f"doc {i} body tokens here") for i in range(20)]
    t = VersionedParquetTable(spark, str(tmp_path / "corpus"))
    t.merge(spark.createDataFrame(docs, "doc_id long, text string"), ["doc_id"])
    out = str(tmp_path / "packed")
    a0 = refresh_packed_corpus_incremental(t, out, n_shards=8, pack_budget=64)
    assert os.path.exists(os.path.join(out, "_layout.json"))

    # one changed doc + a DIFFERENT n_shards on the incremental call
    t.merge(spark.createDataFrame(
        [(3, "rewritten body with different tokens")],
        "doc_id long, text string"), ["doc_id"])
    a1 = refresh_packed_corpus_incremental(
        t, out, from_version=a0["to_version"], n_shards=2, pack_budget=64)
    assert a1["layout_changed"]["from"]["n_shards"] == 8
    assert a1["from_version"] is None  # degraded to full repack
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert all(d.rsplit("-", 1)[-1] in {"0", "1"} for d in dirs)  # new layout only
    assert spark.read.parquet(out + "/shard=*").count() == 20  # no double-serving

    # next incremental under the SAME layout is incremental again
    t.merge(spark.createDataFrame(
        [(5, "another rewrite with new words")],
        "doc_id long, text string"), ["doc_id"])
    a2 = refresh_packed_corpus_incremental(
        t, out, from_version=a1["to_version"], n_shards=2, pack_budget=64)
    assert "layout_changed" not in a2
    assert a2["n_changed_docs"] == 1


def test_refresh_packed_corpus_scratch_dir_durable_materialization(spark, tmp_path):
    """scratch_dir materializes the repack as a durable parquet
    intermediate (vs localCheckpoint): identical output, scratch swept
    on success."""
    import os

    from sap_data_pipeline_spark.etl import refresh_packed_corpus_incremental
    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    docs = [(i, f"doc {i} body tokens here") for i in range(20)]
    t = VersionedParquetTable(spark, str(tmp_path / "corpus"))
    t.merge(spark.createDataFrame(docs, "doc_id long, text string"), ["doc_id"])

    out_a = str(tmp_path / "packed_a")
    out_b = str(tmp_path / "packed_b")
    scratch = str(tmp_path / "scratch")
    refresh_packed_corpus_incremental(t, out_a, n_shards=4, pack_budget=64)
    refresh_packed_corpus_incremental(
        t, out_b, n_shards=4, pack_budget=64, scratch_dir=scratch)

    a = spark.read.parquet(out_a + "/shard=*")
    b = spark.read.parquet(out_b + "/shard=*")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert not any(d.startswith("_repack_") for d in os.listdir(scratch)) \
        if os.path.isdir(scratch) else True


def test_build_training_corpus_gopher_gate(spark, tmp_path):
    """gopher_gates=True runs the full rule battery AND'ed with the
    score threshold — the same X.gopher_signals definition the catalog
    query oracles — and the audit counts track the stricter gate."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import build_training_corpus

    # crafted corpus: half pass the battery (stopword-bearing prose of
    # >=50 words), half fail it (symbol spam / stopword-free token soup
    # — which is also what the synthetic star documents look like)
    good = ("the data pipeline reads the table and writes the result for "
            "the next stage with many plain words that keep every ratio "
            "inside the gopher bounds and is long enough to pass the "
            "minimum word count gate easily " + "word " * 20)
    bad_sym = ("# " * 40) + "symbol spam that fails the symbol gate " * 3
    bad_sw = "alpha beta gamma delta " * 20   # no stopwords at all
    rows = [(i, good + f" doc {i}", "en") for i in range(6)]
    rows += [(10 + i, bad_sym, "en") for i in range(3)]
    rows += [(20 + i, bad_sw, "en") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "gg")
    loose = build_training_corpus(
        docs, str(tmp_path / "loose"), min_quality=0.0, pack_budget=256,
        n_shards=2)
    strict = build_training_corpus(
        docs, out, min_quality=0.0, gopher_gates=True, pack_budget=256,
        n_shards=2)
    assert loose["rows_after_quality"] == 12
    assert strict["rows_after_quality"] <= loose["rows_after_quality"]
    assert strict["rows_after_quality"] > 0
    # parity with the catalog battery's keep flag
    from sap_data_pipeline_spark.functions import text as X

    _, gates = X.gopher_signals(X.tokens("text"), X.line_array("text"), "text")
    keep = None
    for g in gates.values():
        keep = g if keep is None else (keep & g)
    assert strict["rows_after_quality"] == docs.filter(keep).count()


def test_build_training_corpus_survives_fully_gated_corpus(spark, tmp_path):
    """An aggressive gate that drops EVERYTHING must yield a clean
    zero-row audit, not a crash (empty CollectMetrics degrade to 0)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import build_training_corpus

    docs = spark.createDataFrame(
        [(i, "tiny", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    audit = build_training_corpus(
        docs, str(tmp_path / "empty"), min_quality=0.0, gopher_gates=True,
        pack_budget=64, n_shards=1)
    assert audit["rows_after_quality"] == 0
    assert audit["rows_final"] == 0
    assert audit["rows_after_near_dedup"] == 0


def test_etl_mch_dim_refresh_replace_mode(spark, tmp_path):
    """etl_zin_mch.py:13-50 twin: Excel dim → '.0' strip on id columns →
    typed cast → replace-mode write (second run replaces, not appends)."""
    from decimal import Decimal

    from sap_data_pipeline_spark.etl import etl_mch_dim_refresh
    from sap_data_pipeline_spark.sources.xlsx import write_xlsx

    header = ["Article No", "MCH", "Article Description", "Article Description.1",
              "Pack size", "D/C MAP", "Unrestricted-Use Stock", "Allocation Qty",
              "On order Stock", "Unrestricted Stock Value", "PTD MVMT", "YTD MVMT",
              "SCA Assortment", "Assortment grade", "Asrt.Grade Description"]
    rows = [
        # pandas '.0' artifacts on the str-typed ids (etl_zin_mch.py:23-26)
        ["100123.0", "M01.0", "Rice 5kg", "米 5公斤", "12.0", "3.50",
         "120", "5", "30", "420.00", "10", "99", "A1.0", "G2.0", "Core"],
        # end-anchored strip must NOT mangle an interior '.0' ('1.05')
        ["1.05", "M02", "Oil 1L", "油 1L", "6", "2.25",
         "40", "0", "8", "90.00", "3", "21", "B7", "G1", "Seasonal"],
    ]
    fp = tmp_path / "Zmmidr_9801.xlsx"
    write_xlsx(str(fp), header, rows)
    target = tmp_path / "Zmmidr_9801_tbl"

    audit = etl_mch_dim_refresh(spark, str(fp), str(target))
    assert audit["rows"] == 2 and audit["mode"] == "replace"
    got = {r["Article"]: r for r in spark.read.parquet(str(target)).collect()}
    assert set(got) == {"100123", "1.05"}  # '.0' stripped end-anchored only
    assert got["100123"]["MCH"] == "M01"
    assert got["100123"]["Pack_Size"] == "12"
    assert got["100123"]["SCA_Assortment"] == "A1"
    assert got["100123"]["Assortment_Grade"] == "G2"
    assert got["100123"]["DC_MAP"] == Decimal("3.50")
    assert got["100123"]["Stock"] == 120
    assert got["1.05"]["Article_Desc_Local"] == "油 1L"

    # replace mode: a re-run with one row leaves exactly one row
    write_xlsx(str(fp), header, rows[:1])
    audit2 = etl_mch_dim_refresh(spark, str(fp), str(target))
    assert audit2["rows"] == 1
    assert spark.read.parquet(str(target)).count() == 1
