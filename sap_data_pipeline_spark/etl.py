"""End-to-end ETL pipelines — the reference's per-T-code flows, Spark-shaped.

Each pipeline composes the same stages the reference runs per watch-folder
batch (``run_all_template.py:23-67`` → ``pipelines/etl_zmb51.py`` etc.):

    discover files (ledger-filtered, sorted)      S3/S6
    → read_sap_export (banner/totals surgery)     S1, P1, P13
    → rename to canonical names                   P3/P4
    → schema-driven clean & cast                  F1-F11 (cast_to_schema)
    → aggregate to the PK grain                   A1
    → MERGE into the keyed fact                   S8
    → record the ledger                           S6

Everything between read and MERGE is one lazy plan — no per-file pandas
loops; a 10k-file backlog is a single distributed job.  Fixture schemas:
FIXTURES.md §1 (zmb51) and §4 (zmmidr).
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_data_pipeline_spark.functions import cleaning as C
from sap_data_pipeline_spark.operators.merge import ParquetMergeTable
from sap_data_pipeline_spark.operators.relational import dedup_keep_last
from sap_data_pipeline_spark.sources.ledger import ProcessedLedger
from sap_data_pipeline_spark.sources.readers import read_sap_export

DEC18 = T.DecimalType(18, 6)

ZMB51_RENAMES = {"Pstng Date": "Date", "Quantity i": "Quantity", "Amount LC": "Cost"}
ZMB51_SCHEMA = T.StructType([
    T.StructField("Article", T.StringType()),
    T.StructField("Site", T.StringType()),
    T.StructField("Date", T.DateType()),
    T.StructField("Quantity", DEC18),
    T.StructField("Cost", DEC18),
    T.StructField("BUn", T.StringType()),
])

ZMMIDR_RENAMES = {"Article No": "Article", "Unrestricted-Use Stock": "Stock"}
ZMMIDR_SCHEMA = T.StructType([
    T.StructField("Article", T.StringType()),
    T.StructField("MCH", T.StringType()),
    T.StructField("Stock", T.DecimalType(14, 6)),
])


def _discover(watch_glob: str, ledger: ProcessedLedger | None) -> list[str]:
    files = sorted(_glob.glob(watch_glob))
    return ledger.filter_new(files) if ledger else files


def etl_movements(
    spark: SparkSession,
    watch_glob: str,
    table: ParquetMergeTable,
    *,
    ledger: ProcessedLedger | None = None,
) -> dict:
    """ZMB51-shaped goods-movement ETL (``pipelines/etl_zmb51.py:21-115``).

    Sign inversion (movement types 251/252 are issues, ``:73-74``) and the
    sum-to-PK-grain aggregation (``:76-80``) happen before the MERGE, so
    re-delivered files upsert the same grain idempotently.
    """
    files = _discover(watch_glob, ledger)
    if not files:
        return {"files": 0}
    raw = read_sap_export(spark, files)
    typed = C.cast_to_schema(C.rename_canonical(raw, ZMB51_RENAMES), ZMB51_SCHEMA)
    # dropna on the merge keys (etl_zmb51.py:57): unparseable dates cast
    # to NULL and must not reach the keyed MERGE as NULL-keyed rows.
    typed = typed.na.drop(subset=["Article", "Site", "Date"])
    agg = (
        typed.withColumn("Article", C.strip_leading_zeros("Article"))
        .groupBy("Article", "Site", "Date")
        .agg(
            F.sum(C.negate(F.col("Quantity"))).alias("Quantity"),
            F.sum(C.negate(F.col("Cost"))).alias("Cost"),
            # packed min keeps the hash aggregate (see pack_ascii8)
            F.min(C.pack_ascii8("BUn")).alias("_BUn"),
        )
        .withColumn("BUn", C.unpack_ascii8("_BUn"))
        .drop("_BUn")
    )
    audit = table.merge(agg)
    if ledger:
        ledger.record_all(files)
    return {"files": len(files), **audit}


def etl_inventory_snapshot(
    spark: SparkSession,
    watch_glob: str,
    table: ParquetMergeTable,
    *,
    dc: str,
    ledger: ProcessedLedger | None = None,
) -> dict:
    """ZMMIDR-shaped DC inventory snapshot (``pipelines/etl_zmmidr_oun.py``).

    Trailing totals row dropped at read (``:28``); DC stamped from the
    extraction context (``:31``), Date = load date (``:70``); keep-LAST
    dedup on (Date, DC, Article) with the explicit file/line order the
    reference gets implicitly from read order (``:72-76``).
    """
    files = _discover(watch_glob, ledger)
    if not files:
        return {"files": 0}
    raw = read_sap_export(spark, files, drop_trailing_totals=True)
    # Cleaned columns selected explicitly (not via cast_to_schema, which
    # projects the target schema only — the _source_file/_source_line
    # order columns must survive until the keep-last dedup).
    renamed = C.rename_canonical(raw, ZMMIDR_RENAMES)
    keep_order = renamed.select(
        C.strip_leading_zeros(F.trim(F.col("Article"))).alias("Article"),
        F.trim(F.col("MCH")).alias("MCH"),
        C.fast_numeric("Stock", "decimal(14,6)").alias("Stock"),
        F.col("_source_file"),
        F.col("_source_line"),
    ).withColumns({
        "DC": F.lit(dc),
        "Date": F.current_date(),
    })
    deduped = dedup_keep_last(
        keep_order,
        ["Date", "DC", "Article"],
        [F.col("_source_file"), F.col("_source_line")],
    ).drop("_source_file", "_source_line")
    audit = table.merge(deduped)
    if ledger:
        ledger.record_all(files)
    return {"files": len(files), **audit}


ZRSSALE_RENAMES = {
    "Bill.Doc.": "Bill_Doc", "Bill. Date": "Date", "MTyp": "Article_Type",
    "Sales Amou": "Amt", "Bill.qty": "Quantity",
}
ZRSSALE_SCHEMA = T.StructType([
    T.StructField("Bill_Doc", T.StringType()),
    T.StructField("Item", T.StringType()),
    T.StructField("Article", T.StringType()),
    T.StructField("Date", T.DateType()),
    T.StructField("Article_Type", T.StringType()),
    T.StructField("Quantity", DEC18),
    T.StructField("Amt", DEC18),
])


def etl_billing_lines(
    spark: SparkSession,
    watch_glob: str,
    table: ParquetMergeTable,
    *,
    ledger: ProcessedLedger | None = None,
) -> dict:
    """ZRSSALE-shaped wholesale billing lines (``pipelines/etl_zrssale.py``).

    Line-grain (no aggregation): filter ``Article_Type == 'ZTTG'``
    (``:107``), then MERGE on the document PK (Bill_Doc, Item) (``:219``)
    — re-delivered documents update in place.
    """
    files = _discover(watch_glob, ledger)
    if not files:
        return {"files": 0}
    raw = read_sap_export(spark, files)
    typed = C.cast_to_schema(
        C.rename_canonical(raw, ZRSSALE_RENAMES), ZRSSALE_SCHEMA,
        keep=["_source_file", "_source_line"],
    )
    lines = typed.filter(F.col("Article_Type") == "ZTTG").withColumn(
        "Article", C.strip_leading_zeros("Article")
    )
    # A document re-billed within the same batch: the LAST file wins
    # (the reference's one-file-per-batch loop gives this implicitly).
    lines = dedup_keep_last(
        lines, ["Bill_Doc", "Item"], [F.col("_source_file"), F.col("_source_line")]
    ).drop("_source_file", "_source_line")
    audit = table.merge(lines)
    if ledger:
        ledger.record_all(files)
    return {"files": len(files), **audit}


ZMACHK_RENAMES = {"Article Description": "Article_Description",
                  "Merchandise Category": "MCH", "Valid-From Date": "Valid_From_Date",
                  "DOH Target": "DOH_Target"}
ZMACHK_SCHEMA = T.StructType([
    T.StructField("Article", T.StringType()),
    T.StructField("Article_Description", T.StringType()),
    T.StructField("MCH", T.StringType()),
    T.StructField("Valid_From_Date", T.DateType()),
    T.StructField("DOH_Target", T.DecimalType(10, 4)),
])


def etl_weekly_sales(
    spark: SparkSession,
    sf_dir: str,
    table: ParquetMergeTable,
    *,
    min_wk: int = 0,
    max_wk: int = 100_000,
    export_csv_path: str | None = None,
) -> dict:
    """Derived-fact build: ``run_etl_weekly_sales``
    (``pipelines/etl_weekly_sales.py:14-93``, SURVEY §3.2).

    Query the week-grain rollup for the requested window, optionally
    export a CSV copy (``:63-72``), then MERGE into the accumulating
    fact keyed (Article, AcctWk, Site) (``:88-93``) — re-running a
    window replaces its rows in place, so backfills are idempotent.
    """
    from sap_data_pipeline_spark.plans.weekly_sales import weekly_sales
    from sap_data_pipeline_spark.sources.readers import load_star

    result = weekly_sales(load_star(spark, sf_dir), min_wk, max_wk)
    if export_csv_path:
        from sap_data_pipeline_spark.sources.sinks import export_csv

        export_csv(result, export_csv_path)
    return table.merge(result)


def etl_store_rp_export(
    spark: SparkSession,
    sf_dir: str,
    output_path: str,
    *,
    start_wk: int = 0,
    end_wk: int = 100_000,
) -> dict:
    """Analytical report export: ``export_store_rp_report``
    (``pipelines/etl_StoreRP.py:105-219``, SURVEY §3.3).

    Six-stage reorder-point review → changed rows only → file sink
    (the reference writes Excel on a network share, ``:204-213``; the
    engine-side sink is CSV — Excel is a driver-side ``toPandas``
    concern, SURVEY §7.4).
    """
    from sap_data_pipeline_spark.plans.store_rp import store_rp_report
    from sap_data_pipeline_spark.sources.readers import load_star
    from sap_data_pipeline_spark.sources.sinks import export_csv

    report = store_rp_report(load_star(spark, sf_dir), start_wk, end_wk)
    export_csv(report, output_path)
    # audit the written files, not a recompute of the plan
    written = spark.read.option("header", "true").csv(output_path)
    return {"rows": written.count()}


ZSTPROMO_RENAMES = {
    "Payer": "Site", "Bill.qty": "Quantity", "Bill. Date": "Date",
    "Sales Amou": "Amt", "SU": "SUn",
}
ZSTPROMO_SCHEMA = T.StructType([
    T.StructField("Article", T.StringType()),
    T.StructField("Site", T.StringType()),
    T.StructField("Date", T.DateType()),
    T.StructField("Amt", DEC18),
    T.StructField("Quantity", DEC18),
    T.StructField("Cost", DEC18),
    T.StructField("SUn", T.StringType()),
])


def etl_promo_billing(
    spark: SparkSession,
    watch_glob: str,
    table: ParquetMergeTable,
    *,
    ledger: ProcessedLedger | None = None,
) -> dict:
    """ZSTPROMO-shaped promo billing ETL (``pipelines/etl_zstpromo.py``).

    Drop-null on the pre-rename keys (Article, Payer, Bill. Date)
    (``:40``), numeric cleaning on Quantity/Amt/Cost (``:57``), then
    sum-to-grain with first-unit (``:59-64``) and MERGE on
    (Article, Site, Date) (``:86-91``).
    """
    files = _discover(watch_glob, ledger)
    if not files:
        return {"files": 0}
    raw = read_sap_export(spark, files)
    renamed = C.rename_canonical(raw, ZSTPROMO_RENAMES)
    typed = C.cast_to_schema(renamed, ZSTPROMO_SCHEMA).na.drop(
        subset=["Article", "Site", "Date"]
    )
    agg = (
        typed.groupBy("Article", "Site", "Date")
        .agg(
            F.sum("Amt").alias("Amt"),
            F.sum("Quantity").alias("Quantity"),
            F.sum("Cost").alias("Cost"),
            # packed min keeps the hash aggregate (see pack_ascii8)
            F.min(C.pack_ascii8("SUn")).alias("_SUn"),
        )
        .withColumn("SUn", C.unpack_ascii8("_SUn"))
        .drop("_SUn")
    )
    audit = table.merge(agg)
    if ledger:
        ledger.record_all(files)
    return {"files": len(files), **audit}


ZMMIDR_DRY_RENAMES = {
    "Article No": "Article",
    "Unrestricted-Use Stock": "Stock",
    "On order Stock": "OnOrder",
}


def etl_inventory_consolidated(
    spark: SparkSession,
    region_globs: dict[str, str],
    out_path: str,
    *,
    ec_regions: tuple[str, ...] = ("9905", "9901", "9902"),
    ec_label: str = "EC",
    measures: tuple[str, ...] = ("Stock", "OnOrder"),
    sum_measures: tuple[str, ...] = (),
    dry_dept: str = "106",
    dry_export_path: str | None = None,
    snapshot_path: str | None = None,
) -> dict:
    """ZMMIDR "dry" consolidated DC inventory (``pipelines/etl_zmmidr_dry.py``).

    The reference loads one file per DC region (``:36-44``), merges the EC
    regions into a single ``Region='EC'`` row per article — measures summed,
    attributes first-wins (``:47-66``) — concatenates with the standalone
    regions (``:70``), builds the ``Article NoDC = Region||Article``
    surrogate (``:73``), cleans the stock measures with the NaN→0.0 policy
    (``:10-18`` — this flow's cleaner diverges from the others: NULL and
    unparseable become 0.0, not NULL), derives ``Dept = MCH[:3]`` (``:27``),
    exports the dry-goods subset ``Dept=='106'`` (``:82-84``), stamps the
    snapshot date (``:87``) and replaces the warehouse table (``:112``),
    then re-stamps with a DateTime and writes ``inventory_snapshot``
    (``:116,137``).

    Column policy, mirroring the reference:
      * ``measures`` — summed in the EC merge AND NaN→0.0-cleaned
        (reference ``:76-77`` cleans exactly Stock / On-order).
      * ``sum_measures`` — summed in the EC merge, parse-but-preserve-NULL
        (the reference sums ``Allocation Qty`` / ``PTD MVMT`` / … at ``:58-62``
        but never runs ``clean_number`` on them, so standalone-region NaNs
        reach the warehouse as NULL).
      * everything else — attribute: carried through unchanged and
        first-WINS in the EC merge with pandas ``GroupBy.first`` semantics
        (the first NON-NULL value in priority order — ``:48-66``).

    Spark shape: one lazy plan over all region files — per-region scans
    union into one frame (``allowMissingColumns`` mirrors ``pd.concat``'s
    column union); the EC merge is ONE shuffle on Article restricted to
    the EC rows (non-EC rows bypass it).  First-wins priority is pinned
    to the ``ec_regions`` tuple (the reference's explicit concat order
    ``9905→9901→9902`` at ``:47``), NOT the iteration order of
    ``region_globs``; ties break on (file, line).  Null-skipping is
    ``MIN(struct(prio, file, line, value)) FILTER (WHERE value IS NOT
    NULL)`` — an ordered-struct min per column, which stays inside the
    same hash aggregate as the sums (no extra shuffle, no window).
    Replace (not MERGE) matches the reference's ``if_exists='replace'``.
    """
    frames = []
    n_files = 0
    for pos, (region, pattern) in enumerate(region_globs.items()):
        files = sorted(_glob.glob(pattern))
        if not files:
            continue
        n_files += len(files)
        # EC first-wins priority comes from ec_regions order (reference
        # concat order, etl_zmmidr_dry.py:47) — not dict iteration order.
        prio = (
            ec_regions.index(region)
            if region in ec_regions
            else len(ec_regions) + pos
        )
        raw = read_sap_export(spark, files, drop_trailing_totals=True)
        renamed = C.rename_canonical(raw, ZMMIDR_DRY_RENAMES)
        passthrough = [
            c
            for c in renamed.columns
            if c not in {"Article", *measures, *sum_measures}
            and not c.startswith("_")
        ]
        frames.append(
            renamed.select(
                F.lit(region).alias("Region"),
                C.strip_leading_zeros(F.trim(F.col("Article"))).alias("Article"),
                # attributes carried through verbatim (reference keeps every
                # export column — etl_zmmidr_dry.py:48-66,91-109); MCH is
                # trimmed because Dept derives from its first 3 chars
                *[
                    F.trim(F.col(c)).alias(c) if c == "MCH" else F.col(c)
                    for c in passthrough
                ],
                # NaN→0.0 cleaner policy (etl_zmmidr_dry.py:10-18,76-77)
                *[
                    F.coalesce(
                        C.fast_numeric(m, "decimal(14,2)"),
                        F.lit(0).cast("decimal(14,2)"),
                    ).alias(m)
                    for m in measures
                ],
                # summed-but-not-cleaned measures: NULL survives parse
                *[C.fast_numeric(m, "decimal(14,2)").alias(m) for m in sum_measures],
                F.lit(prio).alias("_region_prio"),
                F.col("_source_file"),
                F.col("_source_line"),
            )
        )
    if not frames:
        return {"files": 0}
    from functools import reduce as _reduce

    df = _reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )

    all_measures = (*measures, *sum_measures)
    attrs = [
        c
        for c in df.columns
        if c not in {"Article", "Region", *all_measures} and not c.startswith("_")
    ]

    def first_nonnull(col: str) -> F.Column:
        # pandas GroupBy.first: earliest NON-NULL in concat order.  The
        # when() nulls out rows where the value is null, so MIN skips them;
        # (prio, file, line) is unique per row, so the struct min is the
        # priority-ordered first and the trailing value field never decides.
        ordered = F.when(
            F.col(col).isNotNull(),
            F.struct(
                F.col("_region_prio").alias("p"),
                F.col("_source_file").alias("f"),
                F.col("_source_line").alias("l"),
                F.col(col).alias("v"),
            ),
        )
        return F.min(ordered).getField("v").alias(col)

    ec = (
        df.filter(F.col("Region").isin(*ec_regions))
        .groupBy("Article")
        .agg(
            *[F.sum(m).alias(m) for m in all_measures],
            *[first_nonnull(a) for a in attrs],
        )
        .withColumn("Region", F.lit(ec_label))
    )
    rest = df.filter(~F.col("Region").isin(*ec_regions)).drop(
        "_region_prio", "_source_file", "_source_line"
    )
    merged = rest.unionByName(ec.select(*rest.columns))

    consolidated = merged.select(
        F.concat(F.col("Region"), F.col("Article")).alias("Article_NoDC"),
        "*",
    ).withColumns({
        "Dept": F.substring("MCH", 1, 3),
        "Snapshot_Date": F.current_date(),
    })

    audit: dict = {"files": n_files}
    if dry_export_path:
        from pyspark.sql import Observation

        from sap_data_pipeline_spark.sources.sinks import export_csv

        obs = Observation()
        dry = consolidated.filter(F.col("Dept") == dry_dept).select(
            "Article_NoDC", "Region", "Article", *measures
        ).observe(obs, F.count(F.lit(1)).alias("rows"))
        export_csv(dry, dry_export_path)
        audit["dry_rows"] = int(obs.get["rows"])

    from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

    audit["rows"] = write_parquet_atomic(
        consolidated.drop("Article_NoDC"), out_path
    )
    if snapshot_path:
        # second target (etl_zmmidr_dry.py:116,137): same frame, DateTime
        # stamp instead of Date.  The reference's comment says append but
        # the code passes 'replace' — code wins, replace here too.
        audit["snapshot_rows"] = write_parquet_atomic(
            consolidated.drop("Article_NoDC").withColumn(
                "Snapshot_Date", F.current_timestamp()
            ),
            snapshot_path,
        )
    return audit


def etl_load_dims(
    spark: SparkSession,
    folder: str,
    configs: dict[str, dict],
    tables_root: str,
) -> dict[str, dict]:
    """Config-driven dimension-workbook loader
    (``pipelines/etl_upload_excel.py:142-235``).

    ``configs`` mirrors the reference's ``excel_configs`` catalog
    (``:12-139``): ``{file_name: {"table": name, "pk": [...],
    "schema": StructType}}``.  Per present file: driver-side dim read →
    schema-driven cast → PK NOT NULL enforcement (the reference's
    ``ALTER COLUMN ... NOT NULL``, ``:174-178``, would reject the load;
    we drop the violating rows and report them) → keep-first dedup on PK
    (SQL Server MERGE errors on duplicate source keys) → MERGE upsert
    with create-if-missing.  Returns per-table before/after audits.
    """
    from pathlib import Path

    from sap_data_pipeline_spark.operators.relational import dedup_keep_first
    from sap_data_pipeline_spark.sources.readers import read_dim_table

    results: dict[str, dict] = {}
    for file_name, cfg in configs.items():
        fp = Path(folder) / file_name
        if not fp.exists():
            continue
        df = read_dim_table(spark, str(fp))
        typed = C.cast_to_schema(df, cfg["schema"])
        clean = typed.na.drop(subset=list(cfg["pk"]))
        deduped = dedup_keep_first(clean, list(cfg["pk"]))
        table = ParquetMergeTable(
            spark, str(Path(tables_root) / cfg["table"]),
            keys=list(cfg["pk"]), retry_delay_s=0.0,
        )
        results[cfg["table"]] = table.merge(deduped)
    return results


ZIN_MCH_RENAMES = {
    "Article No": "Article",
    "Article Description": "Article_Desc",
    "Article Description.1": "Article_Desc_Local",
    "Pack size": "Pack_Size",
    "D/C MAP": "DC_MAP",
    "Unrestricted-Use Stock": "Stock",
    "Allocation Qty": "Allocation_Qty",
    "On order Stock": "On_Order_Stock",
    "Unrestricted Stock Value": "Stock_Value",
    "PTD MVMT": "PTD_MVMT",
    "YTD MVMT": "YTD_MVMT",
    "SCA Assortment": "SCA_Assortment",
    "Assortment grade": "Assortment_Grade",
    "Asrt.Grade Description": "Grade_Desc",
}
# the reference's str-typed id columns that pandas mangles with a
# float '.0' artifact (etl_zin_mch.py:23-26), post-rename names
ZIN_MCH_ID_COLS = ["Article", "MCH", "Pack_Size", "SCA_Assortment",
                   "Assortment_Grade"]
ZIN_MCH_SCHEMA = T.StructType([
    # mirrors the reference's column_types catalog (etl_zin_mch.py:28-44)
    T.StructField("Article", T.StringType()),
    T.StructField("MCH", T.StringType()),
    T.StructField("Article_Desc", T.StringType()),
    T.StructField("Article_Desc_Local", T.StringType()),
    T.StructField("Pack_Size", T.StringType()),
    T.StructField("DC_MAP", T.DecimalType(10, 2)),
    T.StructField("Stock", T.IntegerType()),
    T.StructField("Allocation_Qty", T.IntegerType()),
    T.StructField("On_Order_Stock", T.IntegerType()),
    T.StructField("Stock_Value", T.DecimalType(14, 2)),
    T.StructField("PTD_MVMT", T.IntegerType()),
    T.StructField("YTD_MVMT", T.IntegerType()),
    T.StructField("SCA_Assortment", T.StringType()),
    T.StructField("Assortment_Grade", T.StringType()),
    T.StructField("Grade_Desc", T.StringType()),
])


def etl_mch_dim_refresh(spark: SparkSession, path: str, target_dir: str) -> dict:
    """Zmmidr_9801 MCH-dimension refresh (``pipelines/etl_zin_mch.py:13-50``).

    The reference's whole flow is: read one Excel workbook, strip the
    pandas ``'.0'`` float artifact off five str-typed id columns
    (``:23-26`` — we anchor the replace to end-of-string, fixing the
    reference's anywhere-replace bug, see F8), declare SQL types
    (``:28-44``), and upload in **replace** mode (``:48``).  Spark twin:
    dim read → rename to canonical → ``strip_dot_zero_suffix`` on the id
    columns → ``cast_to_schema`` → atomic replace-mode parquet write.
    """
    from sap_data_pipeline_spark.sources.readers import read_dim_table
    from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

    df = C.rename_canonical(read_dim_table(spark, path), ZIN_MCH_RENAMES)
    for col in ZIN_MCH_ID_COLS:
        if col in df.columns:
            df = df.withColumn(col, C.strip_dot_zero_suffix(F.trim(F.col(col))))
    typed = C.cast_to_schema(df, ZIN_MCH_SCHEMA)
    rows = write_parquet_atomic(typed, target_dir)
    return {"table": "Zmmidr_9801", "mode": "replace", "rows": rows}


def etl_article_master(
    spark: SparkSession,
    watch_glob: str,
    table: ParquetMergeTable,
    *,
    only_new: bool = False,
    ledger: ProcessedLedger | None = None,
) -> dict:
    """ZMACHK-shaped article-master load (``pipelines/etl_zmachk.py``).

    ``Status == 'Y'`` gate then column dropped (``:32-34``); ``'-'``→NULL
    on numerics (``:79-80``); dedup keep-first on Article (``:37``);
    ``only_new=True`` reproduces the new-article anti-join mode
    (``:113-117``) — existing keys are untouched instead of updated.
    """
    from sap_data_pipeline_spark.operators.relational import dedup_keep_first, left_anti

    files = _discover(watch_glob, ledger)
    if not files:
        return {"files": 0}
    raw = read_sap_export(spark, files)
    renamed = C.rename_canonical(raw, ZMACHK_RENAMES)
    gated = renamed.filter(F.col("Status") == "Y").drop("Status")
    # '-'-as-NULL on numerics (etl_zmachk.py:79-80) is subsumed by
    # cast_to_schema: clean-then-try_cast sends '-' to NULL.
    typed = C.cast_to_schema(gated, ZMACHK_SCHEMA).withColumn(
        "Article", C.strip_leading_zeros("Article")
    )
    articles = dedup_keep_first(typed, ["Article"])
    if only_new and table.exists():
        articles = left_anti(articles, table.read(), ["Article"])
    audit = table.merge(articles)
    if ledger:
        ledger.record_all(files)
    return {"files": len(files), **audit}


def curate_corpus(
    documents,
    out_path: str,
    *,
    min_quality: float = 0.3,
    near_dedup: bool = True,
) -> dict:
    """Training-corpus curation flow: the extension operators composed
    into the pipeline they exist for.

        quality gate → exact dedup (canonical = min doc_id per
        fingerprint) → MinHash+LSH near-dup CLUSTERING (connected
        components; keep the min-id doc per component) → atomic write

    Component-based survivor selection, not pair-based: dropping "the
    higher id of each candidate pair" keeps two docs whose only links
    run through a shared third (pairs (1,3),(2,3) keep both 1 and 2),
    while one-canonical-per-component is the standard keep-one policy
    and what the cluster operator exists for.

    Scale shape: two content-keyed shuffles (fingerprint group-by, LSH
    band group-by), O(component diameter) label-propagation rounds, and
    one id semi-join — no driver collects beyond per-round convergence
    scalars, no Python row UDFs.  Returns per-stage row counts so the
    curation loss is auditable (a silent 90% drop is a pipeline bug,
    not a success).
    """
    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

    n_raw = documents.count()
    # NOTE: the r12 tokenizer hoist (quality_score_from over a projected
    # token tier) does NOT apply to FILTER gates — Catalyst's predicate
    # pushdown substitutes the alias back into the pushed predicate,
    # re-expanding it per reference (measured: 9 expansions either way).
    # The hoist only helps PROJECT consumers (admission_funnel et al.).
    gated = documents.filter(X.quality_score("text") >= min_quality)
    n_gated = gated.count()

    canonical = exact_dedup(gated).select("doc_id")
    exact_kept = gated.join(canonical, "doc_id", "semi")
    n_exact = exact_kept.count()

    if near_dedup:
        pairs = minhash_dedup_pairs(exact_kept)
        cc = connected_components(exact_kept.select("doc_id"), pairs)
        keep = cc.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
        curated = exact_kept.join(keep, "doc_id", "semi")
    else:
        curated = exact_kept
    n_final = write_parquet_atomic(curated, out_path)
    return {
        "rows_raw": n_raw,
        "rows_after_quality": n_gated,
        "rows_after_exact_dedup": n_exact,
        "rows_final": n_final,
    }


def shard_key(id_col: str, n_shards: int, split_col: str = "split"):
    """Content-addressed shard id ``{split}-{id % n_shards}`` — the ONE
    definition shared by :func:`build_training_corpus` and
    :func:`refresh_packed_corpus_incremental`.  The incremental refresh
    reuses unchanged shards byte-for-byte, which is only sound while
    both writers derive shards identically; a second copy of this
    expression would let them drift apart silently.  Embedding the
    split means no training bin ever straddles a train/val/test
    boundary."""
    return F.concat_ws(
        "-", F.col(split_col), F.pmod(F.col(id_col), F.lit(n_shards))
    )


def build_training_corpus(
    documents,
    out_path: str,
    *,
    benchmark=None,
    min_quality: float = 0.3,
    gopher_gates: bool = False,
    target_mix: dict[str, float] | None = None,
    mix_col: str = "lang",
    mix_weight_col: str | None = None,
    split_weights: dict[str, int] | None = None,
    pack_budget: int = 2048,
    n_shards: int = 8,
) -> dict:
    """The COMPLETE pretraining-data pipeline, every stage a catalog
    operator, composed end-to-end:

        quality gate → exact dedup → near-dup clustering (keep the
        BEST-quality doc per component) → span-level benchmark
        decontamination → target-mixture downsampling → deterministic
        train/val/test split → token-budget sequence packing → atomic
        write

    This is the flow a "switch from the reference" user runs on a raw
    corpus: each stage is independently oracled/tested; this function
    adds only the plumbing and the per-stage loss audit (silent drops
    are pipeline bugs).  Optional stages skip cleanly: no ``benchmark``
    → no decontamination; no ``target_mix`` → no mixing.

    Scale notes: stages reuse the operators' scale shapes (broadcast
    probes, content-keyed shuffles, O(log d) clustering rounds); the
    decontaminated text REPLACES ``text`` (and re-derives token counts)
    so downstream packing budgets see post-surgery lengths.
    """
    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.dedup import (
        decontaminate_spans,
        exact_dedup,
        keep_best_per_cluster,
        minhash_dedup_pairs,
    )
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan,
        hash_split,
        mixture_plan,
        pack_by_offset,
    )
    from pyspark.sql import Observation

    from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

    # Audit cost discipline (r6): the old version ran one eager .count()
    # per stage — four full pipeline rescans at 100 TB.  Now:
    #   * raw/quality/exact-dedup counts fold into ONE combined
    #     aggregate over the raw corpus (count, conditional count,
    #     conditional distinct-fingerprint — a single scan), run after
    #     the write;
    #   * near-dedup/decontamination/mixture counts ride df.observe()
    #     accumulators drained after the final write — zero extra
    #     passes.  Observations are attached ONLY to frames whose first
    #     executing action is the final write: a frame consumed by the
    #     dedup operators' localCheckpoint materializations latches its
    #     CollectMetrics EMPTY (the checkpoint job is not a SQL query
    #     execution), permanently losing the count — which is why the
    #     early-stage counts use the combined aggregate instead.
    obs: dict[str, Observation] = {}
    audit: dict = {}

    # the quality gate: the score threshold, optionally AND'ed with the
    # full Gopher rule battery (gopher_gates=True) — the SAME
    # X.gopher_signals definition the catalog query verifies, so the
    # pipeline's gate semantics are oracle-backed
    gate = X.quality_score("text") >= min_quality
    if gopher_gates:
        _, gates = X.gopher_signals(
            X.tokens("text"), X.line_array("text"), "text"
        )
        for g in gates.values():
            gate = gate & g
    gated = documents.filter(gate)
    exact_kept = gated.join(exact_dedup(gated).select("doc_id"), "doc_id", "semi")

    obs["rows_after_near_dedup"] = Observation("rows_after_near_dedup")
    near_kept = keep_best_per_cluster(
        exact_kept, minhash_dedup_pairs(exact_kept)
    ).observe(obs["rows_after_near_dedup"], F.count(F.lit(1)).alias("n"))

    if benchmark is not None:
        obs["tokens_removed"] = Observation("tokens_removed")
        cleaned = decontaminate_spans(near_kept, benchmark)
        near_kept = (
            near_kept.drop("text")
            .join(cleaned.select("doc_id", "n_removed", "clean_text"), "doc_id")
            .withColumnRenamed("clean_text", "text")
            .observe(
                obs["tokens_removed"],
                F.coalesce(F.sum("n_removed"), F.lit(0)).alias("n"),
            )
            .drop("n_removed")
        )

    if target_mix is not None:
        obs["rows_after_mixture"] = Observation("rows_after_mixture")
        plan = mixture_plan(near_kept, mix_col, target_mix,
                            weight_col=mix_weight_col)
        near_kept = apply_mixture_plan(near_kept, plan, mix_col, key="doc_id")
        near_kept = near_kept.observe(
            obs["rows_after_mixture"], F.count(F.lit(1)).alias("n")
        )

    split = hash_split(near_kept, "doc_id", weights=split_weights)
    packed = pack_by_offset(
        split.withColumn("n_tokens", X.token_count("text"))
        .withColumn("shard", shard_key("doc_id", n_shards)),
        "n_tokens",
        budget=pack_budget,
        shard_col="shard",
        order_by=["doc_id"],
    )
    audit["rows_final"] = write_parquet_atomic(packed, out_path)
    # the write was the action — drain the stage observations now.  A
    # fully-gated (empty) corpus leaves CollectMetrics without a metrics
    # row, which the Py4J row conversion rejects — degrade those to 0
    # instead of failing the pipeline on an aggressive filter config.
    for key, ob in obs.items():
        name = "tokens_removed_decontamination" if key == "tokens_removed" else key
        try:
            audit[name] = ob.get["n"] or 0
        except Exception:
            audit[name] = 0
    # early-stage counts: one combined scan of the raw corpus (count +
    # conditional count + conditional distinct fingerprint), replacing
    # three separate pipeline re-executions
    q = X.quality_score("text") >= min_quality
    if gopher_gates:
        _, _gates2 = X.gopher_signals(
            X.tokens("text"), X.line_array("text"), "text"
        )
        for g in _gates2.values():
            q = q & g
    early = documents.agg(
        F.count(F.lit(1)).alias("raw"),
        F.count(F.when(q, 1)).alias("gated"),
        F.count_distinct(
            F.when(q, X.md5_fingerprint("text"))
        ).alias("exact"),
    ).collect()[0]
    audit["rows_raw"] = early["raw"]
    audit["rows_after_quality"] = early["gated"]
    audit["rows_after_exact_dedup"] = early["exact"]
    # n_bins reads the WRITTEN table, not the packed lineage — a scan of
    # the output beats re-running the whole pipeline for one distinct
    audit["n_bins"] = (
        packed.sparkSession.read.parquet(out_path)
        .select("shard", "split", "bin").distinct().count()
    )
    return audit


def refresh_packed_corpus_incremental(
    table,
    out_root: str,
    *,
    from_version: int | None = None,
    pack_budget: int = 2048,
    n_shards: int = 8,
    split_weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    scratch_dir: str | None = None,
) -> dict:
    """Incremental refresh of the packed training layout from a
    versioned curated corpus: re-pack ONLY the shards touched since
    ``from_version``, reuse every other shard's files untouched.

    The full pipeline (:func:`build_training_corpus`) packs the whole
    corpus; on a 100 TB table where a daily curation batch changes a
    fraction of documents, re-packing everything re-reads and re-writes
    ~all of it.  This flow exploits two facts: (a) split and shard
    assignment are CONTENT-ADDRESSED (md5 split of the doc id, shard =
    ``split-doc_id%n``) — a document's shard never depends on other
    documents; (b) packing is shard-local.  So the shards affected by a
    change set are exactly the shards of the changed/deleted doc ids,
    computable from :meth:`VersionedParquetTable.diff` WITHOUT reading
    unchanged data, and every other shard's packed output is already
    correct byte-for-byte.

    Writes one directory per shard under ``out_root`` (overwriting only
    affected shards) and returns an audit dict.  ``from_version=None``
    (or a diff that touches everything) degrades to a full repack —
    same result, no special casing.

    Scale shape: the diff prunes to changed files; the repack reads the
    current snapshot semi-joined to affected shards only (shard is
    derived map-side, so the filter prunes before any shuffle); per
    affected shard, one window over that shard's rows.

    Layout safety: the shard layout params (``n_shards``,
    ``split_weights``, ``pack_budget``) are persisted in a
    ``_layout.json`` sidecar under ``out_root``.  An incremental call
    whose params differ from the on-disk layout would compute affected
    shards under the NEW layout and leave old-layout shard dirs
    double-serving documents — so a mismatch forces a full repack
    (recorded in the audit as ``layout_changed``).

    Durability: ``scratch_dir`` (when given) materializes the repack as
    a parquet intermediate instead of ``localCheckpoint`` — a reliable
    on-disk copy that survives executor loss, mirroring the
    ``checkpoint_dir`` contract of :func:`operators.graph.pagerank`.
    Leave it ``None`` only where re-running the job on failure is
    acceptable.
    """
    import json as _json

    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.sampling import hash_split, pack_by_offset

    def with_shard(df):
        return hash_split(df, id_col, weights=split_weights).withColumn(
            "shard", shard_key(id_col, n_shards)
        )

    import os
    import shutil

    to_version = table.current_version
    audit: dict = {"from_version": from_version, "to_version": to_version}

    layout = {
        "n_shards": n_shards,
        "split_weights": split_weights,
        "pack_budget": pack_budget,
    }
    sidecar = os.path.join(out_root, "_layout.json")
    if from_version is not None and os.path.exists(sidecar):
        with open(sidecar) as fh:
            on_disk = _json.load(fh)
        if on_disk != layout:
            audit["layout_changed"] = {"from": on_disk, "to": layout}
            from_version = None  # full repack — old-layout dirs get swept
    elif from_version is not None and not os.path.exists(sidecar):
        # pre-sidecar layout on disk (or first write): can't prove the
        # incremental reuse contract holds — rebuild once to mint it
        audit["layout_changed"] = {"from": None, "to": layout}
        from_version = None
    audit["from_version"] = from_version

    if from_version is not None:
        # one diff computation feeds both the shard list and the count —
        # as ONE aggregate row, never per-doc rows: the shard set is
        # bounded by n_shards and the doc count is a scalar, so the
        # driver transfer stays O(n_shards) even when a near-full
        # rewrite touches every document (r9 verdict #4).
        agg = with_shard(
            table.diff([id_col], from_version, to_version)
        ).agg(
            F.count(F.lit(1)).alias("n_changed"),
            F.collect_set("shard").alias("shards"),
        ).collect()[0]
        affected = sorted(agg["shards"])
        audit["n_changed_docs"] = agg["n_changed"]
    else:
        affected = None  # full build

    full = with_shard(table.read(to_version))
    if affected is not None:
        if not affected:
            audit.update(n_affected_shards=0, n_reused_shards="all")
            return audit
        full = full.filter(F.col("shard").isin(affected))

    # materialize ONCE: the per-shard writes below (and the shard list)
    # must not each re-execute the read+split+count+window lineage —
    # that would be one full corpus pass per shard.  With a scratch_dir
    # the materialization is a durable parquet intermediate (survives
    # executor loss; localCheckpoint pins blocks to executor storage
    # with no lineage fallback).
    packed = pack_by_offset(
        full.withColumn("n_tokens", X.token_count("text")),
        "n_tokens",
        budget=pack_budget,
        shard_col="shard",
        order_by=[id_col],
    )
    scratch_path = None
    if scratch_dir is not None:
        scratch_path = os.path.join(scratch_dir, f"_repack_v{to_version}")
        packed.write.mode("overwrite").parquet(scratch_path)
        packed = table.spark.read.parquet(scratch_path)
    else:
        packed = packed.localCheckpoint(eager=True)
    shards_written = sorted(
        r["shard"] for r in packed.select("shard").distinct().collect()
    )
    for s in shards_written:  # per-shard atomic dir swap, others untouched
        packed.filter(F.col("shard") == s).write.mode("overwrite").parquet(
            f"{out_root}/shard={s}"
        )
    # stale dirs must go: in incremental mode, an affected shard whose
    # every doc was deleted; in a full rebuild, any shard of a previous
    # layout (different n_shards/splits) that this layout no longer has
    stale = (
        set(affected) - set(shards_written)
        if affected is not None
        else {
            d[len("shard="):]
            for d in (os.listdir(out_root) if os.path.isdir(out_root) else [])
            if d.startswith("shard=")
        } - set(shards_written)
    )
    for s in stale:
        shutil.rmtree(f"{out_root}/shard={s}", ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)
    with open(sidecar, "w") as fh:
        _json.dump(layout, fh)
    if scratch_path is not None:
        shutil.rmtree(scratch_path, ignore_errors=True)
    audit["n_affected_shards"] = len(affected or shards_written)
    audit["shards_written"] = shards_written
    return audit


def admit_crawl_batch(
    reference,
    batch,
    out_path: str,
    *,
    host_col: str = "host",
    min_quality: float = 0.3,
    host_min_docs: int = 5,
    host_max_low_pct: int = 50,
    split_weights: dict[str, int] | None = None,
    robots_rules=None,
    url_col: str = "url",
    line_filters: bool = False,
) -> dict:
    """Crawl-batch ADMISSION pipeline — the ingest-side complement of
    :func:`build_training_corpus` (which curates a corpus already
    admitted).  Every stage is an independently-oracled catalog
    operator; this function adds plumbing and the per-stage loss audit:

        [optional] robots.txt politeness re-check (rules change between
        fetch and ingest; requires ``url_col`` + a (host, path_prefix,
        allow) ``robots_rules`` frame — RFC 9309 precedence)
        → cross-snapshot exact dedup (reject re-crawls of the reference
        corpus, fold within-batch copies to their keep-first canonical)
        → [optional, ``line_filters=True``] in-place line cleanup:
        C4 shape rules + within-doc keep-first dedup as ONE zero-shuffle
        projection (``corpus.apply_line_filters``) — runs AFTER the
        content dedup (admission compares pages as fetched) and BEFORE
        quality scoring (scores judge the text that would train)
        → host-tier quality blocklist (domain-level admission cut)
        → leakage-safe content-keyed train/val/test assignment
        → atomic write

    Returns the audit dict: ``batch_rows``, ``robots_rejected`` (when
    gated), ``admitted_after_dedup``, ``lines_removed`` (when line
    filtering), ``blocked_hosts``, ``rows_final`` — each stage's loss
    is visible, silent drops are pipeline bugs.

    Scale notes: the robots verdict joins hosts-sized broadcast rules
    and one url-keyed rank window; the snapshot dedup shuffles 32-hex
    fingerprints (never reference text); the line rewrite is a pure
    projection; the host verdict is hosts-sized and re-enters
    broadcast; the split is a stateless scan.  The admitted-count audit
    is ONE extra aggregate over fingerprint-sized rows, not a pipeline
    re-execution; the blocked-host count collects the hosts-sized
    verdict only.
    """
    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.corpus import (
        apply_line_filters,
        robots_disallow_gate,
    )
    from sap_data_pipeline_spark.operators.dedup import snapshot_admission
    from sap_data_pipeline_spark.operators.quality import (
        blocklist_filter,
        host_quality_gate,
    )
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split
    from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

    audit: dict = {}
    audit["batch_rows"] = batch.count()

    if robots_rules is not None:
        allowed_urls = (
            robots_disallow_gate(
                batch.select(F.col(url_col).alias("url")), robots_rules
            )
            .filter(F.col("allowed"))
            .select(F.col("url").alias(url_col))
        )
        batch = batch.join(allowed_urls, url_col, "semi")
        audit["robots_rejected"] = audit["batch_rows"] - batch.count()

    admitted_ids = snapshot_admission(reference, batch).select(
        "doc_id", "n_copies"
    )
    admitted = batch.join(admitted_ids, "doc_id", "semi")

    if line_filters:
        admitted = apply_line_filters(admitted)
        audit["lines_removed"] = (
            admitted.agg(F.sum("lines_removed")).collect()[0][0] or 0
        )
        admitted = admitted.drop("lines_removed")

    scored = admitted.select(
        F.col(host_col), "text", X.tokens("text").alias("_toks")
    ).select(
        F.col(host_col),
        (X.quality_score_from(F.col("text"), F.col("_toks")) < min_quality)
        .alias("is_low"),
    )
    verdict = host_quality_gate(
        scored,
        host_col=host_col,
        min_docs=host_min_docs,
        max_low_pct=host_max_low_pct,
    )
    kept = blocklist_filter(admitted, verdict, host_col=host_col)

    split = dedup_safe_split(kept, weights=split_weights)
    audit["rows_final"] = write_parquet_atomic(split, out_path)

    # loss accounting: one scalar count per pre-write stage (fingerprint-
    # sized / hosts-sized inputs — never a corpus re-scan), after the
    # write so the cached shuffle files are reused where possible.
    # (batch_rows counted up front: the robots gate rebinds ``batch``.)
    audit["admitted_after_dedup"] = admitted_ids.count()
    audit["blocked_hosts"] = verdict.filter(F.col("blocked")).count()
    return audit
