"""Store reorder-point review — the reference's second analytical query.

Reference: ``pipelines/etl_StoreRP.py:107-201`` — a six-CTE pipeline:
Base (week-grain re-agg) → Sales (conditional COUNT/AVG over positive
weeks) → LatestRP (parameter snapshot) → Main (inner join + CEILING
reorder math) → Condition (ABS-diff change flags + stability gate) →
final projection ``WHERE Change='YES' ORDER BY Article, Store``.

Each CTE is one ``.transform`` stage here.  ``wks_gate`` is parameterized
(reference hard-codes ``Wks > 38`` against a 52-week window,
``etl_StoreRP.py:183``); callers pass a gate proportional to their week
range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sap_data_pipeline_spark.plans import star_mapping as sm
from sap_data_pipeline_spark.plans.weekly_sales import weekly_sales, weekly_sales_oracle
from sap_data_pipeline_spark.sources.readers import Star


def store_rp_report(
    star: Star,
    start_wk: int = 0,
    end_wk: int = 100_000,
    wks_gate: int = 38,
    diff_threshold: float = 2.0,
) -> DataFrame:
    # Step 1: Base — the reference re-aggregates fact_TawaSales_Weekly to
    # week grain (etl_StoreRP.py:114-123) because its fact accumulates
    # over loads; our weekly_sales output is already unique at
    # (AcctWk, Article, Site), so the re-agg would shuffle 100% of the
    # rows to reproduce them — skipped (oracle keeps the literal re-agg;
    # summing a single row per key yields identical values).
    base = weekly_sales(star, start_wk, end_wk).select("Article", "Site", "AcctWk", "Qty")
    # Step 2: Sales — weeks with sales + average over positive weeks
    pos = F.when(F.col("Qty") > 0, F.col("Qty"))
    sales = base.groupBy("Article", "Site").agg(
        F.count(pos).alias("Wks"),
        F.round(
            F.sum(pos.cast(sm.DEC)).cast("double")
            / F.count(pos).cast("double"),
            1,
        ).alias("Wkly_Avg"),
    )
    # Step 3: LatestRP — the parameter snapshot
    rp = sm.store_rp_params(star)
    # Step 4: Main — join + CEILING ladder (etl_StoreRP.py:163-170).
    # Build side is the PARAMETER table (dims-derived: |part|×|site|),
    # not the fact-derived sales aggregate — without the explicit
    # broadcast the planner picked the sales side (bigger at every SF)
    # as the build relation (guide §3.1: broadcast the small side).
    main = (
        sales.join(F.broadcast(rp), ["Article", "Site"], "inner")
        .withColumnRenamed("Site", "Store")
        .withColumn(
            "Sales_x125",
            F.when(
                F.col("Rounding") * 0.5 > F.col("Wkly_Avg") * 1.25,
                F.ceil(F.col("Rounding") * 0.5),
            ).otherwise(F.ceil(F.col("Wkly_Avg") * 1.25)).cast("double"),
        )
        .withColumn(
            "Sales_x2",
            F.when(
                F.col("Rounding") > F.col("Wkly_Avg") * 2,
                F.ceil(F.col("Rounding")),
            ).otherwise(F.ceil(F.col("Wkly_Avg") * 2)).cast("double"),
        )
    )
    # Step 5: Condition — change detection (etl_StoreRP.py:177-190)
    cond = (
        main.withColumn("diff_ro", F.abs(F.col("Reorder") - F.col("Sales_x125")))
        .withColumn("diff_tar", F.abs(F.col("Target") - F.col("Sales_x2")))
        .withColumn(
            "Change",
            F.when(
                (F.col("Wks") > wks_gate)
                & ((F.col("diff_ro") > diff_threshold) | (F.col("diff_tar") > diff_threshold)),
                F.lit("YES"),
            ).otherwise(F.lit("")),
        )
    )
    # Step 6: final projection (etl_StoreRP.py:193-199)
    return (
        cond.withColumn("New_ReOdr", F.when(F.col("Change") == "YES", F.col("Sales_x125")))
        .withColumn("New_Tgt", F.when(F.col("Change") == "YES", F.col("Sales_x2")))
        .filter(F.col("Change") == "YES")
        .select(
            "Article", "Store", "RP_Type", "Stock_Planner", "Rounding", "Reorder",
            "Target", "Wkly_Avg", "Wks", "Sales_x125", "Sales_x2", "diff_ro",
            "diff_tar", "Change", "New_ReOdr", "New_Tgt",
        )
        .orderBy("Article", "Store")
    )


def store_rp_oracle(
    start_wk: int = 0,
    end_wk: int = 100_000,
    wks_gate: int = 38,
    diff_threshold: float = 2.0,
) -> str:
    return f"""
    WITH weekly AS ({weekly_sales_oracle(start_wk, end_wk)}),
    Base AS (
        SELECT Article, Site, AcctWk,
               CAST(SUM(CAST(Qty AS DECIMAL(18,6))) AS DOUBLE) AS Qty
        FROM weekly
        WHERE AcctWk BETWEEN {start_wk} AND {end_wk}
        GROUP BY Article, Site, AcctWk
    ),
    Sales AS (
        SELECT Article, Site,
               COUNT(CASE WHEN Qty > 0 THEN 1 END) AS Wks,
               ROUND(CAST(SUM(CASE WHEN Qty > 0 THEN CAST(Qty AS DECIMAL(18,6)) END) AS DOUBLE)
                     / CAST(COUNT(CASE WHEN Qty > 0 THEN 1 END) AS DOUBLE), 1) AS Wkly_Avg
        FROM Base GROUP BY Article, Site
    ),
    LatestRP AS ({sm.STORE_RP_SQL}),
    Main AS (
        SELECT r.Article, r.Site AS Store, r.RP_Type, r.Stock_Planner,
               r.Rounding, r.Reorder, r.Target, s.Wkly_Avg, s.Wks,
               CAST(CASE WHEN r.Rounding * 0.5 > s.Wkly_Avg * 1.25
                         THEN CEILING(r.Rounding * 0.5)
                         ELSE CEILING(s.Wkly_Avg * 1.25) END AS DOUBLE) AS Sales_x125,
               CAST(CASE WHEN r.Rounding > s.Wkly_Avg * 2
                         THEN CEILING(r.Rounding)
                         ELSE CEILING(s.Wkly_Avg * 2) END AS DOUBLE) AS Sales_x2
        FROM LatestRP r
        INNER JOIN Sales s ON r.Article = s.Article AND r.Site = s.Site
    ),
    Condition AS (
        SELECT *,
               ABS(Reorder - Sales_x125) AS diff_ro,
               ABS(Target - Sales_x2) AS diff_tar,
               CASE WHEN Wks > {wks_gate}
                     AND (ABS(Reorder - Sales_x125) > {diff_threshold}
                          OR ABS(Target - Sales_x2) > {diff_threshold})
                    THEN 'YES' ELSE '' END AS Change
        FROM Main
    )
    SELECT Article, Store, RP_Type, Stock_Planner, Rounding, Reorder, Target,
           Wkly_Avg, Wks, Sales_x125, Sales_x2, diff_ro, diff_tar, Change,
           CASE WHEN Change = 'YES' THEN Sales_x125 END AS New_ReOdr,
           CASE WHEN Change = 'YES' THEN Sales_x2 END AS New_Tgt
    FROM Condition
    WHERE Change = 'YES'
    ORDER BY Article, Store
    """
