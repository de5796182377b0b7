"""Weekly-sales rollup — the reference's first analytical query.

Reference: ``pipelines/etl_weekly_sales.py:19-51`` — two CTEs pre-aggregate
ZSTPROMO (Amt) and ZMB51 (Qty, Cost) to week × article × site grain via a
calendar-dim join, FULL JOIN them on the composite key, COALESCE keys and
measures, and gate on ``CAST(Site AS INT) < 5999``.

Spark shape (SURVEY §3.2): two groupBys + one full-outer join, calendar
dim broadcast.  Pre-aggregation-before-join is preserved exactly — it is
the decisive scale optimization (the join operates on week-grain rows,
orders of magnitude smaller than line grain at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators.relational import full_outer_coalesce
from sap_data_pipeline_spark.plans import star_mapping as sm
from sap_data_pipeline_spark.sources.readers import Star


def weekly_sales(star: Star, min_wk: int = 0, max_wk: int = 100_000) -> DataFrame:
    """fact_TawaSales_Weekly build: (AcctWk, Article, Site, Qty, Cost, Amt)."""
    cal = F.broadcast(sm.calendar_dim(star))

    promo = (
        sm.billing(star)
        .join(cal, "Date")
        .filter(F.col("AcctWk").between(min_wk, max_wk))
        .groupBy("AcctWk", "Article", "Site")
        .agg(sm.dec_sum(F.col("Amt"), "Amt"))
    )
    moves = (
        sm.movements(star)
        .join(cal, "Date")
        .filter(F.col("AcctWk").between(min_wk, max_wk))
        .groupBy("AcctWk", "Article", "Site")
        .agg(sm.dec_sum(F.col("Quantity"), "Qty"), sm.dec_sum(F.col("Cost"), "Cost"))
    )

    merged = full_outer_coalesce(
        moves, promo, ["AcctWk", "Article", "Site"], fill={"Qty": 0.0, "Cost": 0.0, "Amt": 0.0}
    )
    return merged.filter(F.col("Site").cast("int") < sm.SITE_MAX).select(
        "AcctWk", "Article", "Site", "Qty", "Cost", "Amt"
    )


def weekly_sales_oracle(min_wk: int = 0, max_wk: int = 100_000) -> str:
    """DuckDB-SQL oracle — same plan, same decimal discipline."""
    return f"""
    WITH cal AS ({sm.CALENDAR_SQL}),
    promo AS (
        SELECT c.AcctWk, t.Article, t.Site,
               CAST(SUM(CAST(t.Amt AS DECIMAL(18,6))) AS DOUBLE) AS Amt
        FROM ({sm.BILLING_SQL}) t JOIN cal c ON c.Date = t.Date
        WHERE c.AcctWk BETWEEN {min_wk} AND {max_wk}
        GROUP BY c.AcctWk, t.Article, t.Site
    ),
    moves AS (
        SELECT c.AcctWk, z.Article, z.Site,
               CAST(SUM(CAST(z.Quantity AS DECIMAL(18,6))) AS DOUBLE) AS Qty,
               CAST(SUM(CAST(z.Cost AS DECIMAL(18,6))) AS DOUBLE) AS Cost
        FROM ({sm.MOVEMENTS_SQL}) z JOIN cal c ON c.Date = z.Date
        WHERE c.AcctWk BETWEEN {min_wk} AND {max_wk}
        GROUP BY c.AcctWk, z.Article, z.Site
    )
    SELECT COALESCE(s.AcctWk, p.AcctWk)   AS AcctWk,
           COALESCE(s.Article, p.Article) AS Article,
           COALESCE(s.Site, p.Site)       AS Site,
           COALESCE(s.Qty, 0)             AS Qty,
           COALESCE(s.Cost, 0)            AS Cost,
           COALESCE(p.Amt, 0)             AS Amt
    FROM moves s
    FULL JOIN promo p
      ON p.AcctWk = s.AcctWk AND p.Article = s.Article AND p.Site = s.Site
    WHERE CAST(COALESCE(s.Site, p.Site) AS INT) < {sm.SITE_MAX}
    """
