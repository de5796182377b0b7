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

from sap_data_pipeline_spark.plans import star_mapping as sm
from sap_data_pipeline_spark.sources.readers import Star


def weekly_sales(star: Star, min_wk: int = 0, max_wk: int = 100_000) -> DataFrame:
    """fact_TawaSales_Weekly build: (AcctWk, Article, Site, Qty, Cost, Amt).

    Plan-equivalence note: the reference FULL JOINs two pre-aggregated
    CTEs because ZSTPROMO and ZMB51 are *different source tables*.  Under
    the star mapping both derive from ``lineitem`` (billing = the
    discounted subset of movements), so the billing groups are a subset of
    the movement groups and the full-outer merge degenerates to a
    conditional aggregation: ONE scan + ONE shuffle instead of two scans,
    two shuffles and a join.  The oracle SQL keeps the reference's literal
    two-CTE FULL JOIN shape — the hash-match proves the rewrite.  The
    general two-table merge operator remains
    ``operators.relational.full_outer_coalesce`` (query
    ``full_outer_week_merge``).

    The ``CAST(Site AS INT) < SITE_MAX`` gate (etl_weekly_sales.py:49)
    commutes with the group-by (it filters on a grouping key), so it is
    applied *before* the shuffle and reaches the scan.
    """
    cal = F.broadcast(sm.calendar_dim(star))
    promo_amt = F.when(
        F.col("l_discount") >= F.lit(sm.PROMO_DISCOUNT_MIN),
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
    )
    rows = (
        star.lineitem
        .filter(F.pmod(F.col("l_suppkey"), F.lit(sm.SITE_MOD)) < sm.SITE_MAX)
        .select(
            F.col("l_partkey").cast("string").alias("Article"),
            F.pmod(F.col("l_suppkey"), F.lit(sm.SITE_MOD)).cast("string").alias("Site"),
            F.col("l_shipdate").cast("date").alias("Date"),
            F.col("l_quantity").alias("Quantity"),
            (F.col("l_extendedprice") * F.lit(0.6)).alias("Cost"),
            promo_amt.alias("PromoAmt"),
        )
    )
    return (
        rows.join(cal, "Date")
        .filter(F.col("AcctWk").between(min_wk, max_wk))
        .groupBy("AcctWk", "Article", "Site")
        .agg(
            sm.dec_sum(F.col("Quantity"), "Qty"),
            sm.dec_sum(F.col("Cost"), "Cost"),
            F.coalesce(F.sum(F.col("PromoAmt").cast(sm.DEC)).cast("double"), F.lit(0.0)).alias("Amt"),
        )
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
