"""Semantic mapping: reference SAP tables → the driver's TPC-H-ish star.

The reference's warehouse tables don't physically exist here; the driver
provides a deterministic star schema (TESTDATA.md).  This module derives
the reference's logical tables from it, so every §2 operator/query runs on
real data and has a DuckDB-expressible definition:

    ZMB51 movements   ← lineitem   (Article=l_partkey, Site=l_suppkey,
                                    Date=l_shipdate, Quantity, Cost)
    ZSTPROMO billing  ← lineitem rows with promo discount (l_discount>=.04)
    dim_Calendar      ← derived fiscal calendar (7-day AcctWk blocks
                        anchored 1995-01-01 — a dim join, NOT weekofyear,
                        per SURVEY §4.3)
    fact_Store_RP     ← part × supplier (deterministic RP parameters)

Decimal discipline (hash-parity with the DuckDB oracle, SURVEY §7.4):
measures are computed in IEEE double (bit-identical across engines), cast
to DECIMAL(18,6) before aggregation (exact, order-independent sums), and
cast back to double on output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sap_data_pipeline_spark.sources.readers import Star

FISCAL_EPOCH = "1995-01-01"
PROMO_DISCOUNT_MIN = 0.04
# Site = l_suppkey % 10: ten "stores", dense (article, site) pairs at every
# SF — matches the reference's store-count-vs-article-count shape.  The
# CAST(Site AS INT) < 5999 gate (etl_weekly_sales.py:49) becomes < 8.
SITE_MOD = 10
SITE_MAX = 8

DEC = "decimal(18,6)"


def dec_sum(c: Column, alias: str) -> Column:
    """Order-independent, engine-portable sum: decimal-cast then sum then
    back to double (see module docstring)."""
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def acct_wk(date_col: Column) -> Column:
    """Fiscal week id: 7-day blocks since FISCAL_EPOCH (integer).

    DuckDB oracle equivalent:
    ``CAST(floor(date_diff('day', DATE '1995-01-01', CAST(x AS DATE)) / 7) AS INT)``
    """
    return F.floor(F.datediff(date_col.cast("date"), F.lit(FISCAL_EPOCH)) / 7).cast("int")


ACCT_WK_SQL = "CAST(floor(date_diff('day', DATE '1995-01-01', CAST({col} AS DATE)) / 7) AS INT)"


# Calendar coverage: a superset of every date in the testdata (generator
# dates span 1995-2001; verified at all SFs).  A dim calendar is
# *generated* — the reference loads it from a maintained workbook
# (pipelines/etl_upload_excel.py:13-27), it is never derived by scanning
# the fact.  An inner join against a too-short calendar silently drops
# rows, so the range is deliberately generous.
CAL_START, CAL_END = "1990-01-01", "2009-12-31"


def calendar_dim(star: Star) -> DataFrame:
    """dim_Calendar: one row per date with its fiscal AcctWk.

    Generated from a date sequence (3288 rows, broadcast-sized at any SF)
    — zero fact-table scans.  The previous ``lineitem.distinct()``
    derivation cost a full scan + shuffle of the largest fact per query;
    at 100 TB that is the difference between a free broadcast build and an
    extra pass over the data.
    """
    spark = star.lineitem.sparkSession
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(CAL_START).cast("date"),
                    F.lit(CAL_END).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("Date")
        )
        .withColumn("AcctWk", acct_wk(F.col("Date")))
        .withColumn("Year", F.year("Date"))
    )


def movements(star: Star) -> DataFrame:
    """ZMB51-shaped goods movements (``pipelines/etl_zmb51.py:51-80``):
    line-grain rows keyed (Article, Site, Date) with Quantity and Cost.
    Cost is a deterministic 60% of extended price (stand-in for Amount LC).
    """
    li = star.lineitem
    return li.select(
        F.col("l_partkey").cast("string").alias("Article"),
        F.pmod(F.col("l_suppkey"), F.lit(SITE_MOD)).cast("string").alias("Site"),
        F.col("l_shipdate").cast("date").alias("Date"),
        F.col("l_quantity").alias("Quantity"),
        (F.col("l_extendedprice") * F.lit(0.6)).alias("Cost"),
        F.col("l_linestatus").alias("BUn"),
    )


def billing(star: Star) -> DataFrame:
    """ZSTPROMO-shaped promo billing (``pipelines/etl_zstpromo.py:36-62``):
    the discounted subset of lines, Amt = extendedprice*(1-discount)."""
    li = star.lineitem.filter(F.col("l_discount") >= F.lit(PROMO_DISCOUNT_MIN))
    return li.select(
        F.col("l_partkey").cast("string").alias("Article"),
        F.pmod(F.col("l_suppkey"), F.lit(SITE_MOD)).cast("string").alias("Site"),
        F.col("l_shipdate").cast("date").alias("Date"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("Amt"),
    )


def store_rp_params(star: Star) -> DataFrame:
    """fact_Store_RP snapshot (FIXTURES §6): reorder-point parameters per
    (Article, Site), derived deterministically from part × supplier.

    supplier is broadcast (tiny vs part at every SF), so this is a
    broadcast nested-loop-free cross of two dims — fine at scale because
    |part|×|supplier| stays dimension-sized relative to the facts.
    """
    p = star.part.select(
        F.col("p_partkey").cast("string").alias("Article"),
        F.col("p_size").cast("double").alias("Reorder"),
        (F.pmod(F.col("p_partkey"), F.lit(5)) + F.lit(1)).cast("double").alias("Rounding"),
        (F.col("p_size") * F.lit(2)).cast("double").alias("Target"),
        F.col("p_brand").alias("Stock_Planner"),
    )
    s = (
        star.supplier.select(
            F.pmod(F.col("s_suppkey"), F.lit(SITE_MOD)).cast("string").alias("Site")
        ).distinct()
    )
    return p.crossJoin(F.broadcast(s)).withColumn("RP_Type", F.lit("ZM"))


# DuckDB-SQL mirrors of the derived tables (used as CTE bodies in oracles).
MOVEMENTS_SQL = f"""
    SELECT CAST(l_partkey AS VARCHAR) AS Article,
           CAST(l_suppkey % {SITE_MOD} AS VARCHAR) AS Site,
           CAST(l_shipdate AS DATE)   AS Date,
           l_quantity                 AS Quantity,
           l_extendedprice * 0.6      AS Cost,
           l_linestatus               AS BUn
    FROM lineitem
"""

BILLING_SQL = f"""
    SELECT CAST(l_partkey AS VARCHAR) AS Article,
           CAST(l_suppkey % {SITE_MOD} AS VARCHAR) AS Site,
           CAST(l_shipdate AS DATE)   AS Date,
           l_extendedprice * (1.0 - l_discount) AS Amt
    FROM lineitem
    WHERE l_discount >= {PROMO_DISCOUNT_MIN}
"""

CALENDAR_SQL = f"""
    SELECT Date, {ACCT_WK_SQL.format(col="Date")} AS AcctWk, year(Date) AS Year
    FROM (SELECT CAST(unnest(generate_series(DATE '{CAL_START}', DATE '{CAL_END}',
                                             INTERVAL 1 DAY)) AS DATE) AS Date)
"""

STORE_RP_SQL = f"""
    SELECT CAST(p.p_partkey AS VARCHAR) AS Article,
           s.Site,
           CAST(p.p_size AS DOUBLE) AS Reorder,
           CAST(p.p_partkey % 5 + 1 AS DOUBLE) AS Rounding,
           CAST(p.p_size * 2 AS DOUBLE) AS Target,
           p.p_brand AS Stock_Planner,
           'ZM' AS RP_Type
    FROM part p
    CROSS JOIN (SELECT DISTINCT CAST(s_suppkey % {SITE_MOD} AS VARCHAR) AS Site
                FROM supplier) s
"""


# ---------------------------------------------------------------------------
# Synthesized partsupp + commit/receipt dates — the same trick as the
# generated calendar dim: the driver's star has no partsupp table and
# lineitem carries only l_shipdate, so the partsupp-shaped sixth of
# TPC-H (Q2/Q9/Q11/Q16/Q20) and Q21's late-delivery predicate would be
# inexpressible.  Both are derived CLOSED-FORM (integer arithmetic on
# the keys — no fact scan, no randomness), with byte-identical DuckDB
# CTE twins, so every query over them stays hash-oracled.
#
# partsupp: 4 suppliers per part at stride n_supp/4 (the TPC-H dbgen
# shape: each part sourced from suppliers spread across the key space),
# availqty in 1..9999 and supplycost in 1.00..1000.00 (the spec's
# domains), both keyed on (ps_partkey, ps_suppkey).  Size is 4×|part| —
# dimension-scale at every SF, broadcast-eligible where needed.
# Deviation vs dbgen (documented): lineitem's l_suppkey is uniform over
# all suppliers, so a lineitem⋈partsupp join on both keys matches ~4/n
# of lines — the queries keep their exact join/agg SHAPE, selectivity
# differs.
# ---------------------------------------------------------------------------

PS_SUPPLIERS_PER_PART = 4


def partsupp(star: Star) -> DataFrame:
    """Synthesized partsupp (ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost).  One bounded driver scalar (|supplier| — a dim
    count) parameterizes the stride; generation is a map-side explode
    over part, zero shuffles."""
    n_supp = star.supplier.count()
    stride = max(n_supp // PS_SUPPLIERS_PER_PART, 1)
    return (
        star.part.select("p_partkey")
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(
                F.array(*[F.lit(i) for i in range(PS_SUPPLIERS_PER_PART)])
            ).alias("_i"),
        )
        .select(
            "ps_partkey",
            F.pmod(F.col("ps_partkey") + F.col("_i") * stride, F.lit(n_supp))
            .cast("long")
            .alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (F.pmod(F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 3, F.lit(9999)) + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                F.pmod(F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17, F.lit(99900))
                / F.lit(100.0)
                + F.lit(1.0)
            )
            .cast("double")
            .alias("ps_supplycost"),
        )
    )


PARTSUPP_SQL = f"""
    SELECT ps_partkey, ps_suppkey,
           CAST((ps_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS INT) AS ps_availqty,
           CAST((ps_partkey * 31 + ps_suppkey * 17) % 99900 / 100.0 + 1.0 AS DOUBLE)
               AS ps_supplycost
    FROM (
        SELECT p.p_partkey AS ps_partkey,
               (p.p_partkey + i.i * greatest(ns.n // {PS_SUPPLIERS_PER_PART}, 1)) % ns.n
                   AS ps_suppkey
        FROM part p
        CROSS JOIN (SELECT count(*) AS n FROM supplier) ns
        CROSS JOIN (SELECT unnest(generate_series(0, {PS_SUPPLIERS_PER_PART - 1})) AS i) i
    )
"""


def lineitem_dated(star: Star) -> DataFrame:
    """lineitem + synthesized l_commitdate / l_receiptdate (Q21's
    late-delivery predicate needs both; the testdata carries only
    l_shipdate).  Offsets are closed-form on (l_orderkey, l_linenumber):
    commit = ship + (3k+7n) % 30 days, receipt = ship + (5k+11n) % 30 + 1
    days — deterministic, pseudo-uniform, ~half the lines late
    (receipt > commit), matching the spec's intent that lateness is
    line-level and plentiful.  Pure projection — no shuffle, pushdown
    unaffected."""
    ship = F.col("l_shipdate").cast("date")
    commit_off = F.pmod(
        F.col("l_orderkey") * 3 + F.col("l_linenumber") * 7, F.lit(30)
    ).cast("int")
    receipt_off = (
        F.pmod(F.col("l_orderkey") * 5 + F.col("l_linenumber") * 11, F.lit(30)) + 1
    ).cast("int")
    return star.lineitem.withColumns(
        {
            "l_commitdate": F.date_add(ship, commit_off),
            "l_receiptdate": F.date_add(ship, receipt_off),
        }
    )


LINEITEM_DATED_SQL = """
    SELECT l.*,
           CAST(l_shipdate AS DATE)
               + CAST((l_orderkey * 3 + l_linenumber * 7) % 30 AS INT) AS l_commitdate,
           CAST(l_shipdate AS DATE)
               + CAST((l_orderkey * 5 + l_linenumber * 11) % 30 + 1 AS INT) AS l_receiptdate
    FROM lineitem l
"""
