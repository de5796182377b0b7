"""Query catalog — the driver-facing surface (__spark_entry__ delegates here).

Every implemented operator from SURVEY §2 is registered as a named query:
a ``(spark, sf_dir) -> DataFrame`` builder plus (where SQL-expressible) a
DuckDB oracle string over the same parquet views.  Column names/aliases
are kept identical on both sides — the driver sorts columns by name and
hashes values.

Portability rules used throughout (see plans.star_mapping docstring):
double math stays IEEE; sums go through DECIMAL(18,6); outputs cast back
to double; hashes are md5-based (bit-identical in DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sap_data_pipeline_spark.functions import cleaning as C
from sap_data_pipeline_spark.operators import merge as M
from sap_data_pipeline_spark.operators import relational as R
from sap_data_pipeline_spark.operators import temporal as T
from sap_data_pipeline_spark.plans import star_mapping as sm
from sap_data_pipeline_spark.plans.store_rp import store_rp_oracle, store_rp_report
from sap_data_pipeline_spark.plans.weekly_sales import weekly_sales, weekly_sales_oracle
from sap_data_pipeline_spark.sources.readers import Star, load_star

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[Star], DataFrame]):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(load_star(spark, sf_dir))

        QUERIES[name] = runner
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship analytical queries (SURVEY §3.2, §3.3)
# ---------------------------------------------------------------------------

register("weekly_sales", weekly_sales_oracle())(lambda star: weekly_sales(star))

# Stability gate scaled to this data's density (~3 active weeks per
# (article, site) pair vs the reference's 38-of-52 window intent).
register("store_rp_report", store_rp_oracle(wks_gate=2))(
    lambda star: store_rp_report(star, wks_gate=2)
)


# ---------------------------------------------------------------------------
# A1: movement aggregation to PK grain (etl_zmb51.py:76-80) — sum + unit
# (reference uses pandas `first`; both sides use MIN for determinism,
#  SURVEY §7.4).  F13 sign inversion included (etl_zmb51.py:73-74).
# ---------------------------------------------------------------------------

@register(
    "movements_daily_agg",
    f"""
    SELECT Article, Site, strftime(Date, '%Y-%m-%d') AS Date,
           CAST(SUM(CAST(-Quantity AS DECIMAL(18,6))) AS DOUBLE) AS Quantity,
           CAST(SUM(CAST(-Cost AS DECIMAL(18,6))) AS DOUBLE) AS Cost,
           MIN(BUn) AS BUn
    FROM ({sm.MOVEMENTS_SQL}) m
    GROUP BY 1, 2, 3
    """,
)
def movements_daily_agg(star: Star) -> DataFrame:
    # Group on the native date (4-byte key in the shuffle), format to the
    # ISO string only on the post-agg rows.  min(BUn) goes through the
    # order-preserving BIGINT packing: a bare min(<string>) has no
    # fixed-width buffer and downgrades the whole aggregate to
    # SortAggregate (full-scan sort before the partial agg); packed, the
    # plan stays a streaming HashAggregate.
    m = sm.movements(star)
    return (
        m.groupBy("Article", "Site", "Date")
        .agg(
            sm.dec_sum(C.negate(F.col("Quantity")), "Quantity"),
            sm.dec_sum(C.negate(F.col("Cost")), "Cost"),
            F.min(C.pack_ascii8("BUn")).alias("_BUn"),
        )
        .withColumns({"Date": C.format_iso_date("Date"),
                      "BUn": C.unpack_ascii8("_BUn")})
        .drop("_BUn")
    )


# ---------------------------------------------------------------------------
# J2: FULL OUTER join on a key + COALESCE merge (etl_weekly_sales.py:38-49)
# on two genuinely different tables: ordered revenue (orders, order week)
# vs shipped quantity (lineitem, ship week).  Order weeks precede ship
# weeks, so both sides contribute unmatched keys.
# ---------------------------------------------------------------------------

@register(
    "full_outer_week_merge",
    f"""
    WITH ordered AS (
        SELECT {sm.ACCT_WK_SQL.format(col='o_orderdate')} AS AcctWk,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS ordered_rev
        FROM orders GROUP BY 1
    ),
    shipped AS (
        SELECT {sm.ACCT_WK_SQL.format(col='l_shipdate')} AS AcctWk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS shipped_qty
        FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.AcctWk, s.AcctWk) AS AcctWk,
           COALESCE(o.ordered_rev, 0)  AS ordered_rev,
           COALESCE(s.shipped_qty, 0)  AS shipped_qty
    FROM ordered o FULL JOIN shipped s ON o.AcctWk = s.AcctWk
    """,
)
def full_outer_week_merge(star: Star) -> DataFrame:
    ordered = star.orders.groupBy(
        sm.acct_wk(F.col("o_orderdate")).alias("AcctWk")
    ).agg(sm.dec_sum(F.col("o_totalprice"), "ordered_rev"))
    shipped = star.lineitem.groupBy(
        sm.acct_wk(F.col("l_shipdate")).alias("AcctWk")
    ).agg(sm.dec_sum(F.col("l_quantity"), "shipped_qty"))
    return R.full_outer_coalesce(
        ordered, shipped, ["AcctWk"], fill={"ordered_rev": 0.0, "shipped_qty": 0.0}
    )


# ---------------------------------------------------------------------------
# S8/J5: keyed MERGE upsert — the reference's signature operator
# (common/loader.py:41-153).  Target = events not divisible by 3; source
# batch = even event_ids with doubled value.  Matched keys take the source
# row (UPDATE-all), unmatched source keys INSERT, untouched target rows
# persist.
# ---------------------------------------------------------------------------

@register(
    "merge_upsert_events",
    """
    WITH t AS (SELECT event_id, event_type, value FROM events WHERE event_id % 3 <> 0),
         s AS (SELECT event_id, event_type, value * 2 AS value FROM events
               WHERE event_id % 2 = 0)
    SELECT event_id, event_type, value FROM s
    UNION ALL
    SELECT t.event_id, t.event_type, t.value FROM t
    WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.event_id = t.event_id)
    """,
)
def merge_upsert_events(star: Star) -> DataFrame:
    ev = star.events
    target = ev.filter(F.col("event_id") % 3 != 0).select("event_id", "event_type", "value")
    source = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", (F.col("value") * 2).alias("value")
    )
    return M.merge_upsert_frames(target, source, ["event_id"])


# ---------------------------------------------------------------------------
# W1: dedup keep-first on key with explicit ordering
# (drop_duplicates(subset), etl_zrssale.py:63; survivor = lowest event_id)
# ---------------------------------------------------------------------------

@register(
    "dedup_keep_first",
    """
    SELECT user_id, event_type, event_id, value
    FROM (SELECT user_id, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id ASC) AS rn
          FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keep_first_q(star: Star) -> DataFrame:
    return R.dedup_keep_first(
        star.events.select("user_id", "event_type", "event_id", "value"),
        ["user_id", "event_type"],
        [F.col("event_id")],
    )


# ---------------------------------------------------------------------------
# W2: dedup keep-last on a composite key with explicit ordering
# (etl_zmmidr_oun.py:72-76; order column = event_id stands in for
#  file-read order).  Latest event per (user_id, event_type).
# ---------------------------------------------------------------------------

@register(
    "dedup_keep_last",
    """
    SELECT user_id, event_type, event_id, value
    FROM (SELECT user_id, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keep_last_q(star: Star) -> DataFrame:
    return R.dedup_keep_last(
        star.events.select("user_id", "event_type", "event_id", "value"),
        ["user_id", "event_type"],
        [F.col("event_id")],
    )


# ---------------------------------------------------------------------------
# P7/J4: left-anti new-key detection (etl_zmachk.py:113-117):
# parts that never shipped.
# ---------------------------------------------------------------------------

@register(
    "new_articles_anti_join",
    """
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND CAST(l.l_shipdate AS DATE) >= DATE '2001-01-01')
    ORDER BY p.p_partkey
    """,
)
def new_articles_anti_join(star: Star) -> DataFrame:
    recent = star.lineitem.filter(
        F.col("l_shipdate").cast("date") >= F.lit("2001-01-01")
    ).select(F.col("l_partkey").alias("p_partkey"))
    return R.left_anti(
        star.part.select("p_partkey", "p_name"), recent, ["p_partkey"]
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# A5: duplicate counting (etl_zmmidr_bun.py:63-64)
# ---------------------------------------------------------------------------

@register(
    "duplicate_order_lines",
    """
    SELECT l_orderkey, l_partkey, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM lineitem GROUP BY l_orderkey, l_partkey HAVING COUNT(*) > 1
    """,
)
def duplicate_order_lines(star: Star) -> DataFrame:
    return R.duplicate_keys(star.lineitem, ["l_orderkey", "l_partkey"])


# ---------------------------------------------------------------------------
# A2/U2: region-merge aggregation (etl_zmmidr_oun.py:142-171): map sites
# into region groups, sum stocks per article within group, surrogate key.
# F7 surrogate key included.
# ---------------------------------------------------------------------------

@register(
    "region_merge_inventory",
    f"""
    SELECT DC, Article,
           CAST(SUM(CAST(Quantity AS DECIMAL(18,6))) AS DOUBLE) AS Quantity,
           DC || Article AS Article_NoDC
    FROM (SELECT CASE WHEN Site IN ('0','1','2') THEN '0'
                      WHEN Site IN ('3','4') THEN '3'
                      ELSE Site END AS DC,
                 Article, Quantity
          FROM ({sm.MOVEMENTS_SQL}))
    GROUP BY DC, Article
    """,
)
def region_merge_inventory(star: Star) -> DataFrame:
    m = sm.movements(star).withColumnRenamed("Site", "DC")
    return (
        m.withColumn(
            "DC",
            F.when(F.col("DC").isin("0", "1", "2"), "0")
            .when(F.col("DC").isin("3", "4"), "3")
            .otherwise(F.col("DC")),
        )
        .groupBy("DC", "Article")
        .agg(sm.dec_sum(F.col("Quantity"), "Quantity"))
        .withColumn("Article_NoDC", C.surrogate_key("DC", "Article"))
    )


# ---------------------------------------------------------------------------
# P5/P6/P9/P11: filter battery — equality, IN-list, BETWEEN, date equality
# (etl_zrssale.py:107; etl_zmmidr_oun.py:142; etl_weekly_sales.py:26)
# ---------------------------------------------------------------------------

@register(
    "filter_battery",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1997-12-31'
      AND o_totalprice > 1000.0
    ORDER BY o_orderkey
    """,
)
def filter_battery(star: Star) -> DataFrame:
    return (
        star.orders.filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderdate").cast("date").between("1995-01-01", "1997-12-31")
            & (F.col("o_totalprice") > 1000.0)
        )
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            C.format_iso_date(F.col("o_orderdate").cast("date")).alias("o_orderdate"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# A4: conditional aggregation (etl_StoreRP.py:125-134)
# ---------------------------------------------------------------------------

@register(
    "conditional_agg",
    """
    SELECT o_custkey,
           COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS big_orders,
           ROUND(CAST(SUM(CASE WHEN o_totalprice > 100000
                               THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END), 0) , 1)
               AS avg_big_price
    FROM orders GROUP BY o_custkey
    """,
)
def conditional_agg(star: Star) -> DataFrame:
    big = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
    cnt = F.count(big)
    return star.orders.groupBy("o_custkey").agg(
        cnt.alias("big_orders"),
        F.round(
            F.sum(big.cast(sm.DEC)).cast("double") / F.nullif(cnt, F.lit(0)).cast("double"), 1
        ).alias("avg_big_price"),
    )


# ---------------------------------------------------------------------------
# A6: max-string-length profiling (etl_zrssale.py:66-69)
# ---------------------------------------------------------------------------

@register(
    "column_length_profile",
    """
    SELECT MAX(length(CAST(o_orderkey AS VARCHAR))) AS o_orderkey,
           MAX(length(CAST(o_orderstatus AS VARCHAR))) AS o_orderstatus,
           MAX(length(CAST(o_orderpriority AS VARCHAR))) AS o_orderpriority
    FROM orders
    """,
)
def column_length_profile(star: Star) -> DataFrame:
    return R.column_max_lengths(star.orders, ["o_orderkey", "o_orderstatus", "o_orderpriority"])


# ---------------------------------------------------------------------------
# U1/U2: union of heterogeneous branches then aggregate
# (pd.concat shapes, etl_zmb51.py:60; etl_zmmidr_oun.py:170)
# ---------------------------------------------------------------------------

@register(
    "union_branches",
    """
    SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM (
        SELECT 'low' AS src, o_totalprice AS price FROM orders WHERE o_totalprice < 50000
        UNION ALL
        SELECT 'high' AS src, o_totalprice AS price FROM orders WHERE o_totalprice >= 50000
    ) GROUP BY src
    """,
)
def union_branches(star: Star) -> DataFrame:
    low = star.orders.filter(F.col("o_totalprice") < 50000).select(
        F.lit("low").alias("src"), F.col("o_totalprice").alias("price")
    )
    high = star.orders.filter(F.col("o_totalprice") >= 50000).select(
        F.lit("high").alias("src"), F.col("o_totalprice").alias("price")
    )
    return R.union_all([low, high]).groupBy("src").agg(
        F.count(F.lit(1)).alias("n"), sm.dec_sum(F.col("price"), "total")
    )


# ---------------------------------------------------------------------------
# F1-F11: SAP cleaning battery — dirty strings synthesized from real
# values, cleaned with the native expression library, round-tripped.
# (etl_utils.py:18-34; etl_zmmidr_oun.py:29; etl_zmachk.py:78-80)
# ---------------------------------------------------------------------------

@register(
    "sap_cleaning_roundtrip",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CASE WHEN dirty_qty LIKE '%-'
                     THEN '-' || substr(dirty_qty, 1, length(dirty_qty) - 1)
                     ELSE dirty_qty END AS DOUBLE) AS clean_qty,
           CASE WHEN length(regexp_replace(dirty_article, '^0+', '')) = 0 THEN '0'
                ELSE regexp_replace(dirty_article, '^0+', '') END AS clean_article,
           CAST(NULLIF(dirty_flag, '-') AS VARCHAR) AS clean_flag,
           strftime(CAST(strptime(dirty_date, '%m/%d/%Y') AS DATE), '%Y-%m-%d') AS clean_date,
           substr(dirty_mch, 1, 3) AS clean_dept,
           regexp_replace(dirty_float_id, '\\.0$', '') AS clean_id
    FROM (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 2 = 0
                    THEN CAST(l_quantity AS VARCHAR) || '-'
                    ELSE CAST(l_quantity AS VARCHAR) END AS dirty_qty,
               lpad(CAST(l_partkey AS VARCHAR), 10, '0') AS dirty_article,
               CASE WHEN l_linenumber % 3 = 0 THEN '-' ELSE l_returnflag END AS dirty_flag,
               strftime(l_shipdate, '%m/%d/%Y') AS dirty_date,
               lpad(CAST(l_suppkey AS VARCHAR), 6, '0') AS dirty_mch,
               CAST(l_partkey AS VARCHAR) || '.0' AS dirty_float_id
        FROM lineitem
    )
    """,
)
def sap_cleaning_roundtrip(star: Star) -> DataFrame:
    li = star.lineitem
    dirty = li.select(
        "l_orderkey", "l_linenumber",
        F.when(
            F.col("l_linenumber") % 2 == 0,
            F.concat(F.col("l_quantity").cast("string"), F.lit("-")),
        ).otherwise(F.col("l_quantity").cast("string")).alias("dirty_qty"),
        F.lpad(F.col("l_partkey").cast("string"), 10, "0").alias("dirty_article"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("-"))
        .otherwise(F.col("l_returnflag")).alias("dirty_flag"),
        F.date_format("l_shipdate", "MM/dd/yyyy").alias("dirty_date"),
        F.lpad(F.col("l_suppkey").cast("string"), 6, "0").alias("dirty_mch"),
        F.concat(F.col("l_partkey").cast("string"), F.lit(".0")).alias("dirty_float_id"),
    )
    return dirty.select(
        "l_orderkey", "l_linenumber",
        C.fast_numeric("dirty_qty", "double").alias("clean_qty"),
        C.strip_leading_zeros("dirty_article").alias("clean_article"),
        C.dash_to_null("dirty_flag").alias("clean_flag"),
        C.format_iso_date(C.parse_sap_date("dirty_date")).alias("clean_date"),
        # F6: dept = first 3 of MCH (etl_zmmidr_dry.py:27)
        F.substring("dirty_mch", 1, 3).alias("clean_dept"),
        # F8: '.0' float-artifact suffix strip, end-anchored (etl_zin_mch.py:26)
        C.strip_dot_zero_suffix("dirty_float_id").alias("clean_id"),
    )


# ---------------------------------------------------------------------------
# F20: week-range generator (sap_utils.py:201-232) — sequence + explode
# ---------------------------------------------------------------------------

@register(
    "week_range_generator",
    """
    SELECT strftime(CAST(wk AS DATE), '%Y-%m-%d') AS week_start,
           CAST(wk AS DATE) + INTERVAL 6 DAY AS week_end_ts
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                        INTERVAL 7 DAY)) AS wk)
    """,
)
def week_range_generator(star: Star) -> DataFrame:
    spark = star.lineitem.sparkSession
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1995-12-31").cast("date"),
                    F.expr("interval 7 days"),
                )
            ).alias("week_start")
        )
        .select(
            C.format_iso_date("week_start").alias("week_start"),
            (F.col("week_start").cast("timestamp") + F.expr("interval 6 days")).alias("week_end_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming batch-analog: hourly tumbling window over events
# (the idiomatic upgrade of the watch-folder weekly rollup, SURVEY §2.9)
# ---------------------------------------------------------------------------

@register(
    "events_hourly_window",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_window(star: Star) -> DataFrame:
    return (
        star.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sm.dec_sum(F.col("value"), "total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# Stateful-streaming analog: session windows per user (native
# F.session_window; streaming adds a watermark — streaming.ingest.sessionize).
# Oracle = the classic gaps-and-islands formulation; new session when the
# gap >= 6h, session_end = last event + gap (Spark's window.end).
# ---------------------------------------------------------------------------

@register(
    "events_sessionize",
    """
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 6 HOUR AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def events_sessionize(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.streaming.ingest import sessionize

    return sessionize(
        star.events, gap="6 hours", value_agg=sm.dec_sum(F.col("value"), "total_value")
    )


# ---------------------------------------------------------------------------
# Hypertable-style rollup re-aggregation: day grain served from an hourly
# pre-aggregate (operators.rollup).  Oracle aggregates the raw events at
# day grain directly — matching hashes prove hour→day re-aggregation is
# lossless (decimal sums stay decimal between grains; only the final
# output casts to double).
# ---------------------------------------------------------------------------

@register(
    "events_daily_from_hourly_rollup",
    """
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_daily_from_hourly_rollup(star: Star) -> DataFrame:
    hourly = (
        star.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(sm.DEC)).alias("dec_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "dec_value")
    )
    return (
        hourly.groupBy(F.window("hour_start", "1 day").alias("w"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("dec_value").cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# JSON property extraction (extension — the reference has no JSON, SURVEY
# §2.8 notes; the events stream carries a JSON props column).
# get_json_object stays JVM-side; the cast-or-null contract matches
# DuckDB's json_extract + TRY_CAST.
# ---------------------------------------------------------------------------

@register(
    "events_json_props",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(star: Star) -> DataFrame:
    k = F.get_json_object("props", "$.k").try_cast("int")
    return star.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# O1 + top-k: order-by-limit (absent in reference; SURVEY §2.6 notes) —
# Spark TakeOrderedAndProject at scale.
# ---------------------------------------------------------------------------

@register(
    "topk_customers_by_revenue",
    """
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey ASC LIMIT 10
    """,
)
def topk_customers_by_revenue(star: Star) -> DataFrame:
    return (
        star.orders.groupBy("o_custkey")
        .agg(sm.dec_sum(F.col("o_totalprice"), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J1-J3 composite: star join — customer orders enriched through
# nation/region dims (broadcast), aggregated per region.
# ---------------------------------------------------------------------------

@register(
    "star_join_revenue_by_region",
    """
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def star_join_revenue_by_region(star: Star) -> DataFrame:
    return (
        star.orders.join(F.broadcast(star.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(star.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(star.region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sm.dec_sum(F.col("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (operators.temporal.asof_join): for each purchase event, the
# user's most recent click at-or-before it.  Absent in the reference (all
# joins equi, SURVEY §2.3) and absent as a Spark primitive — implemented
# as union + running-last window (one shuffle, no row explosion); the
# oracle is DuckDB's native ASOF LEFT JOIN, so a hash match proves the
# window formulation reproduces real as-of semantics including unmatched
# probes.
# ---------------------------------------------------------------------------

@register(
    "asof_join_purchase_prior_click",
    """
    SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts AS click_ts, value AS click_value
                    FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_join_purchase_prior_click(star: Star) -> DataFrame:
    ev = star.events
    probe = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    return T.asof_join(probe, build, on=["user_id"], left_ts="ts", right_ts="click_ts")


# ---------------------------------------------------------------------------
# Bounded range join (operators.temporal.explode_to_date_windows): events
# against 7-day sliding windows stepping 1 day.  Not expressible as an
# equi-join directly; the explode-to-equi-join keeps it a hash join
# (the inequality-join oracle would be a nested-loop at scale).
# ---------------------------------------------------------------------------

@register(
    "events_sliding_7d_windows",
    """
    WITH w AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                                  INTERVAL 1 DAY)) AS DATE) AS win_start)
    SELECT strftime(w.win_start, '%Y-%m-%d') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM w JOIN events e
      ON e.ts >= CAST(w.win_start AS TIMESTAMP)
     AND e.ts <  CAST(w.win_start AS TIMESTAMP) + INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def events_sliding_7d_windows(star: Star) -> DataFrame:
    spark = star.events.sparkSession
    windows = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("win_start")
    )
    joined = T.explode_to_date_windows(star.events, "ts", windows, window_days=7)
    return (
        joined.groupBy("win_start")
        .agg(F.count(F.lit(1)).alias("n_events"), sm.dec_sum(F.col("value"), "total_value"))
        .select(
            C.format_iso_date("win_start").alias("win_start"), "n_events", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# Analytic window battery: lag / moving average / running total / exact
# distinct-agg over the weekly site revenue series.  The reference has
# ZERO `OVER` clauses and no distinct aggregates (SURVEY §2.4-2.5) —
# this query demonstrates the full analytic surface Spark adds.  All
# window arithmetic stays on DECIMAL sums (order-independent) and casts
# to double only on output, so the oracle hash-matches bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "weekly_site_sales_analytics",
    f"""
    WITH wk AS (
        SELECT Site, {sm.ACCT_WK_SQL.format(col='Date')} AS AcctWk,
               SUM(CAST(Cost AS DECIMAL(18,6))) AS dec_rev,
               COUNT(DISTINCT Article) AS n_articles
        FROM ({sm.MOVEMENTS_SQL}) GROUP BY 1, 2
    )
    SELECT Site, AcctWk,
           CAST(dec_rev AS DOUBLE) AS revenue,
           CAST(n_articles AS BIGINT) AS n_articles,
           CAST(lag(dec_rev) OVER w AS DOUBLE) AS prev_revenue,
           CAST(SUM(dec_rev) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(COUNT(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS mov_avg_4wk,
           CAST(SUM(dec_rev) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM wk
    WINDOW w AS (PARTITION BY Site ORDER BY AcctWk)
    """,
)
def weekly_site_sales_analytics(star: Star) -> DataFrame:
    wk = (
        sm.movements(star)
        .groupBy("Site", sm.acct_wk(F.col("Date")).alias("AcctWk"))
        .agg(
            F.sum(F.col("Cost").cast(sm.DEC)).alias("dec_rev"),
            F.countDistinct("Article").alias("n_articles"),
        )
    )
    w = Window.partitionBy("Site").orderBy("AcctWk")
    w4 = w.rowsBetween(-3, Window.currentRow)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return wk.select(
        "Site",
        "AcctWk",
        F.col("dec_rev").cast("double").alias("revenue"),
        F.col("n_articles").cast("long").alias("n_articles"),
        F.lag("dec_rev").over(w).cast("double").alias("prev_revenue"),
        (
            F.sum("dec_rev").over(w4).cast("double")
            / F.count(F.lit(1)).over(w4).cast("double")
        ).alias("mov_avg_4wk"),
        F.sum("dec_rev").over(wcum).cast("double").alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# General-analytics battery: the three classic TPC-H plan shapes on the
# driver's star schema (the reference has none of these — its analytics
# stop at two T-SQL reports).  Q1 = the canonical scan+agg, Q3 = the
# selective fact-x-fact join + top-k, Q5 = the 6-table star join.
# Decimal discipline as everywhere: row expressions in IEEE double,
# sums through DECIMAL(18,6), output double.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Data-quality expectations (operators.quality): the reference's ad-hoc
# audits (row counts, duplicate prints, length profiling) generalized to
# declarative named checks — ALL evaluated in one aggregate pass over
# the fact, reported long-format.
# ---------------------------------------------------------------------------

@register(
    "data_quality_checks",
    """
    SELECT check_name, n_violations FROM (
        SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS null_pk,
               CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_partkey, l_suppkey,
                                               l_linenumber)) AS BIGINT) AS dup_pk,
               CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nonpositive_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS discount_out_of_range,
               CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) NOT BETWEEN
                                  DATE '1990-01-01' AND DATE '2009-12-31'
                             THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_out_of_range
        FROM lineitem
    )
    UNPIVOT (n_violations FOR check_name IN
             (null_pk, dup_pk, nonpositive_qty, discount_out_of_range,
              shipdate_out_of_range))
    """,
)
def data_quality_checks(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.quality import (
        duplicate_count,
        quality_report,
        violation,
    )

    li = star.lineitem
    return quality_report(
        li,
        {
            "null_pk": violation(
                F.col("l_orderkey").isNull() | F.col("l_linenumber").isNull()
            ),
            "dup_pk": duplicate_count(
                ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
            ),
            "nonpositive_qty": violation(F.col("l_quantity") <= 0),
            "discount_out_of_range": violation(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ),
            "shipdate_out_of_range": violation(
                ~F.col("l_shipdate").cast("date").between("1990-01-01", "2009-12-31")
            ),
        },
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen week, counted per week
# offset since their cohort week.  Two aggregations and one join — the
# cohort dim (one row per user) is the *output of the first agg*, keyed
# and joined back on user_id; at scale the join shuffles on user_id
# (AQE skew-safe) and the retention matrix is tiny.  The reference has
# nothing like this; it's the standard product-analytics shape a
# warehouse engine must express.
# ---------------------------------------------------------------------------

@register(
    "events_cohort_retention",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', CAST(MIN(ts) AS DATE)) / 7)
                    AS INT) AS cohort_wk
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_wk,
           CAST(floor(date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) / 7)
                AS INT) - f.cohort_wk AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(star: Star) -> DataFrame:
    wk = lambda c: F.floor(  # noqa: E731
        F.datediff(c.cast("date"), F.lit("2024-01-01")) / 7
    ).cast("int")
    first_seen = star.events.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_wk"))
    return (
        star.events.select("user_id", wk(F.col("ts")).alias("event_wk"))
        .join(first_seen, "user_id")
        .groupBy("cohort_wk", (F.col("event_wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(star: Star) -> DataFrame:
    li = star.lineitem.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sm.dec_sum(F.col("l_quantity"), "sum_qty"),
        sm.dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        sm.dec_sum(disc_price, "sum_disc_price"),
        sm.dec_sum(charge, "sum_charge"),
        (F.sum(F.col("l_quantity").cast(sm.DEC)).cast("double") / n.cast("double")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast(sm.DEC)).cast("double") / n.cast("double")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast(sm.DEC)).cast("double") / n.cast("double")).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-06-01'
      AND CAST(l.l_shipdate AS DATE) > DATE '1996-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(star: Star) -> DataFrame:
    c = star.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = star.orders.filter(F.col("o_orderdate").cast("date") < F.lit("1996-06-01"))
    li = star.lineitem.filter(F.col("l_shipdate").cast("date") > F.lit("1996-06-01"))
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "l_orderkey",
            C.format_iso_date(F.col("o_orderdate").cast("date")).alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(star: Star) -> DataFrame:
    o = star.orders.filter(
        F.col("o_orderdate").cast("date").between("1996-01-01", "1996-12-31")
    )
    return (
        o.join(F.broadcast(star.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(star.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(star.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(star.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(star.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            )
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(star: Star) -> DataFrame:
    """TPC-H Q10 (adapted to the available columns): top-20 customers by
    revenue lost to returned items in a quarter.  The plan shape that
    matters at scale: lineitem is the ONLY big frame — the return-flag
    and quarter gates push into both scans, customer/nation ride
    broadcast, and the top-20 is TakeOrderedAndProject (k rows per
    partition), never a global sort.  Ties cannot straddle the LIMIT:
    (revenue, custkey) is a total order on DECIMAL-exact revenue."""
    o = star.orders.filter(
        F.col("o_orderdate").cast("date").between("1996-01-01", "1996-03-31")
    )
    l = star.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(star.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(star.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            )
        )
        .withColumn("c_acctbal", F.col("c_acctbal").cast("double"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
    )


@register(
    "tpch_q12_priority_shipping",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY 1
    """,
)
def tpch_q12_priority_shipping(star: Star) -> DataFrame:
    """TPC-H Q12 (adapted: return-flag stands in for ship-mode): did
    late/cheap shipping classes starve high-priority orders?  One
    fact-fact join on the order key and a 3-group conditional aggregate;
    the ship-date gate pushes into the lineitem scan."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = star.lineitem.filter(
        F.col("l_shipdate").cast("date").between("1996-01-01", "1996-12-31")
    )
    return (
        l.join(star.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(star: Star) -> DataFrame:
    """TPC-H Q6: revenue increase from eliminating small discounts — a
    pure scan-filter-aggregate, the cheapest honest scan-speed
    yardstick.  All three predicates push into the parquet scan
    (PushedFilters on shipdate/discount/quantity), no join, no
    exchange beyond the single-row partial-agg combine; at 100 TB this
    is bandwidth-bound and nothing else."""
    return (
        star.lineitem.filter(
            F.col("l_shipdate").cast("date").between("1996-01-01", "1996-12-31")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sm.dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT CAST(100.00 * SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                                       THEN l.l_extendedprice * (1.0 - l.l_discount)
                                       ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct,
           CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1.0 - l.l_discount)
                              ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
               AS promo_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
    """,
)
def tpch_q14_promo_revenue(star: Star) -> DataFrame:
    """TPC-H Q14: share of a month's revenue from promotional parts —
    fact→dim join + conditional aggregate.  The month gate pushes into
    the lineitem scan; part rides broadcast (a dim), so the only
    exchange is the single-row combine."""
    promo = F.when(
        F.col("p_type").startswith("PROMO"),
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
    ).otherwise(F.lit(0.0))
    total = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        star.lineitem.filter(
            F.col("l_shipdate").cast("date").between("1996-03-01", "1996-03-31")
        )
        .join(F.broadcast(star.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo.cast(sm.DEC)).cast("double")
                / F.sum(total.cast(sm.DEC)).cast("double")
            ).alias("promo_revenue_pct"),
            sm.dec_sum(promo, "promo_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           big.sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customers(star: Star) -> DataFrame:
    """TPC-H Q18 (threshold 250, scaled to this data's ~4-line orders):
    customers who placed very large-quantity orders — the group-by
    HAVING semi-join shape.  The HAVING aggregate IS the join input
    (no re-aggregation after the join); orders joins it on the same
    order key the aggregate already shuffled on, so AQE can reuse the
    exchange.  Deliberately NOT a broadcast: the >threshold order set
    grows linearly with the fact at 100 TB — a shuffle join on the
    order key is the scale-safe default, and the top-100 is
    TakeOrderedAndProject on the DECIMAL-exact total order
    (o_totalprice, o_orderkey), never a global sort."""
    big = (
        star.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(sm.DEC)).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey", F.col("_sq").cast("double").alias("sum_qty"))
    )
    return (
        star.orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(star.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            C.format_iso_date(F.col("o_orderdate").cast("date")).alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)
def tpch_q4_order_priority(star: Star) -> DataFrame:
    """TPC-H Q4 (adapted: 'late' = shipped >90 days after ordering, the
    available-date equivalent of commit<receipt): priority distribution
    of orders with at least one late line — the EXISTS shape.  Spark
    expresses it as a LEFT SEMI join with a non-equi residual: one
    shuffle on the order key, lineitem never multiplies the order rows
    (semi stops at first match), and the quarter gate pushes into the
    orders scan."""
    o = star.orders.filter(
        F.col("o_orderdate").cast("date").between("1996-01-01", "1996-03-31")
    )
    li = star.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate").cast("date")
                > F.date_add(F.col("o_orderdate").cast("date"), 90)
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(star: Star) -> DataFrame:
    """TPC-H Q13: how many customers placed k orders, INCLUDING k=0 —
    the left-outer count-distribution shape (an inner join would
    silently drop order-less customers; COUNT(o_orderkey) counts
    non-null matches so they land in the zero bucket).  One shuffle on
    the customer key for the first aggregate; the distribution
    re-aggregates on the tiny c_count domain."""
    per_cust = (
        star.customer.select("c_custkey")
        .join(
            star.orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(star: Star) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders of one brand's parts —
    the correlated-scalar-subquery shape, decorrelated into a per-part
    aggregate joined back on the part key.  The brand filter (broadcast
    part dim) prunes lineitem FIRST, so the per-part average runs over
    the pruned fact, one shuffle on l_partkey reused by the
    threshold join.  Cross-engine determinism: l_quantity is
    integer-valued, so AVG sums exactly in double on both engines and
    the 0.2·avg comparison cannot flip on summation order."""
    brand_parts = F.broadcast(
        star.part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    )
    li = star.lineitem.join(
        brand_parts, F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_thresh")
    )
    return (
        li.join(thresh, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_thresh"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(sm.DEC)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "tpch_q22_lapsed_customers",
    """
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND CAST(o.o_orderdate AS DATE) >= DATE '2001-01-01'
      )
    GROUP BY 1
    """,
)
def tpch_q22_lapsed_customers(star: Star) -> DataFrame:
    """TPC-H Q22 (adapted: nation key stands in for the phone country
    code, 'lapsed' = no orders since 2001): high-balance customers who
    stopped ordering — global scalar subquery + NOT EXISTS.  The
    average re-enters as a broadcast single row (never a shuffle); the
    anti-join runs against the date-pruned DISTINCT custkey set.  The
    average divides an exact DECIMAL sum so the balance comparison is
    bit-identical across engines."""
    avg_bal = F.broadcast(
        star.customer.filter(F.col("c_acctbal") > 0.0).agg(
            (
                F.sum(F.col("c_acctbal").cast(sm.DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("_avg_bal")
        )
    )
    recent = star.orders.filter(
        F.col("o_orderdate").cast("date") >= F.lit("2001-01-01")
    ).select("o_custkey")
    return (
        star.customer.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            sm.dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT cr.r_name AS cust_region, sr.r_name AS supp_region,
           year(CAST(l.l_shipdate AS DATE)) AS yr,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN region cr   ON cn.n_regionkey = cr.r_regionkey
    JOIN region sr   ON sn.n_regionkey = sr.r_regionkey
    WHERE (cr.r_name = 'ASIA' AND sr.r_name = 'EUROPE')
       OR (cr.r_name = 'EUROPE' AND sr.r_name = 'ASIA')
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(star: Star) -> DataFrame:
    """TPC-H Q7 (region grain — a single nation pair is empty at test
    SF): trade volume between two markets, BOTH directions — the
    two-sided disjunctive dim filter where the same dim pair (nation→
    region) hangs off OPPOSITE sides of the fact (customer lineage vs
    supplier lineage).  All dims broadcast; lineitem joins orders on
    the order key as the only big exchange."""
    cust_r = (
        star.customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(star.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(star.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    supp_r = (
        star.supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(star.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(star.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    return (
        star.lineitem.join(star.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_r), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("cust_region") == "ASIA") & (F.col("supp_region") == "EUROPE"))
            | ((F.col("cust_region") == "EUROPE") & (F.col("supp_region") == "ASIA"))
        )
        .groupBy(
            "cust_region",
            "supp_region",
            F.year(F.col("l_shipdate").cast("date")).alias("yr"),
        )
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
    )


@register(
    "tpch_q8_market_share",
    """
    WITH base AS (
        SELECT year(CAST(o.o_orderdate AS DATE)) AS yr,
               CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)) AS vol,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cr.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
           CAST(SUM(vol) AS DOUBLE) AS total_volume
    FROM base GROUP BY yr
    """,
)
def tpch_q8_market_share(star: Star) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, per year — the conditional-share-of-total shape.  Both the
    numerator and denominator aggregate DECIMAL-exact in one pass (a
    self-join of yearly totals would re-scan); every dim broadcasts,
    the order-key join is the only big exchange."""
    dec = sm.DEC
    cust_region = (
        star.customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(star.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(star.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        star.supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(star.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(dec)
    base = (
        star.lineitem.join(
            F.broadcast(star.part.filter(F.col("p_type") == "STANDARD")
                        .select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(star.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0.0).cast(dec)
    return base.groupBy("yr").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))
                  .otherwise(zero)).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share"),
        F.sum("vol").cast("double").alias("total_volume"),
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
        GROUP BY 1
    ),
    mx AS (SELECT MAX(total_revenue) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey, mx
    WHERE rev.total_revenue = mx.m
    """,
)
def tpch_q15_top_supplier(star: Star) -> DataFrame:
    """TPC-H Q15: the quarter's top supplier(s) by revenue — the
    view-plus-global-max shape.  The max re-enters as a broadcast
    single row against the supplier-grain aggregate (never a
    re-aggregation or a global sort); the equality keeps ALL tied
    suppliers, as the spec requires.  DECIMAL-exact revenue makes the
    tie comparison engine-portable."""
    rev = (
        star.lineitem.filter(
            F.col("l_shipdate").cast("date").between("1996-01-01", "1996-03-31")
        )
        .groupBy("l_suppkey")
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_m"))
        .join(F.broadcast(star.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_discounted_revenue(star: Star) -> DataFrame:
    """TPC-H Q19 (size ranges stand in for containers): revenue over a
    DISJUNCTION of (brand, size-range, quantity-range) triples — the
    multi-clause OR that defeats naive single-predicate pushdown.  The
    quantity envelope (1..40, the union of the clauses) still pushes to
    the lineitem scan; the exact triple disjunction applies after the
    broadcast part join."""
    cl = [
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20),
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30),
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40),
    ]
    return (
        star.lineitem.filter(F.col("l_quantity").between(1, 40))
        .join(
            F.broadcast(star.part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cl[0] | cl[1] | cl[2])
        .agg(
            sm.dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Relational extension pack: pivot / unpivot, CUBE, top-n per group,
# INTERSECT/EXCEPT, blocked fuzzy matching — classic warehouse shapes
# the reference's pandas surface never needed but any migrating user
# will reach for.  All oracled; pivot compiles to the same conditional
# aggregation the oracle states.
# ---------------------------------------------------------------------------

_PIVOT_YEARS = list(range(1995, 2002))


def _nation_year_revenue(star: Star) -> DataFrame:
    """Shared base: (n_name, yr, o_totalprice) — orders joined to its
    broadcast dims, year extracted once."""
    return (
        star.orders.select(
            "o_custkey",
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            "o_totalprice",
        )
        .join(
            F.broadcast(star.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(star.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )


_PIVOT_CELLS_SQL = ",\n           ".join(
    f"CAST(COALESCE(SUM(CASE WHEN year(CAST(o.o_orderdate AS DATE)) = {y} "
    f"THEN CAST(o.o_totalprice AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS y{y}"
    for y in _PIVOT_YEARS
)


@register(
    "pivot_revenue_by_nation_year",
    f"""
    SELECT n.n_name,
           {_PIVOT_CELLS_SQL}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def pivot_revenue_by_nation_year(star: Star) -> DataFrame:
    """PIVOT: long fact → wide per-year revenue columns.  Catalyst
    rewrites pivot into ONE conditional aggregation over the explicit
    value list (no second scan, no per-value job — the values are
    pinned, so the distinct-scan pivot would otherwise run is skipped);
    absent cells coalesce to 0 so the wide frame is total."""
    wide = (
        _nation_year_revenue(star)
        .groupBy("n_name")
        .pivot("yr", _PIVOT_YEARS)
        .agg(F.sum(F.col("o_totalprice").cast(sm.DEC)))
    )
    return wide.select(
        "n_name",
        *[
            F.coalesce(F.col(str(y)).cast("double"), F.lit(0.0)).alias(f"y{y}")
            for y in _PIVOT_YEARS
        ],
    )


@register(
    "unpivot_revenue_long",
    """
    SELECT n.n_name,
           year(CAST(o.o_orderdate AS DATE)) AS yr,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def unpivot_revenue_long(star: Star) -> DataFrame:
    """UNPIVOT (melt): the wide pivot back to (n_name, yr, revenue) long
    form — proving the lossless inverse.  ``DataFrame.unpivot`` is a
    zero-shuffle generator expression over the wide frame; the 0-filled
    absent cells are dropped to recover the true long set (revenue sums
    of positive prices are never exactly 0)."""
    wide = pivot_revenue_by_nation_year(star)
    return (
        wide.unpivot(
            ["n_name"],
            [f"y{y}" for y in _PIVOT_YEARS],
            "yr_label",
            "revenue",
        )
        .filter(F.col("revenue") != 0.0)
        .select(
            "n_name",
            F.substring("yr_label", 2, 4).cast("int").alias("yr"),
            "revenue",
        )
    )


@register(
    "cube_revenue_nation_year",
    """
    SELECT COALESCE(n.n_name, 'ALL') AS n_name,
           COALESCE(year(CAST(o.o_orderdate AS DATE)), -1) AS yr,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, year(CAST(o.o_orderdate AS DATE)))
    """,
)
def cube_revenue_nation_year(star: Star) -> DataFrame:
    """GROUP BY CUBE: all four grouping grains (nation×year, nation,
    year, grand total) in ONE pass — Spark expands the cube map-side
    and aggregates every grain through the same exchange, vs 4 separate
    scans.  Labels are coalesced ('ALL' / -1; the data carries no NULL
    nations or dates) so the subtotal rows are self-describing."""
    return (
        _nation_year_revenue(star)
        .cube("n_name", "yr")
        .agg(sm.dec_sum(F.col("o_totalprice"), "revenue"))
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("n_name"),
            F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
            "revenue",
        )
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT COALESCE(n.n_name, 'ALL') AS n_name,
           COALESCE(year(CAST(o.o_orderdate AS DATE)), -1) AS yr,
           CAST(GROUPING(n.n_name) * 2
                + GROUPING(year(CAST(o.o_orderdate AS DATE))) AS INT) AS gid,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name, year(CAST(o.o_orderdate AS DATE))),
                            (year(CAST(o.o_orderdate AS DATE))), ())
    """,
)
def grouping_sets_revenue(star: Star) -> DataFrame:
    """GROUP BY GROUPING SETS — the hand-picked-grains sibling of CUBE
    (here: nation×year, year, grand total — deliberately NOT the
    nation-only grain, which is what distinguishes this from the cube):
    Spark expands only the requested grains map-side and aggregates
    them through one exchange.  ``grouping_id`` disambiguates subtotal
    rows from genuine 'ALL'-valued data, the standard warehouse
    idiom."""
    base = _nation_year_revenue(star)
    return (
        base.groupingSets(
            [["n_name", "yr"], ["yr"], []], "n_name", "yr"
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            sm.dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("n_name"),
            F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
            "gid",
            "revenue",
        )
    )


@register(
    "topn_customers_per_nation",
    """
    SELECT n.n_name, c.c_custkey, c.c_acctbal,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
           ) AS INT) AS rank
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    QUALIFY rank <= 3
    """,
)
def topn_customers_per_nation(star: Star) -> DataFrame:
    """Top-n per group (richest 3 customers per nation) via
    operators.relational.top_n_per_group — WindowGroupLimit keeps ≤ n
    candidates per group below the sort; ties broken by key for
    deterministic survivors."""
    from sap_data_pipeline_spark.operators.relational import top_n_per_group

    joined = star.customer.join(
        F.broadcast(star.nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return top_n_per_group(
        joined,
        ["n_name"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        3,
    ).select("n_name", "c_custkey", "c_acctbal", F.col("rank").cast("int").alias("rank"))


@register(
    "order_customer_set_ops",
    """
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1995
    ),
    y97 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1997
    )
    SELECT 'retained' AS op, o_custkey FROM (
        SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y97
    )
    UNION ALL
    SELECT 'churned' AS op, o_custkey FROM (
        SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y97
    )
    """,
)
def order_customer_set_ops(star: Star) -> DataFrame:
    """INTERSECT / EXCEPT: customers ordering in both 1995 and 1997
    (retained) vs only 1995 (churned).  Spark plans both set ops as
    aggregated joins (semi/anti over distinct keys) — each is one
    exchange on the key, and the two branches share the year-slice
    subplans."""
    yr = F.year(F.col("o_orderdate").cast("date"))

    def keys(y: int) -> DataFrame:
        return star.orders.filter(yr == y).select("o_custkey").distinct()

    y95, y97 = keys(1995), keys(1997)
    retained = y95.intersect(y97).select(F.lit("retained").alias("op"), "o_custkey")
    churned = y95.subtract(y97).select(F.lit("churned").alias("op"), "o_custkey")
    return retained.unionByName(churned)


@register(
    "fuzzy_part_name_pairs",
    """
    WITH blocked AS (
        SELECT p_partkey, p_name, p_type,
               regexp_extract(p_name, '(\\S+)$', 1) AS noun
        FROM part
        QUALIFY COUNT(*) OVER (
            PARTITION BY p_type, regexp_extract(p_name, '(\\S+)$', 1)
        ) <= 1024
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
    FROM blocked a JOIN blocked b
      ON a.p_type = b.p_type AND a.noun = b.noun AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def fuzzy_part_name_pairs(star: Star) -> DataFrame:
    """Blocked fuzzy matching (operators.relational.fuzzy_self_pairs):
    near-identical part names (edit distance ≤ 4) within a
    (type, head-noun) block — catalog-variant linkage.  Pair space is
    Σ|block|² with oversized blocks dropped, the LSH-band policy."""
    from sap_data_pipeline_spark.operators.relational import fuzzy_self_pairs

    blocked = star.part.withColumn(
        "noun", F.regexp_extract(F.col("p_name"), r"(\S+)$", 1)
    )
    return fuzzy_self_pairs(
        blocked,
        id_col="p_partkey",
        name_col="p_name",
        block_cols=["p_type", "noun"],
        max_distance=4,
    ).withColumn("distance", F.col("distance").cast("int"))


# ---------------------------------------------------------------------------
# TPC-H partsupp sixth (Q2/Q9/Q11/Q16/Q20) + Q21 — expressible now that
# star_mapping synthesizes partsupp and commit/receipt dates closed-form
# (see star_mapping.partsupp / lineitem_dated for the derivation and its
# documented deviations).  With these, 22 of 22 TPC-H queries run.
# Constant adaptations to this data's domains (same policy as Q19's
# size-for-container swap): p_type categories replace the spec's
# composite types, p_name color words replace '%green%', a REGION gate
# replaces single-nation gates (dense at every SF), and the negative-
# acctbal suppliers stand in for Q16's '%Customer%Complaints%' comment
# scan (no s_comment column).
# ---------------------------------------------------------------------------

@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH partsupp AS ({sm.PARTSUPP_SQL}),
    eu AS (
        SELECT ps.ps_partkey, ps.ps_supplycost, s.s_suppkey, s.s_name,
               s.s_acctbal, n.n_name
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    mn AS (SELECT ps_partkey, MIN(ps_supplycost) AS mc FROM eu GROUP BY 1)
    SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_type,
           CAST(e.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM eu e
    JOIN mn ON mn.ps_partkey = e.ps_partkey AND e.ps_supplycost = mn.mc
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(star: Star) -> DataFrame:
    """TPC-H Q2: cheapest regional supplier per qualifying part — the
    correlated-MIN shape, decorrelated into a per-part MIN aggregate
    joined back on (part, cost); the equality keeps all tied suppliers,
    as the spec requires.  partsupp is dim-scale (4×|part|), so the
    region-gated supplier side broadcasts and the min-join stays on the
    ps_partkey key; the part filter prunes before the final join."""
    eu = (
        sm.partsupp(star)
        .join(
            F.broadcast(
                star.supplier.join(
                    F.broadcast(
                        star.nation.join(
                            F.broadcast(star.region.filter(F.col("r_name") == "EUROPE")),
                            F.col("n_regionkey") == F.col("r_regionkey"),
                        ).select("n_nationkey", "n_name")
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
    )
    mn = eu.groupBy(F.col("ps_partkey").alias("_pk")).agg(
        F.min("ps_supplycost").alias("_mc")
    )
    p = star.part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    return (
        eu.join(
            mn,
            (F.col("ps_partkey") == F.col("_pk"))
            & (F.col("ps_supplycost") == F.col("_mc")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    f"""
    WITH partsupp AS ({sm.PARTSUPP_SQL})
    SELECT n.n_name AS nation,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                         - ps.ps_supplycost * l.l_quantity
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p      ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(star: Star) -> DataFrame:
    """TPC-H Q9: profit (revenue minus supply cost) by supplier nation
    and order year for one product line.  The name-filtered partsupp
    slice (4×|filtered parts|, built part-side before touching the
    fact) broadcasts into lineitem on the composite key; the only big
    exchange is lineitem⋈orders on the order key — same discipline as
    Q7/Q8."""
    fp = star.part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    psf = sm.partsupp(star).join(
        F.broadcast(fp), F.col("ps_partkey") == F.col("p_partkey")
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        star.lineitem.join(
            F.broadcast(psf),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            star.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(star.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(star.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
        )
        .agg(sm.dec_sum(profit, "sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    f"""
    WITH partsupp AS ({sm.PARTSUPP_SQL}),
    eu AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,6)) AS v
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    byp AS (SELECT ps_partkey, SUM(v) AS v FROM eu GROUP BY 1),
    tot AS (SELECT SUM(v) AS t FROM byp)
    SELECT b.ps_partkey, CAST(b.v AS DOUBLE) AS value
    FROM byp b, tot
    WHERE CAST(b.v AS DOUBLE) > CAST(tot.t AS DOUBLE) * 0.001
    ORDER BY value DESC, ps_partkey ASC
    """,
)
def tpch_q11_important_stock(star: Star) -> DataFrame:
    """TPC-H Q11: parts whose regional stock value exceeds a fraction of
    the total — the global-scalar-threshold shape.  Like Q15, the total
    re-enters as a broadcast single row against the part-grain
    aggregate; sums stay DECIMAL-exact until the final double compare so
    the threshold cut is engine-portable."""
    eu = (
        sm.partsupp(star)
        .join(
            F.broadcast(
                star.supplier.join(
                    F.broadcast(
                        star.nation.join(
                            F.broadcast(star.region.filter(F.col("r_name") == "EUROPE")),
                            F.col("n_regionkey") == F.col("r_regionkey"),
                        ).select("n_nationkey")
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).cast(sm.DEC).alias("v"),
        )
    )
    byp = eu.groupBy("ps_partkey").agg(F.sum("v").alias("v"))
    tot = byp.agg(F.sum("v").alias("t"))
    return (
        byp.crossJoin(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t").cast("double") * F.lit(0.001))
        .select("ps_partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("ps_partkey").asc())
    )


@register(
    "tpch_q16_parts_supplier_counts",
    f"""
    WITH partsupp AS ({sm.PARTSUPP_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_parts_supplier_counts(star: Star) -> DataFrame:
    """TPC-H Q16: how many suppliers can serve each (brand, type, size)
    bucket, excluding flagged suppliers (negative acctbal stands in for
    the spec's complaint-comment scan).  The exclusion is a broadcast
    LEFT ANTI against a tiny supplier slice; COUNT(DISTINCT) runs on the
    part-pruned partsupp slice — both dim-scale."""
    p = star.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = star.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        sm.partsupp(star)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    f"""
    WITH partsupp AS ({sm.PARTSUPP_SQL}),
    shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        GROUP BY 1, 2
    ),
    excess AS (
        SELECT DISTINCT ps.ps_suppkey
        FROM partsupp ps
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
             ON p.p_partkey = ps.ps_partkey
        JOIN shipped sh
             ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_availqty > 0.5 * sh.qty
    )
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
    ORDER BY s_name ASC
    """,
)
def tpch_q20_potential_promotion(star: Star) -> DataFrame:
    """TPC-H Q20: regional suppliers holding excess stock (availqty >
    half the year's shipments) of a product line.  The correlated
    quantity subquery decorrelates into ONE (partkey, suppkey)-grain
    aggregate of the date-pruned lineitem — the only fact pass — then
    everything else is dim-scale joins; the inner join reproduces the
    spec's NULL semantics (no shipments → no qualification)."""
    shipped = (
        star.lineitem.filter(
            F.col("l_shipdate").cast("date").between("1996-01-01", "1996-12-31")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(sm.dec_sum(F.col("l_quantity"), "qty"))
    )
    fp = star.part.filter(F.col("p_name").like("small%")).select("p_partkey")
    excess = (
        sm.partsupp(star)
        .join(F.broadcast(fp), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        star.supplier.join(
            F.broadcast(
                star.nation.join(
                    F.broadcast(star.region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(excess), F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy(F.col("s_name").asc())
    )


@register(
    "tpch_q21_suppliers_who_kept_waiting",
    f"""
    WITH ld AS (
        SELECT l_orderkey, l_suppkey,
               CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey * 3 + l_linenumber * 7) % 30 AS INT)
                   AS l_commitdate,
               CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey * 5 + l_linenumber * 11) % 30 + 1 AS INT)
                   AS l_receiptdate
        FROM lineitem
    ),
    fl AS (
        SELECT ld.* FROM ld
        JOIN orders o ON o.o_orderkey = ld.l_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM fl l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND l1.l_receiptdate > l1.l_commitdate
      AND EXISTS (SELECT 1 FROM fl l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM fl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_receiptdate > l3.l_commitdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def tpch_q21_suppliers_who_kept_waiting(star: Star) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late supplier on a
    completed multi-supplier order.  The spec's EXISTS / NOT EXISTS
    self-join pair (which the oracle states verbatim) collapses into
    ONE (orderkey, suppkey)-grain aggregate + one order-grain rollup:
    an order qualifies iff it has ≥2 suppliers and exactly one of them
    is late — l1's count is that supplier's late lines.  Because the
    qualifying order has EXACTLY ONE late supplier, that supplier's
    (suppkey, late-line count) rides the order-grain aggregate as two
    scalar ``max(when(late, …))`` columns (both come from the same row;
    scalar max keeps the aggregate in HashAggregate — a struct-valued
    max falls back to SortAggregate and re-sorts the fact) — so the
    whole query is one
    aggregation chain over a single lineitem scan, no self-join at all
    (r13 optimization: the former per_os ⋈ qual shape re-evaluated the
    per-supplier aggregate once per side and sort-merge-joined them —
    plans/r13/tpch_q21_*: 2 lineitem scans + SMJ → 1 scan, SMJ gone);
    the differential between this and the oracle's verbatim
    EXISTS/NOT-EXISTS strategy is the correctness evidence."""
    ld = sm.lineitem_dated(star).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_receiptdate") > F.col("l_commitdate")).cast("int").alias("late"),
    )
    fl = ld.join(
        star.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).drop("o_orderkey")
    per_os = fl.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("sup_late"),
        F.sum("late").cast("long").alias("n_late_lines"),
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sups"),
        F.sum("sup_late").alias("n_late_sups"),
        F.max(
            F.when(F.col("sup_late") == 1, F.col("l_suppkey"))
        ).alias("late_suppkey"),
        F.max(
            F.when(F.col("sup_late") == 1, F.col("n_late_lines"))
        ).alias("late_lines"),
    )
    qual = per_o.filter(
        (F.col("n_sups") >= 2) & (F.col("n_late_sups") == 1)
    ).select(
        F.col("late_suppkey").alias("l_suppkey"),
        F.col("late_lines").alias("n_late_lines"),
    )
    asia_sup = star.supplier.join(
        F.broadcast(
            star.nation.join(
                F.broadcast(star.region.filter(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(asia_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )
