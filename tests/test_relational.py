"""Core relational operator tests (SURVEY §2.2-§2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators import relational as R


def test_dedup_keep_last_explicit_order(spark):
    df = spark.createDataFrame(
        [("k1", "f1", 1, "old"), ("k1", "f2", 1, "new"), ("k2", "f1", 2, "only")],
        "k string, file string, line int, v string",
    )
    out = R.dedup_keep_last(df, ["k"], [F.col("file"), F.col("line")])
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {"k1": "new", "k2": "only"}


def test_dedup_keep_first_with_order(spark):
    df = spark.createDataFrame(
        [("k1", 2, "later"), ("k1", 1, "first")], "k string, seq int, v string"
    )
    out = R.dedup_keep_first(df, ["k"], [F.col("seq")])
    assert out.collect()[0]["v"] == "first"


def test_union_all_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id int")
    out = R.union_all([a, b]).orderBy("id").collect()
    assert [(r["id"], r["v"]) for r in out] == [(1, "x"), (2, "y")]


def test_left_anti(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    existing = spark.createDataFrame([("a",), ("a",)], "k string")
    out = R.left_anti(df, existing, ["k"]).collect()
    assert [r["k"] for r in out] == ["b"]


def test_duplicate_keys(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    out = R.duplicate_keys(df, ["k"]).collect()
    assert len(out) == 1 and out[0]["k"] == "a" and out[0]["dup_count"] == 2


def test_region_merge_single_pass(spark):
    df = spark.createDataFrame(
        [("9891", "A", 1.0), ("9801", "A", 2.0), ("9900", "A", 5.0)],
        "DC string, Article string, stock double",
    )
    out = R.region_merge(
        df, dc_col="DC", groups={"9891": ["9891", "9801"]}, sum_cols=["stock"]
    )
    rows = {r["DC"]: r["stock"] for r in out.collect()}
    assert rows == {"9891": 3.0, "9900": 5.0}


def test_full_outer_coalesce(spark):
    l = spark.createDataFrame([("k1", 1.0), ("k2", 2.0)], "k string, qty double")
    r = spark.createDataFrame([("k2", 20.0), ("k3", 30.0)], "k string, amt double")
    out = R.full_outer_coalesce(l, r, ["k"], fill={"qty": 0.0, "amt": 0.0})
    rows = {x["k"]: (x["qty"], x["amt"]) for x in out.collect()}
    assert rows == {"k1": (1.0, 0.0), "k2": (2.0, 20.0), "k3": (0.0, 30.0)}


def test_column_max_lengths(spark):
    df = spark.createDataFrame([("abc", 1), ("a", 22)], "s string, n int")
    row = R.column_max_lengths(df).collect()[0]
    assert row["s"] == 3 and row["n"] == 2


def test_salted_join_matches_plain_join(spark):
    """Salting never changes results — only the shuffle distribution."""
    from sap_data_pipeline_spark.operators.relational import salted_join

    big = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], ["k", "v"]  # key 0/1/2, skewed-ish
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (9, "z")], ["k", "name"])
    plain = sorted(map(tuple, big.join(small, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(big, small, ["k"], salt=4).collect()))
    assert salted == plain


def test_quality_report_single_pass(spark):
    """Declarative checks: correct counts, evaluated in ONE aggregate pass
    (a single scan in the plan), long-format output."""
    from sap_data_pipeline_spark.operators.quality import (
        duplicate_count,
        quality_report,
        violation,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "a", 5.0), (2, None, -1.0), (3, "c", 0.0)],
        "k int, name string, qty double",
    )
    rpt = quality_report(
        df,
        {
            "null_name": violation(F.col("name").isNull()),
            "dup_k": duplicate_count(["k"]),
            "nonpositive_qty": violation(F.col("qty") <= 0),
        },
    )
    got = {r["check_name"]: r["n_violations"] for r in rpt.collect()}
    assert got == {"null_name": 1, "dup_k": 1, "nonpositive_qty": 2}
    # count scans in the FINAL plan only (the AQE string repeats the
    # pre-adaptive plan under "== Initial Plan ==")
    plan = rpt._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1


def test_events_funnel_walk_semantics(spark, tmp_path):
    """The funnel state machine must require ORDER (a purchase before
    the view doesn't count), allow gaps/repeats, and count each user at
    every stage they reach."""
    import sap_data_pipeline_spark.plans.catalog_ext  # noqa: F401  (registers)
    from sap_data_pipeline_spark.plans.catalog import QUERIES
    from sap_data_pipeline_spark.sources.readers import TABLES

    # build a tiny star dir with ONLY events (other tables unused here)
    import shutil

    src = "/root/testdata/sf0.001"
    d = tmp_path / "star"
    d.mkdir()
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        # u1 completes all 4 in order (with noise + repeats)
        (1, "2024-01-01 10:00:00", 1, "signup"),
        (2, "2024-01-01 10:05:00", 1, "error"),
        (3, "2024-01-01 10:10:00", 1, "view"),
        (4, "2024-01-01 10:15:00", 1, "view"),
        (5, "2024-01-01 10:20:00", 1, "click"),
        (6, "2024-01-01 10:25:00", 1, "purchase"),
        # u2: purchase BEFORE view -> stops after click
        (7, "2024-01-02 09:00:00", 2, "signup"),
        (8, "2024-01-02 09:01:00", 2, "purchase"),
        (9, "2024-01-02 09:02:00", 2, "view"),
        (10, "2024-01-02 09:03:00", 2, "click"),
        # u3: never signs up -> reaches nothing
        (11, "2024-01-03 08:00:00", 3, "view"),
        (12, "2024-01-03 08:01:00", 3, "purchase"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props",
    ).write.parquet(str(d / "events.parquet"))

    got = {r["stage"]: (r["step"], r["n_users"]) for r in
           QUERIES["events_funnel"](spark, str(d)).collect()}
    assert got == {1: ("signup", 2), 2: ("view", 2),
                   3: ("click", 2), 4: ("purchase", 1)}


def test_top_n_per_group_deterministic_ties(spark):
    from sap_data_pipeline_spark.operators.relational import top_n_per_group
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 9.0), ("a", 4, 1.0),
         ("b", 5, 2.0)],
        ["grp", "id", "score"],
    )
    out = top_n_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], 2
    ).collect()
    got = {(r["grp"], r["id"], r["rank"]) for r in out}
    # score 9 first; the 5.0 tie breaks toward the lower id
    assert got == {("a", 3, 1), ("a", 1, 2), ("b", 5, 1)}


def test_top_n_per_group_uses_window_group_limit(star):
    """Plan: the rank bound must push below the sort (WindowGroupLimit),
    so partitions keep <= n candidates per group instead of sorting
    whole groups."""
    from sap_data_pipeline_spark.operators.relational import top_n_per_group
    from pyspark.sql import functions as F

    plan = (
        top_n_per_group(
            star.customer, ["c_nationkey"],
            [F.col("c_acctbal").desc(), F.col("c_custkey").asc()], 3
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_fuzzy_self_pairs_blocks_and_bounds(spark):
    from sap_data_pipeline_spark.operators.relational import fuzzy_self_pairs

    df = spark.createDataFrame(
        [
            (1, "red gear", "t1"),
            (2, "red geer", "t1"),   # distance 1 to id 1
            (3, "blue gear", "t1"),  # distance 2 to "red gear"? r->b,e->l,d->u = 3
            (4, "red gear", "t2"),   # other block — never paired with t1
            (5, "entirely different", "t1"),
        ],
        ["id", "name", "typ"],
    )
    out = fuzzy_self_pairs(
        df, id_col="id", name_col="name", block_cols=["typ"], max_distance=2
    ).collect()
    pairs = {(r["id_a"], r["id_b"], r["distance"]) for r in out}
    assert (1, 2, 1) in pairs
    assert all(a < b for a, b, _ in pairs)
    assert not any(4 in (a, b) for a, b, _ in pairs)  # cross-block never joins
    assert not any(5 in (a, b) for a, b, _ in pairs)  # beyond max_distance

    # degenerate block (cap=2) drops, never truncates
    capped = fuzzy_self_pairs(
        df, id_col="id", name_col="name", block_cols=["typ"],
        max_distance=20, max_block=2
    ).collect()
    assert {r["id_a"] for r in capped} <= {4}  # t1 block (4 rows) dropped whole


def test_drift_psi_hand_computed(spark):
    import math

    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.operators.quality import drift_psi

    ref = spark.createDataFrame(
        [("en",), ("en",), ("de",), ("fr",)], "lang string"
    )
    cur = spark.createDataFrame(
        [("en",), ("de",), ("de",), ("zh",)], "lang string"
    )
    got = {r["feature"]: r for r in
           drift_psi(ref, cur, {"lang": F.col("lang")}).collect()}
    eps = 1e-6
    expected = 0.0
    for pr, pc in [(0.5, 0.25), (0.25, 0.5), (0.25, eps), (eps, 0.25)]:
        expected += (pc - pr) * math.log(pc / pr)
    assert got["lang"]["n_buckets"] == 4
    assert got["lang"]["psi"] == round(expected, 6)


def test_drift_psi_identical_distributions_zero(spark):
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.operators.quality import drift_psi

    df = spark.createDataFrame([("a", 1), ("b", 250)], "k string, v long")
    got = drift_psi(
        df, df,
        {"k": F.col("k"), "v_bucket": F.least(F.floor(F.col("v") / 100), F.lit(9))},
    ).collect()
    assert {r["feature"]: r["psi"] for r in got} == {"k": 0.0, "v_bucket": 0.0}
    assert all(r["n_buckets"] == 2 for r in got)


def test_drift_psi_rejects_empty_features(spark):
    import pytest as _pytest

    from sap_data_pipeline_spark.operators.quality import drift_psi

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError):
        drift_psi(df, df, {})


def test_k_anonymity_report_flags_small_groups_only(spark):
    import pytest as _pytest

    from sap_data_pipeline_spark.operators.quality import k_anonymity_report

    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("de", None)]
    df = spark.createDataFrame(rows, "lang string, src string")
    got = {(r["lang"], r["src"]): r["group_size"]
           for r in k_anonymity_report(df, ["lang", "src"], 3).collect()}
    assert got == {("en", "b"): 2, ("de", None): 1}  # null QID is a group
    assert k_anonymity_report(df, ["lang", "src"], 1).count() == 0
    with _pytest.raises(ValueError):
        k_anonymity_report(df, [], 3)
    with _pytest.raises(ValueError):
        k_anonymity_report(df, ["lang"], 0)
