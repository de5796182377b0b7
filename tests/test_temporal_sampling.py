"""Tests for temporal joins (as-of, range) and sampling/packing/PII ops."""

from __future__ import annotations

from conftest import count_hash_exchanges

import re

from pyspark.sql import functions as F

from sap_data_pipeline_spark.functions import text as X
from sap_data_pipeline_spark.operators import temporal as T
from sap_data_pipeline_spark.operators.sampling import hash_split, pack_by_offset

# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _asof_fixture(spark):
    probe = spark.createDataFrame(
        [
            ("u1", 10, "p1"),   # matches b@5
            ("u1", 20, "p2"),   # matches b@20 (equal ts, non-strict)
            ("u1", 3, "p3"),    # before any build row -> null
            ("u2", 50, "p4"),   # u2 has no build rows -> null
        ],
        "user string, ts long, pid string",
    )
    build = spark.createDataFrame(
        [("u1", 5, 1.0), ("u1", 20, 2.0), ("u1", 30, 3.0)],
        "user string, bts long, bval double",
    )
    return probe, build


def test_asof_join_backward_semantics(spark):
    probe, build = _asof_fixture(spark)
    out = T.asof_join(probe, build, on=["user"], left_ts="ts", right_ts="bts")
    rows = {r["pid"]: (r["bts"], r["bval"]) for r in out.collect()}
    assert rows == {
        "p1": (5, 1.0),
        "p2": (20, 2.0),   # >= matches the equal-ts build row
        "p3": (None, None),
        "p4": (None, None),
    }


def test_asof_join_strict_excludes_equal_ts(spark):
    probe, build = _asof_fixture(spark)
    out = T.asof_join(probe, build, on=["user"], left_ts="ts", right_ts="bts", strict=True)
    rows = {r["pid"]: r["bts"] for r in out.collect()}
    assert rows["p2"] == 5  # equal-ts row invisible under strict <


def test_asof_join_inner_drops_unmatched(spark):
    probe, build = _asof_fixture(spark)
    out = T.asof_join(probe, build, on=["user"], left_ts="ts", right_ts="bts", how="inner")
    assert {r["pid"] for r in out.collect()} == {"p1", "p2"}


def test_asof_join_rejects_column_collision(spark):
    probe, build = _asof_fixture(spark)
    try:
        T.asof_join(probe, build.withColumnRenamed("bts", "ts"), on=["user"])
    except ValueError as e:
        assert "collision" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_asof_join_no_join_node_in_plan(spark):
    """The scalable property: the plan is shuffle+window, not a join."""
    probe, build = _asof_fixture(spark)
    plan = T.asof_join(probe, build, on=["user"], left_ts="ts", right_ts="bts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# bounded range join
# ---------------------------------------------------------------------------


def test_explode_to_date_windows_matches_bruteforce(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-03 12:00:00"), (3, "2024-01-09 23:59:59")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    windows = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-10").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("win_start")
    )
    fast = T.explode_to_date_windows(events, "ts", windows, window_days=3)
    brute = events.crossJoin(windows).filter(
        (F.col("ts") >= F.col("win_start").cast("timestamp"))
        & (F.col("ts") < F.col("win_start").cast("timestamp") + F.expr("interval 3 days"))
    )
    got = {(r["id"], str(r["win_start"])) for r in fast.collect()}
    want = {(r["id"], str(r["win_start"])) for r in brute.collect()}
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# hash split
# ---------------------------------------------------------------------------


def test_hash_split_deterministic_and_complete(star):
    a = hash_split(star.documents, "doc_id").select("doc_id", "split")
    b = hash_split(star.documents, "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == star.documents.count()
    # 80/10/10 within a loose tolerance on 500 docs
    assert counts["train"] / total > 0.7
    assert 0 < counts.get("val", 0) < total * 0.2
    assert 0 < counts.get("test", 0) < total * 0.2


def test_hash_split_rejects_bad_weights(star):
    try:
        hash_split(star.documents, "doc_id", weights={"a": 50, "b": 49})
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


# ---------------------------------------------------------------------------
# offset packing
# ---------------------------------------------------------------------------


def test_pack_by_offset_invariants(spark):
    df = spark.createDataFrame(
        [(i, i % 2, 100 + i) for i in range(20)], "doc_id long, shard long, sz long"
    )
    out = pack_by_offset(df, "sz", budget=300, shard_col="shard", order_by=["doc_id"]).collect()
    for r in out:
        assert r["start_offset"] >= 0
        assert r["bin"] == r["start_offset"] // 300
    # offsets within a shard are the exclusive prefix sums in doc_id order
    for shard in (0, 1):
        rows = sorted((r for r in out if r["shard"] == shard), key=lambda r: r["doc_id"])
        acc = 0
        for r in rows:
            assert r["start_offset"] == acc
            acc += r["sz"]


# ---------------------------------------------------------------------------
# approximate aggregates: error bound vs exact companions
# ---------------------------------------------------------------------------


def test_approx_profile_error_bounds(spark, star):
    from sap_data_pipeline_spark.plans import catalog_ext  # noqa: F401  (registers)
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    approx = {
        r["source"]: r
        for r in QUERIES["approx_corpus_profile"](spark, "/root/testdata/sf0.001").collect()
    }
    exact = {
        r["source"]: r
        for r in star.documents.groupBy("source")
        .agg(
            F.countDistinct("text").alias("nd"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for src, e in exact.items():
        a = approx[src]
        assert abs(a["approx_distinct_texts"] - e["nd"]) <= max(2, 0.05 * e["nd"])
        assert abs(a["approx_p50_chars"] - e["p50"]) <= max(5, 0.05 * e["p50"])


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_redact_pii_removes_all_patterns(spark):
    df = spark.createDataFrame(
        [
            ("a", "mail me at jo.doe+x@sub.example.org now"),
            ("b", "ssn 123-45-6789 phone 415-555-0199"),
            ("c", "clean text with no pii at all"),
            ("d", "two mails a@b.co and c@d.io plus 212-555-0000"),
        ],
        "id string, t string",
    )
    out = df.select("id", X.redact_pii("t").alias("r"), *X.pii_counts("t")).collect()
    by_id = {r["id"]: r for r in out}
    for r in out:
        for pat in (X.EMAIL_RE, X.SSN_RE, X.PHONE_RE):
            assert re.search(pat, r["r"]) is None, (r["id"], r["r"])
    assert by_id["a"]["n_emails"] == 1 and "<EMAIL>" in by_id["a"]["r"]
    assert by_id["b"]["n_ssn"] == 1 and by_id["b"]["n_phones"] == 1
    assert by_id["c"]["r"] == "clean text with no pii at all"
    assert by_id["d"]["n_emails"] == 2 and by_id["d"]["r"].count("<EMAIL>") == 2


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_fraction_properties(star):
    from sap_data_pipeline_spark.operators.sampling import stratified_sample_fraction

    fractions = {"en": 1.0, "de": 0.5}
    out = stratified_sample_fraction(star.documents, "lang", fractions, key="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in star.documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == base["en"]                    # fraction 1.0 keeps all
    assert set(counts) <= {"en", "de"}                       # default 0 drops the rest
    if "de" in counts:
        assert counts["de"] <= base["de"]
    # deterministic: identical membership on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample_fraction(
            star.documents, "lang", fractions, key="doc_id"
        ).collect()
    )
    assert a == b


def test_stratified_sample_n_exact_sizes(star):
    from sap_data_pipeline_spark.operators.sampling import stratified_sample_n

    out = stratified_sample_n(star.documents, ["lang"], 5, key="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in star.documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, base[lang])


def test_pack_greedy_respects_budget(spark):
    from sap_data_pipeline_spark.operators.sampling import pack_greedy

    rows = [(i, i % 2, sz) for i, sz in enumerate([100, 250, 120, 90, 400, 50, 777, 10])]
    df = spark.createDataFrame(rows, "doc_id long, shard long, sz long")
    out = pack_greedy(df, "sz", budget=300, shard_col="shard", order_by=["doc_id"]).collect()

    # bins fill at most `budget` unless a single oversized doc owns the bin
    fills: dict[tuple, list] = {}
    for r in out:
        fills.setdefault((r["shard"], r["bin"]), []).append(r["sz"])
    for sizes in fills.values():
        assert sum(sizes) <= 300 or len(sizes) == 1

    # bins are contiguous non-decreasing in walk order within each shard
    for shard in (0, 1):
        seq = [r["bin"] for r in sorted(out, key=lambda r: r["doc_id"]) if r["shard"] == shard]
        assert seq == sorted(seq) and seq[0] == 0

    # exact bin assignment for shard 0: sizes 100,120,400,777 -> greedy
    s0 = {r["doc_id"]: r["bin"] for r in out if r["shard"] == 0}
    assert s0 == {0: 0, 2: 0, 4: 1, 6: 2}


def test_stratum_cap_exact_bound_and_stability(spark, star):
    from sap_data_pipeline_spark.operators.sampling import stratum_cap

    capped = stratum_cap(star.documents, "lang", 10)
    per = {r["lang"]: r["n"] for r in
           capped.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            star.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(10, full[lang])
    # membership is a pure function of the key: re-run selects identically
    a = {r["doc_id"] for r in capped.collect()}
    b = {r["doc_id"] for r in stratum_cap(star.documents, "lang", 10).collect()}
    assert a == b
    # and differs from naive smallest-id selection (hash order, not id order)
    naive = {r["doc_id"] for r in star.documents.orderBy("doc_id").limit(10).collect()}
    assert a != naive


def test_mixture_plan_solves_downsample_only_mix(spark, star):
    """The plan must (a) hit the target shares exactly in expectation,
    (b) never upsample (all fractions <= 1), and (c) saturate the
    binding stratum (exactly one fraction == 1)."""
    from sap_data_pipeline_spark.operators.sampling import mixture_plan

    target = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    plan = {r["stratum"]: r for r in
            mixture_plan(star.documents, "lang", target,
                         weight_col="n_chars").collect()}
    assert set(plan) == set(target)
    fracs = [r["sampling_fraction"] for r in plan.values()]
    assert all(0 < f <= 1 for f in fracs)
    assert sum(1 for f in fracs if f == 1.0) == 1  # binding stratum saturates
    total_take = sum(r["take_weight"] for r in plan.values())
    for lang, r in plan.items():
        # planned takes reproduce the target mix
        assert abs(r["take_weight"] / total_take - target[lang]) < 1e-6
        # and never exceed what's available
        assert r["take_weight"] <= r["available"] + 1e-9


def test_mixture_plan_drops_unlisted_strata(spark, star):
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan,
        mixture_plan,
    )

    target = {"en": 0.5, "de": 0.5}  # es/fr/zh unlisted -> dropped
    plan = mixture_plan(star.documents, "lang", target, weight_col="n_chars")
    kept = apply_mixture_plan(star.documents, plan, "lang", key="doc_id")
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en", "de"}


def test_apply_mixture_plan_is_retry_stable(spark, star):
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan,
        mixture_plan,
    )

    target = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}
    plan = mixture_plan(star.documents, "lang", target, weight_col="n_chars")
    a = {r["doc_id"] for r in
         apply_mixture_plan(star.documents, plan, "lang", key="doc_id").collect()}
    b = {r["doc_id"] for r in
         apply_mixture_plan(star.documents, plan, "lang", key="doc_id").collect()}
    assert a == b and len(a) > 0


def test_curriculum_bins_approximately_uniform(spark, star):
    """Deciles over quality_score: every bin within a tolerant band of
    uniform occupancy (approx cutpoints; curricula tolerate boundary
    fuzz by design), labels span 0..9, membership reproducible."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.functions.text import quality_score
    from sap_data_pipeline_spark.operators.sampling import curriculum_bins

    scored = star.documents.select(
        "doc_id", quality_score("text").alias("q")
    )
    binned = curriculum_bins(scored, "q", n_bins=10)
    counts = {r["curriculum_bin"]: r["n"] for r in
              binned.groupBy("curriculum_bin").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    # tied cutpoints legally collapse a bin (ties land in the lower
    # bin); most deciles must survive and all labels stay in range
    assert set(counts) <= set(range(10)) and len(counts) >= 8
    for b, n in counts.items():
        assert n / total <= 0.3, (b, n, total)
    # reproducible membership
    a = {r["doc_id"]: r["curriculum_bin"] for r in binned.collect()}
    b = {r["doc_id"]: r["curriculum_bin"] for r in
         curriculum_bins(scored, "q", n_bins=10).collect()}
    assert a == b
    # ordering property over the bins present: max score of a bin never
    # exceeds the min score two bins later (adjacent bins may
    # interleave at the fuzzy boundary only)
    stats = {r["curriculum_bin"]: (r["lo"], r["hi"]) for r in
             binned.groupBy("curriculum_bin").agg(
                 F.min("q").alias("lo"), F.max("q").alias("hi")).collect()}
    present = sorted(stats)
    for i in range(len(present) - 2):
        assert stats[present[i]][1] <= stats[present[i + 2]][0] + 1e-9


def test_curriculum_bins_rejects_bad_n(spark, star):
    import pytest

    from sap_data_pipeline_spark.operators.sampling import curriculum_bins

    with pytest.raises(ValueError):
        curriculum_bins(star.documents, "n_chars", n_bins=1)


def test_dsir_logweights_hand_computed(spark):
    """Two-bucket-world hand check: target favors 'good' vocabulary, so a
    good-vocab doc must outweigh a bad-vocab doc; weights match a direct
    python recomputation of the smoothed log-ratio model."""
    import math

    from sap_data_pipeline_spark.functions.text import hash64
    from sap_data_pipeline_spark.operators.sampling import dsir_logweights
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [
            (1, "good good text"),
            (2, "bad bad text"),
            (3, "good text"),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame([(10, "good good good text")], ["doc_id", "text"])
    buckets, seed = 64, 7
    out = {
        r["doc_id"]: r
        for r in dsir_logweights(corpus, target, buckets=buckets, seed=seed).collect()
    }

    # independent python model over the same gram/hash definitions
    def grams(text):
        toks = text.split()
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    hrows = spark.createDataFrame(
        [(g,) for d in ["good good text", "bad bad text", "good text",
                        "good good good text"] for g in set(grams(d))],
        ["g"],
    ).select("g", F.pmod(hash64(F.col("g"), seed=seed), F.lit(buckets)).alias("b"))
    b_of = {r["g"]: r["b"] for r in hrows.distinct().collect()}

    q_cnt: dict[int, int] = {}
    p_cnt: dict[int, int] = {}
    docs = {1: "good good text", 2: "bad bad text", 3: "good text"}
    for d in docs.values():
        for g in grams(d):
            q_cnt[b_of[g]] = q_cnt.get(b_of[g], 0) + 1
    for g in grams("good good good text"):
        p_cnt[b_of[g]] = p_cnt.get(b_of[g], 0) + 1
    nq, np_ = sum(q_cnt.values()), sum(p_cnt.values())
    for doc_id, text in docs.items():
        expect = sum(
            math.log((p_cnt.get(b_of[g], 0) + 1) / (np_ + buckets))
            - math.log((q_cnt[b_of[g]] + 1) / (nq + buckets))
            for g in grams(text)
        )
        assert abs(out[doc_id]["dsir_logweight"] - expect) < 1e-5, doc_id
        assert out[doc_id]["n_grams"] == len(grams(text))
    # the in-domain doc ranks above the out-of-domain doc
    assert out[1]["dsir_logweight"] > out[2]["dsir_logweight"]


def test_dsir_logweights_corpus_never_shuffles_twice(star):
    """Plan shape: the bucket→log-ratio table re-enters as a BROADCAST
    join (the corpus-side frame must not hash-exchange for the join)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.operators.sampling import dsir_logweights

    plan = dsir_logweights(
        star.documents, star.documents.filter(F.col("lang") == "en")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_resample_gapfill_policies(spark):
    import datetime as dt

    from sap_data_pipeline_spark.operators.temporal import resample_gapfill
    import pytest as _pytest

    d = dt.date
    df = spark.createDataFrame(
        [
            ("a", d(2020, 1, 1), 5.0, 10.0),
            ("a", d(2020, 1, 4), 7.0, 20.0),
            ("b", d(2020, 3, 1), 1.0, 2.0),
        ],
        ["k", "day", "flow", "stock"],
    )
    out = resample_gapfill(
        df, "k", "day", fill_zero=["flow"], fill_forward=["stock"]
    )
    rows = {(r["k"], str(r["day"])): (r["flow"], r["stock"]) for r in out.collect()}
    # dense spine per key's own bounds: a gets 4 days, b gets 1 — never
    # a's span applied to b
    assert len(rows) == 5
    assert rows[("a", "2020-01-02")] == (0.0, 10.0)  # zero-fill + locf
    assert rows[("a", "2020-01-03")] == (0.0, 10.0)
    assert rows[("a", "2020-01-04")] == (7.0, 20.0)
    assert rows[("b", "2020-03-01")] == (1.0, 2.0)

    with _pytest.raises(ValueError):
        resample_gapfill(df, "k", "day", fill_zero=["flow"], fill_forward=["flow"])


def test_transition_matrix_hand_computed(spark):
    import datetime as dt

    from sap_data_pipeline_spark.operators.temporal import transition_matrix

    t = dt.datetime
    df = spark.createDataFrame(
        [
            (1, t(2020, 1, 1, 0), "a"),
            (1, t(2020, 1, 1, 1), "b"),
            (1, t(2020, 1, 1, 2), "a"),
            (2, t(2020, 1, 1, 0), "a"),
            (2, t(2020, 1, 1, 1), "b"),
            (3, t(2020, 1, 1, 0), "c"),  # singleton: no transitions
        ],
        ["uid", "ts", "ev"],
    )
    out = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in transition_matrix(df, "uid", "ts", "ev").collect()
    }
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_temperature_mixture_plan_smooths_toward_tail(spark):
    """alpha=1 reproduces the observed mix; alpha=0.5 moves share from
    the head stratum to the tail (the smoothing's whole point); every
    fraction stays in (0, 1] with exactly one binding stratum."""
    from sap_data_pipeline_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    rows = [(i, "en") for i in range(900)] + [(i + 900, "mi") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    p1 = {r["stratum"]: r for r in
          temperature_mixture_plan(df, "lang", alpha=1.0).collect()}
    assert abs(p1["en"]["target_share"] - 0.9) < 1e-4
    assert abs(p1["mi"]["target_share"] - 0.1) < 1e-4

    p5 = {r["stratum"]: r for r in
          temperature_mixture_plan(df, "lang", alpha=0.5).collect()}
    assert p5["mi"]["target_share"] > 0.1       # tail gains
    assert p5["en"]["target_share"] < 0.9       # head yields
    fracs = [r["sampling_fraction"] for r in p5.values()]
    assert all(0 < f <= 1.0 for f in fracs)
    assert any(abs(f - 1.0) < 1e-6 for f in fracs)  # binding stratum


# ---------------------------------------------------------------------------
# interval_overlap_join (r7): binned equi-join formulation of the
# overlap theta join
# ---------------------------------------------------------------------------


def _intervals(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_interval_overlap_join_matches_naive_theta_join(spark):
    """Differential vs the naive O(L×R) predicate join across bin
    boundary cases: touching endpoints (closed-interval), containment,
    multi-bin spans, disjoint, and same-bin-no-overlap."""
    import random

    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    rng = random.Random(11)
    left = [(i, rng.randrange(0, 500), 0) for i in range(60)]
    left = [(i, s, s + rng.randrange(0, 120)) for i, s, _ in left]
    right = [(j, rng.randrange(0, 500), 0) for j in range(40)]
    right = [(j, s, s + rng.randrange(0, 40)) for j, s, _ in right]
    ldf = _intervals(spark, left, "lid long, ls long, le long")
    rdf = _intervals(spark, right, "rid long, rs long, re long")

    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=64,
        ).collect()
    )
    want = sorted(
        (li, rj)
        for li, ls, le in left
        for rj, rs, re in right
        if ls <= re and rs <= le
    )
    assert got == want and len(got) > 0
    # emit-once: no pair may appear twice even when intervals share
    # several bins
    assert len(got) == len(set(got))


def test_interval_overlap_join_keys_malformed_and_collision(spark):
    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    ldf = _intervals(
        spark,
        [("u1", 1, 10, 100), ("u2", 2, 10, 100), ("u1", 3, 50, 40)],
        "k string, lid long, ls long, le long",
    )
    rdf = _intervals(
        spark, [("u1", 7, 5, 20)], "k string, rid long, rs long, re long"
    )
    # same key overlaps; different key with identical interval does NOT;
    # the (start > end) malformed row is dropped, not joined
    got = [
        (r["k"], r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, on=["k"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=16,
        ).collect()
    ]
    assert got == [("u1", 1, 7)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        interval_overlap_join(
            ldf.withColumnRenamed("lid", "rid"), rdf, on=["k"],
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=16,
        )

    # bin_size <= 0 would NULL every bin under non-ANSI division and
    # silently return an empty join — must raise instead
    for bad in (0, -4):
        with _pytest.raises(ValueError, match="bin_size"):
            interval_overlap_join(
                ldf, rdf, on=["k"], left_start="ls", left_end="le",
                right_start="rs", right_end="re", bin_size=bad,
            )
    with _pytest.raises(ValueError, match="max_bins_per_interval"):
        interval_overlap_join(
            ldf, rdf, on=["k"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=16,
            max_bins_per_interval=0,
        )


def test_interval_overlap_join_plan_is_equi_hash_join(spark):
    """The 100 TB contract: the physical plan must contain a real
    equi-join (hash or sort-merge) on the bin key and NO nested-loop /
    cartesian fallback — the entire point of the bin rewrite."""
    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    ldf = spark.range(1000).select(
        F.col("id").alias("lid"),
        (F.col("id") * 7 % 5000).alias("ls"),
        (F.col("id") * 7 % 5000 + 50).alias("le"),
    )
    rdf = spark.range(1000).select(
        F.col("id").alias("rid"),
        (F.col("id") * 13 % 5000).alias("rs"),
        (F.col("id") * 13 % 5000 + 20).alias("re"),
    )
    plan = (
        interval_overlap_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=64,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# ---------------------------------------------------------------------------
# weighted_sample_n (r7): Efraimidis-Spirakis A-Res
# ---------------------------------------------------------------------------


def test_weighted_sample_exact_n_deterministic_and_biased(spark):
    """Exactly n per stratum, identical across re-runs, and the
    inclusion bias is real: with 20 heavy (w=200) vs 180 light (w=1)
    rows competing for 20 slots, heavy rows must take a clear majority
    (uniform sampling would give them ~2)."""
    from sap_data_pipeline_spark.operators.sampling import weighted_sample_n

    rows = [(f"d{i}", "s", 200 if i < 20 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, stratum string, w long")
    take = lambda: weighted_sample_n(  # noqa: E731
        df, ["stratum"], 20, key="doc_id", weight_col="w"
    )
    got = take().collect()
    assert len(got) == 20
    heavy = sum(1 for r in got if r["w"] == 200)
    assert heavy >= 12, heavy
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in take().collect()
    )


def test_weighted_sample_excludes_nonpositive_and_small_strata(spark):
    from sap_data_pipeline_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [("a", "x", 5), ("b", "x", 0), ("c", "x", -3), ("d", "y", 1)],
        "doc_id string, stratum string, w long",
    )
    got = weighted_sample_n(df, ["stratum"], 10, key="doc_id", weight_col="w")
    ids = sorted(r["doc_id"] for r in got.collect())
    assert ids == ["a", "d"]  # zero/negative weights carry no mass


def test_weighted_sample_priority_contract(spark):
    """The returned ``priority`` column is part of the documented
    contract: input columns + priority, nothing internal; an existing
    ``priority`` column is rejected, never silently overwritten."""
    import pytest as _pytest

    from sap_data_pipeline_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [("a", "x", 5), ("b", "x", 2)], "doc_id string, stratum string, w long"
    )
    out = weighted_sample_n(df, ["stratum"], 1, key="doc_id", weight_col="w")
    assert out.columns == ["doc_id", "stratum", "w", "priority"]
    assert all(r["priority"] is not None for r in out.collect())

    with _pytest.raises(ValueError, match="priority"):
        weighted_sample_n(
            df.withColumn("priority", F.lit(0.0)),
            ["stratum"], 1, key="doc_id", weight_col="w",
        )


def test_interval_overlap_join_caps_pathological_spans(spark):
    """The fan-out guard: a corrupt near-infinite interval is DROPPED
    (never exploded to billions of bins); normal rows still join."""
    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    ldf = _intervals(
        spark,
        [(1, 100, 150), (2, 0, 9_000_000_000_000)],  # row 2 is garbage
        "lid long, ls long, le long",
    )
    rdf = _intervals(spark, [(7, 120, 130)], "rid long, rs long, re long")
    got = [
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=64,
            max_bins_per_interval=1000,
        ).collect()
    ]
    assert got == [(1, 7)]


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------


def _shuffle_fixture(spark):
    return spark.range(0, 200).select(F.col("id").alias("doc_id"))


def test_epoch_shuffle_is_a_permutation(spark):
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    out = epoch_shuffle(_shuffle_fixture(spark), "doc_id", epoch=1, n_shards=4)
    rows = out.collect()
    assert len(rows) == 200
    # global_order is a bijection into a dense-enough range: unique, and
    # interleaving means order o sits in shard o % n_shards
    orders = [r["global_order"] for r in rows]
    assert len(set(orders)) == 200
    for r in rows:
        assert r["shard"] == r["global_order"] % 4
        assert 0 <= r["shard"] < 4
        assert r["global_order"] == (r["pos_in_shard"] - 1) * 4 + r["shard"]


def test_epoch_shuffle_deterministic_and_epoch_varying(spark):
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    df = _shuffle_fixture(spark)
    a1 = {r["doc_id"]: r["global_order"]
          for r in epoch_shuffle(df, "doc_id", epoch=2).collect()}
    a2 = {r["doc_id"]: r["global_order"]
          for r in epoch_shuffle(df, "doc_id", epoch=2).collect()}
    b = {r["doc_id"]: r["global_order"]
         for r in epoch_shuffle(df, "doc_id", epoch=3).collect()}
    assert a1 == a2                       # bit-stable across re-runs
    assert a1 != b                        # epochs genuinely re-order
    # and the epoch-3 order is still a permutation of the same rows
    assert set(b) == set(a1) and len(set(b.values())) == len(b)


def test_epoch_shuffle_single_exchange_no_global_sort(spark):
    """Plan contract: ONE hash exchange (on the shard key) and a
    partition-local sort — a global-sort formulation would show
    Exchange rangepartitioning."""
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    out = epoch_shuffle(_shuffle_fixture(spark), "doc_id", n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert count_hash_exchanges(plan) == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_shuffle_rejects_bad_shards(spark):
    import pytest

    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    with pytest.raises(ValueError):
        epoch_shuffle(_shuffle_fixture(spark), "doc_id", n_shards=0)


def test_ring_negatives_count_and_no_self_pairs(spark):
    from sap_data_pipeline_spark.operators.sampling import ring_negatives

    df = _shuffle_fixture(spark)  # 200 rows
    out = ring_negatives(df, "doc_id", k=3, n_shards=4).collect()
    # every shard has >= 4 rows at n=200/shards=4, so stepping 1..3 never
    # wraps onto the anchor: exactly k*N pairs, none reflexive
    assert len(out) == 3 * 200
    for r in out:
        assert r["anchor"] != r["negative"]
    # per anchor: k distinct negatives (ring steps are distinct positions)
    from collections import defaultdict

    by_anchor = defaultdict(set)
    for r in out:
        by_anchor[r["anchor"]].add(r["negative"])
    assert all(len(v) == 3 for v in by_anchor.values())


def test_ring_negatives_deterministic_and_epoch_varying(spark):
    from sap_data_pipeline_spark.operators.sampling import ring_negatives

    df = _shuffle_fixture(spark)
    p1 = {(r["anchor"], r["j"]): r["negative"]
          for r in ring_negatives(df, "doc_id", k=2, epoch=5).collect()}
    p2 = {(r["anchor"], r["j"]): r["negative"]
          for r in ring_negatives(df, "doc_id", k=2, epoch=5).collect()}
    p3 = {(r["anchor"], r["j"]): r["negative"]
          for r in ring_negatives(df, "doc_id", k=2, epoch=6).collect()}
    assert p1 == p2
    assert p1 != p3


def test_ring_negatives_single_row_shard_drops_self(spark):
    from sap_data_pipeline_spark.operators.sampling import ring_negatives

    one = spark.createDataFrame([(1,)], "doc_id long")
    # a 1-row corpus: the only candidate negative is the anchor itself
    assert ring_negatives(one, "doc_id", k=2).count() == 0


def test_ring_negatives_rejects_bad_k(spark):
    import pytest

    from sap_data_pipeline_spark.operators.sampling import ring_negatives

    with pytest.raises(ValueError):
        ring_negatives(_shuffle_fixture(spark), "doc_id", k=0)


# ---------------------------------------------------------------------------
# upsampling mixture apply
# ---------------------------------------------------------------------------


def _upmix_fixture(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("src"),
    )
    plan = spark.createDataFrame(
        [("a", 2.5), ("b", 0.25)], "stratum string, sampling_fraction double"
    )
    return df, plan


def test_upsampling_mixture_copy_counts(spark):
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan_with_repetition,
    )

    df, plan = _upmix_fixture(spark)
    out = apply_mixture_plan_with_repetition(df, plan, "src", key="doc_id")
    rows = out.collect()
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in rows)
    # stratum a (fraction 2.5): every doc 2 or 3 copies, ~half get 3
    a_docs = [i for i in range(0, 300, 3)]
    a_counts = [per_doc[i] for i in a_docs]
    assert set(a_counts) <= {2, 3}
    three_share = sum(1 for c in a_counts if c == 3) / len(a_counts)
    assert 0.3 < three_share < 0.7, three_share
    # stratum b (fraction 0.25): kept docs exactly once, ~quarter kept
    b_docs = [i for i in range(300) if i % 3 != 0]
    b_counts = [per_doc[i] for i in b_docs if per_doc[i] > 0]
    assert all(c == 1 for c in b_counts)
    assert 0.12 < len(b_counts) / len(b_docs) < 0.40
    # copy tags are 1..total per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_upsampling_fractional_part_composes_with_downsample(spark):
    """The fractional copy keeps EXACTLY the rows a plain fractional
    downsample at the same fraction keeps (same hash bucket contract)."""
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan,
        apply_mixture_plan_with_repetition,
    )

    df, _ = _upmix_fixture(spark)
    plan = df.sparkSession.createDataFrame(
        [("a", 0.5), ("b", 0.5)], "stratum string, sampling_fraction double"
    )
    plain = {r["doc_id"] for r in
             apply_mixture_plan(df, plan, "src", key="doc_id").collect()}
    rep = {r["doc_id"] for r in
           apply_mixture_plan_with_repetition(df, plan, "src", key="doc_id")
           .collect()}
    assert plain == rep


def test_upsampling_rejects_runaway_plan(spark):
    import pytest

    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan_with_repetition,
    )

    df, _ = _upmix_fixture(spark)
    plan = df.sparkSession.createDataFrame(
        [("a", 1000.0)], "stratum string, sampling_fraction double"
    )
    with pytest.raises(ValueError):
        apply_mixture_plan_with_repetition(df, plan, "src", key="doc_id")


def test_upsampling_mixture_plan_is_broadcast_explode_no_shuffle(spark):
    """Plan contract: the corpus side never shuffles — one broadcast
    plan join plus a map-side explode(sequence)."""
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan_with_repetition,
    )

    df, plan = _upmix_fixture(spark)
    out = apply_mixture_plan_with_repetition(df, plan, "src", key="doc_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert count_hash_exchanges(p) == 0, p
    assert "Generate explode" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_proportional_allocation_hamilton(spark):
    from sap_data_pipeline_spark.operators.sampling import proportional_allocation

    counts = spark.createDataFrame(
        [("en", 7), ("de", 2), ("fr", 1)], "stratum string, n long"
    )
    # total=5: shares 3.5 / 1.0 / 0.5 → bases 3/1/0, deficit 1 goes to
    # the largest remainder (en .5 ties fr .5 → 'en' < 'fr' wins)
    got = {r["stratum"]: r["quota"] for r in
           proportional_allocation(counts, 5).collect()}
    assert got == {"en": 4, "de": 1, "fr": 0}
    assert sum(got.values()) == 5


def test_proportional_allocation_sums_exactly_property(spark):
    import itertools

    from sap_data_pipeline_spark.operators.sampling import proportional_allocation

    sizes = [13, 57, 1, 900, 29]
    counts = spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(sizes)], "stratum string, n long"
    )
    for total in (0, 1, 7, 100, 999):
        got = {r["stratum"]: r["quota"] for r in
               proportional_allocation(counts, total).collect()}
        assert sum(got.values()) == total, total
        # quotas never exceed stratum size when total <= N
        assert all(got[f"s{i}"] <= sizes[i] for i in range(len(sizes))), total


def test_proportional_holdout_exact_total_and_determinism(spark):
    from sap_data_pipeline_spark.operators.sampling import proportional_holdout

    df = spark.createDataFrame(
        [(i, "en" if i % 10 else "de") for i in range(200)],
        "doc_id long, lang string",
    )
    a = proportional_holdout(df, "lang", 50, key="doc_id").collect()
    b = proportional_holdout(df, "lang", 50, key="doc_id").collect()
    assert len(a) == 50
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    langs = [r["lang"] for r in a]
    # 180 en / 20 de → quotas 45 / 5
    assert langs.count("en") == 45 and langs.count("de") == 5


def test_proportional_holdout_oversized_total_degrades_to_all(spark):
    from sap_data_pipeline_spark.operators.sampling import proportional_holdout

    df = spark.createDataFrame(
        [(i, "en") for i in range(10)], "doc_id long, lang string"
    )
    got = proportional_holdout(df, "lang", 10, key="doc_id").collect()
    assert len(got) == 10


def test_curriculum_interleave_bijection_and_order(spark):
    """The arithmetic global position is a bijection onto 1..N; rank-1
    docs of every source precede any rank-2 doc; sources that run dry
    drop out of later rounds (no gaps)."""
    from sap_data_pipeline_spark.operators.sampling import (
        curriculum_interleave,
    )

    rows = [
        # source a: 3 docs, b: 2, c: 1 — unequal so rounds shrink
        (1, "a", 90), (2, "a", 80), (3, "a", 70),
        (4, "b", 95), (5, "b", 60),
        (6, "c", 85),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    got = {r["doc_id"]: r for r in curriculum_interleave(df, "q").collect()}
    pos = sorted(r["global_pos"] for r in got.values())
    assert pos == [1, 2, 3, 4, 5, 6]          # bijection, no gaps
    # round 1 = best of a, b, c in source order; round 2 = a, b;
    # round 3 = a alone
    assert got[1]["global_pos"] == 1   # a rank1
    assert got[4]["global_pos"] == 2   # b rank1
    assert got[6]["global_pos"] == 3   # c rank1
    assert got[2]["global_pos"] == 4   # a rank2
    assert got[5]["global_pos"] == 5   # b rank2
    assert got[3]["global_pos"] == 6   # a rank3 (b, c dropped out)


def test_curriculum_interleave_tie_break_and_plan(spark):
    """Score ties break by id ascending; the only exchange is the
    per-source rank window's — no global range sort."""
    from sap_data_pipeline_spark.operators.sampling import (
        curriculum_interleave,
    )

    df = spark.createDataFrame(
        [(10, "a", 50), (11, "a", 50), (12, "b", 50)],
        "doc_id long, source string, q long",
    )
    out = curriculum_interleave(df, "q")
    got = {r["doc_id"]: r["rank_in_source"] for r in out.collect()}
    assert got == {10: 1, 11: 2, 12: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert "Exchange rangepartitioning" not in plan, plan
    assert count_hash_exchanges(plan) == 1, plan


def test_curriculum_interleave_null_source_contract(spark):
    """A NULL source has no round-robin slot: the operator fails with
    its contract error, not an unrelated sort/map-key error."""
    import pytest

    from sap_data_pipeline_spark.operators.sampling import (
        curriculum_interleave,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 7)],
        "doc_id long, source string, q long",
    )
    with pytest.raises(ValueError, match="must be non-null"):
        curriculum_interleave(df, "q")
