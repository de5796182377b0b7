"""Round-11 pipeline operators: code-vs-prose routing, recrawl
scheduling, multiplicative-weights domain rebalancing, and the
snapshot diff audit."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# code_signals / is_code_verdict
# ---------------------------------------------------------------------------

def _route(spark, texts):
    from sap_data_pipeline_spark.functions.text import (
        code_signals,
        is_code_verdict,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    s = code_signals(F.col("t"))
    out = df.select("i", *[v.alias(k) for k, v in s.items()]).withColumn(
        "is_code",
        is_code_verdict({k: F.col(k) for k in s}),
    )
    return {r["i"]: r for r in out.collect()}


def test_code_detector_routes_obvious_code_and_prose(spark):
    rows = _route(spark, [
        # 0: python
        "def add(x, y):\n    return x + y\n\nclass Foo:\n"
        "    def run(self):\n        print(self)\n        return 1",
        # 1: C-ish
        "int main() { int x = 0; for (x = 0; x < 10; x++) "
        "{ printf(\"%d\", x); } return 0; }",
        # 2: plain prose
        "The quick brown fox jumps over the lazy dog and then "
        "wanders through the quiet forest looking for supper.",
        # 3: prose with one incidental parenthesis
        "It was a bright day (cold for April), and the clocks were "
        "striking thirteen as he slipped through the glass doors.",
    ])
    assert rows[0]["is_code"] and rows[1]["is_code"]
    assert not rows[2]["is_code"] and not rows[3]["is_code"]


def test_code_detector_signal_arithmetic_hand_computed(spark):
    [r] = _route(spark, ["a = [1];\n    b(2)"]).values()
    assert r["n_chars"] == 17
    assert r["n_lines"] == 2
    # symbols: = [ ] ; ( )  -> 6
    assert r["sym_hits"] == 6
    assert r["kw_hits"] == 0
    assert r["indent_lines"] == 1
    # votes: sym 6*100 >= 17*4 yes; kw 0 no; indent 1*5 >= 2 yes -> code
    assert r["is_code"]


def test_code_detector_keywords_whole_word_only(spark):
    # "definition", "classic", "important" contain keyword substrings
    # but must NOT hit the whole-word pattern
    rows = _route(spark, ["definition classic important interest"])
    [r] = rows.values()
    assert r["kw_hits"] == 0


# ---------------------------------------------------------------------------
# url_change_rate
# ---------------------------------------------------------------------------

def test_url_change_rate_hand_computed(spark):
    from sap_data_pipeline_spark.operators.temporal import url_change_rate

    def ts(day):
        return datetime(2026, 1, day)

    hist = spark.createDataFrame(
        [
            # volatile url: 3 fetches, 2 changes, last on day 5
            (1, "a", ts(1), "h1"),
            (2, "a", ts(3), "h2"),
            (3, "a", ts(5), "h3"),
            # static url: 3 fetches, 0 changes, last on day 9 (global max)
            (4, "b", ts(2), "s"),
            (5, "b", ts(6), "s"),
            (6, "b", ts(9), "s"),
            # single-fetch url: rate 0 via the max(n-1, 1) floor
            (7, "c", ts(4), "x"),
        ],
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    got = {r["url"]: r for r in url_change_rate(
        hist, order_tiebreak="event_id").collect()}
    assert got["a"]["n_fetches"] == 3 and got["a"]["n_changes"] == 2
    assert got["a"]["change_rate"] == 1.0
    assert got["a"]["days_stale"] == 4.0      # day 9 - day 5
    assert got["a"]["priority"] == 4.0
    assert got["b"]["change_rate"] == 0.0 and got["b"]["priority"] == 0.0
    assert got["b"]["days_stale"] == 0.0
    assert got["c"]["n_fetches"] == 1 and got["c"]["change_rate"] == 0.0


def test_url_change_rate_orders_by_ts_not_arrival(spark):
    from sap_data_pipeline_spark.operators.temporal import url_change_rate

    # rows arrive shuffled; the ts order is h1,h1,h2 -> ONE change
    hist = spark.createDataFrame(
        [
            (3, "a", datetime(2026, 1, 5), "h2"),
            (1, "a", datetime(2026, 1, 1), "h1"),
            (2, "a", datetime(2026, 1, 3), "h1"),
        ],
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    [r] = url_change_rate(hist, order_tiebreak="event_id").collect()
    assert r["n_changes"] == 1


# ---------------------------------------------------------------------------
# domain_reweight_mw
# ---------------------------------------------------------------------------

def test_domain_reweight_upweights_high_loss_and_normalizes(spark):
    from sap_data_pipeline_spark.operators.sampling import domain_reweight_mw

    weights = spark.createDataFrame(
        [("web", 0.5), ("code", 0.3), ("books", 0.2)],
        "domain string, weight double",
    )
    losses = spark.createDataFrame(
        [("web", 0.0), ("code", 1.0), ("books", -0.5)],
        "domain string, excess_loss double",
    )
    got = {r["domain"]: r for r in
           domain_reweight_mw(weights, losses, eta=0.5).collect()}
    # raw: web 0.5*1.0=0.5, code 0.3*1.5=0.45, books 0.2*0.75=0.15 -> sum 1.1
    assert got["web"]["new_weight"] == round(0.5 / 1.1, 6)
    assert got["code"]["new_weight"] == round(0.45 / 1.1, 6)
    assert got["books"]["new_weight"] == round(0.15 / 1.1, 6)
    assert abs(sum(r["new_weight"] for r in got.values()) - 1.0) < 1e-5
    # direction: high-loss domain gained share, negative-loss lost it
    assert got["code"]["new_weight"] > 0.3
    assert got["books"]["new_weight"] < 0.2


def test_domain_reweight_floor_prevents_domain_zeroing(spark):
    from sap_data_pipeline_spark.operators.sampling import domain_reweight_mw

    weights = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], "domain string, weight double")
    losses = spark.createDataFrame(
        [("a", -10.0), ("b", 0.0)], "domain string, excess_loss double")
    got = {r["domain"]: r for r in
           domain_reweight_mw(weights, losses).collect()}
    # factor floored at 0.05: a keeps 0.5*0.05=0.025 raw, never 0/negative
    assert got["a"]["new_weight"] == round(0.025 / 0.525, 6)


def test_domain_reweight_missing_loss_means_no_update(spark):
    from sap_data_pipeline_spark.operators.sampling import domain_reweight_mw

    weights = spark.createDataFrame(
        [("a", 0.6), ("b", 0.4)], "domain string, weight double")
    losses = spark.createDataFrame(
        [("b", 0.0)], "domain string, excess_loss double")
    got = {r["domain"]: r["new_weight"] for r in
           domain_reweight_mw(weights, losses).collect()}
    assert got == {"a": 0.6, "b": 0.4}  # factors all 1.0 -> unchanged


# ---------------------------------------------------------------------------
# snapshot_diff_stats
# ---------------------------------------------------------------------------

def test_snapshot_diff_all_four_statuses(spark):
    from sap_data_pipeline_spark.operators.relational import (
        snapshot_diff_stats,
    )

    ref = spark.createDataFrame(
        [(1, "f1"), (2, "f2"), (3, "f3")], "doc_id long, fingerprint string")
    cur = spark.createDataFrame(
        [(1, "f1"),           # unchanged
         (2, "f2-edited"),    # modified
         (4, "f4")],          # added; 3 removed
        "doc_id long, fingerprint string")
    got = {r["status"]: r["n_docs"]
           for r in snapshot_diff_stats(ref, cur).collect()}
    assert got == {"unchanged": 1, "modified": 1, "added": 1, "removed": 1}


def test_snapshot_diff_grouped_by_source(spark):
    from sap_data_pipeline_spark.operators.relational import (
        snapshot_diff_stats,
    )

    ref = spark.createDataFrame(
        [(1, "f1", "web"), (2, "f2", "web"), (3, "f3", "books")],
        "doc_id long, fingerprint string, source string")
    cur = spark.createDataFrame(
        [(1, "f1", "web"), (4, "f4", "books")],
        "doc_id long, fingerprint string, source string")
    got = {(r["status"], r["source"]): r["n_docs"] for r in
           snapshot_diff_stats(ref, cur, group_col="source").collect()}
    assert got == {
        ("unchanged", "web"): 1,
        ("removed", "web"): 1,
        ("removed", "books"): 1,
        ("added", "books"): 1,
    }


# ---------------------------------------------------------------------------
# bloom_bitmap / bloom_probe
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr_tracks_theory(spark):
    """Seen elements are ALWAYS flagged (Bloom's contract — nothing
    fetched is ever re-admitted); unseen elements false-positive at
    roughly the (1-e^-kn/m)^k rate: ~15% at n=1000, m=4096, k=4 (the
    deliberately tight fixture), gated loosely at [5%, 30%]."""
    from sap_data_pipeline_spark.operators.corpus import (
        bloom_bitmap,
        bloom_probe,
    )

    seen = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    bm = bloom_bitmap(seen, "url", m_bits=1 << 12, k=4)
    assert len(bm) == (1 << 12) // 64
    cand = spark.range(500, 1500).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    rows = bloom_probe(cand, bm, "url", m_bits=1 << 12, k=4).collect()
    fn = sum(1 for r in rows
             if int(r["url"][1:]) < 1000 and not r["maybe_seen"])
    fp = sum(1 for r in rows
             if int(r["url"][1:]) >= 1000 and r["maybe_seen"])
    assert fn == 0
    assert 25 <= fp <= 150  # ~76 expected of 500


def test_bloom_probe_is_pure_map_projection(spark):
    """The probe plan must contain NO exchange, join, or aggregate —
    the frontier scan streams through unchanged (the whole point of
    the Bloom gate vs the exact anti-join)."""
    from sap_data_pipeline_spark.operators.corpus import (
        bloom_bitmap,
        bloom_probe,
    )

    seen = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    bm = bloom_bitmap(seen, "url", m_bits=1 << 12, k=4)
    probe = bloom_probe(
        spark.range(50).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")),
        bm, "url", m_bits=1 << 12, k=4)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Aggregate" not in plan, plan


def test_bloom_bitmap_size_bounded_by_m_not_n(spark):
    from sap_data_pipeline_spark.operators.corpus import bloom_bitmap

    big = spark.range(20000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    bm = bloom_bitmap(big, "url", m_bits=1 << 10, k=4)
    assert len(bm) == (1 << 10) // 64  # 16 words regardless of n


# ---------------------------------------------------------------------------
# bigram_logprob
# ---------------------------------------------------------------------------

def test_bigram_logprob_hand_computed_two_docs(spark):
    """Corpus 'a b' + 'a b a': bigrams (a,b)x2, (b,a)x1, N=3.
    c1(a)=2, c1(b)=1, c2(b)=2, c2(a)=1.
    p(b|a) = .75*(2/2) + .25*(2/3); p(a|b) = .75*(1/1) + .25*(1/3)."""
    import math

    from sap_data_pipeline_spark.operators.corpus import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b a")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    p_ba = 0.75 * (2 / 2) + 0.25 * (2 / 3)
    p_ab = 0.75 * (1 / 1) + 0.25 * (1 / 3)
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_neg_logprob"] == round(-math.log(p_ba), 6)
    assert got[2]["n_bigrams"] == 2
    expect2 = round((-math.log(p_ba) - math.log(p_ab)) / 2, 6)
    assert got[2]["avg_neg_logprob"] == expect2


def test_bigram_logprob_flags_shuffled_word_order(spark):
    """The gate's reason to exist: a document whose tokens are a
    PERMUTATION of ordinary text (same unigrams) must score worse than
    the ordinary documents when the corpus repeats the ordinary
    transition pattern."""
    from sap_data_pipeline_spark.operators.corpus import bigram_logprob

    normal = "the cat sat on the mat"
    rows = [(i, normal) for i in range(10)] + [(99, "mat the on sat cat the")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["avg_neg_logprob"]
           for r in bigram_logprob(df).collect()}
    assert got[99] > got[0]


def test_bigram_logprob_short_docs_drop_out(spark):
    from sap_data_pipeline_spark.operators.corpus import bigram_logprob

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], ["doc_id", "text"])
    got = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert got == {3}


# ---------------------------------------------------------------------------
# admission_funnel
# ---------------------------------------------------------------------------

def test_admission_funnel_first_failing_rule_wins_and_sums_exact(spark):
    from sap_data_pipeline_spark.operators.quality import admission_funnel

    df = spark.createDataFrame(
        [
            (1, 5, True),    # fails BOTH rules -> first one ('short') wins
            (2, 50, True),   # fails only 'flagged'
            (3, 50, False),  # admitted
            (4, 3, False),   # 'short'
        ],
        "doc_id long, ntok long, flag boolean",
    )
    got = {r["reason"]: r["n_docs"] for r in admission_funnel(
        df, {"short": F.col("ntok") < 20, "flagged": F.col("flag")},
    ).collect()}
    assert got == {"short": 2, "flagged": 1, "admitted": 1}
    assert sum(got.values()) == 4  # exactly one verdict per doc


def test_admission_funnel_grouped(spark):
    from sap_data_pipeline_spark.operators.quality import admission_funnel

    df = spark.createDataFrame(
        [(1, "web", True), (2, "web", False), (3, "books", False)],
        "doc_id long, src string, bad boolean",
    )
    got = {(r["reason"], r["src"]): r["n_docs"] for r in admission_funnel(
        df, {"bad": F.col("bad")}, group_col="src").collect()}
    assert got == {("bad", "web"): 1, ("admitted", "web"): 1,
                   ("admitted", "books"): 1}


# ---------------------------------------------------------------------------
# crawl_schedule
# ---------------------------------------------------------------------------

def test_crawl_schedule_budget_ceiling_and_host_proportionality(spark):
    from sap_data_pipeline_spark.operators.temporal import crawl_schedule

    # host A: 4 volatile urls (every fetch changes); host B: 4 static
    rows = []
    eid = 0
    for h, volatile in (("hA", True), ("hB", False)):
        for p in range(4):
            for f in range(3):
                eid += 1
                rows.append((
                    eid, f"{h}/p{p}", datetime(2026, 1, 1 + f),
                    f"c{f}" if volatile else "same",
                ))
    # a later sentinel fetch (single observation -> zero priority of its
    # own) makes every other URL stale; without it days_stale = 0
    # everywhere and no host has mass
    rows.append((999, "hZ/px", datetime(2026, 1, 9), "z"))
    hist = spark.createDataFrame(
        rows,
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    out = crawl_schedule(hist, 3, order_tiebreak="event_id").collect()
    # hB has zero priority mass -> excluded; all 3 slots go to hA
    assert all(r["host"] == "hA" for r in out)
    assert len(out) == 3
    assert sorted(r["rank_in_host"] for r in out) == [1, 2, 3]


def test_crawl_schedule_quota_is_ceiling_when_host_pool_small(spark):
    from sap_data_pipeline_spark.operators.temporal import crawl_schedule

    # one volatile host with only 2 urls; budget 10 -> schedules 2
    rows = []
    eid = 0
    for p in range(2):
        for f in range(3):
            eid += 1
            rows.append((eid, f"hA/p{p}", datetime(2026, 1, 1 + f), f"c{f}"))
    rows.append((999, "hZ/px", datetime(2026, 1, 9), "z"))
    hist = spark.createDataFrame(
        rows,
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    out = crawl_schedule(hist, 10, order_tiebreak="event_id").collect()
    assert len(out) == 2


def test_crawl_schedule_strips_scheme_before_host(spark):
    # r11 ADVICE: 'http://hA/p0' must budget under host 'hA', not
    # pseudo-host 'http:' — and all three spellings of the SAME host
    # (scheme-ful, protocol-relative, bare) pool into one budget.
    from sap_data_pipeline_spark.operators.temporal import crawl_schedule

    rows = []
    eid = 0
    for p, prefix in enumerate(("http://", "//", "")):
        for f in range(3):
            eid += 1
            rows.append((
                eid, f"{prefix}hA/p{p}", datetime(2026, 1, 1 + f), f"c{f}",
            ))
    rows.append((999, "hZ/px", datetime(2026, 1, 9), "z"))
    hist = spark.createDataFrame(
        rows,
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    out = crawl_schedule(hist, 3, order_tiebreak="event_id").collect()
    assert len(out) == 3
    assert {r["host"] for r in out} == {"hA"}
    # one pooled per-host ranking across the three spellings
    assert sorted(r["rank_in_host"] for r in out) == [1, 2, 3]
