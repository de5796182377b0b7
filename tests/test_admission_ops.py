"""Tests for the r10 admission/curation additions: leakage-safe split,
host quality blocklist, link-graph extraction, cross-snapshot admission
dedup.  All hand-computed fixtures plus plan-shape pins for the scale
claims (zero-shuffle split, broadcast anti-join blocklist)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ---------------------------------------------------------------------------
# dedup_safe_split
# ---------------------------------------------------------------------------

def test_dedup_safe_split_duplicates_never_straddle(spark):
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split

    # 40 texts × 3 exact copies each (ids far apart), plus whitespace/case
    # variants that normalize equal — every group must land in ONE split.
    rows = []
    for i in range(40):
        rows.append((i, f"Document body number {i} with words"))
        rows.append((1000 + i, f"document   body number {i} with words"))
        rows.append((2000 + i, f"DOCUMENT BODY NUMBER {i} WITH WORDS"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_safe_split(df)
    straddlers = (
        out.groupBy("fingerprint")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # groups really are size 3 (normalization collapsed the variants)
    sizes = dict(
        out.groupBy("fingerprint").count().groupBy("count").count().collect()
    )
    assert sizes == {3: 40}


def test_dedup_safe_split_matches_hash_split_on_fingerprint(spark):
    """The banding contract is hash_split's, applied to the fingerprint."""
    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.sampling import (
        dedup_safe_split,
        hash_split,
    )

    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(100)], ["doc_id", "text"]
    )
    got = dedup_safe_split(df, seed=31).select("doc_id", "split")
    want = hash_split(
        df.withColumn("fingerprint", X.md5_fingerprint("text")),
        "fingerprint",
        seed=31,
    ).select("doc_id", "split")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dedup_safe_split_plan_has_no_exchange(spark):
    """Group-atomicity without a group-by: the whole split is map-side."""
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = _plan(dedup_safe_split(df))
    assert "Exchange" not in plan, plan


def test_dedup_safe_split_custom_weights(spark):
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], ["doc_id", "text"]
    )
    out = dedup_safe_split(df, weights={"train": 90, "test": 10})
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "test"}
    n_test = out.filter(F.col("split") == "test").count()
    assert 20 <= n_test <= 90  # ~10% of 500, generous hash-variance band


# ---------------------------------------------------------------------------
# host_quality_gate / blocklist_filter
# ---------------------------------------------------------------------------

def _scored(spark):
    # host A: 6 docs, 4 low  -> blocked (4*100 >= 6*50)
    # host B: 6 docs, 2 low  -> kept   (2*100 <  6*50)
    # host C: 3 docs, 3 low  -> kept   (below min_docs=5, never blocks)
    # host D: 6 docs, 3 low  -> blocked (exactly at the 50% boundary)
    rows = (
        [("A", True)] * 4 + [("A", False)] * 2
        + [("B", True)] * 2 + [("B", False)] * 4
        + [("C", True)] * 3
        + [("D", True)] * 3 + [("D", False)] * 3
    )
    return spark.createDataFrame(rows, ["host", "is_low"])


def test_host_quality_gate_hand_computed(spark):
    from sap_data_pipeline_spark.operators.quality import host_quality_gate

    out = host_quality_gate(_scored(spark), min_docs=5, max_low_pct=50)
    verdict = {r["host"]: (r["n_docs"], r["n_low"], r["blocked"])
               for r in out.collect()}
    assert verdict == {
        "A": (6, 4, True),
        "B": (6, 2, False),
        "C": (3, 3, False),
        "D": (6, 3, True),
    }


def test_blocklist_filter_drops_exactly_blocked_hosts(spark):
    from sap_data_pipeline_spark.operators.quality import (
        blocklist_filter,
        host_quality_gate,
    )

    scored = _scored(spark)
    verdict = host_quality_gate(scored, min_docs=5, max_low_pct=50)
    docs = spark.createDataFrame(
        [(i, h) for i, h in enumerate("AABBCCDD")], ["doc_id", "host"]
    )
    kept = blocklist_filter(docs, verdict)
    assert {r["host"] for r in kept.select("host").distinct().collect()} == {
        "B", "C",
    }
    assert kept.count() == 4


def test_blocklist_filter_is_broadcast_anti_join(spark):
    from sap_data_pipeline_spark.operators.quality import (
        blocklist_filter,
        host_quality_gate,
    )

    verdict = host_quality_gate(_scored(spark), min_docs=5, max_low_pct=50)
    docs = spark.createDataFrame([(1, "A")], ["doc_id", "host"])
    plan = _plan(blocklist_filter(docs, verdict))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# ---------------------------------------------------------------------------
# link_host_graph
# ---------------------------------------------------------------------------

def test_link_host_graph_hand_computed(spark):
    from sap_data_pipeline_spark.operators.corpus import link_host_graph

    df = spark.createDataFrame(
        [
            # two absolute links (one repeated host), one relative (ignored)
            ("a.com",
             '<a href="https://x.com/p">1</a><a href="/nav">r</a>'
             '<a href="http://x.com/q">2</a>'),
            # same edge again from a second doc + a different dst
            ("a.com", '<a href="https://x.com/z">3</a>'
                      '<a href="https://y.com/">4</a>'),
            # doc with no absolute links contributes nothing
            ("b.com", '<a href="/only/relative">r</a> plain text'),
        ],
        ["src_host", "html"],
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in link_host_graph(df).collect()
    }
    assert got == {("a.com", "x.com"): 3, ("a.com", "y.com"): 1}


def test_link_host_graph_strips_port_free_authority_up_to_slash(spark):
    from sap_data_pipeline_spark.operators.corpus import link_host_graph

    df = spark.createDataFrame(
        [("s", '<a href="https://h.example.com:8443/deep/path?q=1">x</a>')],
        ["src_host", "html"],
    )
    [row] = link_host_graph(df).collect()
    # authority (incl. port) up to the first '/', query never leaks in
    assert row["dst_host"] == "h.example.com:8443"


def test_link_host_graph_sloppy_real_web_html(spark):
    """ADVICE r10: real-web HTML carries uppercase HREF, whitespace
    around `=`, single-quoted / unquoted values, and protocol-relative
    links — each carries host signal and must extract; mid-word
    `data-href` noise and relative links must not."""
    from sap_data_pipeline_spark.operators.corpus import link_host_graph

    df = spark.createDataFrame(
        [
            ("s",
             '<a HREF="https://up.com/p">1</a>'
             "<a href = 'https://sq.com/q'>2</a>"
             '<a href=//proto.com/r>3</a>'
             '<a href=HTTP://cased.com/s>4</a>'
             '<a href="/relative">r</a>'),
        ],
        ["src_host", "html"],
    )
    got = {r["dst_host"] for r in link_host_graph(df).collect()}
    assert got == {"up.com", "sq.com", "proto.com", "cased.com"}


def test_anchor_text_terms_sloppy_real_web_html(spark):
    """The anchor-text twin of the above: quoted-but-messy anchors
    (uppercase HREF, spaced `=`, single quotes, protocol-relative)
    extract both host and text."""
    from sap_data_pipeline_spark.operators.corpus import anchor_text_terms

    df = spark.createDataFrame(
        [("<a HREF = '//m.com/x' class='z'>mirror page</a>"
          '<a href="https://n.com/y">plain link</a>',)],
        ["html"],
    )
    got = {(r["dst_host"], r["term"]) for r in
           anchor_text_terms(df, k=5).collect()}
    assert ("m.com", "mirror") in got
    assert ("m.com", "page") in got
    assert ("n.com", "plain") in got


# ---------------------------------------------------------------------------
# snapshot_admission
# ---------------------------------------------------------------------------

def test_snapshot_admission_hand_computed(spark):
    from sap_data_pipeline_spark.operators.dedup import snapshot_admission

    ref = spark.createDataFrame(
        [(1, "old page one"), (2, "old page two")], ["doc_id", "text"]
    )
    cur = spark.createDataFrame(
        [
            (10, "old page one"),       # re-crawl -> rejected
            (11, "Old  Page   ONE"),    # normalizes to re-crawl -> rejected
            (12, "fresh page"),         # new -> admitted
            (13, "fresh page"),         # within-batch dup -> folded into 12
            (14, "old page two rev2"),  # edit -> admitted
        ],
        ["doc_id", "text"],
    )
    out = snapshot_admission(ref, cur)
    got = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert got == {12: 2, 14: 1}


def test_snapshot_admission_empty_reference_admits_all_once(spark):
    from sap_data_pipeline_spark.operators.dedup import snapshot_admission

    ref = spark.createDataFrame([], "doc_id long, text string")
    cur = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "text"]
    )
    out = snapshot_admission(ref, cur)
    got = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert got == {1: 2, 3: 1}


# ---------------------------------------------------------------------------
# Catalog-query plan pins (shuffle budget of the new admission passes)
# ---------------------------------------------------------------------------

def test_html_link_graph_one_exchange_partial_agg(spark):
    """Edge aggregation: partial agg collapses repeated edges map-side,
    ONE hash exchange carries the edge set (never the corpus)."""
    import sap_data_pipeline_spark.plans.catalog_ext  # noqa: F401
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    plan = _plan(QUERIES["html_link_graph"](spark, "/root/testdata/sf0.001"))
    # exclude the documents scan's doc_id spread-key rebalance
    # (REPARTITION_BY_NUM origin, r13) — as before, only the
    # framework-inserted edge-set exchange is pinned
    framework_ex = [
        ln for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(framework_ex) == 1, plan
    assert "partial_count" in plan, plan


def test_snapshot_admission_two_fingerprint_exchanges_anti_join(spark):
    """Exactly two fingerprint-keyed exchanges — the batch side's
    keep-first aggregate and the reference side's DISTINCT — and both
    carry 32-hex fingerprints, never document text; the anti-join
    itself is broadcast at this size."""
    import sap_data_pipeline_spark.plans.catalog_ext  # noqa: F401
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    plan = _plan(
        QUERIES["snapshot_dedup_admission"](spark, "/root/testdata/sf0.001")
    )
    framework_ex = [
        ln for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(framework_ex) == 2, plan
    assert "LeftAnti" in plan, plan


# ---------------------------------------------------------------------------
# admit_crawl_batch (the ingest-side E2E composition)
# ---------------------------------------------------------------------------

def test_admit_crawl_batch_end_to_end(spark, tmp_path):
    """Re-crawls rejected, within-batch copies folded, spammy host
    blocked wholesale, survivors split leakage-safely, audit accounts
    for every loss."""
    from sap_data_pipeline_spark.etl import admit_crawl_batch

    good = ("a perfectly reasonable document with the usual amount of "
            "words and the standard sprinkling of stopwords in it to "
            "pass the quality score gate comfortably every single time")
    ref = spark.createDataFrame(
        [(1, good + " ref one", "h1"), (2, good + " ref two", "h2")],
        ["doc_id", "text", "host"],
    )
    spam = "$$$ !!! 0123456789 %%% ### @@@ ^^^ &&& *** ((( )))"
    batch_rows = (
        # re-crawl of ref doc 1 -> rejected by snapshot dedup
        [(10, good + " ref one", "h1")]
        # fresh doc + its exact copy -> folded to keep-first (11)
        + [(11, good + " fresh alpha", "h3"), (12, good + " fresh alpha", "h3")]
        # fresh unique docs on a clean host
        + [(13 + i, good + f" fresh beta {i}", "h3") for i in range(5)]
        # a spam host: 6 docs, all low quality -> host blocked
        + [(30 + i, spam + f" {i}", "spamhost") for i in range(6)]
    )
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text", "host"])
    out = str(tmp_path / "admitted")
    audit = admit_crawl_batch(ref, batch, out, min_quality=0.6)

    assert audit["batch_rows"] == 14
    # 13 distinct fingerprints in batch; one (re-crawl) is in ref
    assert audit["admitted_after_dedup"] == 12
    assert audit["blocked_hosts"] == 1
    # 11 admitted minus the 6 spam-host docs... but the folded copy (12)
    # was dropped by keep-first too: kept = 11, 13..17 -> 6 rows
    assert audit["rows_final"] == 6

    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == {11, 13, 14, 15, 16, 17}
    assert {"split", "fingerprint"} <= set(got.columns)


def test_admit_crawl_batch_clean_batch_admits_everything(spark, tmp_path):
    from sap_data_pipeline_spark.etl import admit_crawl_batch

    good = ("a perfectly reasonable document with the usual amount of "
            "words and the standard sprinkling of stopwords in it to "
            "pass the quality score gate comfortably every single time")
    ref = spark.createDataFrame([], "doc_id long, text string, host string")
    batch = spark.createDataFrame(
        [(i, good + f" v{i}", f"h{i % 3}") for i in range(9)],
        ["doc_id", "text", "host"],
    )
    audit = admit_crawl_batch(ref, batch, str(tmp_path / "out"))
    assert audit["rows_final"] == 9 and audit["blocked_hosts"] == 0


def test_admit_crawl_batch_robots_and_line_filters(spark, tmp_path):
    """r12 stages: the robots re-check drops disallowed URLs before
    dedup, and line_filters rewrites documents in place (C4 shape rules
    + within-doc dedup) with the removed-line audit."""
    from sap_data_pipeline_spark.etl import admit_crawl_batch

    good = ("this is a perfectly reasonable body sentence with plenty "
            "of the usual stopword words in it to pass the gate.")
    # each doc: 2 good lines + 1 repeated nav line (x2) + 1 short line
    body = "\n".join([good, "nav menu", good, "nav menu",
                      good.replace("body", "second")])
    ref = spark.createDataFrame([], "doc_id long, text string, host string, url string")
    batch = spark.createDataFrame(
        [(i, body, f"h{i % 2}", f"https://h{i % 2}/keep/p{i}")
         for i in range(6)]
        + [(10, body, "h0", "https://h0/private/x"),
           (11, body, "h1", "https://h1/private/y")],
        ["doc_id", "text", "host", "url"],
    )
    rules = spark.createDataFrame(
        [("h0", "/private", False), ("h1", "/private", False),
         ("h0", "/keep", True), ("h1", "/keep", True)],
        "host string, path_prefix string, allow boolean",
    )
    audit = admit_crawl_batch(
        ref, batch, str(tmp_path / "out2"),
        robots_rules=rules, line_filters=True, min_quality=0.3,
    )
    assert audit["batch_rows"] == 8
    assert audit["robots_rejected"] == 2
    # all 6 surviving docs share one body -> folded to keep-first
    assert audit["admitted_after_dedup"] == 1
    # the one admitted doc has 5 lines: 'nav menu' (2 words) fails the
    # shape rule twice, and the repeated good line dedups once = 3
    assert audit["lines_removed"] == 3
    assert audit["rows_final"] == 1
    got = spark.read.parquet(str(tmp_path / "out2"))
    [r] = got.collect()
    assert r["text"].count("\n") == 1  # two surviving distinct lines
    assert "nav menu" not in r["text"]


# ---------------------------------------------------------------------------
# anchor_text_terms
# ---------------------------------------------------------------------------

def test_anchor_text_terms_hand_computed(spark):
    from sap_data_pipeline_spark.operators.corpus import anchor_text_terms

    df = spark.createDataFrame(
        [
            (1, '<a href="https://x.com/p" class="z">best site ever</a>'
                '<a href="/rel">skip me entirely</a>'
                '<a href="http://y.com/q">read this</a>'),
            (2, '<a href="https://x.com/other">best page</a>'),
        ],
        ["doc_id", "html"],
    )
    got = {
        (r["dst_host"], r["term"]): (r["n"], r["rank"])
        for r in anchor_text_terms(df, k=2).collect()
    }
    # 'best' counted across both docs; tie at n=1 broken by term ASC;
    # the relative link's text never indexes
    assert got == {
        ("x.com", "best"): (2, 1),
        ("x.com", "ever"): (1, 2),
        ("y.com", "read"): (1, 1),
        ("y.com", "this"): (1, 2),
    }


def test_anchor_text_terms_group_alignment(spark):
    """Host and text come from TWO regexp_extract_all passes — this
    pins their positional alignment when anchors interleave."""
    from sap_data_pipeline_spark.operators.corpus import anchor_text_terms

    df = spark.createDataFrame(
        [(1, '<a href="https://a.com/1">alpha</a>'
             '<a href="https://b.com/2">beta</a>'
             '<a href="https://a.com/3">gamma</a>')],
        ["doc_id", "html"],
    )
    got = {(r["dst_host"], r["term"]) for r in
           anchor_text_terms(df, k=5).collect()}
    assert got == {("a.com", "alpha"), ("a.com", "gamma"),
                   ("b.com", "beta")}


# ---------------------------------------------------------------------------
# canonicalize_url / url_canonical_dedup
# ---------------------------------------------------------------------------

def test_canonicalize_url_hand_computed(spark):
    from sap_data_pipeline_spark.functions.text import canonicalize_url

    cases = {
        "https://WWW.Example.COM/Path/?utm_source=x&id=3&utm_campaign=y#f":
            "https://www.example.com/Path/?id=3",
        "http://example.com:80/a?gclid=zz": "http://example.com/a",
        "https://example.com:443/": "https://example.com",
        "https://example.com/path/": "https://example.com/path",
        "http://h.com/p?utm_only=1": "http://h.com/p",
        "https://h.com/p?a=1&fbclid=q&b=2": "https://h.com/p?a=1&b=2",
        "HTTPS://H.COM/Upper/Case": "https://h.com/Upper/Case",
        "https://h.com:8080/x/": "https://h.com:8080/x",  # non-default port kept
        # ADVICE r10: the tracking-param pattern must anchor on a [?&]
        # separator — a legitimate param that merely CONTAINS "utm_"
        # mid-token is not a tracking param and must survive intact
        # (the unanchored form canonicalized `?myutm_a=1` to `?my`):
        "https://h.com/p?myutm_a=1": "https://h.com/p?myutm_a=1",
        # ...and must be case-insensitive, since the authority is
        # lowercased but param names were matched lowercase-only:
        "https://h.com/p?UTM_SOURCE=x": "https://h.com/p",
        "https://h.com/p?a=1&FbClId=q": "https://h.com/p?a=1",
        # runs of consecutive tracking params collapse in one match
        # (a single-param pattern eats the `&` the next one anchors on):
        "https://h.com/p?utm_a=1&utm_b=2&c=3": "https://h.com/p?c=3",
        "https://h.com/p?a=1&utm_x=2&utm_y=3&b=4":
            "https://h.com/p?a=1&b=4",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_url("url").alias("c")).collect()}
    assert got == cases


def test_canonicalize_url_is_idempotent(spark):
    from sap_data_pipeline_spark.functions.text import canonicalize_url

    urls = [
        "https://WWW.Example.COM/Path/?utm_source=x&id=3#f",
        "http://example.com:80/a?gclid=zz",
        "https://h.com/p?a=1&fbclid=q&b=2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(canonicalize_url("c").alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_admit_crawl_batch_readmission_is_empty(spark, tmp_path):
    """Content-level exactly-once: once a batch is admitted into the
    reference corpus, replaying the SAME batch admits nothing — the
    property that makes crash-replayed ingest safe."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import admit_crawl_batch

    good = ("a perfectly reasonable document with the usual amount of "
            "words and the standard sprinkling of stopwords in it to "
            "pass the quality score gate comfortably every single time")
    ref = spark.createDataFrame(
        [(1, good + " seed", "h0")], ["doc_id", "text", "host"]
    )
    batch = spark.createDataFrame(
        [(10 + i, good + f" page {i}", f"h{i % 2}") for i in range(6)],
        ["doc_id", "text", "host"],
    )
    first = admit_crawl_batch(ref, batch, str(tmp_path / "v1"))
    assert first["rows_final"] == 6

    admitted = spark.read.parquet(str(tmp_path / "v1")).select(
        "doc_id", "text", "host"
    )
    ref2 = ref.unionByName(admitted)
    second = admit_crawl_batch(ref2, batch, str(tmp_path / "v2"))
    assert second["admitted_after_dedup"] == 0
    assert second["rows_final"] == 0
    # and a half-new batch admits exactly the new half
    batch2 = batch.unionByName(spark.createDataFrame(
        [(50 + i, good + f" fresh {i}", "h9") for i in range(3)],
        ["doc_id", "text", "host"],
    ))
    third = admit_crawl_batch(ref2, batch2, str(tmp_path / "v3"))
    assert third["admitted_after_dedup"] == 3
    got = spark.read.parquet(str(tmp_path / "v3"))
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {50, 51, 52}


def test_admission_feeds_pretraining_build(spark, tmp_path):
    """The two E2E pipelines compose: admit_crawl_batch's output is a
    valid build_training_corpus input, and the final packed corpus
    contains only admitted, non-blocked, deduplicated documents."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.etl import (
        admit_crawl_batch,
        build_training_corpus,
    )

    # docs share only a short stopword-rich prefix (for the quality
    # gate) over 40 doc-unique letter tokens — distinct enough that the
    # downstream NEAR-dedup must keep all of them
    def text_for(i):
        prefix = "the and of to in is that for with was "
        return prefix + " ".join(
            f"zz{chr(97 + i)}{chr(97 + j)}word" for j in range(40)
        )

    ref = spark.createDataFrame(
        [(1, text_for(20), "h0")], ["doc_id", "text", "host"]
    )
    batch = spark.createDataFrame(
        [(10 + i, text_for(i), f"h{i % 2}") for i in range(8)]
        + [(30, text_for(0), "h0")],   # within-batch dup of 10
        ["doc_id", "text", "host"],
    )
    admit_crawl_batch(ref, batch, str(tmp_path / "admitted"))
    admitted = spark.read.parquet(str(tmp_path / "admitted"))
    assert admitted.count() == 8  # dup folded

    audit = build_training_corpus(
        admitted.select("doc_id", "text"),
        str(tmp_path / "corpus"),
        pack_budget=64,
        n_shards=2,
    )
    assert audit["rows_final"] == 8
    packed = spark.read.parquet(str(tmp_path / "corpus"))
    assert packed.count() == 8
    assert {r["doc_id"] for r in packed.select("doc_id").collect()} == set(
        range(10, 18)
    )
