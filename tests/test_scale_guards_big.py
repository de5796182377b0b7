"""Enforced scaling-exponent guards for the heavy operators (r6 verdict #5).

SCALE.md records one-off 20× measurements for the round-5/6 heavy
operators; this file turns the claim into a guard that RUNS: each
operator executes at two generated scales (4× apart) in the same
session and must stay off the quadratic cliff —

* wall-clock ratio t(4×)/t(1×) must stay under 10 (quadratic work is
  16×; the bound allows exponent ≈1.66).  The small scale runs FIRST,
  so JIT/codegen warmup inflates t(1×) and compresses the measured
  ratio — bias is in the safe direction: a genuinely quadratic
  operator still blows the bound, a linear one can only look better.
* work-VOLUME ratios (emitted pairs, per-cell occupancy, iteration
  rounds) are asserted deterministically where the operator exposes
  them — these carry the signal when wall time is floor-dominated.

Fixture shape keeps the TRUE near-dup structure linear in N (templates
of 10 perturbed copies, vocabulary growing with N so bucket collision
DENSITY stays constant as N grows — the honest 100 TB scaling axis;
the density-blowup axis is covered separately by test_scale_guards).
"""

from __future__ import annotations

import math
import random
import time

import pytest
from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators import dedup as D
from sap_data_pipeline_spark.operators import graph as G
from sap_data_pipeline_spark.operators import similarity as S

N_SMALL = 2000
SCALE = 4  # big = SCALE × small on every axis
WALL_RATIO_MAX = 10.0  # 4× data: linear → ~4, quadratic → 16
PAIR_RATIO_MAX = 6.0  # true pairs linear by construction (→ ~4)


def _make_corpus(spark, tmp_path_factory, n: int, tag: str) -> str:
    """n docs = n/10 templates × 10 perturbed copies.  Each template
    draws 40 words from its own slice of a vocabulary sized n/5, so
    within-template docs near-dup while cross-template bucket
    collisions stay rare — density constant in n, truth linear."""
    rng = random.Random(1729 + n)
    vocab_n = n // 5
    rows = []
    for i in range(n):
        t = i // 10
        words = [f"w{(t * 17 + j * 3) % vocab_n}" for j in range(40)]
        for _ in range(rng.randrange(3)):
            words[rng.randrange(40)] = f"w{rng.randrange(vocab_n)}"
        rows.append((i, " ".join(words)))
    path = str(tmp_path_factory.mktemp(f"corpus_{tag}") / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        8
    ).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def corpus_small(spark, tmp_path_factory):
    return _make_corpus(spark, tmp_path_factory, N_SMALL, "small")


@pytest.fixture(scope="module")
def corpus_big(spark, tmp_path_factory):
    return _make_corpus(spark, tmp_path_factory, N_SMALL * SCALE, "big")


def _timed_count(df_or_thunk) -> tuple[float, int]:
    """Time construction + count.  Accepts a DataFrame or a zero-arg
    thunk returning one: the iterative operators (pagerank, CC) do their
    round work EAGERLY during construction (per-round localCheckpoint),
    so timing only ``.count()`` over an already-materialized result
    measures scheduler noise, not the operator — a warm suite once
    produced t(1×)=57 ms and a spurious 17× ratio.  Passing a thunk puts
    construction inside the timed region."""
    t0 = time.time()
    df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
    n = df.count()
    return time.time() - t0, n


def test_near_dup_clusters_wall_and_pair_volume(spark, corpus_small, corpus_big):
    """End-to-end sketch→LSH→verify→CC→cluster stats at 1× and 4×:
    wall exponent sub-quadratic AND the verified pair graph grows
    linearly (the quantity whose quadratic blowup would sink 100 TB)."""
    small = spark.read.parquet(corpus_small)
    big = spark.read.parquet(corpus_big)

    t1, n1 = _timed_count(lambda: D.near_dup_clusters(small))
    t2, n2 = _timed_count(lambda: D.near_dup_clusters(big))
    assert n1 == N_SMALL and n2 == N_SMALL * SCALE  # one row per doc
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)

    p1 = D.minhash_dedup_pairs(small).count()
    p2 = D.minhash_dedup_pairs(big).count()
    assert p1 > 0  # fixture really contains near-dups
    assert p2 <= PAIR_RATIO_MAX * p1, (p1, p2)


def test_simhash64_wall_and_pair_volume(spark, corpus_small, corpus_big):
    small = spark.read.parquet(corpus_small)
    big = spark.read.parquet(corpus_big)

    df1 = D.simhash_near_dup_pairs(small)  # bits=64 production default
    df2 = D.simhash_near_dup_pairs(big)
    t1, p1 = _timed_count(df1)
    t2, p2 = _timed_count(df2)
    assert p1 > 0
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)
    assert p2 <= PAIR_RATIO_MAX * p1, (p1, p2)


def _edges(spark, n_nodes: int):
    """Deterministic out-degree-8 multigraph, built JVM-side (no
    driver row list): dst = (src·2654435761 + j·40503) mod n."""
    return (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("j"),
        )
        .select(
            "src",
            ((F.col("src") * 2654435761 + F.col("j") * 40503) % n_nodes).alias(
                "dst"
            ),
        )
    )


def test_pagerank_wall_time_linearish(spark):
    """3 fixed power iterations over 8·N edges at N=30k and N=120k —
    per-iteration cost is one rank shuffle + one dst aggregate, so the
    4× graph must run well under the quadratic 16×."""
    n1 = 30_000
    t1, r1 = _timed_count(lambda: G.pagerank(_edges(spark, n1), iterations=3))
    t2, r2 = _timed_count(
        lambda: G.pagerank(_edges(spark, n1 * SCALE), iterations=3)
    )
    assert r1 == n1 and r2 == n1 * SCALE
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)


def _embeddings(spark, n: int, dim: int):
    """Deterministic pseudo-uniform vectors in [-1,1]^dim, JVM-side:
    component h = hash-folded (id, h) — no cluster structure, so
    KMeans cells partition space roughly evenly at any n."""
    comps = F.array(*[
        (F.pmod(F.xxhash64(F.col("id"), F.lit(h)), F.lit(2001)) / 1000.0 - 1.0)
        .cast("float")
        for h in range(dim)
    ])
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comps.alias("embedding")
    )


def test_ivfpq_cells_stay_bounded_and_wall_subquadratic(spark):
    """The IVF scale contract (SCALE.md): cell count grows WITH the
    corpus so |cell| stays executor-sized.  At 4× vectors with 4×
    cells: (a) p90 cell occupancy must stay within 2× — the per-probe
    candidate bound — and (b) end-to-end ivfpq_topk (train on a fixed-
    size sample + encode + ADC + rerank) stays sub-quadratic."""
    dim, n1, cells1 = 16, 4000, 16
    n2, cells2 = n1 * SCALE, cells1 * SCALE
    queries = _embeddings(spark, 32, dim).withColumnRenamed(
        "vec_id", "query_id"
    )

    def p90_occupancy(n, n_cells):
        corpus = _embeddings(spark, n, dim)
        _, cents = S.ivf_train_cells(
            corpus, n_cells=n_cells, sample_fraction=min(1.0, 4000 / n)
        )
        sizes = (
            S._assign_cells(corpus, cents, vec_col="embedding", nprobe=1)
            .groupBy("ivf_cell")
            .count()
            .select(F.percentile_approx("count", 0.9).alias("p90"))
            .collect()[0]["p90"]
        )
        return sizes

    occ1 = p90_occupancy(n1, cells1)
    occ2 = p90_occupancy(n2, cells2)
    assert occ2 <= 2 * occ1, (occ1, occ2)

    def run(n, n_cells):
        corpus = _embeddings(spark, n, dim)
        return _timed_count(
            lambda: S.ivfpq_topk(
                corpus, queries, k=5, dim=dim, n_cells=n_cells,
                sample_fraction=min(1.0, 4000 / n),
            )
        )

    t1, k1 = run(n1, cells1)
    t2, k2 = run(n2, cells2)
    assert k1 == k2 == 32 * 5
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)


def test_tree_root_depth_round_budget_logarithmic(spark):
    """A depth-4096 chain must converge within ceil(log2 4096)+5 = 17
    pointer-doubling rounds (plain per-level recursion would need 4096
    and trip the max_iter raise) — the doc_tree_root_depth iteration
    bound stated as an enforced budget, 8× deeper than the 512-hop CC
    pin."""
    depth = 4096
    edges = spark.range(1, depth + 1).select(
        F.col("id").alias("child"), (F.col("id") - 1).alias("parent")
    )
    budget = math.ceil(math.log2(depth)) + 5  # 17
    out = G.tree_root_depth(edges, max_iter=budget)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("depth").alias("maxd"),
        F.count_distinct("root").alias("roots"),
    ).collect()[0]
    assert agg["n"] == depth + 1
    assert agg["maxd"] == depth
    assert agg["roots"] == 1


def test_triangle_wedge_bound_degree_orientation(spark):
    """The √|E| wedge-bound claim, enforced: on a hub graph whose hub
    sits at a MIDDLE id (the id orientation's worst case — half its
    edges orient in, half out, so the hub contributes ~deg²/4 wedges),
    degree orientation points every hub edge INTO the hub (highest
    degree), killing those wedges: row count must drop ≥10× and max
    out-degree must respect the √(2|E|) cap; and both orientations
    count identical triangles."""
    from sap_data_pipeline_spark.operators.graph import (
        _orient,
        triangle_counts,
    )

    n = 2000
    hub = n // 2  # middle id: ~half the leaf ids below, half above
    leaves = [i for i in range(n + 1) if i != hub]
    spokes = [(hub, i) for i in leaves]
    ring = [
        (leaves[i], leaves[(i + 1) % len(leaves)])
        for i in range(len(leaves))
    ]
    edges = spark.createDataFrame(spokes + ring, "src long, dst long")

    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    und = fwd.unionAll(rev).filter(F.col("a") != F.col("b")).distinct()
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )

    def wedges(orient):
        ori = _orient(und, deg, orient)
        return (
            ori.alias("e1")
            .join(ori.alias("e2"), F.col("e1.b") == F.col("e2.a"))
            .count()
        )

    w_id, w_deg = wedges("id"), wedges("degree")
    assert w_id >= (n // 2) ** 2  # the mid-id hub really blows up: in×out
    assert w_deg * 10 <= w_id, (w_id, w_deg)

    ori_deg = _orient(und, deg, "degree")
    max_out = (
        ori_deg.groupBy("a").count().agg(F.max("count")).collect()[0][0]
    )
    e_cnt = und.count() // 2
    assert max_out <= int((2 * e_cnt) ** 0.5) + 2, (max_out, e_cnt)

    t_id = triangle_counts(edges, orient="id").agg(
        F.sum("triangles")
    ).collect()[0][0]
    t_deg = triangle_counts(edges, orient="degree").agg(
        F.sum("triangles")
    ).collect()[0][0]
    # one triangle per ring edge (both endpoints share the hub)
    assert t_id == t_deg == 3 * n


def test_label_propagation_wall_linear_fixed_rounds(spark):
    """LPA scale guard (r7 verdict #6): 3 fixed synchronous rounds over
    the out-degree-8 multigraph at N=30k and N=120k — each round is one
    label join + (node, label) count + struct-max winner against the
    ONE persisted edge layout, so per-round cost is linear in |E| and
    the 4× graph must stay far off the quadratic 16×.  Round count is
    fixed by the iterations budget, not data-dependent."""
    n1 = 30_000
    t1, r1 = _timed_count(G.label_propagation(_edges(spark, n1), iterations=3))
    t2, r2 = _timed_count(
        G.label_propagation(_edges(spark, n1 * SCALE), iterations=3)
    )
    assert r1 == n1 and r2 == n1 * SCALE
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)


def test_knn_graph_candidate_volume_bounded(spark):
    """knn_graph scale guard (r7 verdict #6): the candidate space is
    Σ|cell|², so with cells grown WITH the corpus (the IVF contract)
    per-cell occupancy stays flat and candidate volume stays ~linear:
    at 4× vectors with 4× cells the Σ|cell·nprobe-occupancy|² ratio
    must stay under 6 (linear → ~4, fixed-cells quadratic → 16), and
    the end-to-end graph build stays off the quadratic wall."""
    from sap_data_pipeline_spark.operators.dedup import seeded_cell_assign

    dim, n1, cells1 = 16, 4000, 16
    n2, cells2 = n1 * SCALE, cells1 * SCALE

    def cand_volume(n, n_cells):
        occ = (
            seeded_cell_assign(
                _embeddings(spark, n, dim), n_cells=n_cells, nprobe=2
            )
            .groupBy("cell")
            .count()
        )
        return occ.agg(
            F.sum(F.col("count") * F.col("count")).alias("v")
        ).collect()[0]["v"]

    v1, v2 = cand_volume(n1, cells1), cand_volume(n2, cells2)
    assert v2 / v1 < PAIR_RATIO_MAX, (v1, v2)

    t1, k1 = _timed_count(
        S.knn_graph(_embeddings(spark, n1, dim), k=3, n_cells=cells1)
    )
    t2, k2 = _timed_count(
        S.knn_graph(_embeddings(spark, n2, dim), k=3, n_cells=cells2)
    )
    assert k1 == n1 * 3 and k2 == n2 * 3  # every vector gets its top-3
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)


def test_interval_overlap_join_volume_linear_and_cap_at_scale(spark):
    """interval_overlap_join scale guard (r7 verdict #6): with the axis
    growing WITH the row count (constant interval density — the honest
    scaling axis) and bin_size near the typical span, emitted-pair
    volume and wall clock stay ~linear at 4×; and the fan-out cap
    still DROPS a corrupt near-infinite interval inside the big run
    instead of exploding it into billions of bins."""
    from sap_data_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    def frames(n):
        # n activity intervals of span 100 every 50 ticks; n/10
        # windows of span 200 every 500 ticks; one corrupt row with a
        # ~1e12 span rides along and must be dropped by the cap
        left = spark.range(n).select(
            F.col("id").alias("lid"),
            (F.col("id") * 50).alias("ls"),
            (F.col("id") * 50 + 100).alias("le"),
        )
        corrupt = spark.range(1).select(
            F.lit(-1).cast("long").alias("lid"),
            F.lit(0).cast("long").alias("ls"),
            F.lit(1_000_000_000_000).cast("long").alias("le"),
        )
        right = spark.range(n // 10).select(
            F.col("id").alias("rid"),
            (F.col("id") * 500).alias("rs"),
            (F.col("id") * 500 + 200).alias("re"),
        )
        return left.unionAll(corrupt), right

    def run(n):
        ldf, rdf = frames(n)
        out = interval_overlap_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=128,
        )
        t0 = time.time()
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("lid") == -1, 1).otherwise(0)).alias("bad"),
        ).collect()[0]
        return time.time() - t0, agg["n"], agg["bad"]

    n1 = 200_000
    t1, p1, bad1 = run(n1)
    t2, p2, bad2 = run(n1 * SCALE)
    assert bad1 == 0 and bad2 == 0  # cap fired on the corrupt span
    assert p1 > 0 and p2 / p1 < PAIR_RATIO_MAX, (p1, p2)
    assert t2 / t1 < WALL_RATIO_MAX, (t1, t2)


def test_misra_gries_counter_table_bounded_at_scale(spark):
    """misra_gries_batch scale guard (r8 verdict #5): the bounded
    counter table is the whole point of the sketch — at 10× item
    cardinality the per-key counter array must still hold ≤ k entries
    (emit_top set above k so truncation can't mask growth), and the
    Misra-Gries guarantee (est ≥ true − n/k) must still hold for a
    genuinely heavy item, so the frequent item always survives the
    10× tail-noise blowup."""
    from sap_data_pipeline_spark.streaming.stateful import misra_gries_batch

    k = 8
    for u in (500, 5000):
        n = 10 * u
        ev = (
            spark.range(n)
            .select(
                F.lit("click").alias("event_type"),
                F.when(F.col("id") < 3 * u, F.lit("heavy"))
                .otherwise(F.concat(F.lit("u"), (F.col("id") % u).cast("string")))
                .alias("user_id"),
                F.col("id").alias("ts"),
            )
            .repartition(8)
        )
        out = misra_gries_batch(
            ev, key_cols=("event_type",), item_col="user_id", ts_col="ts",
            k=k, emit_top=100,
        ).collect()
        assert 1 <= len(out) <= k, f"counter table grew past k at u={u}"
        heavy = [r for r in out if r["item"] == "heavy"]
        assert heavy, f"heavy hitter evicted at u={u}"
        assert heavy[0]["rank"] == 1
        assert heavy[0]["est_count"] >= 3 * u - n / k  # MG lower bound
        assert heavy[0]["n_seen"] == n


def test_hll_register_frame_fixed_at_scale(spark):
    """events_windowed_distinct_hll scale guard (r8 verdict #5): the
    per-(window, type) state is m = 2^p registers NO MATTER how many
    distinct users flow through — at 10× user cardinality the output
    must still expose n_occ ≤ m occupied registers (v_zero = m − n_occ
    is the direct witness of the register-frame row count after the
    first aggregate), one output row per (day, type), and an estimate
    within HLL error of the exact count."""
    import math
    from types import SimpleNamespace

    from sap_data_pipeline_spark.plans import catalog_ext as CX

    sigma = 1.04 / math.sqrt(CX._HLL_M)
    for u in (400, 4000):
        ev = (
            spark.range(u * 8)
            .select(
                F.timestamp_seconds(
                    F.lit(1_767_225_600) + (F.col("id") % 2) * 86_400
                    + F.col("id") % 3_600
                ).alias("ts"),
                F.when(F.col("id") % 4 < 2, F.lit("click"))
                .otherwise(F.lit("view")).alias("event_type"),
                F.concat(F.lit("u"), (F.col("id") % u).cast("string"))
                .alias("user_id"),
            )
            .repartition(8)
        )
        rows = CX.events_windowed_distinct_hll(
            SimpleNamespace(events=ev)
        ).collect()
        assert len(rows) == 4  # 2 days × 2 types, independent of u
        for r in rows:
            assert 0 <= r["v_zero"] <= CX._HLL_M  # n_occ ≤ m registers
            rel = abs(r["approx_distinct"] - r["exact_distinct"]) / max(
                r["exact_distinct"], 1
            )
            assert rel <= 4 * sigma, (u, dict(r.asDict()))


def test_knn_graph_auto_cells_balanced_and_assignment_single_eval(spark):
    """r10 verdict #5 follow-up: (a) the auto n_cells default balances
    assignment (N·n_cells) against candidate volume (N²·nprobe/n_cells)
    at √(N·nprobe), clamped to [8, 2048]; (b) the assignment is a
    single-evaluation literal Project — the plan must contain NO
    BroadcastNestedLoopJoin (the old crossJoin shape whose inferred
    size()>0 condition re-evaluated the full n_cells-way scoring per
    row) and NO ObjectHashAggregate centroid collect_list subplan."""
    emb = _embeddings(spark, 2000, 16)

    # (a) auto default: results identical to the explicit balanced value
    expect_cells = max(8, min(2048, int((2000 * 2) ** 0.5)))  # 63
    auto = S.knn_graph(emb, k=3)
    explicit = S.knn_graph(emb, k=3, n_cells=expect_cells)
    assert sorted(map(tuple, auto.collect())) == \
        sorted(map(tuple, explicit.collect()))

    # (b) plan shape: literal assignment, no nested-loop join, no
    # centroid aggregate
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
