"""Dataset split and sequence-packing operators (training-data pipeline).

Both are pure column-expression / window formulations — no driver
collects, no Python in the hot path — so they run at scan speed over a
100 TB corpus:

* **hash_split** — deterministic train/val/test assignment by hashing a
  stable key.  Content-addressed (re-runs and late-arriving shards land
  in the same split), no ``rand()`` (which would reshuffle membership on
  every retry/recompute — Spark task retries re-evaluate ``rand``).

* **pack_by_offset** — assign documents to fixed-token-budget training
  bins by cumulative offset within a shard.  A true greedy packer is a
  sequential recurrence (bin boundary depends on every prior row), which
  cannot scale beyond one partition; offset packing is the standard
  distributed approximation: partition the corpus into shards, order
  deterministically within shard, and cut bins every ``budget`` tokens
  of cumulative size.  One shuffle (on the shard key), one window pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sap_data_pipeline_spark.functions import text as X


def hash_split(
    df: DataFrame,
    key: str,
    *,
    weights: dict[str, int] | None = None,
    seed: int = 11,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic percentage split: bucket = md5-hash(key) mod 100,
    split label by cumulative weight band.  ``weights`` values must sum
    to 100 (default 80/10/10 train/val/test).

    The hash is the portable md5-based ``functions.text.hash64`` so an
    external system (or the DuckDB oracle) can reproduce the exact
    assignment — splits are a *contract*, not a sample.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100: {weights}")
    bucket = F.pmod(X.hash64(F.col(key).cast("string"), seed=seed), F.lit(100))
    out = df.withColumn(bucket_col, bucket)
    label: Column | None = None
    hi = 0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        hi += w
        cond = F.col(bucket_col) < hi
        label = F.when(cond, name) if label is None else label.when(cond, name)
    label = F.lit(last_name) if label is None else label.otherwise(last_name)
    return out.withColumn(split_col, label)


def stratified_sample_fraction(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    key: str,
    seed: int = 23,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling at target fractions: keep a row
    when hash(key) mod 1e6 falls under fraction·1e6 for its stratum.

    The corpus-mixing primitive (e.g. re-weight sources/languages for a
    training mix).  Stateless map over the scan — NO shuffle, NO window,
    NO rand(); membership is content-addressed, so the same document is
    kept or dropped consistently across re-runs, retries, and overlapping
    corpus snapshots.  Strata missing from ``fractions`` get
    ``default_fraction`` (0 = drop).
    """
    bucket = F.pmod(X.hash64(F.col(key).cast("string"), seed=seed), F.lit(1_000_000))
    thresh: Column = F.lit(int(default_fraction * 1_000_000))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * 1_000_000))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def stratified_sample_n(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    *,
    key: str,
    seed: int = 23,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows within each
    stratum by hash(key) and keep the first n.

    One shuffle on the strata; Spark's WindowGroupLimit pushes the rank
    filter below the sort, so each partition keeps only n candidates
    per stratum instead of sorting whole strata.  Use the fraction
    variant when approximate sizes are acceptable — it's shuffle-free.
    """
    h = X.hash64(F.col(key).cast("string"), seed=seed)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def pack_greedy(
    df: DataFrame,
    size_col: str,
    *,
    budget: int,
    shard_col: str,
    order_by: Sequence[str],
    bin_col: str = "bin",
) -> DataFrame:
    """True sequential greedy packing per shard: walk the shard in
    ``order_by`` order, open a new bin whenever adding the next document
    would exceed ``budget`` (an oversized document gets a bin alone).

    This is a genuine sequential recurrence — bin boundaries depend on
    every prior row — so it cannot be a window expression; it is the
    legitimate ``applyInPandas`` case (SURVEY §2.10 policy: Arrow-batched
    pandas, never row-at-a-time Python).  Parallelism = shard count;
    each shard must fit in executor memory, which the sharding contract
    already guarantees for :func:`pack_by_offset`.  Prefer the offset
    variant when documents may straddle bins — it's pure codegen.
    """
    from pyspark.sql.types import LongType, StructType

    # copy the field list — StructType aliases it, and .add would
    # otherwise append to the input DataFrame's own schema
    out_schema = StructType(list(df.schema.fields)).add(bin_col, LongType())
    order_cols = list(order_by)

    def pack(pdf):
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        bins = []
        cur_bin, cur_fill = 0, 0
        for s in pdf[size_col]:
            if cur_fill > 0 and cur_fill + s > budget:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            cur_fill += s
        pdf[bin_col] = bins
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)


def pack_by_offset(
    df: DataFrame,
    size_col: str,
    *,
    budget: int,
    shard_col: str,
    order_by: Sequence[str],
    offset_col: str = "start_offset",
    bin_col: str = "bin",
) -> DataFrame:
    """Assign each row a (shard-local) byte/token ``start_offset`` and a
    training ``bin`` id = floor(start_offset / budget).

    Every bin holds ~``budget`` units of cumulative size; a document
    whose start offset falls in bin k belongs to bin k (documents may
    straddle a boundary — the sequence writer handles the carry, exactly
    like fixed-size context-window packing).  Deterministic given the
    (shard, order_by) contract.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum(size_col).over(w) - F.col(size_col)
    return df.withColumn(offset_col, offset.cast("long")).withColumn(
        bin_col, F.floor(F.col(offset_col) / F.lit(budget)).cast("long")
    )


def stratum_cap(df: DataFrame, stratum_col: str, n_per_stratum: int, *,
                key: str = "doc_id", seed: int = 31) -> DataFrame:
    """Deterministic per-stratum cap: keep at most ``n_per_stratum`` rows
    per stratum, chosen by content-addressed hash order (md5 of the key,
    ties by key) — the "no language dominates the mix" guard when
    building a weighted corpus.

    Unlike fraction sampling (:func:`stratified_sample_fraction`), the
    cap yields an exact per-stratum COUNT bound; like it, membership is
    a pure function of the key, so retries, re-runs, and late shards
    select identical rows.  One stratum-keyed window shuffle; per-group
    sort covers stratum-sized groups.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"cap{seed}:"), F.col(key).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    *,
    weight_col: str | None = None,
) -> DataFrame:
    """Solve per-stratum sampling fractions that hit a target domain
    mixture by DOWNSAMPLING only — the planning half of corpus mixing
    (reference analog: per-source extract sizing was manual in the SAP
    flows; a training mix needs it computed from the data).

    With ``avail_s`` = total weight per stratum (``weight_col``, e.g. a
    token count; row count when None), the largest total ``T`` whose
    mix is exactly ``target_shares`` without upsampling satisfies
    ``T = min_s avail_s / share_s`` over strata with ``share_s > 0``;
    each stratum then takes ``share_s · T`` (fraction ``share_s · T /
    avail_s``, and exactly one binding stratum has fraction 1).  Strata
    absent from ``target_shares`` get share 0 → dropped.

    Scale shape: ONE aggregation shuffle to stratum grain (map-side
    combined); the minimization and the per-stratum arithmetic run on
    the stratum-count-sized frame (broadcast scalar join, no second
    pass over the data).  Fractions feed
    :func:`stratified_sample_fraction` / :func:`apply_mixture_plan`,
    which are shuffle-free maps.
    """
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    avail = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(w).cast("double").alias("available")
    )
    share: Column = F.lit(0.0)
    for stratum, s in sorted(target_shares.items()):
        share = F.when(F.col("stratum") == stratum, F.lit(float(s))).otherwise(share)
    planned = avail.withColumn("target_share", share)
    t_total = planned.filter(F.col("target_share") > 0).agg(
        F.min(F.col("available") / F.col("target_share")).alias("_t")
    )
    return (
        planned.crossJoin(F.broadcast(t_total))
        .select(
            "stratum",
            "available",
            "target_share",
            F.round(F.col("target_share") * F.col("_t"), 6).alias("take_weight"),
            F.round(
                F.when(
                    F.col("target_share") > 0,
                    F.col("target_share") * F.col("_t") / F.col("available"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("sampling_fraction"),
        )
    )


def temperature_mixture_plan(
    df: DataFrame,
    strata_col: str,
    *,
    alpha: float = 0.5,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-smoothed mixture targets: ``target_s ∝ p_s^alpha``
    where ``p_s`` is the observed share — the multilingual-LM sampling
    rule (exponential smoothing, Devlin et al. 2019 / Conneau et al.
    2020) that keeps head languages from drowning the tail without
    hand-writing target shares.  ``alpha=1`` reproduces the observed
    mix; ``alpha=0`` is uniform; 0.5-0.7 are the published defaults.

    Feeds the same solve as :func:`mixture_plan`: T = min available/
    target, per-stratum take and fraction.  Cross-engine determinism:
    observed shares divide exact integer sums; the smoothed weights are
    quantized to integer micro-units (floor(x·1e6 + 0.5)) BEFORE
    normalizing, so the normalizing sum is an exact integer sum —
    immune to float summation order — and every downstream value
    derives from identical doubles.  ``alpha=0.5`` runs through sqrt
    (correctly rounded per IEEE on every engine); other alphas use
    pow, whose last-ulp behavior is library-specific — fine for
    planning, but pin alpha=0.5 where bit-reproducibility matters.
    One aggregation shuffle to stratum grain; everything after runs on
    the stratum-sized frame.
    """
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    avail = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(w).cast("double").alias("available")
    )
    tot = avail.agg(F.sum("available").alias("_total"))
    p = F.col("available") / F.col("_total")
    smoothed = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(float(alpha)))
    weighted = (
        avail.crossJoin(F.broadcast(tot))
        .withColumn("_p", p)
        .withColumn(
            "_wmicro",
            F.floor(smoothed * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        )
    )
    wsum = weighted.agg(F.sum("_wmicro").alias("_wsum"))
    planned = weighted.crossJoin(F.broadcast(wsum)).withColumn(
        "target_share",
        F.col("_wmicro").cast("double") / F.col("_wsum").cast("double"),
    )
    t_total = planned.filter(F.col("target_share") > 0).agg(
        F.min(F.col("available") / F.col("target_share")).alias("_t")
    )
    return (
        planned.crossJoin(F.broadcast(t_total))
        .select(
            "stratum",
            "available",
            F.round(F.col("_p"), 6).alias("observed_share"),
            F.round(F.col("target_share"), 6).alias("target_share"),
            F.round(
                F.when(
                    F.col("target_share") > 0,
                    F.col("target_share") * F.col("_t") / F.col("available"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("sampling_fraction"),
        )
    )


def apply_mixture_plan(
    df: DataFrame,
    plan: DataFrame,
    strata_col: str,
    *,
    key: str,
    seed: int = 23,
) -> DataFrame:
    """Apply a :func:`mixture_plan` (or any (stratum, sampling_fraction)
    frame) to the corpus: keep a row when its content-addressed hash
    bucket falls under ``fraction · 1e6`` for its stratum — the
    data-dependent-fractions twin of :func:`stratified_sample_fraction`
    (same hash contract, so membership is retry-stable and externally
    reproducible).  The plan is stratum-count-sized → broadcast join,
    no shuffle on the corpus side.
    """
    bucket = F.pmod(X.hash64(F.col(key).cast("string"), seed=seed), F.lit(1_000_000))
    return (
        df.join(
            F.broadcast(plan.select("stratum", "sampling_fraction")),
            F.col(strata_col) == F.col("stratum"),
            "left",
        )
        .filter(bucket < F.coalesce(F.col("sampling_fraction"), F.lit(0.0)) * 1_000_000)
        .drop("stratum", "sampling_fraction")
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    seed: int = 7,
    materialize: bool = True,
) -> DataFrame:
    """DSIR importance weights: score every raw-corpus document by how
    much it resembles a (small) target domain, using hashed n-gram
    bag-of-features models — Data Selection via Importance Resampling
    (Xie et al., NeurIPS 2023).  The standard pretraining-data targeting
    move: ``target`` is the high-quality / in-domain slice (e.g. a
    curated reference corpus), weights rank the raw corpus for selection.

    Features are unigrams + bigrams hashed into ``buckets`` cells (the
    paper's hashed n-gram model).  With add-one smoothing, bucket b has
    target probability ``p_b = (p_cnt+1)/(N_p+B)`` and raw probability
    ``q_b = (q_cnt+1)/(N_q+B)``; a document's log importance weight is
    ``sum over its grams of ln(p_bucket) - ln(q_bucket)``.  Returns
    ``(id, n_grams, dsir_logweight)`` — one row per document with at
    least one token; the weight rounds to 6 decimals so a 1-ulp ``ln``
    divergence cannot move the value across engines.

    Scale shape: the corpus aggregates to (doc, bucket) grain (one
    exchange at sub-gram cardinality — map-side combine collapses
    repeated grams); both LM count frames are re-aggregates of that
    frame (≤ ``buckets`` rows), and the bucket→log-ratio table
    re-enters the per-doc frame as a BROADCAST join.  The (doc, bucket)
    frame has TWO consumers (the raw-LM counts and the scoring join) —
    a lineage diamond Spark recomputes by default — so ``materialize``
    (default) pins it with a lazy ``localCheckpoint``, making the
    corpus tokenize/explode/aggregate pass run ONCE; on a cluster with
    executor loss concerns, persist the frame to reliable storage
    instead (the same trade documented at
    ``dedup.connected_components``).  The target side is assumed
    target-domain-sized (DSIR's premise); everything is
    content-addressed md5 hashing — no rand(), retry-stable,
    externally reproducible.
    """
    b_lit = F.lit(buckets)

    def doc_buckets(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col), X.tokens(text_col).alias("_t"))
        grams = toks.select(
            F.col(id_col),
            F.explode(F.concat(F.col("_t"), X.ngrams_from(F.col("_t"), 2))).alias("g"),
        )
        return (
            grams.select(
                F.col(id_col), F.pmod(X.hash64(F.col("g"), seed=seed), b_lit).alias("b")
            )
            .groupBy(id_col, "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    raw_db = doc_buckets(corpus)
    if materialize:
        raw_db = raw_db.localCheckpoint(eager=False)
    q_counts = raw_db.groupBy("b").agg(F.sum("cnt").alias("q_cnt"))
    p_counts = (
        doc_buckets(target).groupBy("b").agg(F.sum("cnt").alias("p_cnt"))
    )
    n_q = q_counts.agg(F.sum("q_cnt").cast("double").alias("_nq"))
    n_p = p_counts.agg(F.sum("p_cnt").cast("double").alias("_np"))
    ratio = (
        q_counts.join(p_counts, "b", "left")
        .crossJoin(F.broadcast(n_q))
        .crossJoin(F.broadcast(n_p))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("p_cnt"), F.lit(0)).cast("double") + 1.0)
                    / (F.col("_np") + F.lit(float(buckets)))
                )
                - F.log(
                    (F.col("q_cnt").cast("double") + 1.0)
                    / (F.col("_nq") + F.lit(float(buckets)))
                )
            ).alias("lr"),
        )
    )
    return (
        raw_db.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("cnt").cast("double") * F.col("lr")), 6).alias(
                "dsir_logweight"
            ),
        )
    )


def curriculum_bins(
    df: DataFrame,
    score_col: str,
    *,
    n_bins: int = 10,
    bin_col: str = "curriculum_bin",
    relative_error: float = 0.001,
) -> DataFrame:
    """Curriculum binning: assign each row a difficulty/quality decile
    (0 = lowest score … ``n_bins - 1`` = highest) so a training loader
    can order or re-weight by bin.

    The 100 TB-honest formulation: cutpoints come from ONE pass of
    ``approx_percentile`` (Greenwald-Khanna sketch — mergeable, fixed
    memory, driver receives ``n_bins - 1`` scalars), then re-enter the
    corpus as a literal CASE ladder evaluated map-side — so binning
    costs one aggregate plus a shuffle-free projection.  The exact
    alternative (``ntile`` over a global ORDER BY) funnels the corpus
    through a single-partition sort and is precisely the plan shape
    this module avoids; at ``relative_error`` = 1e-3 the bin boundary
    misplacement is bounded to ±0.1 % of rows per boundary, which a
    curriculum (a coarse ordering heuristic) tolerates by design.
    Ties across a cutpoint land in the lower bin on both sides of any
    re-run: the cutpoints are deterministic for a given input, so
    membership is reproducible.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(
            F.col(score_col), F.lit(qs), F.lit(int(1.0 / relative_error))
        ).alias("c")
    ).collect()[0]["c"]
    label: Column = F.lit(n_bins - 1)
    for b in range(n_bins - 2, -1, -1):
        label = F.when(F.col(score_col) <= F.lit(cuts[b]), F.lit(b)).otherwise(label)
    return df.withColumn(bin_col, label.cast("int"))


def curriculum_interleave(
    df: DataFrame,
    score_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Source-interleaved curriculum ORDER: the actual read order a
    curriculum loader consumes, complementing :func:`curriculum_bins`
    (which labels difficulty but orders nothing).  Within each source,
    rows rank by score descending (ties by id); the global order then
    round-robins across sources by rank — every source's best doc
    before any source's second-best — so quality decays smoothly over
    training WITHOUT the domain runs a plain ``ORDER BY score``
    produces (thousands of consecutive same-source docs, which is
    exactly what interleaving exists to break).

    The 100 TB-honest formulation: the naive ``row_number() OVER
    (ORDER BY rank, source)`` funnels the corpus through one
    partition.  Instead the per-source counts (a sources-sized table,
    like the mixture planners' weight tables) are collected once and
    the global position is computed ARITHMETICALLY map-side:
    ``pos = Σ_s min(cnt_s, r−1)  +  |{s' < source : cnt_s' ≥ r}| + 1``
    — rows finished before round ``r`` plus this source's slot within
    its round (sources that ran out of docs drop out of later rounds).
    Two tiny HOF folds over the counts literal per row; the only
    exchange is the per-source rank window's.  The position is a
    bijection onto 1..N by construction, verified by the oracle's
    window twin.

    Returns (id, source, rank_in_source, global_pos).
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    if None in counts:
        # a NULL source has no round-robin slot and would otherwise die
        # in an unrelated sort/map-key error — fail with the contract
        raise ValueError(
            f"curriculum_interleave: {source_col!r} must be non-null "
            "(coalesce a sentinel source before ordering)"
        )
    srcs = sorted(counts)
    cnts = [int(counts[s]) for s in srcs]
    if not srcs:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, {source_col} string, "
            "rank_in_source long, global_pos long"
        )
    idx_map = F.map_from_arrays(
        F.lit(srcs), F.lit(list(range(len(srcs))))
    )
    w = Window.partitionBy(source_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        id_col, source_col,
        F.row_number().over(w).cast("long").alias("rank_in_source"),
    )
    r = F.col("rank_in_source")
    prior = F.aggregate(
        F.lit(cnts), F.lit(0).cast("long"),
        lambda acc, c: acc + F.least(c.cast("long"), r - 1),
    )
    idx = F.element_at(idx_map, F.col(source_col))
    within = F.aggregate(
        F.slice(F.lit(cnts), F.lit(1), idx), F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c.cast("long") >= r, F.lit(1)).otherwise(F.lit(0)),
    )
    return ranked.select(
        id_col, source_col, "rank_in_source",
        (prior + within + F.lit(1)).alias("global_pos"),
    )


def weighted_sample_n(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    *,
    key: str,
    weight_col: str,
    seed: int = 23,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly n per stratum,
    deterministic: Efraimidis-Spirakis A-Res — each row draws a
    content-addressed uniform u = (hash(key) mod 1e6 + 0.5)/1e6 and
    competes on priority ``ln(u)/w`` (equivalently u^(1/w)); the top n
    priorities per stratum are a weighted sample, rows with weight w
    selected with the inclusion bias w deserves (quality scores, token
    counts, dedup cluster mass as sampling weights).

    Same scale/retry contract as the unweighted samplers: no ``rand()``
    (task retries re-evaluate rand and would resample), one shuffle on
    the strata, WindowGroupLimit keeps <= n candidates per stratum below
    the sort.  Priorities round to 9 decimals before ranking (ties break
    on the key) so a last-ulp ``ln`` divergence cannot reorder replicas
    across engines — the TF-IDF boundary-rounding rule.  Non-positive
    weights are excluded (they have no sampling mass).

    Return contract: the input columns plus ``priority`` (the A-Res
    priority each survivor won on — callers audit selection pressure
    with it; drop it if unwanted).  An existing ``priority`` column is
    rejected rather than silently overwritten.
    """
    if "priority" in df.columns:
        raise ValueError("input already has a 'priority' column")
    u = (
        F.pmod(X.hash64(F.col(key).cast("string"), seed=seed), F.lit(1_000_000))
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    pr = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    w = Window.partitionBy(*strata_cols).orderBy(
        pr.desc(), F.col(key).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", pr)
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    *,
    epoch: int = 0,
    seed: int = 17,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle of a corpus into training
    shards — the epoch-ordering pass of a streaming training loader
    (MosaicML StreamingDataset / HF datasets ``shuffle(seed=…)``
    lineage): every epoch the corpus must be read in a fresh
    pseudorandom order that is (a) reproducible bit-for-bit across
    restarts and workers, (b) different per epoch, and (c) computable
    without a global sort on one machine.

    Formulation: each row draws a content-addressed shuffle key
    ``k = hash64("e{epoch}|" ‖ key)`` (seeded md5 — portable, so the
    DuckDB oracle replays the exact permutation; never ``rand()``,
    which Spark re-evaluates on task retry and would tear the epoch
    order apart mid-job).  ``shard = k mod n_shards`` spreads rows
    uniformly; ``pos_in_shard`` ranks by ``k`` INSIDE each shard (one
    hash exchange + per-shard sort — the window never sees more than
    one shard, so no global-sort bottleneck); ``global_order =
    (pos_in_shard-1)·n_shards + shard`` is the canonical interleaved
    read order (round-robin across shards), unique per row because
    (shard, pos) is unique.

    Scale shape (100 TB): ONE shuffle, hash-partitioned on ``shard``;
    per-shard sorts run in parallel and spill independently.  Size
    ``n_shards`` to the training-reader fan-in (shards ≫ executor
    slots keeps every sort partition-local and bounded at
    corpus_bytes/n_shards).  Epoch determinism means a killed epoch
    resumes from any ``global_order`` offset with zero recomputation
    drift.

    Reference parity: the reference pipeline has no training-loader
    stage — extension surface, same family as ``hash_split``
    (content-addressed membership) but producing an ORDER, not a
    label.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    reserved = {"_k", "shard", "pos_in_shard", "global_order"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns {sorted(reserved)} collide with epoch_shuffle "
            "output columns — rename them first"
        )
    k = X.hash64(
        F.concat(F.lit(f"e{epoch}|"), F.col(key).cast("string")), seed=seed
    )
    win = Window.partitionBy("shard").orderBy(
        F.col("_k").asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_k", k)
        .withColumn("shard", F.pmod(F.col("_k"), F.lit(n_shards)))
        .withColumn("pos_in_shard", F.row_number().over(win).cast("long"))
        .withColumn(
            "global_order",
            (F.col("pos_in_shard") - F.lit(1)) * F.lit(n_shards)
            + F.col("shard"),
        )
        .drop("_k")
    )


def ring_negatives(
    df: DataFrame,
    key: str,
    *,
    k: int = 2,
    epoch: int = 0,
    seed: int = 17,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic random-negative pairing for contrastive training
    (word2vec / DPR lineage): every anchor row draws ``k`` negatives
    uniformly-pseudorandomly from the corpus, reproducibly, WITHOUT a
    corpus×corpus join or ``rand()``.

    Formulation — the ring trick: :func:`epoch_shuffle` already places
    every row at a pseudorandom (shard, pos); the j-th negative of an
    anchor is the row ``j`` steps ahead on its shard's ring
    (``neg_pos = (pos - 1 + j) mod shard_size + 1``).  Because the ring
    order is itself a seeded shuffle, stepping it IS uniform sampling —
    the standard derangement-style pairing used by in-batch-negative
    trainers, made corpus-global and retry-stable.

    Scale shape: shard sizes are one tiny aggregate (``n_shards`` rows,
    broadcast); the pair frame joins back to the (shard, pos)→key map
    with ONE narrow self-equi-join, both sides hash-partitioned on the
    same key — no N² pair space, output is exactly ``k·N`` rows minus
    ring wraps back onto the anchor's own position (``j ≡ 0 mod
    shard_size``, so only shards of size ≤ k lose pairs; duplicate KEY
    VALUES are fine — rows pair by ring position, not value).
    Epoch-varying: advance ``epoch`` to redraw all negatives.

    Returns ``(anchor, negative, j)`` — ``anchor``/``negative`` carry
    the ``key`` values; ``j`` in 1..k identifies the draw.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    # the ring feeds THREE consumers (sizes aggregate, probe side,
    # lookup side); the scan+hash below the exchange is ReusedExchange,
    # only the narrow (key, shard, pos) sort+rank re-executes per
    # branch.  A localCheckpoint here was MEASURED SLOWER at 20x scale
    # (5.9 s vs 2.8 s at 5M rows, tools/measure_scale_r10_sampling.py):
    # materializing and re-reading the ring 3x costs more than
    # re-running its cheap sorts — the triangle_counts checkpoint
    # precedent doesn't transfer because those arms re-read SOURCE
    # scans, not a reused exchange.
    ring = epoch_shuffle(
        df.select(key), key, epoch=epoch, seed=seed, n_shards=n_shards
    ).select(key, "shard", "pos_in_shard")
    sizes = ring.groupBy("shard").agg(
        F.count(F.lit(1)).alias("_sz")
    )
    probes = (
        ring.join(F.broadcast(sizes), "shard")
        .select(
            F.col(key).alias("anchor"),
            "shard",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
            "pos_in_shard",
            "_sz",
        )
        .withColumn(
            "_neg_pos",
            F.pmod(F.col("pos_in_shard") - 1 + F.col("j"), F.col("_sz")) + 1,
        )
        # a wrap back onto the anchor's own POSITION (j ≡ 0 mod shard
        # size, e.g. any j in a 1-row shard) is a self-pair — filtered
        # by position, not key value, so duplicate key values elsewhere
        # on the ring still pair as the distinct rows they are
        .filter(F.col("_neg_pos") != F.col("pos_in_shard"))
    )
    lookup = ring.select(
        "shard",
        F.col("pos_in_shard").alias("_neg_pos"),
        F.col(key).alias("negative"),
    )
    return (
        probes.join(lookup, ["shard", "_neg_pos"])
        .select("anchor", "negative", "j")
    )


def apply_mixture_plan_with_repetition(
    df: DataFrame,
    plan: DataFrame,
    strata_col: str,
    *,
    key: str,
    seed: int = 23,
    copy_col: str = "copy",
    max_repetition: int = 20,
) -> DataFrame:
    """Apply a mixture plan whose fractions may EXCEED 1 — the
    epochs-per-source mix of the GPT-3/LLaMA recipes, where scarce
    high-quality strata are repeated (fraction 2.5 = every doc twice
    plus a deterministic 50% third copy) while bulk strata downsample
    (fraction 0.25) — all in one pass.

    Per row: ``total = floor(fraction) + (bucket < frac_part·10⁶)``
    copies, where ``bucket`` is the same content-addressed hash bucket
    as :func:`apply_mixture_plan` (retry-stable, externally
    reproducible — and the fractional copy keeps EXACTLY the rows a
    plain fractional downsample would keep, so plans compose).  Output
    carries ``copy_col`` in 1..total so downstream packing/shuffling
    can tell repeats apart (and an epoch shuffle keyed on
    (key, copy) spreads them).

    Scale shape: broadcast plan join + map-side ``explode(sequence)``
    — no shuffle, output rows = Σ fraction·|stratum|.  A malformed
    plan (fraction > ``max_repetition``) is rejected up front via one
    plan-sized aggregate rather than silently exploding the corpus.
    """
    mx = plan.agg(F.max("sampling_fraction")).first()[0]
    if mx is not None and float(mx) > max_repetition:
        raise ValueError(
            f"plan fraction {mx} exceeds max_repetition={max_repetition}"
        )
    bucket = F.pmod(X.hash64(F.col(key).cast("string"), seed=seed), F.lit(1_000_000))
    frac = F.coalesce(F.col("sampling_fraction"), F.lit(0.0))
    total = F.floor(frac) + F.when(
        bucket < (frac - F.floor(frac)) * 1_000_000, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(
            F.broadcast(plan.select("stratum", "sampling_fraction")),
            F.col(strata_col) == F.col("stratum"),
            "left",
        )
        .withColumn("_total", total)
        .filter(F.col("_total") >= 1)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1).cast("long"), F.col("_total"))))
        .drop("stratum", "sampling_fraction", "_total")
    )


def proportional_allocation(counts: DataFrame, total: int, *,
                            stratum_col: str = "stratum",
                            n_col: str = "n") -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an exact global
    ``total`` across strata proportional to their sizes: quota_s =
    floor(total·n_s/N) plus one extra for the ``total − Σfloor`` largest
    fractional remainders (ties → lexicographically smaller stratum).
    Σ quota_s == total, exactly — the property fraction-based sampling
    cannot give and uniform n-per-stratum gives only for flat mixes.

    ``counts`` is a strata-cardinality-sized frame (stratum, n); the
    windows here deliberately run over that single tiny frame (one
    partition), never over data-sized input.  Returns (stratum, quota).
    """
    if total < 0:
        raise ValueError(f"total must be >= 0: {total}")
    w_all = Window.partitionBy()
    share = (F.lit(total) * F.col(n_col)).cast("double") / F.sum(n_col).over(
        w_all
    ).cast("double")
    with_share = counts.select(
        F.col(stratum_col).alias("stratum"),
        F.floor(share).cast("long").alias("_base"),
        (share - F.floor(share)).alias("_rem"),
    )
    deficit = F.lit(total) - F.sum("_base").over(w_all)
    rank = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
    )
    return with_share.select(
        "stratum",
        (
            F.col("_base")
            + F.when(rank <= deficit, F.lit(1)).otherwise(F.lit(0))
        ).alias("quota"),
    )


def proportional_holdout(df: DataFrame, stratum_col: str, total: int, *,
                         key: str = "doc_id", seed: int = 41) -> DataFrame:
    """Exact-size stratified holdout: select exactly ``total`` rows whose
    stratum mix mirrors the corpus mix — the eval/calibration-set
    builder ("give me exactly 10k docs, proportionally by language")
    where hash-fraction splits drift by ±√n per stratum and uniform
    caps distort the mix.

    Quotas come from :func:`proportional_allocation`; within each
    stratum the quota picks the lowest md5-hash rows (ties → smaller
    key), so membership is a pure function of (key, seed) — re-runs,
    retries, and incremental rebuilds select identical rows, and the
    DuckDB oracle reproduces the exact set.  When ``total`` exceeds the
    corpus size, quotas exceed stratum sizes and the selection
    degrades deterministically to "everything".

    Scale shape: one strata-sized count aggregate (map-side partial),
    the tiny-frame allocation, a BROADCAST quota join, and one
    stratum-keyed window ranking where Spark's WindowGroupLimit keeps
    only quota-many candidates per partition before the sort — the
    same shape as :func:`stratified_sample_n`; a mega-stratum is one
    sort partition, acceptable for one-off holdout builds (holdouts
    are rebuilt rarely, read often).
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    quotas = proportional_allocation(counts, total)
    h = X.hash64(F.col(key).cast("string"), seed=seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.join(
            F.broadcast(quotas), F.col(stratum_col) == F.col("stratum")
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("quota"))
        .drop("_rk", "stratum", "quota")
    )


def dedup_safe_split(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    seed: int = 31,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Leakage-safe train/val/test split: the hash key is the CONTENT
    fingerprint (md5 of normalized text), not the row id, so exact
    duplicates are assigned atomically — a document and its re-crawls
    can never straddle train and test (the classic eval-leakage bug
    that id-keyed splits like :func:`hash_split` cannot prevent).

    Same banding contract as :func:`hash_split` (portable md5 hash →
    bucket mod 100 → cumulative weight bands), so membership is a
    reproducible contract across engines and re-runs.  Stateless scan —
    the fingerprint and band are computed map-side per row; ZERO
    shuffles at any corpus size (group-atomicity needs no group-by:
    equal texts hash equal, period).
    """
    with_fp = df.withColumn(fingerprint_col, X.md5_fingerprint(text_col))
    return hash_split(with_fp, fingerprint_col, weights=weights, seed=seed)


def domain_reweight_mw(weights: DataFrame, losses: DataFrame, *,
                       domain_col: str = "domain",
                       weight_col: str = "weight",
                       loss_col: str = "excess_loss",
                       eta: float = 0.5) -> DataFrame:
    """One multiplicative-weights step of DoReMi-style domain
    rebalancing: domains where the proxy model's EXCESS loss (loss
    minus a reference model's loss) is high get upweighted in the next
    training mix — the training-feedback loop that turns static corpus
    mixing into an adaptive recipe.

    Update: ``w'_d ∝ w_d · (1 + η·excess_d)`` then renormalize to sum 1.
    The linearized (1 + ηx) form replaces DoReMi's exp(ηx) — same
    ascent direction, but a plain multiply instead of a transcendental,
    so the arithmetic is bit-replayable across engines (exp() is not
    correctly-rounded and differs by ulps between libms).  Negative
    excess (domain already over-trained) downweights; the factor is
    floored at 0.05 so one bad round can never zero a domain out.

    Both inputs are domain-cardinality frames (tens of rows at any
    corpus scale — the LOSSES are aggregates the training job emits,
    not per-document data), so the join broadcasts and the normalizing
    sum is a scalar aggregate.  Returns (domain, weight, excess_loss,
    new_weight) with new_weight rounded 6dp.
    """
    raw = (
        weights.join(losses, domain_col, "left")
        .withColumn("_x", F.coalesce(F.col(loss_col), F.lit(0.0)))
        .withColumn(
            "_raw",
            F.col(weight_col)
            * F.greatest(F.lit(1.0) + F.lit(eta) * F.col("_x"), F.lit(0.05)),
        )
    )
    total = raw.agg(F.sum("_raw").alias("_tot"))
    return (
        raw.crossJoin(F.broadcast(total))
        .select(
            F.col(domain_col),
            F.col(weight_col).alias("weight"),
            F.round(F.col("_x"), 6).alias("excess_loss"),
            F.round(F.col("_raw") / F.col("_tot"), 6).alias("new_weight"),
        )
    )


def pack_efficiency_report(packed: DataFrame, *, budget: int,
                           size_col: str, shard_col: str = "shard",
                           bin_col: str = "bin") -> DataFrame:
    """Bin-level audit of a :func:`pack_by_offset` packing — the
    training-batch efficiency dashboard: per (shard, bin), how many
    documents landed, how many size units they carry, the fill ratio
    against the ``budget``, and whether the bin overflows (offset
    packing assigns by START offset, so a document straddling the
    boundary carries its tail into the bin — the sequence writer's
    carry; the report makes that overflow visible instead of implicit).

    Rounding: ``fill`` = round(units/budget, 6) — an IEEE division of
    exact integer counts, engine-identical.  One (shard, bin)-keyed
    aggregate over the already-packed frame; the packing window itself
    is not recomputed.  At 100 TB the report is bins-sized (corpus
    units / budget rows).
    """
    return (
        packed.groupBy(shard_col, bin_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(size_col).cast("long").alias("units"),
        )
        .select(
            shard_col, bin_col, "n_docs", "units",
            F.round(F.col("units").cast("double") / F.lit(float(budget)), 6)
            .alias("fill"),
            (F.col("units") > F.lit(budget)).alias("overflow"),
        )
    )
