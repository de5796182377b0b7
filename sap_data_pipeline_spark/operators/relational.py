"""Core relational operators (SURVEY §2.2-§2.7) as composable transforms.

Each function is ``DataFrame -> DataFrame`` (or a small factory returning
one) so pipelines chain with ``df.transform(...)``.  All are pure
DataFrame-API — Catalyst handles pushdown/pruning/join selection; notes on
the 100 TB behavior are given per operator.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL of per-file/per-branch frames (reference ``pd.concat``,
    ``pipelines/etl_zmb51.py:60``).  ``unionByName`` so column order never
    silently corrupts data; no shuffle — unions are free at any scale."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=False), dfs)


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column] | None = None) -> DataFrame:
    """``drop_duplicates(subset=keys)`` keep-first (``pipelines/etl_zrssale.py:63``).

    pandas keep-first is input-order-dependent; a shuffle engine needs the
    order made explicit.  With ``order_by`` given, survivor = first row in
    that order (row_number window — one shuffle on ``keys``).  Without it,
    falls back to ``dropDuplicates`` (arbitrary survivor, cheaper:
    map-side partial dedup before the shuffle).
    """
    if order_by is None:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dedup_keep_last(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Keep-last dedup (``drop_duplicates(..., keep='last')``,
    ``pipelines/etl_zmmidr_oun.py:72-76``).

    The reference's "last" is file-read order; here the caller supplies the
    explicit ordering columns (e.g. ``_source_file``, ``_source_line`` from
    read_sap_export) and we invert them.  Single hash-partition shuffle on
    ``keys``; at 100 TB this is the unavoidable shuffle and it's keyed on
    the dedup key, so AQE skew-split handles hot keys.
    """
    return dedup_keep_first(df, keys, [c.desc() for c in order_by])


def left_anti(df: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """New-key detection (reference ``~isin`` on keys pulled from SQL,
    ``pipelines/etl_zmachk.py:113-117``).  With a small ``existing`` side
    Catalyst broadcasts it (BroadcastHashJoin LeftAnti) — no shuffle of the
    big side."""
    return df.join(existing.select(*keys).dropDuplicates(list(keys)), list(keys), "left_anti")


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate counting (``df.duplicated().sum()``,
    ``pipelines/etl_zmmidr_bun.py:63-64``): keys with count > 1."""
    return (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count")).filter(F.col("dup_count") > 1)
    )


def column_max_lengths(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """Max string length per column — the DDL-sizing profiler
    (``pipelines/etl_zrssale.py:66-69``).  One aggregate pass, all columns
    at once (the reference loops column-by-column)."""
    cols = list(cols or df.columns)
    return df.agg(*[F.max(F.length(F.col(c).cast("string"))).alias(c) for c in cols])


def region_merge(
    df: DataFrame,
    *,
    dc_col: str = "DC",
    groups: dict[str, Sequence[str]],
    sum_cols: Sequence[str],
    first_cols: Sequence[str] = (),
    key_cols: Sequence[str] = ("Article",),
) -> DataFrame:
    """DC region-merge aggregation (``pipelines/etl_zmmidr_oun.py:142-167``):
    branch-filter DCs into labeled groups, sum stocks per key within each
    group, stamp the group label, union the branches.

    Implemented as a single pass: map DC -> group label with a CASE ladder,
    then one groupBy — one shuffle total instead of one per branch.
    Unmapped DCs pass through with their own label.
    """
    label = F.col(dc_col)
    for out_label, members in groups.items():
        label = F.when(F.col(dc_col).isin(list(members)), F.lit(out_label)).otherwise(label)
    labeled = df.withColumn("_region_dc", label)
    aggs = [F.sum(F.col(c)).alias(c) for c in sum_cols]
    aggs += [F.min(F.col(c)).alias(c) for c in first_cols]
    return (
        labeled.groupBy(F.col("_region_dc").alias(dc_col), *key_cols).agg(*aggs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a random salt appended to
    the key, the small side is replicated once per salt value.

    For the hot-key case AQE's skew-join can't fix (a single key too
    large for any post-shuffle split, or a broadcast-ineligible small
    side): one key's rows spread over ``salt`` reducers instead of one.
    Cost = small side duplicated ``salt``× — keep ``salt`` modest.
    Results are row-identical to the plain join (salt never leaves the
    join).
    """
    keys = list(keys)
    b = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


def full_outer_coalesce(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    fill: dict[str, float] | None = None,
) -> DataFrame:
    """FULL OUTER join on a composite key + COALESCE of keys and measures —
    the weekly-sales merge shape (``pipelines/etl_weekly_sales.py:38-49``).

    Measures present on both sides get ``coalesce(l, r, fill)``; join keys
    come back non-null by construction of the equi-join.  Both inputs are
    pre-aggregated to the key grain by the caller, so the join is
    1:1 — at scale this is a sort-merge join on the key; AQE picks
    shuffled-hash when one side is small.
    """
    lcols = set(left.columns) - set(keys)
    rcols = set(right.columns) - set(keys)
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, list(keys), "full_outer")
    out: list[Column] = [F.col(k) for k in keys]
    fill = fill or {}
    for c in sorted(lcols | rcols):
        if c in lcols and c in rcols:
            expr = F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}"))
        elif c in lcols:
            expr = F.col(f"l.{c}")
        else:
            expr = F.col(f"r.{c}")
        if c in fill:
            expr = F.coalesce(expr, F.lit(fill[c]))
        out.append(expr.alias(c))
    return joined.select(*out)


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-n rows per group by an explicit deterministic ordering
    (callers must break ties — e.g. order by measure DESC, key ASC —
    or survivors are nondeterministic across runs).

    One shuffle on the group key; Spark's WindowGroupLimit pushes the
    ``row_number() <= n`` bound below the sort, so every partition keeps
    at most n candidates per group instead of sorting whole groups —
    the per-group twin of TakeOrderedAndProject.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def fuzzy_self_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int,
    max_block: int = 1024,
) -> DataFrame:
    """Blocked fuzzy-match pairs: within each blocking-key group, emit
    (id_a, id_b, name_a, name_b, distance) for every unordered pair with
    Levenshtein edit distance ≤ ``max_distance`` — the record-linkage /
    fuzzy-dedup primitive (catalog variants of the same product, typo'd
    dimension members).

    An unblocked fuzzy join is O(N²) and cannot exist at scale; blocking
    bounds the pair space to Σ|block|², exactly like the LSH band join
    (``dedup.bucketed_pairs``).  Blocks larger than ``max_block`` rows
    are dropped (not truncated) so a degenerate blocking key degrades
    recall, never memory — same drop-and-audit policy as LSH.  One
    shuffle on the blocking key; ``levenshtein`` runs inside codegen.
    """
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_name"), *block_cols
    )
    capped = (
        keyed.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy(*block_cols))
        )
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
    a = capped.select(
        *[F.col(c) for c in block_cols],
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
    )
    b = capped.select(
        *[F.col(c) for c in block_cols],
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
    )
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def snapshot_diff_stats(ref: DataFrame, cur: DataFrame, *,
                        id_col: str = "doc_id",
                        hash_col: str = "fingerprint",
                        group_col: str | None = None) -> DataFrame:
    """Snapshot-over-snapshot corpus diff — the ops dashboard every
    recurring ingest needs: what did the new crawl ADD, REMOVE, MODIFY
    (same id, different content fingerprint), or leave UNCHANGED,
    optionally broken down by a group column (source, host, lang).

    One id-keyed FULL OUTER join of two (id, fingerprint[, group])
    projections — the diff never touches document payloads, so at
    100 TB the shuffle carries two fingerprint columns.  Distinct from
    ``dedup.snapshot_admission`` (content-keyed anti-join deciding what
    to INGEST): this is the id-keyed audit of what HAPPENED, including
    deletions the admission path never sees.  Returns
    (status[, group], n_docs) with statuses
    ``added | removed | modified | unchanged``.
    """
    rcols = [F.col(id_col), F.col(hash_col).alias("_rh")] + (
        [F.col(group_col).alias("_rg")] if group_col else []
    )
    ccols = [F.col(id_col), F.col(hash_col).alias("_ch")] + (
        [F.col(group_col).alias("_cg")] if group_col else []
    )
    j = ref.select(*rcols).join(cur.select(*ccols), id_col, "full_outer")
    status = (
        F.when(F.col("_rh").isNull(), "added")
        .when(F.col("_ch").isNull(), "removed")
        .when(F.col("_rh") != F.col("_ch"), "modified")
        .otherwise("unchanged")
    )
    keys = [status.alias("status")] + (
        [F.coalesce(F.col("_cg"), F.col("_rg")).alias(group_col)]
        if group_col else []
    )
    return j.select(*keys).groupBy(
        "status", *([group_col] if group_col else [])
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
