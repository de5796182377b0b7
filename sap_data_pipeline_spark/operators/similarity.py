"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:

* ``brute_force_topk`` — exact baseline: query×corpus join, cosine via
  JVM higher-order functions, per-query top-k with a window.  At 100 TB
  the corpus side stays partitioned; the (small) query set is broadcast,
  so the join is shuffle-free and the only shuffle is the per-query top-k
  (k rows per partition pre-aggregated by the window's partial sort).
* ``lsh_topk`` — the scale path: random-hyperplane signs bucket the
  corpus (signed-projection LSH); queries probe only their bucket, then
  exact cosine re-ranks within it.  Hyperplanes are deterministic
  (seeded md5 of (plane, dim)) so results are reproducible and the
  planes need no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sap_data_pipeline_spark.functions import vectors as V


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Ties broken by neighbor id for determinism.  Returns
    (query_id, neighbor_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(V.cosine("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"p{plane}:d{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def lsh_buckets(df: DataFrame, *, vec_col: str = "embedding", dim: int,
                n_planes: int = 4, n_tables: int = 8) -> DataFrame:
    """Explode each row into ``n_tables`` (table, bucket) LSH keys.

    OR-amplification: a neighbor is a candidate if it collides in ANY
    table.  With per-plane collision probability p = 1 - θ/π, candidate
    recall is 1-(1-p^n_planes)^n_tables — n_tables is the recall knob,
    n_planes the bucket-size knob.
    """
    tables = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(v) for v in _hyperplane(dim, t * n_planes + p)])
            proj = F.aggregate(
                F.zip_with(F.col(vec_col), plane, lambda x, h: x.cast("double") * h),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        tables.append(F.struct(F.lit(t).alias("tbl"), F.concat(*bits).alias("bucket")))
    return df.withColumn("_lsh", F.explode(F.array(*tables))).select(
        "*", F.col("_lsh.tbl").alias("lsh_table"), F.col("_lsh.bucket").alias("lsh_bucket")
    ).drop("_lsh")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, *, dim: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_planes: int = 4,
             n_tables: int = 8) -> DataFrame:
    """Multi-table bucketed ANN: union candidates over tables, exact
    cosine re-rank inside the candidate set.

    Recall < 1 by design; tests gate it against ``brute_force_topk``.
    The bucket join shuffles on (table, bucket) ids — n_tables×2^n_planes
    distinct keys; AQE skew-split covers hot buckets.  Corpus-side cost is
    one scan producing n_tables narrow (key, id) rows per vector.
    """
    cb = lsh_buckets(corpus, vec_col=vec_col, dim=dim, n_planes=n_planes,
                     n_tables=n_tables).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        "lsh_table", "lsh_bucket",
    )
    qb = lsh_buckets(queries, vec_col=vec_col, dim=dim, n_planes=n_planes,
                     n_tables=n_tables).select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        "lsh_table", "lsh_bucket",
    )
    cands = (
        qb.join(cb, ["lsh_table", "lsh_bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cosine", F.round(V.cosine("qv", "cv"), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
