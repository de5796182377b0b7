"""Extension query catalog: training-data-pipeline operators.

Registers the dedup / similarity-search / text-analysis / multimodal
queries into the same driver-facing registry as the core catalog.
Oracles use only portable constructs (md5-derived hashing, explicit
list ops) so DuckDB computes bit-identical values.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sap_data_pipeline_spark.functions import text as X
from sap_data_pipeline_spark.operators import dedup as D
from sap_data_pipeline_spark.operators import multimodal as MM
from sap_data_pipeline_spark.operators import similarity as S
from sap_data_pipeline_spark.plans.catalog import register
from sap_data_pipeline_spark.sources.readers import Star

# --- shared SQL fragments (DuckDB) -----------------------------------------

NORM_SQL = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
# Raw token sequence (order + duplicates preserved — required for shingling)
TOKSEQ_SQL = (
    "list_filter("
    "string_split_regex(" + NORM_SQL + ", '[^\\p{{L}}\\p{{N}}]+'), t -> t <> '')"
)
TOKENS_SQL = "list_distinct(" + TOKSEQ_SQL + ")"


def _hash64_sql(expr: str, seed: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('s{seed}:', {expr})), 1, 15)) AS BIGINT)"
    )


_TOKS_CTE = f"""
    toks AS (
        SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS tok
        FROM documents
    )
"""

# Word 3-gram shingles (matches operators.dedup.SHINGLE_N): tokens t →
# t[i]||' '||t[i+1]||' '||t[i+2] for i in 1..len-2 (1-based list indexing).
_SHINGLE_CONCAT = " || ' ' || ".join(
    f"t[i + {j}]" if j else "t[i]" for j in range(D.SHINGLE_N)
)

_SHINGLES_CTE = f"""
    doctoklists AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    shingles AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - {D.SHINGLE_N - 1}, 0)),
                   i -> {_SHINGLE_CONCAT}))) AS tok
        FROM doctoklists
    )
"""

# Carter-Wegman minhash (matches operators.dedup.minhash_signature): one
# md5 per shingle → (h1: 15 hex chars, h2: 13 hex chars); perm s = h1+s*h2.
_MINHASH_COLS = ",\n               ".join(
    f"MIN(h1 + {s} * h2) AS mh{s}" for s in range(D.NUM_PERM)
)

_SIG_CTE = f"""
    {_SHINGLES_CTE},
    shingle_hashes AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(concat('mh:', tok)), 1, 15)) AS BIGINT) AS h1,
               CAST(concat('0x', substr(md5(concat('mh:', tok)), 16, 13)) AS BIGINT) AS h2
        FROM shingles
    ),
    sig AS (
        SELECT doc_id,
               {_MINHASH_COLS}
        FROM shingle_hashes GROUP BY doc_id
    )
"""

_BAND_SELECTS = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band, "
    f"concat_ws('_', {', '.join(f'CAST(mh{i} AS VARCHAR)' for i in range(b, b + D.BAND_SIZE))}) AS bkey "
    f"FROM sig"
    for b in range(0, D.NUM_PERM, D.BAND_SIZE)
)

# kept mirrors operators.dedup.bucketed_pairs: rows in band-buckets above
# LSH_MAX_BUCKET are DROPPED before pair expansion — without this cap the
# oracle silently diverges the moment any bucket exceeds the cap at a
# larger scale factor.
_CAND_CTE = f"""
    {_SIG_CTE},
    bands AS (
{_BAND_SELECTS}
    ),
    kept AS (
        SELECT doc_id, band, bkey FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= {D.LSH_MAX_BUCKET}
    ),
    cands AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM kept l JOIN kept r ON l.band = r.band AND l.bkey = r.bkey
        WHERE l.doc_id < r.doc_id
    )
"""


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

@register(
    "exact_dedup_documents",
    f"""
    SELECT md5({NORM_SQL.format(col='text')}) AS fingerprint,
           MIN(doc_id) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_documents(star: Star) -> DataFrame:
    return D.exact_dedup(star.documents).select("fingerprint", "doc_id", "group_size")


@register(
    "minhash_signatures",
    f"""
    WITH {_SIG_CTE}
    SELECT * FROM sig
    """,
)
def minhash_signatures(star: Star) -> DataFrame:
    # Docs with < SHINGLE_N tokens produce no shingles and drop out on
    # both sides (SQL inner unnest does the same).
    return D.minhash_signature(star.documents)


@register(
    "minhash_lsh_pairs",
    f"""
    WITH {_CAND_CTE}
    SELECT id_a, id_b FROM cands
    """,
)
def minhash_lsh_pairs(star: Star) -> DataFrame:
    return D.minhash_dedup_pairs(star.documents)


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_CAND_CTE},
    doctoks AS (
        SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    )
    SELECT c.id_a, c.id_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6)
               AS jaccard
    FROM cands c
    JOIN doctoks a ON a.doc_id = c.id_a
    JOIN doctoks b ON b.doc_id = c.id_b
    WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) >= 0.7
    """,
)
def ngram_jaccard_pairs_q(star: Star) -> DataFrame:
    return D.ngram_jaccard_pairs(star.documents, threshold=0.7)


@register(
    "token_containment_pairs",
    f"""
    WITH {_CAND_CTE},
    doctoks AS (
        SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN len(a.toks) > 0
                    THEN round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                               / CAST(len(a.toks) AS DOUBLE), 6) ELSE 0.0 END
                   AS containment_ab,
               CASE WHEN len(b.toks) > 0
                    THEN round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                               / CAST(len(b.toks) AS DOUBLE), 6) ELSE 0.0 END
                   AS containment_ba
        FROM cands c
        JOIN doctoks a ON a.doc_id = c.id_a
        JOIN doctoks b ON b.doc_id = c.id_b
    )
    SELECT * FROM scored
    WHERE containment_ab >= 0.8 OR containment_ba >= 0.8
    """,
)
def token_containment_pairs_q(star: Star) -> DataFrame:
    return D.token_containment_pairs(star.documents, threshold=0.8)


# Sketch bit i votes on bit i%60 of seeded hash word h{i//60}; bit 63's
# addend is the two's-complement sign-bit constant (see
# operators.dedup.simhash / simhash_bit_value — a 1<<63 literal overflows
# BIGINT in both engines).
def _simhash_sums(bits: int) -> str:
    return ",\n               ".join(
        f"SUM(CASE WHEN (h{i // D._SIMHASH_WORD} & {1 << (i % D._SIMHASH_WORD)}) <> 0 "
        f"THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )


def _simhash_sketch(bits: int) -> str:
    return " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {D.simhash_bit_value(i)} ELSE 0 END)"
        for i in range(bits)
    )


def _simhash_hashed_cte(bits: int) -> str:
    n_words = (bits + D._SIMHASH_WORD - 1) // D._SIMHASH_WORD
    cols = ",\n               ".join(
        f"{_hash64_sql('tok', w)} AS h{w}" for w in range(n_words)
    )
    return f"""
    hashed AS (
        SELECT doc_id, {cols} FROM toks
    )"""


_SIMHASH_BITS = 16
_SIMHASH_SUMS = _simhash_sums(_SIMHASH_BITS)
_SIMHASH_SKETCH = _simhash_sketch(_SIMHASH_BITS)


@register(
    "simhash_sketches",
    f"""
    WITH {_TOKS_CTE},
    hashed AS (
        SELECT doc_id, {_hash64_sql('tok', 0)} AS h0 FROM toks
    ),
    bitsums AS (
        SELECT doc_id,
               {_SIMHASH_SUMS}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({_SIMHASH_SKETCH} AS BIGINT) AS simhash
    FROM bitsums
    """,
)
def simhash_sketches(star: Star) -> DataFrame:
    return D.simhash(star.documents, bits=_SIMHASH_BITS)


@register(
    "embedding_near_dup_pairs",
    # CAST(... AS DOUBLE[]): DuckDB's list_dot_product on FLOAT[] computes
    # in float32; Spark-side folds are double — cast for bit parity.
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a
    JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
    """,
)
def embedding_near_dup_pairs_q(star: Star) -> DataFrame:
    # 0.3 threshold: testdata embeddings are near-uniform random (cosine
    # concentrates near 0 in 64-dim), so a production-style 0.95 gate
    # matches nothing; 0.3 keeps the operator's output non-degenerate.
    return D.embedding_near_dup_pairs(star.embeddings, threshold=0.3)


# ---------------------------------------------------------------------------
# Shared SEMANTIC near-dup index — the embedding twin of
# _near_dup_index below: the cell-blocked cosine pair graph and its
# connected-component labeling are corpus artifacts (one sketch+closure
# per corpus, served by every downstream query), not per-query work.
# Built once per corpus with the catalog's default params (threshold
# 0.3, 8 cells, nprobe 2) and shared by embedding_near_dup_cells
# (pairs) and semantic_dedup_clusters (CC); like _near_dup_index it is
# served from the durable content-addressed artifact store, so a cold
# session's first call is a parquet read, not a sketch+closure build.
# ---------------------------------------------------------------------------

_sem_index_cache: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_sem_index_builds = 0  # test hook: number of pair-graph + CC builds

_SEM_PARAMS = dict(threshold=0.3, n_cells=8, nprobe=2)


def _sem_index(star: Star) -> tuple[DataFrame, DataFrame]:
    """(cosine pair graph, component labeling) for star.embeddings.

    Three tiers (r8 verdict #2): process cache → the durable
    content-addressed artifact store (``sources.artifacts``: a COLD
    session's first family query is a parquet read, not a 13 s
    sketch+closure build) → a real build, committed to storage for the
    next session.  Synthetic in-memory stars (no files to fingerprint)
    build in-process only, pinned via localCheckpoint."""
    global _sem_index_builds
    spark = star.embeddings.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect has no sparkContext
        app_id = str(id(spark))
    key = (app_id, star.sf_dir)
    if key not in _sem_index_cache:
        from sap_data_pipeline_spark.sources import artifacts as A

        def build() -> dict[str, DataFrame]:
            global _sem_index_builds
            _sem_index_builds += 1
            pairs = D.embedding_near_dup_pairs_by_cell(
                star.embeddings, **_SEM_PARAMS
            ).localCheckpoint(eager=True)
            cc = D.connected_components(
                star.embeddings.select("vec_id"),
                pairs.select("id_a", "id_b"), id_col="vec_id",
            )
            return {"pairs": pairs, "cc": cc}

        fp = A.corpus_fingerprint(
            getattr(star, "sf_dir", "") or "", "embeddings",
            params=f"sem|{sorted(_SEM_PARAMS.items())}",
        )
        if fp is None:
            built = build()
            _sem_index_cache[key] = (
                built["pairs"],
                built["cc"].localCheckpoint(eager=True),
            )
        else:
            frames = A.load_or_build(spark, "sem_index", fp, build)
            _sem_index_cache[key] = (frames["pairs"], frames["cc"])
    return _sem_index_cache[key]


@register(
    "embedding_near_dup_cells",
    # Label-free variant: the block is a quantizer cell.  The seeded-
    # sample quantizer (centroids = the 8 vectors with smallest
    # md5('cell:'||id)) is deterministic and SQL-replayable, so this gets
    # a full value-hash oracle — the assignment, probing, and candidate
    # expansion are replayed verbatim.  Spark folds L2 left-to-right from
    # 0.0; the oracle sums the same squared diffs (list ops on DOUBLE[]);
    # cell ranking ties break by cell id on both sides.
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeded AS (
        SELECT vec_id, v, md5('cell:' || CAST(vec_id AS VARCHAR)) AS r
        FROM e ORDER BY r, vec_id LIMIT 8
    ),
    cents AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS INT) AS cell,
               v AS cv
        FROM seeded
    ),
    dists AS (
        SELECT e.vec_id, c.cell,
               list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
        FROM e CROSS JOIN cents c
    ),
    probed AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM dists
        ) WHERE rk <= 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probed a JOIN probed b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           round(list_dot_product(ea.v, eb.v)
                 / (sqrt(list_dot_product(ea.v, ea.v))
                    * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
    FROM cand JOIN e ea ON ea.vec_id = cand.id_a
              JOIN e eb ON eb.vec_id = cand.id_b
    WHERE round(list_dot_product(ea.v, eb.v)
                / (sqrt(list_dot_product(ea.v, ea.v))
                   * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.3
    """,
)
def embedding_near_dup_cells_q(star: Star) -> DataFrame:
    pairs, _ = _sem_index(star)
    return pairs


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@register(
    "ann_brute_force_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, c.v)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        FROM q CROSS JOIN e c
        WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_brute_force_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.brute_force_topk(
        star.embeddings, queries, k=5, query_id_col="query_id"
    ).withColumn("rank", F.col("rank").cast("int"))


# LSH-bucketed ANN: approximate w.r.t. brute force but fully DETERMINISTIC
# (hyperplanes are md5-derived constants), so the oracle replays the exact
# bucketing with the same plane literals.  Recall vs brute force is gated
# separately in tests/test_dedup_similarity.py.
_LSH_PLANES, _LSH_TABLES, _LSH_DIM, _LSH_K = 4, 8, 64, 5


def _lsh_bucket_sql(vcol: str, t: int) -> str:
    bits = []
    for p in range(_LSH_PLANES):
        w = S._hyperplane(_LSH_DIM, t * _LSH_PLANES + p)
        arr = "[" + ", ".join(repr(x) for x in w) + "]"
        bits.append(
            f"CASE WHEN list_dot_product({vcol}, {arr}) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


_LSH_TABLES_SQL = "\n        UNION ALL\n".join(
    f"        SELECT vec_id, {t} AS tbl, {_lsh_bucket_sql('v', t)} AS bucket, v FROM e"
    for t in range(_LSH_TABLES)
)

_LSH_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
{_LSH_TABLES_SQL}
    ),
    q AS (SELECT vec_id AS query_id, tbl, bucket, v AS qv FROM b WHERE vec_id < 5),
    cands AS (
        SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id, q.qv, b.v AS cv
        FROM q JOIN b ON q.tbl = b.tbl AND q.bucket = b.bucket
        WHERE q.query_id <> b.vec_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))), 6) AS cosine
        FROM cands
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
    FROM scored QUALIFY rank <= {_LSH_K}
"""


@register("ann_lsh_topk", _LSH_ORACLE)
def ann_lsh_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_topk(
        star.embeddings, queries, k=_LSH_K, dim=_LSH_DIM, query_id_col="query_id",
        n_planes=_LSH_PLANES, n_tables=_LSH_TABLES,
    ).withColumn("rank", F.col("rank").cast("int"))


# IVF ANN (KMeans coarse quantizer + nprobe cell probing): training is
# iterative → no SQL twin; rows-only check + recall test vs brute force.
# The coarse quantizer comes from the shared per-sf_dir model cache
# (same n_cells/seed as ann_ivfpq_topk) — train-once/serve-many.
@register("ann_ivf_topk")
def ann_ivf_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_topk(
        star.embeddings, queries, k=5, n_cells=8, nprobe=3,
        query_id_col="query_id", centroids=_ivf_centroids_cached(star),
    )


# Fixed-centroid IVF twin (r10, the embedding_fixed_basis_project
# precedent applied to the IVF family): the SAME production serving
# pipeline — similarity.ivf_topk's corpus nprobe=1 assignment, query
# nprobe=3 probing, cell join, map-side cosine, one-exchange
# rank-then-dedup tail — run over a FIXED literal coarse quantizer
# (md5-derived constants from similarity._hyperplane, seeds 100..107),
# so the entire end-to-end kernel value-hashes against DuckDB.  What
# keeps ann_ivf_topk itself rows-only is ONLY the KMeans training;
# every serving step is oracled here.  Spark folds L2 left-to-right
# from 0.0, the oracle list_sums the same squared diffs (DOUBLE[] both
# sides); dist only feeds the cell RANKING (ties broken by cell id on
# both sides), cosine rounds to 6 on both sides, top-k tie-breaks
# (cosine DESC, neighbor_id ASC).
_IVF_FIX_CELLS, _IVF_FIX_NPROBE, _IVF_FIX_K, _IVF_FIX_DIM = 8, 3, 5, 64
_IVF_FIX_CENTS = [
    S._hyperplane(_IVF_FIX_DIM, 100 + j) for j in range(_IVF_FIX_CELLS)
]

_IVF_FIX_CENT_ROWS = ",\n        ".join(
    f"({j}, [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])"
    for j, c in enumerate(_IVF_FIX_CENTS)
)

_IVF_FIX_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
        SELECT * FROM (VALUES
        {_IVF_FIX_CENT_ROWS}
        ) AS t(cell, cv)
    ),
    dists AS (
        SELECT e.vec_id, c.cell,
               list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
        FROM e CROSS JOIN cent c
    ),
    corpus_cell AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM dists
        ) WHERE rk = 1
    ),
    query_cells AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM dists WHERE vec_id < 5
        ) WHERE rk <= {_IVF_FIX_NPROBE}
    ),
    cands AS (
        SELECT DISTINCT q.query_id, cc.vec_id AS neighbor_id
        FROM query_cells q JOIN corpus_cell cc ON q.cell = cc.cell
        WHERE q.query_id <> cc.vec_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(eq.v, en.v)
                     / (sqrt(list_dot_product(eq.v, eq.v))
                        * sqrt(list_dot_product(en.v, en.v))), 6) AS cosine
        FROM cands JOIN e eq ON eq.vec_id = cands.query_id
                   JOIN e en ON en.vec_id = cands.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
    FROM scored QUALIFY rank <= {_IVF_FIX_K}
"""


@register("ann_ivf_fixed_centroids_topk", _IVF_FIX_ORACLE)
def ann_ivf_fixed_centroids_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_topk(
        star.embeddings, queries, k=_IVF_FIX_K, nprobe=_IVF_FIX_NPROBE,
        query_id_col="query_id", centroids=_IVF_FIX_CENTS,
    ).withColumn("rank", F.col("rank").cast("int"))


# Fixed-codebook PQ twin (r10, same precedent for the PQ family): the
# production pq_topk ADC pipeline — pq_encode's per-subspace argmin
# (array_position-of-min = FIRST-match, i.e. lowest-code tie-break),
# the broadcast per-query distance table, the m-lookup ADC sum, the
# top-4k shortlist (adc ASC, neighbor ASC), and the exact-cosine
# rerank — run over FIXED literal codebooks (md5-derived constants,
# seeds 200..263), so the entire encode/ADC/shortlist/rerank kernel
# value-hashes against DuckDB.  What keeps ann_pq_topk itself
# rows-only is ONLY the per-subspace KMeans fits.  ADC sums 4 doubles
# (Spark folds in subspace order, DuckDB SUMs) — order effects sit ~10
# orders of magnitude below the 6-dp round and ADC only SELECTS the
# shortlist; the output values are the reranked cosines, same parity
# story as the IVF twin.
_PQ_FIX_M, _PQ_FIX_NBITS, _PQ_FIX_K = 4, 4, 5
_PQ_FIX_SUB = _IVF_FIX_DIM // _PQ_FIX_M
_PQ_FIX_BOOKS = [
    [
        S._hyperplane(_PQ_FIX_SUB, 200 + j * (1 << _PQ_FIX_NBITS) + c)
        for c in range(1 << _PQ_FIX_NBITS)
    ]
    for j in range(_PQ_FIX_M)
]

_PQ_FIX_CB_ROWS = ",\n        ".join(
    f"({j}, {c}, [" + ", ".join(repr(x) for x in cent) + "]::DOUBLE[])"
    for j, book in enumerate(_PQ_FIX_BOOKS)
    for c, cent in enumerate(book)
)

_PQ_FIX_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
        SELECT * FROM (VALUES
        {_PQ_FIX_CB_ROWS}
        ) AS t(j, c, cv)
    ),
    dists AS (
        SELECT e.vec_id, cb.j, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_FIX_SUB}),
                        i -> (e.v[cb.j * {_PQ_FIX_SUB} + i] - cb.cv[i]) ^ 2))
                   AS dist
        FROM e CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, j, c FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                         ORDER BY dist, c) AS rk
            FROM dists
        ) WHERE rk = 1
    ),
    qd AS (
        SELECT vec_id AS query_id, j, c, dist FROM dists WHERE vec_id < 5
    ),
    adc AS (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               round(SUM(q.dist), 6) AS adc_dist
        FROM codes n JOIN qd q ON q.j = n.j AND q.c = n.c
        WHERE q.query_id <> n.vec_id
        GROUP BY 1, 2
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist ASC,
                                                  neighbor_id ASC) AS rk
            FROM adc
        ) WHERE rk <= {4 * _PQ_FIX_K}
    ),
    rescored AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_dot_product(eq.v, en.v)
                     / (sqrt(list_dot_product(eq.v, eq.v))
                        * sqrt(list_dot_product(en.v, en.v))), 6) AS cosine
        FROM short s JOIN e eq ON eq.vec_id = s.query_id
                     JOIN e en ON en.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
    FROM rescored QUALIFY rank <= {_PQ_FIX_K}
"""


@register("ann_pq_fixed_codebook_topk", _PQ_FIX_ORACLE)
def ann_pq_fixed_codebook_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.pq_topk(
        star.embeddings, queries, k=_PQ_FIX_K, dim=_IVF_FIX_DIM,
        m=_PQ_FIX_M, nbits=_PQ_FIX_NBITS, query_id_col="query_id",
        codebooks=_PQ_FIX_BOOKS,
    )


# Fixed-model IVFPQ twin (r10, completing the family): the production
# ivfpq_topk pipeline — IVF cell restriction of the candidate set
# (corpus nprobe=1, query nprobe=3) composed with the PQ ADC
# table-lookup scoring, shortlist, and exact-cosine rerank — over the
# SAME literal quantizer and codebooks as the two twins above, so the
# composed sublinear serving path value-hashes end-to-end.  With this,
# all three KMeans-trained ANN serving pipelines (IVF, PQ, IVFPQ) are
# oracled; only the fits themselves remain engine-specific.
_IVFPQ_FIX_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
        SELECT * FROM (VALUES
        {_IVF_FIX_CENT_ROWS}
        ) AS t(cell, cv)
    ),
    cdists AS (
        SELECT e.vec_id, c.cell,
               list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
        FROM e CROSS JOIN cent c
    ),
    corpus_cell AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM cdists
        ) WHERE rk = 1
    ),
    query_cells AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM cdists WHERE vec_id < 5
        ) WHERE rk <= {_IVF_FIX_NPROBE}
    ),
    cb AS (
        SELECT * FROM (VALUES
        {_PQ_FIX_CB_ROWS}
        ) AS t(j, c, cv)
    ),
    pdists AS (
        SELECT e.vec_id, cb.j, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_FIX_SUB}),
                        i -> (e.v[cb.j * {_PQ_FIX_SUB} + i] - cb.cv[i]) ^ 2))
                   AS dist
        FROM e CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, j, c FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                         ORDER BY dist, c) AS rk
            FROM pdists
        ) WHERE rk = 1
    ),
    qd AS (
        SELECT vec_id AS query_id, j, c, dist FROM pdists WHERE vec_id < 5
    ),
    cand AS (
        SELECT DISTINCT q.query_id, cc.vec_id AS neighbor_id
        FROM query_cells q JOIN corpus_cell cc ON q.cell = cc.cell
        WHERE q.query_id <> cc.vec_id
    ),
    adc AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(SUM(qd.dist), 6) AS adc_dist
        FROM cand JOIN codes n ON n.vec_id = cand.neighbor_id
                  JOIN qd ON qd.query_id = cand.query_id
                         AND qd.j = n.j AND qd.c = n.c
        GROUP BY 1, 2
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist ASC,
                                                  neighbor_id ASC) AS rk
            FROM adc
        ) WHERE rk <= {4 * _PQ_FIX_K}
    ),
    rescored AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_dot_product(eq.v, en.v)
                     / (sqrt(list_dot_product(eq.v, eq.v))
                        * sqrt(list_dot_product(en.v, en.v))), 6) AS cosine
        FROM short s JOIN e eq ON eq.vec_id = s.query_id
                     JOIN e en ON en.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
    FROM rescored QUALIFY rank <= {_PQ_FIX_K}
"""


@register("ann_ivfpq_fixed_models_topk", _IVFPQ_FIX_ORACLE)
def ann_ivfpq_fixed_models_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivfpq_topk(
        star.embeddings, queries, k=_PQ_FIX_K, dim=_IVF_FIX_DIM,
        nprobe=_IVF_FIX_NPROBE, m=_PQ_FIX_M, nbits=_PQ_FIX_NBITS,
        query_id_col="query_id", centroids=_IVF_FIX_CENTS,
        codebooks=_PQ_FIX_BOOKS,
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_stats",
    f"""
    SELECT doc_id,
           CAST(len({TOKENS_SQL.format(col='text')}) AS INT) AS n_distinct_tokens,
           CAST(len(list_filter(string_split_regex({NORM_SQL.format(col='text')},
                '[^\\p{{L}}\\p{{N}}]+'), t -> t <> '')) AS INT) AS n_tokens,
           length(text) AS n_chars_raw,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[^ a-zA-Z0-9]')) AS INT) AS n_punct,
           CAST(len(regexp_extract_all(text, '\\p{{L}}+|\\p{{N}}|[^\\s\\p{{L}}\\p{{N}}]'))
                + floor(length(text) / 16) AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
)
def text_stats(star: Star) -> DataFrame:
    d = star.documents
    return d.select(
        "doc_id",
        F.size(F.array_distinct(X.tokens("text"))).alias("n_distinct_tokens"),
        F.size(X.tokens("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.regexp_count("text", F.lit("[0-9]")).alias("n_digits"),
        F.regexp_count("text", F.lit("[^ a-zA-Z0-9]")).alias("n_punct"),
        X.bpe_ish_token_count("text").alias("n_bpe_ish"),
    )


_SW = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "una", "por", "con"],
}


def _sw_hits_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _SW[lang])
    return (
        f"len(list_filter(list_filter(string_split_regex({NORM_SQL.format(col='text')},"
        f" '[^\\p{{L}}\\p{{N}}]+'), t -> t <> ''), t -> list_contains([{arr}], t)))"
    )


@register(
    "lang_id_heuristic",
    f"""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               {" , ".join(f"CAST({_sw_hits_sql(lang)} AS INT) AS hits_{lang}" for lang in _SW)}
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, labeled_lang,
               (SELECT max({{'hits': h, 'lang': l}})
                FROM (VALUES (hits_en, 'en'), (hits_de, 'de'),
                             (hits_fr, 'fr'), (hits_es, 'es')) AS t(h, l)) AS best
        FROM scored
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS detected_lang
    FROM ranked
    """,
)
def lang_id_heuristic(star: Star) -> DataFrame:
    # NOTE: Spark detect_lang takes max over structs (hits, lang) — ties
    # resolve to the lexicographically larger lang on equal hits, matching
    # the SQL max() over structs above.
    return star.documents.select(
        "doc_id", "lang", X.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.detect_lang_from(F.col("_toks")).alias("detected_lang"),
    )


# SQL twin of functions.text.quality_score — same bands, same weights,
# double arithmetic in the same order for bit parity.  Kept as a CTE
# block so cluster-survivor queries can reuse it.
_EN_SW = ", ".join(f"'{w}'" for w in _SW["en"])
_QUALITY_CTES = f"""
    feat AS (
        SELECT doc_id,
               length(text) AS n,
               {TOKSEQ_SQL.format(col='text')} AS toks,
               CAST(len(regexp_extract_all(text, '[^\\s\\p{{L}}\\p{{N}}]')) AS DOUBLE) AS n_punct,
               CAST(len(regexp_extract_all(text, '\\p{{N}}')) AS DOUBLE) AS n_digit
        FROM documents
    ),
    feat2 AS (
        SELECT doc_id, n, n_punct, n_digit,
               CAST(len(toks) AS DOUBLE) AS ntok,
               CAST(len(list_filter(toks, t -> list_contains([{_EN_SW}], t))) AS DOUBLE) AS sw_hits,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS tok_chars
        FROM feat
    ),
    ratios AS (
        SELECT doc_id, n,
               CASE WHEN ntok > 0 THEN sw_hits / ntok ELSE 0.0 END AS sw_ratio,
               CASE WHEN n > 0 THEN n_punct / CAST(n AS DOUBLE) ELSE 0.0 END AS punct_r,
               CASE WHEN n > 0 THEN n_digit / CAST(n AS DOUBLE) ELSE 0.0 END AS digit_r,
               CASE WHEN ntok > 0 THEN tok_chars / ntok ELSE 0.0 END AS mwl
        FROM feat2
    ),
    quality AS (
        SELECT doc_id,
               round((
                   (CASE WHEN n >= 100 AND n <= 20000 THEN 1.0
                         WHEN n >= 20 THEN 0.5 ELSE 0.0 END)
                 + least(sw_ratio * 4.0, 1.0)
                 + (CASE WHEN punct_r < 0.2 THEN 1.0 ELSE 0.3 END)
                 + (CASE WHEN digit_r < 0.3 THEN 1.0 ELSE 0.3 END)
                 + (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.4 END)
               ) / 5.0, 4) AS quality
        FROM ratios
    )
"""
_QUALITY_SQL = f"WITH {_QUALITY_CTES} SELECT doc_id, quality FROM quality"


@register("quality_scores", _QUALITY_SQL)
def quality_scores(star: Star) -> DataFrame:
    return star.documents.select(
        "doc_id", "text", X.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        X.quality_score_from(F.col("text"), F.col("_toks")).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Learned quality classifier (operators.linear_model): the CCNet/LLaMA
# "wiki-ref"-style linear filter — train once (full-batch logistic GD,
# ONE gradient aggregate per iteration, driver transfer bounded by the
# feature count), score the corpus map-side.  Training is rows-only
# (iterative GD — same family as the KMeans/eigensolve internals);
# serving over FROZEN literal weights is value-hashed end-to-end, the
# fixed-model precedent of the PCA/IVF/PQ families.  The frozen weights
# below are one 60-iteration sf0.01 fit of the long-form label
# (n_chars > 300) from token stats — the label is synthetic-corpus
# scaffolding; the verified artifact is the train/serve kernel.
# ---------------------------------------------------------------------------

_QC_FEATS = ["n_tokens", "n_distinct_tokens", "sw_en"]
_QC_MODEL = {
    "weights": {
        "n_tokens": 0.128879,
        "n_distinct_tokens": 0.369726,
        "sw_en": 0.319028,
    },
    "intercept": -16.551366,
}


def _qc_features(star: Star) -> DataFrame:
    return star.documents.select(
        "doc_id",
        F.size(X.tokens("text")).alias("n_tokens"),
        F.size(F.array_distinct(X.tokens("text"))).alias("n_distinct_tokens"),
        X.stopword_hits("text", "en").alias("sw_en"),
        (F.length("text") > 300).cast("int").alias("y"),
    )


@register("quality_classifier_train")
def quality_classifier_train(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.linear_model import logreg_train

    feats = _qc_features(star).persist()
    try:
        model = logreg_train(feats, _QC_FEATS, "y", iterations=12, lr=1.5)
    finally:
        feats.unpersist()
    spark = star.documents.sparkSession
    rows = [(c, float(w)) for c, w in model["weights"].items()]
    rows.append(("_intercept", float(model["intercept"])))
    return spark.createDataFrame(rows, "feature string, weight double")


_QC_Z_SQL = "round({b} + {terms}, 6)".format(
    b=_QC_MODEL["intercept"],
    terms=" + ".join(
        f"{_QC_MODEL['weights'][c]} * {c}" for c in _QC_FEATS
    ),
)


@register(
    "quality_classifier_score_fixed",
    f"""
    WITH f AS (
        SELECT doc_id,
               CAST(len({TOKSEQ_SQL.format(col='text')}) AS DOUBLE) AS n_tokens,
               CAST(len({TOKENS_SQL.format(col='text')}) AS DOUBLE) AS n_distinct_tokens,
               CAST({_sw_hits_sql('en')} AS DOUBLE) AS sw_en
        FROM documents
    ),
    z AS (SELECT doc_id, {_QC_Z_SQL} AS logit FROM f)
    SELECT doc_id, logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS score,
           logit > 0 AS pred
    FROM z
    """,
)
def quality_classifier_score_fixed(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.linear_model import logreg_score

    return logreg_score(
        _qc_features(star).drop("y"), _QC_MODEL
    ).select("doc_id", "logit", "score", "pred")


# Rolling-hash SQL twin (functions.text.rolling_fingerprint): fold
# (acc*31 + codepoint) % (2^31-1) over the normalized characters.
# list_reduce has no initial-accumulator form, so 0 is prepended.
_ROLLING_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length({norm})), "
    "i -> CAST(ascii(substr({norm}, CAST(i AS INT), 1)) AS BIGINT))), "
    f"(acc, x) -> (acc * {X.ROLLING_BASE} + x) % {X.ROLLING_MOD})"
)


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           substr(md5({NORM_SQL.format(col='text')}), 1, 16) AS fp16,
           {_hash64_sql(NORM_SQL.format(col='text'), 7)} AS fp_long,
           {_ROLLING_SQL.format(norm=NORM_SQL.format(col='text'))} AS fp_rolling
    FROM documents
    """,
)
def doc_fingerprints(star: Star) -> DataFrame:
    return star.documents.select(
        "doc_id",
        F.substring(X.md5_fingerprint("text"), 1, 16).alias("fp16"),
        X.hash64(X.normalize_text("text"), seed=7).alias("fp_long"),
        X.rolling_fingerprint("text").alias("fp_rolling"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; Spark-side schema/batching real).
# The registered query EXPLODES the 8-dim feature array to scalar
# (media_id, n_bytes, pos, val) rows — the driver's canonicalizer sorts
# pandas columns and cannot hash array cells — and casts val to DOUBLE
# (np.float32 is not a Python float, so it would bypass the harness's
# %.6f rounding).  FakeDecoder's byte histogram IS SQL-expressible, so
# this gets a full value-hash oracle: hex(encode(text)) exposes each
# UTF-8 byte as a hex pair, whose LOW nibble mod 8 equals byte mod 8;
# the float32 quantization that Arrow applies to the mapInPandas output
# is replicated with CAST(.. AS REAL) so both engines carry identical
# bits into the hash.  Library users keep the array-returning
# extract_features API; exact per-value tests in tests/test_multimodal.py.
# ---------------------------------------------------------------------------

_MULTIMODAL_SQL = """
    WITH enc AS (
      SELECT doc_id, upper(hex(encode(text))) AS h,
             COALESCE(octet_length(encode(text)), 0) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, h, n, unnest(generate_series(1, n)) AS i
      FROM enc WHERE n > 0
    ),
    counts AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF', substr(h, CAST(2*i AS INT), 1)) - 1) % 8 AS pos,
             COUNT(*) AS cnt
      FROM bytes GROUP BY 1, 2
    ),
    slots AS (SELECT unnest(generate_series(0, 7)) AS pos)
    SELECT e.doc_id AS media_id,
           CAST(e.n AS BIGINT) AS n_bytes,
           CAST(s.pos AS INT) AS pos,
           CAST(CAST(CAST(COALESCE(c.cnt, 0) AS DOUBLE)
                / CAST(GREATEST(e.n, 1) AS DOUBLE) AS REAL) AS DOUBLE) AS val
    FROM enc e CROSS JOIN slots s
    LEFT JOIN counts c ON c.doc_id = e.doc_id AND c.pos = s.pos
"""


# Real audio modality: synth_wav_media emits genuine RIFF/WAVE PCM bytes
# parameterized by doc_id; the Spark side PARSES them back with stdlib
# wave+struct (operators.multimodal.decode_wav_meta) while the oracle
# computes every field closed-form from doc_id — a differential test of
# the real decode path (header offsets, frame unpacking, sample math);
# any misparse breaks the value hash.  Standard PCM header = 44 bytes.
@register(
    "audio_meta_wav",
    """
    SELECT doc_id AS media_id,
           CAST(44 + 2 * (100 + doc_id % 400) AS BIGINT) AS n_bytes,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
           CAST(((100 + doc_id % 400) * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(doc_id % 1000 + 1 AS DOUBLE) AS rms_amplitude,
           CAST(doc_id % 1000 + 1 AS INT) AS peak_amplitude
    FROM documents
    """,
)
def audio_meta_wav(star: Star) -> DataFrame:
    return MM.extract_wav_meta(MM.synth_wav_media(star.documents))


@register("multimodal_features", _MULTIMODAL_SQL)
def multimodal_features(star: Star) -> DataFrame:
    media = MM.synth_media(star.documents)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id", "n_bytes", F.posexplode("feature").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


# ---------------------------------------------------------------------------
# Corpus stats at multiple grains in ONE pass: ROLLUP (lang, source) →
# per-(lang, source), per-lang, and grand-total rows from a single scan
# and a single shuffle — the multi-grain reporting shape a 100 TB corpus
# audit needs (running three separate group-bys re-scans the corpus
# three times).  grouping_id disambiguates subtotal rows; NULL group
# keys are labeled '(all)'.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Embedding centroids per label, in long format (label, pos, mean_val):
# posexplode → groupBy(label, pos) → exact decimal mean.  The long-format
# formulation is the scale path for vector aggregation — it uses the
# stock shuffle/agg machinery (partial aggregation, AQE) instead of a
# UDAF holding a dim-width buffer, and reassembling with
# array_agg-sorted-by-pos is a cheap follow-up when an array is wanted.
# Means divide a decimal-exact sum in double, so both engines compute
# bit-identically (modulo half-up/half-even casting ties ~1e-12, far
# below the gate's 6-decimal hash rounding).
# ---------------------------------------------------------------------------

@register(
    "embedding_centroids",
    """
    SELECT label, pos,
           CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS val,
                 generate_subscripts(embedding, 1) - 1 AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embedding_centroids(star: Star) -> DataFrame:
    return (
        star.embeddings.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# Symmetric int8 embedding quantization (functions.vectors.quantize_int8):
# floor(x*127/max|x| + 0.5) — floor, not round, so half-way semantics are
# IEEE-identical across engines and the codes hash-match exactly.
# Output is scalar-ized (vec_id, pos, q, scale): the driver canonicalizer
# cannot hash array cells.
# ---------------------------------------------------------------------------

@register(
    "embedding_quantize_int8",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS mx
        FROM e
    ),
    codes AS (
        SELECT vec_id, mx,
               list_transform(v, x -> CASE WHEN mx > 0
                   THEN CAST(floor(x * (127.0 / mx) + 0.5) AS INT)
                   ELSE 0 END) AS q
        FROM m
    )
    SELECT vec_id,
           CASE WHEN mx > 0 THEN round(mx / 127.0, 6) ELSE 0.0 END AS scale,
           CAST(generate_subscripts(q, 1) - 1 AS INT) AS pos,
           unnest(q) AS q
    FROM codes
    """,
)
def embedding_quantize_int8(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.functions import vectors as V

    return star.embeddings.select(
        "vec_id",
        F.round(V.dequant_scale("embedding"), 6).alias("scale"),
        F.posexplode(V.quantize_int8("embedding")).alias("pos", "q"),
    )


# ---------------------------------------------------------------------------
# Exact quantiles (corpus length profiling): interpolated percentiles per
# language.  Spark `percentile` and DuckDB `quantile_cont` both compute
# the linear-interpolation estimate over the sorted values — verified
# bit-identical, so this gets a full hash oracle.  At 100 TB exact
# percentiles need a global sort per group; this query is the exact
# companion to `approx_corpus_profile` (the scale path).
# ---------------------------------------------------------------------------

@register(
    "corpus_length_quantiles",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.9)  AS p90
    FROM documents GROUP BY lang
    """,
)
def corpus_length_quantiles(star: Star) -> DataFrame:
    return star.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_chars, 0.25)").alias("p25"),
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
    )


# ---------------------------------------------------------------------------
# Approximate aggregates — the 100 TB path for distinct counts and
# quantiles: HyperLogLog++ (approx_count_distinct) and KLL-style sketch
# (approx_percentile) are single-pass, mergeable, fixed-memory sketches;
# exact distinct/percentile need a shuffle of every distinct value / a
# per-group sort.  Sketch internals are engine-specific → no SQL twin
# (rows-only driver check); the error bound vs the exact companions is
# gated in tests/test_temporal_sampling.py.
# ---------------------------------------------------------------------------

@register("approx_corpus_profile")
def approx_corpus_profile(star: Star) -> DataFrame:
    return star.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("text", rsd=0.02).alias("approx_distinct_texts"),
        F.percentile_approx("n_chars", 0.5, 10_000).alias("approx_p50_chars"),
        F.percentile_approx("n_chars", 0.9, 10_000).alias("approx_p90_chars"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (operators.sampling.hash_split):
# content-addressed md5 bucketing, not rand() — assignment is a stable
# contract that survives retries, re-runs, and late-arriving shards.
# ---------------------------------------------------------------------------

@register(
    "train_test_split",
    f"""
    SELECT doc_id,
           CAST({_hash64_sql('CAST(doc_id AS VARCHAR)', 11)} % 100 AS BIGINT) AS bucket,
           CASE WHEN {_hash64_sql('CAST(doc_id AS VARCHAR)', 11)} % 100 < 80 THEN 'train'
                WHEN {_hash64_sql('CAST(doc_id AS VARCHAR)', 11)} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_test_split(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import hash_split

    return hash_split(star.documents, "doc_id", seed=11).select("doc_id", "bucket", "split")


# ---------------------------------------------------------------------------
# Weighted corpus mix (operators.sampling.stratified_sample_fraction):
# per-language sampling fractions applied via a content-addressed hash
# threshold — a stateless scan-side filter, NO shuffle/window/rand, so
# re-runs keep identical membership.  This is the source/language
# re-weighting pass of a training-data mix.
# ---------------------------------------------------------------------------

_MIX = {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.1}
_MIX_CASE = "CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {int(f * 1_000_000)}" for s, f in sorted(_MIX.items())
) + " ELSE 0 END"


@register(
    "corpus_weighted_mix",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_hash64_sql('CAST(doc_id AS VARCHAR)', 23)} % 1000000 < {_MIX_CASE}
    """,
)
def corpus_weighted_mix(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import stratified_sample_fraction

    return stratified_sample_fraction(
        star.documents, "lang", _MIX, key="doc_id"
    ).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Per-stratum cap (operators.sampling.stratum_cap): at most N docs per
# language, selected by content-addressed hash order — exact count
# bound, retry-stable membership.
# ---------------------------------------------------------------------------

_CAP_N = 40

@register(
    "stratum_cap_by_lang",
    f"""
    SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('cap31:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= {_CAP_N}
    """,
)
def stratum_cap_by_lang(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import stratum_cap

    return stratum_cap(star.documents, "lang", _CAP_N).select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (operators.sampling.pack_by_offset):
# shard → deterministic order → cumulative offset → fixed-budget bin id.
# The distributed form of context-window packing; one window pass.
# ---------------------------------------------------------------------------

_PACK_BUDGET, _PACK_SHARDS = 2048, 8

@register(
    "doc_pack_offset",
    f"""
    SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard, n_chars,
           CAST(SUM(n_chars) OVER w - n_chars AS BIGINT) AS start_offset,
           CAST(floor((SUM(n_chars) OVER w - n_chars) / {_PACK_BUDGET}) AS BIGINT) AS bin
    FROM documents
    WINDOW w AS (PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def doc_pack_offset(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import pack_by_offset

    sized = star.documents.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).alias("shard"), "n_chars"
    )
    return pack_by_offset(
        sized, "n_chars", budget=_PACK_BUDGET, shard_col="shard", order_by=["doc_id"]
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (operators.sampling.epoch_shuffle): the
# training-loader ordering pass — every epoch a fresh, reproducible
# pseudorandom global order, computed as one hash exchange + per-shard
# sort (never a global sort, never rand()).  The oracle replays the
# exact permutation from the portable seeded-md5 shuffle key.
# ---------------------------------------------------------------------------

_EPOCH, _EPOCH_SEED, _EPOCH_SHARDS = 3, 17, 8

# ONE ring definition shared by both companion oracles
# (epoch_shuffle_order / ring_negatives_pairs are defined as the SAME
# ring — a single fragment keeps them bit-identical under edits, the
# TOKSEQ_SQL/_TOKS_CTE convention):
_RING_CTE = f"""
    hk AS (
        SELECT doc_id,
               {_hash64_sql(f"concat('e{_EPOCH}|', CAST(doc_id AS VARCHAR))", _EPOCH_SEED)} AS k
        FROM documents
    ),
    ring AS (
        SELECT doc_id, k % {_EPOCH_SHARDS} AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY k % {_EPOCH_SHARDS} ORDER BY k, doc_id
               ) AS pos
        FROM hk
    )
"""

@register(
    "epoch_shuffle_order",
    f"""
    WITH {_RING_CTE}
    SELECT doc_id, shard, pos AS pos_in_shard,
           (pos - 1) * {_EPOCH_SHARDS} + shard AS global_order
    FROM ring
    """,
)
def epoch_shuffle_order(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    return epoch_shuffle(
        star.documents.select("doc_id"), "doc_id",
        epoch=_EPOCH, seed=_EPOCH_SEED, n_shards=_EPOCH_SHARDS,
    ).select("doc_id", "shard", "pos_in_shard", "global_order")


# ---------------------------------------------------------------------------
# Ring negative sampling (operators.sampling.ring_negatives): k
# deterministic pseudorandom negatives per anchor for contrastive
# training — steps along the epoch-shuffle ring instead of rand() or an
# N×N join.  Broadcast shard sizes + ONE narrow self-equi-join on
# (shard, pos); output exactly k·N rows minus single-row-shard
# self-pairs.  The oracle replays the full pairing.
# ---------------------------------------------------------------------------

_RING_K = 2

@register(
    "ring_negatives_pairs",
    f"""
    WITH {_RING_CTE},
    sz AS (SELECT shard, COUNT(*) AS n FROM ring GROUP BY shard),
    probes AS (
        SELECT r.doc_id AS anchor, r.shard, j.j,
               ((r.pos - 1 + j.j) % s.n) + 1 AS neg_pos
        FROM ring r
        JOIN sz s USING (shard)
        CROSS JOIN (SELECT unnest(generate_series(1, {_RING_K})) AS j) j
        WHERE ((r.pos - 1 + j.j) % s.n) + 1 <> r.pos
    )
    SELECT p.anchor, r2.doc_id AS negative, CAST(p.j AS INT) AS j
    FROM probes p
    JOIN ring r2 ON r2.shard = p.shard AND r2.pos = p.neg_pos
    """,
)
def ring_negatives_pairs(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import ring_negatives

    return ring_negatives(
        star.documents.select("doc_id"), "doc_id",
        k=_RING_K, epoch=_EPOCH, seed=_EPOCH_SEED, n_shards=_EPOCH_SHARDS,
    )


# ---------------------------------------------------------------------------
# PII scrub (functions.text.redact_pii): emails / SSNs / phone numbers
# redacted with typed placeholders, plus per-class audit counts.  PII is
# injected deterministically from doc_id so both engines scrub the same
# dirty text; chained regexp_replace stays in whole-stage codegen.
# ---------------------------------------------------------------------------

_PII_DIRTY_SQL = """
    SELECT doc_id,
           text || ' Contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' SSN 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS t
    FROM documents
"""


@register(
    "pii_scrub",
    f"""
    WITH dirty AS ({_PII_DIRTY_SQL})
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{X.EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{X.SSN_RE}')) AS INT) AS n_ssn,
           CAST(len(regexp_extract_all(t, '{X.PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{X.EMAIL_RE}', '<EMAIL>', 'g'),
               '{X.SSN_RE}', '<SSN>', 'g'),
               '{X.PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM dirty
    """,
)
def pii_scrub(star: Star) -> DataFrame:
    dirty = star.documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(1000)).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" SSN 987-65-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return dirty.select(
        "doc_id", *X.pii_counts("t"), X.redact_pii("t").alias("redacted")
    )


@register(
    "corpus_stats_rollup",
    """
    SELECT coalesce(lang, '(all)') AS lang,
           coalesce(source, '(all)') AS source,
           CAST(GROUPING(lang, source) AS INT) AS gid,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
    """,
)
def corpus_stats_rollup(star: Star) -> DataFrame:
    return (
        star.documents.rollup("lang", "source")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            F.coalesce("source", F.lit("(all)")).alias("source"),
            "gid", "n_docs", "total_chars", "max_chars",
        )
    )


# ---------------------------------------------------------------------------
# Shared near-dup INDEX: the verified MinHash/LSH pair graph and its
# connected-component labeling are corpus artifacts, not per-query work —
# a production dedup pipeline materializes them ONCE (a parquet edge/label
# table) and serves every downstream curation and audit query from the
# same index.  The catalog mirrors that literally: the index is a
# DURABLE content-addressed parquet artifact (sources.artifacts, keyed
# by corpus file listing + sketch params), built by the first query that
# ever needs it on this machine and served as a plain parquet scan by
# every later query — including cold sessions (r8 verdict #2).  The
# process-local cache below only saves the re-read within a session;
# synthetic in-memory stars (nothing to fingerprint) fall back to a
# per-session localCheckpoint build.
# ---------------------------------------------------------------------------

_near_dup_index_cache: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_near_dup_index_builds = 0  # test hook: number of sketch+CC builds


def _near_dup_index(star: Star) -> tuple[DataFrame, DataFrame]:
    """(verified pair graph, component labeling) for star.documents.

    Same three-tier serving as ``_sem_index``: process cache → durable
    content-addressed artifact (cold sessions read parquet) → build +
    commit.  Synthetic stars build in-process only."""
    global _near_dup_index_builds
    spark = star.documents.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect has no sparkContext
        app_id = str(id(spark))
    key = (app_id, star.sf_dir)
    if key not in _near_dup_index_cache:
        from sap_data_pipeline_spark.sources import artifacts as A

        def build() -> dict[str, DataFrame]:
            global _near_dup_index_builds
            _near_dup_index_builds += 1
            pairs = D.minhash_dedup_pairs(star.documents).localCheckpoint(
                eager=True
            )
            cc = D.connected_components(star.documents.select("doc_id"), pairs)
            return {"pairs": pairs, "cc": cc}

        fp = A.corpus_fingerprint(
            getattr(star, "sf_dir", "") or "", "documents",
            params=f"minhash|perm={D.NUM_PERM}|band={D.BAND_SIZE}"
                   f"|shingle={D.SHINGLE_N}|cap={D.LSH_MAX_BUCKET}",
        )
        if fp is None:
            built = build()
            _near_dup_index_cache[key] = (
                built["pairs"],
                built["cc"].localCheckpoint(eager=True),
            )
        else:
            frames = A.load_or_build(spark, "near_dup_index", fp, build)
            _near_dup_index_cache[key] = (frames["pairs"], frames["cc"])
    return _near_dup_index_cache[key]


# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: LSH pairs → connected components → canonical survivor.
# The step pairwise dedup output needs before anything can be dropped
# (near-dups chain: A~B~C with A≁C must still land in one cluster).  The
# oracle replays the pair generation verbatim, then closes it with a
# recursive CTE — the fixpoint (min reachable id) is unique, so Spark's
# iterative min-label propagation and DuckDB's transitive closure agree
# exactly regardless of iteration strategy.
# ---------------------------------------------------------------------------

@register(
    "near_dup_clusters",
    f"""
    WITH RECURSIVE {_CAND_CTE},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM cands
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM cands
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM edges e JOIN reach r ON r.src = e.dst
    ),
    comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    sizes AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           c.doc_id = c.cluster_id AS is_canonical
    FROM comp c JOIN sizes s USING (cluster_id)
    """,
)
def near_dup_clusters_q(star: Star) -> DataFrame:
    _, cc = _near_dup_index(star)
    return D.near_dup_clusters(star.documents, cc=cc)


# ---------------------------------------------------------------------------
# Training-window chunking (operators.corpus.chunk_documents): sliding
# token windows, zero shuffles.  Budget 64 / overlap 16 → step 48.
# ---------------------------------------------------------------------------

_CHUNK_BUDGET, _CHUNK_STEP = 64, 48

@register(
    "chunk_documents",
    f"""
    WITH toklists AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    nz AS (
        SELECT doc_id, t, len(t) AS n FROM toklists WHERE len(t) > 0
    ),
    starts AS (
        SELECT doc_id, t, n,
               unnest(generate_series(0, n - 1, {_CHUNK_STEP})) AS start_tok
        FROM nz
    )
    SELECT doc_id,
           CAST(start_tok // {_CHUNK_STEP} AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(len(list_slice(t, start_tok + 1,
                               least(start_tok + {_CHUNK_BUDGET}, n))) AS INT)
               AS n_chunk_tokens,
           array_to_string(list_slice(t, start_tok + 1,
                                      least(start_tok + {_CHUNK_BUDGET}, n)), ' ')
               AS chunk_text
    FROM starts
    """,
)
def chunk_documents_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import chunk_documents

    return chunk_documents(star.documents, budget=_CHUNK_BUDGET,
                           overlap=_CHUNK_BUDGET - _CHUNK_STEP)


# ---------------------------------------------------------------------------
# HTML → text extraction (functions.text.extract_text_html): docs are
# wrapped in deterministic HTML (script/style blocks, tags, entities)
# and the SAME strip/decode chain runs on both engines — differential
# evidence for the web-scrape front door.  RE2-safe patterns ('g' flag
# on the DuckDB side: Spark replaces all matches by default, DuckDB only
# the first).
# ---------------------------------------------------------------------------

_HTML_WRAP_SQL = """
    SELECT doc_id,
           '<html><head><script>var x = ' || CAST(doc_id AS VARCHAR)
           || ';</script><style>.c{color:red}</style></head><body><h1>Doc '
           || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
           || '</p><a href="https://example.com/' || CAST(doc_id AS VARCHAR)
           || '">link &amp; more &lt;here&gt;</a>&nbsp;</body></html>' AS html
    FROM documents
"""

@register(
    "html_text_extract",
    f"""
    WITH wrapped AS ({_HTML_WRAP_SQL}),
    stripped AS (
        SELECT doc_id,
               replace(replace(replace(replace(replace(replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                           '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                       '<[^>]+>', ' ', 'g'),
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS s
        FROM wrapped
    )
    SELECT doc_id,
           trim(regexp_replace(s, '\\s+', ' ', 'g')) AS clean_text,
           CAST(length(trim(regexp_replace(s, '\\s+', ' ', 'g'))) AS INT) AS n_chars
    FROM stripped
    """,
)
def html_text_extract(star: Star) -> DataFrame:
    wrapped = star.documents.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><script>var x = "),
            F.col("doc_id").cast("string"),
            F.lit(";</script><style>.c{color:red}</style></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit('</p><a href="https://example.com/'),
            F.col("doc_id").cast("string"),
            F.lit('">link &amp; more &lt;here&gt;</a>&nbsp;</body></html>'),
        ).alias("html"),
    )
    clean = X.extract_text_html("html")
    return wrapped.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("int").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# URL components (functions.text.url_host/url_path/url_query_param):
# deterministic URLs from (source, lang, doc_id); identical regexes on
# both engines (Spark parse_url has engine-specific semantics — avoided).
# ---------------------------------------------------------------------------

_URL_SQL = """
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang || '&q=' || CAST(doc_id % 13 AS VARCHAR) AS url
    FROM documents
"""

@register(
    "url_components",
    f"""
    WITH u AS ({_URL_SQL})
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param
    FROM u
    """,
)
def url_components(star: Star) -> DataFrame:
    u = star.documents.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&q="), F.pmod(F.col("doc_id"), F.lit(13)).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        X.url_host("url").alias("host"),
        X.url_path("url").alias("path"),
        X.url_query_param("url", "lang").alias("lang_param"),
        X.url_query_param("url", "q").alias("q_param"),
    )


# ---------------------------------------------------------------------------
# C4-style line dedup (operators.corpus.dedup_lines): lines occurring
# >= 2 times corpus-wide are dropped.  The synthetic docs have no line
# structure, so boilerplate lines are injected deterministically from
# doc_id (same differential pattern as pii_scrub): a header shared by
# every doc and a footer shared by each doc_id % 7 class — both must be
# removed, the unique body must survive, and the accounting must match.
# ---------------------------------------------------------------------------

_LINE_DIRTY_SQL = """
    SELECT doc_id,
           'SHARED HEADER BOILERPLATE' || chr(10) || text || chr(10)
               || 'footer block ' || CAST(doc_id % 7 AS VARCHAR) AS t
    FROM documents
"""

@register(
    "line_dedup_c4",
    f"""
    WITH dirty AS ({_LINE_DIRTY_SQL}),
    lines AS (
        SELECT doc_id,
               generate_subscripts(string_split(t, chr(10)), 1) - 1 AS idx,
               unnest(string_split(t, chr(10))) AS line
        FROM dirty
    ),
    counted AS (
        SELECT doc_id, idx, line,
               COUNT(*) OVER (PARTITION BY line) AS cnt
        FROM lines
    )
    SELECT doc_id,
           COALESCE(string_agg(line, chr(10) ORDER BY idx)
                        FILTER (WHERE cnt < 2), '') AS cleaned_text,
           CAST(COUNT(*) FILTER (WHERE cnt < 2) AS BIGINT) AS n_lines_kept,
           CAST(COUNT(*) FILTER (WHERE cnt >= 2) AS BIGINT) AS n_lines_removed
    FROM counted
    GROUP BY doc_id
    """,
)
def line_dedup_c4_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import dedup_lines

    dirty = star.documents.select(
        "doc_id",
        F.concat(
            F.lit("SHARED HEADER BOILERPLATE\n"),
            F.col("text"),
            F.lit("\nfooter block "),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        ).alias("text"),
    )
    return dedup_lines(dirty)


# ---------------------------------------------------------------------------
# Corpus-wide top n-grams (operators.corpus.top_ngrams): heavy-hitter
# vocabulary pass; ties break to the smaller n-gram so the top-k cut is
# deterministic on both engines.
# ---------------------------------------------------------------------------

_TOPNG_K = 20

@register(
    "top_bigrams",
    f"""
    WITH grams AS (
        SELECT unnest(list_transform(
                   generate_series(1, greatest(len(t) - 1, 0)),
                   i -> t[i] || ' ' || t[i + 1])) AS ngram
        FROM (SELECT {TOKSEQ_SQL.format(col='text')} AS t FROM documents)
    )
    SELECT ngram, COUNT(*) AS n_occurrences
    FROM grams GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram ASC
    LIMIT {_TOPNG_K}
    """,
)
def top_bigrams_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import top_ngrams

    return top_ngrams(star.documents, n=2, k=_TOPNG_K)


# ---------------------------------------------------------------------------
# TF-IDF top terms (operators.corpus.tf_idf_top_terms): scores rounded
# to 6 decimals BEFORE ranking on both sides so a 1-ulp ln() difference
# cannot reorder the boundary; ties break to the smaller term.
# ---------------------------------------------------------------------------

_TFIDF_K = 5

@register(
    "tfidf_top_terms",
    f"""
    WITH terms AS (
        SELECT doc_id, unnest({TOKSEQ_SQL.format(col='text')}) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term
    ),
    doclen AS (
        SELECT doc_id, SUM(cnt) AS n_toks FROM tf GROUP BY doc_id
    ),
    dfreq AS (
        SELECT term, COUNT(*) AS n_docs_with FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round((CAST(cnt AS DOUBLE) / CAST(n_toks AS DOUBLE))
                     * ln((n_docs + 1.0) / (CAST(n_docs_with AS DOUBLE) + 1.0)),
                     6) AS tf_idf
        FROM tf JOIN doclen USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf_idf,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tf_idf DESC, term ASC) AS INT) AS rank
    FROM scored QUALIFY rank <= {_TFIDF_K}
    """,
)
def tfidf_top_terms_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import tf_idf_top_terms

    return tf_idf_top_terms(star.documents, k=_TFIDF_K)


# ---------------------------------------------------------------------------
# JSONL corpus front door, end-to-end: materialize a JSONL dump from the
# documents table (deterministically corrupted — doc_id % 101 == 0 →
# blank line, else doc_id % 53 == 0 → truncated JSON), push it through
# the REAL file path (text write → sources.readers.read_jsonl_corpus →
# PERMISSIVE from_json → clean/quarantine split), and report per-lang
# totals plus the quarantine count.  The oracle computes the same
# accounting closed-form from doc_id — a misrouted line (e.g. a blank
# line loading as an all-NULL row) breaks the value hash.
# ---------------------------------------------------------------------------

@register(
    "jsonl_corpus_roundtrip",
    """
    WITH clean AS (
        SELECT lang, n_chars FROM documents
        WHERE doc_id % 101 <> 0 AND doc_id % 53 <> 0
    ),
    agg AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM clean GROUP BY lang
    ),
    quar AS (
        SELECT '(quarantined)' AS lang, COUNT(*) AS n_docs,
               CAST(0 AS BIGINT) AS total_chars
        FROM documents WHERE doc_id % 101 = 0 OR doc_id % 53 = 0
    )
    SELECT * FROM agg UNION ALL SELECT * FROM quar
    """,
)
def jsonl_corpus_roundtrip(star: Star) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_jsonl_corpus

    spark = star.documents.sparkSession
    lines = star.documents.select(
        F.when(F.pmod("doc_id", F.lit(101)) == 0, F.lit(""))
        .when(
            F.pmod("doc_id", F.lit(53)) == 0,
            F.concat(F.lit('{"broken '), F.col("doc_id").cast("string")),
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
        .alias("value")
    )
    dump_dir = tempfile.mkdtemp(prefix="jsonl_corpus_fixture_")
    lines.write.mode("overwrite").text(dump_dir)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    clean, quarantine = read_jsonl_corpus(spark, dump_dir, schema)
    agg = clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    quar = quarantine.agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.lit("(quarantined)").alias("lang"),
        F.col("n_docs"),
        F.lit(0).cast("long").alias("total_chars"),
    )
    return agg.unionAll(quar)


# ---------------------------------------------------------------------------
# Quality-preferring cluster survivor: keep the BEST-scoring doc per
# near-dup component (ties → smallest id), not the arbitrary min-id one.
# quality_score is closed-form, so the survivor set is SQL-expressible:
# window rank over the score within the recursive-CTE components.
# ---------------------------------------------------------------------------

@register(
    "keep_best_per_cluster",
    f"""
    WITH RECURSIVE {_CAND_CTE},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM cands
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM cands
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM edges e JOIN reach r ON r.src = e.dst
    ),
    comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    {_QUALITY_CTES},
    ranked AS (
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality DESC, d.doc_id ASC) AS rk
        FROM documents d
        JOIN comp c ON c.doc_id = d.doc_id
        JOIN quality q ON q.doc_id = d.doc_id
    )
    SELECT doc_id, lang, source, n_chars FROM ranked WHERE rk = 1
    """,
)
def keep_best_per_cluster_q(star: Star) -> DataFrame:
    pairs, cc = _near_dup_index(star)
    survivors = D.keep_best_per_cluster(star.documents, pairs, cc=cc)
    return survivors.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: bit-banded bucketing + exact Hamming verify.
# With max_hamming < n_bands the pigeonhole principle guarantees every
# true near-pair shares a band, so banding loses nothing; the oracle
# replays the sketch, the banding, and the bit_count(xor) verify.
# ---------------------------------------------------------------------------

# 32-bit sketch for the PAIRS operator (the 16-bit sketch query above
# keeps its width for sketch-value continuity): on a shared-vocabulary
# corpus, Hamming ≤ 3 of 16 bits admits most of the all-pairs space,
# while 3 of 32 is selective.  8-bit bands × 4 keep the pigeonhole
# guarantee (max_hamming < n_bands).
_SH_PAIR_BITS = 32
_SH_BANDS, _SH_WIDTH = 4, _SH_PAIR_BITS // 4
_SH_MASK = (1 << _SH_WIDTH) - 1
_SH_MAX_HAMMING = 3

_SH_BAND_SELECTS = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band, "
    f"CAST((sh >> {b * _SH_WIDTH}) & {_SH_MASK} AS VARCHAR) AS bkey FROM sk"
    for b in range(_SH_BANDS)
)

@register(
    "simhash_near_dup_pairs",
    f"""
    WITH {_TOKS_CTE},
    hashed AS (
        SELECT doc_id, {_hash64_sql('tok', 0)} AS h0 FROM toks
    ),
    bitsums AS (
        SELECT doc_id,
               {_simhash_sums(_SH_PAIR_BITS)}
        FROM hashed GROUP BY doc_id
    ),
    sk AS (
        SELECT doc_id, CAST({_simhash_sketch(_SH_PAIR_BITS)} AS BIGINT) AS sh
        FROM bitsums
    ),
    shbands AS (
{_SH_BAND_SELECTS}
    ),
    shkept AS (
        SELECT doc_id, band, bkey FROM shbands
        QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= {D.LSH_MAX_BUCKET}
    ),
    shcands AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM shkept l JOIN shkept r ON l.band = r.band AND l.bkey = r.bkey
        WHERE l.doc_id < r.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM shcands c
    JOIN sk a ON a.doc_id = c.id_a
    JOIN sk b ON b.doc_id = c.id_b
    WHERE bit_count(xor(a.sh, b.sh)) <= {_SH_MAX_HAMMING}
    """,
)
def simhash_near_dup_pairs_q(star: Star) -> DataFrame:
    return D.simhash_near_dup_pairs(
        star.documents, bits=_SH_PAIR_BITS, n_bands=_SH_BANDS,
        max_hamming=_SH_MAX_HAMMING,
    )


# 64-bit PRODUCTION variant (operator default): Hamming ≤ 3 of 64 bits
# bounds emitted-pair volume — the one quadratic-OUTPUT risk on
# homogeneous corpora that the bucket cap (compute-side) cannot bound.
# Sketch bits ≥ 60 come from a second seeded hash word; bit 63 is the
# sign bit (negative addend) — see operators.dedup.simhash.
_SH64_BITS = 64
_SH64_WIDTH = _SH64_BITS // _SH_BANDS
_SH64_MASK = (1 << _SH64_WIDTH) - 1

_SH64_BAND_SELECTS = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band, "
    f"CAST((sh >> {b * _SH64_WIDTH}) & {_SH64_MASK} AS VARCHAR) AS bkey FROM sk"
    for b in range(_SH_BANDS)
)

@register(
    "simhash_near_dup_pairs64",
    f"""
    WITH {_TOKS_CTE},
    {_simhash_hashed_cte(_SH64_BITS)},
    bitsums AS (
        SELECT doc_id,
               {_simhash_sums(_SH64_BITS)}
        FROM hashed GROUP BY doc_id
    ),
    sk AS (
        SELECT doc_id, CAST({_simhash_sketch(_SH64_BITS)} AS BIGINT) AS sh
        FROM bitsums
    ),
    shbands AS (
{_SH64_BAND_SELECTS}
    ),
    shkept AS (
        SELECT doc_id, band, bkey FROM shbands
        QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= {D.LSH_MAX_BUCKET}
    ),
    shcands AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM shkept l JOIN shkept r ON l.band = r.band AND l.bkey = r.bkey
        WHERE l.doc_id < r.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM shcands c
    JOIN sk a ON a.doc_id = c.id_a
    JOIN sk b ON b.doc_id = c.id_b
    WHERE bit_count(xor(a.sh, b.sh)) <= {_SH_MAX_HAMMING}
    """,
)
def simhash_near_dup_pairs64_q(star: Star) -> DataFrame:
    return D.simhash_near_dup_pairs(star.documents)  # production defaults


# ---------------------------------------------------------------------------
# Benchmark contamination: corpus docs sharing word n-grams with a held-out
# benchmark set (docs with doc_id % 97 == 0 stand in for the eval suite).
# The benchmark n-gram set is broadcast; the probe is a map-side semi-join.
# ---------------------------------------------------------------------------

_BENCH_MOD = 97

@register(
    "benchmark_contamination",
    f"""
    WITH {_SHINGLES_CTE},
    bench AS (
        SELECT DISTINCT tok FROM shingles WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corp AS (
        SELECT doc_id, tok FROM shingles WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS n FROM corp
        WHERE tok IN (SELECT tok FROM bench)
        GROUP BY doc_id
    ),
    tot AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM corp GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated,
           round(CAST(COALESCE(h.n, 0) AS DOUBLE)
                 / CAST(t.n_shingles AS DOUBLE), 6) AS contamination_frac
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
)
def benchmark_contamination_q(star: Star) -> DataFrame:
    is_bench = F.pmod(F.col("doc_id"), F.lit(_BENCH_MOD)) == 0
    return D.ngram_contamination(
        star.documents.filter(~is_bench), star.documents.filter(is_bench)
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher/C4 duplicate-text filters): duplicate-word
# fraction, top-word share, top-bigram share — per-row higher-order array
# expressions, zero shuffles (see functions.text.repetition_stats).
# ---------------------------------------------------------------------------

_REP_T = TOKSEQ_SQL.format(col="text")
_REP_BIGRAM = (
    "list_transform(generate_series(1, greatest(len(t) - 1, 0)), "
    "i -> t[i] || ' ' || t[i + 1])"
)
_TOPCOUNT = (
    "list_max(list_transform(list_distinct({arr}), "
    "u -> len(list_filter({arr}, x -> x = u))))"
)

@register(
    "repetition_stats",
    f"""
    WITH toklists AS (
        SELECT doc_id, {_REP_T} AS t FROM documents
    ),
    arrs AS (
        SELECT doc_id, t, {_REP_BIGRAM} AS bg FROM toklists
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_words,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_words,
           CASE WHEN len(t) > 0 THEN round(
               CAST(len(t) - len(list_distinct(t)) AS DOUBLE)
               / CAST(len(t) AS DOUBLE), 6) ELSE 0.0 END AS dup_word_frac,
           CASE WHEN len(t) > 0 THEN round(
               CAST({_TOPCOUNT.format(arr='t')} AS DOUBLE)
               / CAST(len(t) AS DOUBLE), 6) ELSE 0.0 END AS top_word_frac,
           CASE WHEN len(bg) > 0 THEN round(
               CAST({_TOPCOUNT.format(arr='bg')} AS DOUBLE)
               / CAST(len(bg) AS DOUBLE), 6) ELSE 0.0 END AS top_bigram_frac
    FROM arrs
    """,
)
def repetition_stats_q(star: Star) -> DataFrame:
    # Tiered projections: tokenize once, derive bigrams from the token
    # array, THEN compute the metrics — each tier's alias is non-cheap
    # and multiply-referenced, so CollapseProject keeps the tiers and
    # the scan-side tokenizer runs once per row, not once per metric.
    toks = star.documents.select("doc_id", X.tokens("text").alias("_t"))
    arrs = toks.select("doc_id", "_t", X.ngrams_from(F.col("_t"), 2).alias("_bg"))
    return arrs.select(
        "doc_id", *X.repetition_stats(F.col("_t"), F.col("_bg"))
    )


# ---------------------------------------------------------------------------
# Real image modality: synth_bmp_media emits genuine 24-bit BMP bytes
# parameterized by doc_id (w = 4 + id%13, h = 3 + id%7, channel byte at
# (r, c, ch) = (id + 11r + 5c + ch) % 256); the Spark side PARSES them
# back with struct+numpy (operators.multimodal.decode_bmp_pixels) while
# the oracle computes every field closed-form — a differential test of
# the real decode path (header offsets, 4-byte row stride, bottom-up row
# order).  BMP size = 54-byte headers + stride*h, stride = ceil(3w/4)*4.
# ---------------------------------------------------------------------------

_BMP_DIMS_CTE = """
    dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
        FROM documents
    ),
    rr AS (SELECT unnest(generate_series(0, 8)) AS r),
    cc AS (SELECT unnest(generate_series(0, 15)) AS c),
    chs AS (SELECT unnest(generate_series(0, 2)) AS ch)
"""


@register(
    "image_meta_bmp",
    f"""
    WITH {_BMP_DIMS_CTE},
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 11 * rr.r + 5 * cc.c + chs.ch) % 256 AS v
        FROM dims d, rr, cc, chs
        WHERE rr.r < d.h AND cc.c < d.w
    )
    SELECT d.doc_id AS media_id,
           CAST(54 + ((3 * d.w + 3) // 4) * 4 * d.h AS BIGINT) AS n_bytes,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(24 AS INT) AS bits_per_pixel,
           CAST(SUM(p.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma,
           CAST(MAX(p.v) AS INT) AS max_luma
    FROM dims d JOIN px p ON p.doc_id = d.doc_id
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def image_meta_bmp(star: Star) -> DataFrame:
    return MM.extract_image_meta(MM.synth_bmp_media(star.documents))


# Decode → nearest-neighbor resize to 8×5 → re-encode → decode again:
# the resized pixel at (r2, c2) is the exact source pixel at
# ((r2*h)//5, (c2*w)//8), so the oracle stays closed-form through the
# whole transform chain.  Position-DEPENDENT by construction — this is
# the query that pins stride padding and bottom-up row order (a flipped
# or sheared decode changes which pixels the gather picks).
@register(
    "image_resize_meta",
    f"""
    WITH {_BMP_DIMS_CTE},
    r2 AS (SELECT unnest(generate_series(0, 4)) AS r),
    c2 AS (SELECT unnest(generate_series(0, 7)) AS c),
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 11 * ((r2.r * d.h) // 5)
                + 5 * ((c2.c * d.w) // 8) + chs.ch) % 256 AS v
        FROM dims d, r2, c2, chs
    )
    SELECT doc_id AS media_id,
           CAST(54 + 24 * 5 AS BIGINT) AS n_bytes,
           CAST(8 AS INT) AS width,
           CAST(5 AS INT) AS height,
           CAST(24 AS INT) AS bits_per_pixel,
           CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma,
           CAST(MAX(v) AS INT) AS max_luma
    FROM px
    GROUP BY doc_id
    """,
)
def image_resize_meta(star: Star) -> DataFrame:
    media = MM.resize_images(MM.synth_bmp_media(star.documents), width=8, height=5)
    return MM.extract_image_meta(media)


# ---------------------------------------------------------------------------
# Real video modality: synth_y4m_media emits genuine YUV4MPEG2 streams
# (the standard raw-video interchange format) parameterized by doc_id
# (w = 8 + 2(id%5), h = 6 + 2(id%3), nf = 2 + id%6 frames at 25 fps,
# luma at (f, r, c) = (id + 17f + 3r + c) % 256, C420 chroma constant);
# the Spark side PARSES them back (operators.multimodal.decode_y4m)
# while the oracle computes every field closed-form — differential test
# of header-tag parsing, FRAME walking, and C420 plane arithmetic.
# Stream bytes = len("YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n") +
# nf * (len("FRAME\n") + w*h*3/2).
# ---------------------------------------------------------------------------

_Y4M_DIMS_CTE = """
    vdims AS (
        SELECT doc_id,
               8 + 2 * (doc_id % 5) AS w,
               6 + 2 * (doc_id % 3) AS h,
               2 + doc_id % 6 AS nf
        FROM documents
    ),
    vf AS (SELECT unnest(generate_series(0, 7)) AS f),
    vr AS (SELECT unnest(generate_series(0, 9)) AS r),
    vc AS (SELECT unnest(generate_series(0, 15)) AS c)
"""


@register(
    "video_meta_y4m",
    f"""
    WITH {_Y4M_DIMS_CTE},
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 17 * vf.f + 3 * vr.r + vc.c) % 256 AS v
        FROM vdims d, vf, vr, vc
        WHERE vf.f < d.nf AND vr.r < d.h AND vc.c < d.w
    )
    SELECT d.doc_id AS media_id,
           CAST(33 + len(CAST(d.w AS VARCHAR)) + len(CAST(d.h AS VARCHAR))
                + d.nf * (6 + d.w * d.h * 3 // 2) AS BIGINT) AS n_bytes,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(25 AS INT) AS fps_num,
           CAST(1 AS INT) AS fps_den,
           CAST(d.nf AS INT) AS n_frames,
           CAST(d.nf * 40 AS BIGINT) AS duration_ms,
           CAST(SUM(p.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma
    FROM vdims d JOIN px p ON p.doc_id = d.doc_id
    GROUP BY d.doc_id, d.w, d.h, d.nf
    """,
)
def video_meta_y4m(star: Star) -> DataFrame:
    return MM.extract_video_meta(MM.synth_y4m_media(star.documents))


# Evenly-spaced REAL frame sampling (k = min(3, nf), source frame
# idx = (i·nf)//k) + per-frame luma stats; the sampled frame's pixel
# values stay closed-form through the sample → raw-plane → stats chain.
@register(
    "video_frame_sample",
    f"""
    WITH {_Y4M_DIMS_CTE},
    samples AS (
        SELECT d.doc_id, d.w, d.h, d.nf,
               (vf.f * d.nf) // least(3, d.nf) AS fidx
        FROM vdims d, vf
        WHERE vf.f < least(3, d.nf)
    ),
    px AS (
        SELECT s.doc_id, s.fidx, s.w, s.h,
               (s.doc_id + 17 * s.fidx + 3 * vr.r + vc.c) % 256 AS v
        FROM samples s, vr, vc
        WHERE vr.r < s.h AND vc.c < s.w
    )
    SELECT doc_id AS media_id,
           CAST(fidx AS INT) AS frame_idx,
           CAST(w * h AS BIGINT) AS n_frame_bytes,
           CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frame_mean
    FROM px
    GROUP BY doc_id, fidx, w, h
    """,
)
def video_frame_sample(star: Star) -> DataFrame:
    frames = MM.sample_video_frames(MM.synth_y4m_media(star.documents), n_frames=3)
    return MM.frame_stats(frames)


# ---------------------------------------------------------------------------
# Corpus mixture planning (operators.sampling.mixture_plan): solve the
# per-language sampling fractions that hit a target domain mix by
# downsampling only — T = min_s available_s / share_s, take_s = share_s·T.
# ONE aggregation shuffle to stratum grain; the solve runs on the
# stratum-sized frame.  The apply twin keeps membership content-addressed
# (hash64 buckets, no rand()) with the plan broadcast into a map-side
# filter — the corpus-side pass is shuffle-free.  Both engines compute
# the fraction with the identical op order (share · T / available,
# round 6) so the rounded doubles — and therefore the kept-row sets —
# are bit-identical.
# ---------------------------------------------------------------------------

_TARGET_MIX = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_MIX_SHARE_CASE = "CASE stratum " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in sorted(_TARGET_MIX.items())
) + " ELSE CAST(0.0 AS DOUBLE) END"

_MIX_PLAN_CTE = f"""
    avail AS (
        SELECT lang AS stratum, CAST(SUM(n_chars) AS DOUBLE) AS available
        FROM documents GROUP BY lang
    ),
    planned AS (
        SELECT stratum, available, {_MIX_SHARE_CASE} AS target_share
        FROM avail
    ),
    tt AS (
        SELECT MIN(available / target_share) AS _t
        FROM planned WHERE target_share > 0
    ),
    mix_plan AS (
        SELECT stratum, available, target_share,
               round(target_share * _t, 6) AS take_weight,
               round(CASE WHEN target_share > 0
                          THEN target_share * _t / available
                          ELSE CAST(0.0 AS DOUBLE) END, 6) AS sampling_fraction
        FROM planned, tt
    )
"""


@register(
    "corpus_mixture_plan",
    f"WITH {_MIX_PLAN_CTE} SELECT * FROM mix_plan",
)
def corpus_mixture_plan(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import mixture_plan

    return mixture_plan(star.documents, "lang", _TARGET_MIX, weight_col="n_chars")


@register(
    "corpus_mixture_apply",
    f"""
    WITH {_MIX_PLAN_CTE}
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN mix_plan p ON p.stratum = d.lang
    WHERE {_hash64_sql('CAST(d.doc_id AS VARCHAR)', 23)} % 1000000
          < p.sampling_fraction * 1000000
    """,
)
def corpus_mixture_apply(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan,
        mixture_plan,
    )

    plan = mixture_plan(star.documents, "lang", _TARGET_MIX, weight_col="n_chars")
    return apply_mixture_plan(star.documents, plan, "lang", key="doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Upsampling mixture apply (operators.sampling.
# apply_mixture_plan_with_repetition): the epochs-per-source mix of the
# GPT-3/LLaMA recipes — scarce strata REPEAT (fraction 2.5 = 2 copies +
# a deterministic hash-selected 50% third) while bulk strata downsample,
# in one broadcast-join + map-side explode pass.  Fractions are
# binary-exact literals so the hash threshold is bit-identical across
# engines.  The `copy` column distinguishes repeats downstream.
# ---------------------------------------------------------------------------

_UPMIX = {"en": 0.25, "de": 2.5, "fr": 1.75, "es": 1.0, "zh": 3.0}
_UPMIX_FRAC_CASE = "CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {f}" for s, f in sorted(_UPMIX.items())
) + " ELSE 0.0 END"


@register(
    "corpus_mixture_upsampled",
    f"""
    WITH f AS (
        SELECT doc_id, lang, n_chars,
               {_UPMIX_FRAC_CASE} AS frac,
               {_hash64_sql('CAST(doc_id AS VARCHAR)', 23)} % 1000000 AS bucket
        FROM documents
    ),
    t AS (
        SELECT doc_id, lang, n_chars,
               CAST(floor(frac) AS BIGINT)
               + CASE WHEN bucket < (frac - floor(frac)) * 1000000
                      THEN 1 ELSE 0 END AS total
        FROM f
    )
    SELECT doc_id, lang, n_chars,
           unnest(generate_series(1, total)) AS copy
    FROM t WHERE total >= 1
    """,
)
def corpus_mixture_upsampled(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan_with_repetition,
    )

    spark = star.documents.sparkSession
    plan = spark.createDataFrame(
        sorted(_UPMIX.items()), "stratum string, sampling_fraction double"
    )
    return apply_mixture_plan_with_repetition(
        star.documents.select("doc_id", "lang", "n_chars"),
        plan, "lang", key="doc_id",
    ).select("doc_id", "lang", "n_chars", "copy")


# ---------------------------------------------------------------------------
# Perplexity-proxy scoring (operators.corpus.unigram_logprob): mean
# -ln(c_term / N) per document under the corpus's own unigram LM — the
# CCNet-style quality filter.  Both engines compute the score with the
# identical op order (cnt · -ln(c/N), summed, / doc tokens, round 6) so
# a 1-ulp ln difference cannot move the rounded value.
# ---------------------------------------------------------------------------

@register(
    "unigram_logprob_scores",
    f"""
    WITH terms AS (
        SELECT doc_id, unnest({TOKSEQ_SQL.format(col='text')}) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term
    ),
    cfreq AS (SELECT term, SUM(cnt) AS c_term FROM tf GROUP BY term),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM tf)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           round(SUM(CAST(cnt AS DOUBLE)
                     * -ln(CAST(c_term AS DOUBLE) / n_total))
                 / SUM(CAST(cnt AS DOUBLE)), 6) AS avg_neg_logprob
    FROM tf JOIN cfreq USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def unigram_logprob_scores(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import unigram_logprob

    return unigram_logprob(star.documents)


# ---------------------------------------------------------------------------
# Span-level decontamination (operators.dedup.decontaminate_spans):
# remove each benchmark-overlapping n-gram span ± context tokens from
# the normalized token stream instead of dropping the whole document.
# Same doc_id % 97 bench/corpus split as benchmark_contamination; the
# oracle rebuilds drop-sets with 1-based list indexes (Spark uses
# 0-based array indexes — both sides stay index-consistent internally).
# ---------------------------------------------------------------------------

_DECON_CTX = 2

@register(
    "decontaminate_spans",
    f"""
    WITH {_SHINGLES_CTE},
    bench AS (
        SELECT DISTINCT tok FROM shingles WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corp AS (
        SELECT doc_id, t FROM doctoklists WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    positions AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {D.SHINGLE_N - 1}, 0))) AS i
        FROM corp
    ),
    hitpos AS (
        SELECT doc_id, i FROM positions
        WHERE ({_SHINGLE_CONCAT}) IN (SELECT tok FROM bench)
    ),
    dropsets AS (
        SELECT doc_id, list_distinct(flatten(list(drange))) AS dp
        FROM (
            SELECT doc_id,
                   generate_series(greatest(i - {_DECON_CTX}, 1),
                                   i + {D.SHINGLE_N - 1} + {_DECON_CTX}) AS drange
            FROM hitpos
        ) GROUP BY doc_id
    ),
    kept AS (
        SELECT c.doc_id, c.t,
               CASE WHEN dp IS NULL THEN c.t
                    ELSE list_filter(c.t, (x, j) -> NOT list_contains(dp, j))
               END AS k
        FROM corp c LEFT JOIN dropsets USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(k) AS BIGINT) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
           -- (same edge as exact_substring_excise's oracle): a fully
           -- decontaminated document keeps clean_text = '' on both sides
           COALESCE(array_to_string(k, ' '), '') AS clean_text
    FROM kept
    """,
)
def decontaminate_spans_q(star: Star) -> DataFrame:
    is_bench = F.pmod(F.col("doc_id"), F.lit(_BENCH_MOD)) == 0
    return D.decontaminate_spans(
        star.documents.filter(~is_bench),
        star.documents.filter(is_bench),
        context=_DECON_CTX,
    )


# ---------------------------------------------------------------------------
# Mixed-media dump front door (operators.multimodal.sniff_media_meta):
# magic-byte dispatch to the three REAL decoders + unknown-kind
# quarantine rows, over a doc_id % 4 rotation of WAV / BMP / Y4M / raw
# bytes.  Each branch's oracle reuses the single-modality closed forms.
# ---------------------------------------------------------------------------

@register(
    "media_sniff_dispatch",
    f"""
    WITH {_BMP_DIMS_CTE},
    {_Y4M_DIMS_CTE},
    bpx AS (
        SELECT d.doc_id,
               (d.doc_id + 11 * rr.r + 5 * cc.c + chs.ch) % 256 AS v
        FROM dims d, rr, cc, chs
        WHERE rr.r < d.h AND cc.c < d.w AND d.doc_id % 4 = 1
    ),
    bmp_stats AS (
        SELECT doc_id, CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lvl
        FROM bpx GROUP BY doc_id
    ),
    vpx AS (
        SELECT d.doc_id,
               (d.doc_id + 17 * vf.f + 3 * vr.r + vc.c) % 256 AS v
        FROM vdims d, vf, vr, vc
        WHERE vf.f < d.nf AND vr.r < d.h AND vc.c < d.w AND d.doc_id % 4 = 2
    ),
    y4m_stats AS (
        SELECT doc_id, CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lvl
        FROM vpx GROUP BY doc_id
    )
    SELECT doc_id AS media_id, 'wav' AS kind,
           CAST(44 + 2 * (100 + doc_id % 400) AS BIGINT) AS n_bytes,
           CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(8000 AS INT) AS sample_rate,
           CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
           CAST(((100 + doc_id % 400) * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(doc_id % 1000 + 1 AS DOUBLE) AS mean_level
    FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT d.doc_id, 'bmp',
           CAST(54 + ((3 * d.w + 3) // 4) * 4 * d.h AS BIGINT),
           CAST(d.w AS INT), CAST(d.h AS INT),
           CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           s.lvl
    FROM dims d JOIN bmp_stats s ON s.doc_id = d.doc_id
    WHERE d.doc_id % 4 = 1
    UNION ALL
    SELECT d.doc_id, 'y4m',
           CAST(33 + len(CAST(d.w AS VARCHAR)) + len(CAST(d.h AS VARCHAR))
                + d.nf * (6 + d.w * d.h * 3 // 2) AS BIGINT),
           CAST(d.w AS INT), CAST(d.h AS INT),
           CAST(NULL AS INT), CAST(d.nf AS BIGINT), CAST(d.nf * 40 AS BIGINT),
           s.lvl
    FROM vdims d JOIN y4m_stats s ON s.doc_id = d.doc_id
    WHERE d.doc_id % 4 = 2
    UNION ALL
    SELECT doc_id, 'unknown',
           CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT),
           CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM documents WHERE doc_id % 4 = 3
    """,
)
def media_sniff_dispatch(star: Star) -> DataFrame:
    return MM.sniff_media_meta(MM.synth_mixed_media(star.documents))


# Curriculum binning (operators.sampling.curriculum_bins): approx-
# percentile cutpoints (GK sketch, one aggregate) re-entering as a
# literal CASE ladder — sketch cutpoints have no cross-engine twin →
# rows-only check; occupancy/ordering bounds are test-gated.
@register("curriculum_deciles")
def curriculum_deciles(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import curriculum_bins

    scored = star.documents.select(
        "doc_id", "text", X.tokens("text").alias("_toks")
    ).select(
        "doc_id", X.quality_score_from(F.col("text"), F.col("_toks")).alias("q")
    )
    return curriculum_bins(scored, "q", n_bins=10)


# ---------------------------------------------------------------------------
# Binary-quantized ANN (operators.similarity.binary_quantize /
# hamming_topk): sign bits packed MSB-first into two positive BIGINT
# words (32 bits each — same signed-range discipline as 64-bit SimHash),
# neighbors ranked by bit_count(xor) Hamming distance.  Integer-exact
# on both engines → full value-hash oracle.
# ---------------------------------------------------------------------------

_SIGN_WORD_SQL = (
    "CAST(list_sum(list_transform(generate_series(1, 32), "
    "i -> CASE WHEN embedding[{off} + i] > 0 "
    "THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "ann_hamming_topk",
    f"""
    WITH packed AS (
        SELECT vec_id,
               {_SIGN_WORD_SQL.format(off=0)} AS w0,
               {_SIGN_WORD_SQL.format(off=32)} AS w1
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
          FROM packed WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               CAST(bit_count(xor(q.qw0, c.w0))
                    + bit_count(xor(q.qw1, c.w1)) AS INT) AS hamming
        FROM q CROSS JOIN packed c
        WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, hamming, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY hamming ASC, neighbor_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_hamming_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.hamming_topk(
        star.embeddings, queries, k=5, query_id_col="query_id", dim=64
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (operators.corpus.count_min_cells / count_min_probe):
# fixed-memory mergeable term-frequency sketch.  md5-based hashes make
# the sketch itself reproducible in DuckDB, so the estimates (not just
# the ≥-exact contract) are value-hash-checked: probe the exact top-20
# terms and emit exact vs estimate side by side.
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_SEED = 4, 1024, 41

_CMS_HASHES = ", ".join(
    f"{_hash64_sql('term', _CMS_SEED + d)} % {_CMS_W}" for d in range(_CMS_D)
)


@register(
    "cms_term_frequencies",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({TOKSEQ_SQL.format(col='text')}) AS tok
        FROM documents
    ),
    exact AS (
        SELECT tok AS term, COUNT(*) AS exact_cnt FROM toks GROUP BY tok
    ),
    top AS (
        SELECT term, exact_cnt FROM exact
        ORDER BY exact_cnt DESC, term ASC LIMIT 20
    ),
    keyed AS (
        SELECT term, unnest([{_CMS_HASHES}]) AS bucket,
               unnest(generate_series(0, {_CMS_D - 1})) AS row
        FROM (SELECT tok AS term FROM toks)
    ),
    cells AS (
        SELECT row, bucket, COUNT(*) AS cnt FROM keyed GROUP BY row, bucket
    ),
    probe AS (
        SELECT t.term, unnest([{_CMS_HASHES.replace('term', 't.term')}]) AS bucket,
               unnest(generate_series(0, {_CMS_D - 1})) AS row
        FROM top t
    )
    SELECT p.term, t.exact_cnt,
           CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_estimate
    FROM probe p
    JOIN top t ON t.term = p.term
    LEFT JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
    GROUP BY p.term, t.exact_cnt
    """,
)
def cms_term_frequencies(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import (
        count_min_cells,
        count_min_probe,
    )

    toks = star.documents.select(F.explode(X.tokens("text")).alias("term"))
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(20)
    )
    cells = count_min_cells(star.documents, depth=_CMS_D, width=_CMS_W,
                            seed=_CMS_SEED)
    est = count_min_probe(cells, top.select("term"), depth=_CMS_D,
                          width=_CMS_W, seed=_CMS_SEED)
    return top.join(est, "term").select("term", "exact_cnt", "cms_estimate")


# ---------------------------------------------------------------------------
# WARC corpus front door (sources/warc.py): Common Crawl's format, parsed
# with stdlib only (per-record gzip members via zlib, Content-Length
# record walking).  The round-trip query builds real .warc.gz bytes from
# the documents table executor-side (one multi-record file per doc_id
# % 25 group, plus warcinfo records readers must skip), pushes them
# through the REAL parse path, and the oracle is the documents table
# itself — closed form: HTTP head is 60 bytes + the UTF-8 body.
# ---------------------------------------------------------------------------

@register(
    "warc_corpus_roundtrip",
    """
    SELECT doc_id,
           CAST(200 AS INT) AS http_status,
           'text/plain; charset=utf-8' AS content_type,
           COALESCE(text, '') AS body,
           CAST(60 + octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS n_payload_bytes
    FROM documents
    """,
)
def warc_corpus_roundtrip(star: Star) -> DataFrame:
    import pandas as pd

    from sap_data_pipeline_spark.sources import warc as W

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [
            (f"http://synth.example/{int(did)}", txt if txt is not None else "")
            for did, txt in zip(pdf["doc_id"], pdf["text"])
        ]
        fid = int(pdf["fid"].iloc[0])
        return pd.DataFrame({
            "source_file": [f"mem://part-{fid}.warc.gz"],
            "payload": [W.build_warc_bytes(recs, gzip_members=True)],
        })

    files = (
        star.documents.select("doc_id", "text")
        .withColumn("fid", F.pmod("doc_id", F.lit(25)))
        .groupBy("fid")
        .applyInPandas(build, "source_file string, payload binary")
    )
    parsed = W.parse_warc_frames(files).filter(F.col("record_type") == "response")
    return parsed.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        "http_status",
        "content_type",
        F.col("body"),
        "n_payload_bytes",
    )


# The complete Common Crawl ingestion path: .warc.gz bytes → record
# explosion → HTML text extraction → clean corpus rows.  Bodies are
# HTML-wrapped executor-side; the oracle applies only the extractor's
# whitespace collapse to the source text.
@register(
    "warc_html_to_corpus",
    r"""
    SELECT doc_id,
           trim(regexp_replace(COALESCE(text, ''), '\s+', ' ', 'g')) AS text
    FROM documents
    """,
)
def warc_html_to_corpus(star: Star) -> DataFrame:
    import pandas as pd

    from sap_data_pipeline_spark.sources import warc as W

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [
            (
                f"http://synth.example/{int(did)}",
                "<html><head><title></title><style>p{}</style></head>"
                f"<body><p>{txt if txt is not None else ''}</p></body></html>",
            )
            for did, txt in zip(pdf["doc_id"], pdf["text"])
        ]
        fid = int(pdf["fid"].iloc[0])
        return pd.DataFrame({
            "source_file": [f"mem://part-{fid}.warc.gz"],
            "payload": [W.build_warc_bytes(recs, gzip_members=True)],
        })

    files = (
        star.documents.select("doc_id", "text")
        .withColumn("fid", F.pmod("doc_id", F.lit(25)))
        .groupBy("fid")
        .applyInPandas(build, "source_file string, payload binary")
    )
    parsed = W.parse_warc_frames(files).filter(F.col("record_type") == "response")
    return parsed.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        X.extract_text_html("body").alias("text"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension versioning (operators.merge.scd2_apply): two
# deterministic update batches over the customer dim — batch 1 seeds the
# history at 2024-01-01; batch 2 (2024-02-01) raises acctbal by 10 for
# custkey % 3 == 0.  Closed form: those keys carry a closed v1 and an
# open v2; everyone else keeps one open v1.
# ---------------------------------------------------------------------------

@register(
    "scd2_customer_history",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           '2024-01-01' AS valid_from,
           CASE WHEN c_custkey % 3 = 0 THEN '2024-02-01' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DOUBLE) + 10.0,
           '2024-02-01', NULL
    FROM customer WHERE c_custkey % 3 = 0
    """,
)
def scd2_customer_history(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.merge import scd2_apply

    base = star.customer.select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double")
    )
    batch1 = base.withColumn("eff", F.lit("2024-01-01"))
    batch2 = base.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal")),
    ).withColumn("eff", F.lit("2024-02-01"))
    h1 = scd2_apply(None, batch1, keys=["c_custkey"],
                    tracked=["c_mktsegment", "c_acctbal"], effective="eff")
    return scd2_apply(h1, batch2, keys=["c_custkey"],
                      tracked=["c_mktsegment", "c_acctbal"], effective="eff")


# ---------------------------------------------------------------------------
# Active-user retention rollup: DAU + trailing-7-day WAU per day.  The
# trailing-distinct is the classic scale trap — a windowed
# COUNT(DISTINCT) cannot partial-aggregate — so each distinct
# (day, user) pair fans out to the ≤7 window-END days it contributes to
# (BOUNDED fan-out) and both grains reduce with stock two-phase exact
# distinct aggregation.  Window-end days beyond the observed range are
# clipped via a broadcast max-day scalar.
# ---------------------------------------------------------------------------

@register(
    "events_dau_wau",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    hi AS (SELECT max(day) AS hi FROM du),
    dau AS (
        SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day
    ),
    fan AS (
        SELECT du.user_id, du.day + CAST(x.i AS INT) AS wday
        FROM du, (SELECT unnest(generate_series(0, 6)) AS i) x
    ),
    wau AS (
        SELECT wday, COUNT(DISTINCT user_id) AS wau_7d
        FROM fan, hi WHERE wday <= hi
        GROUP BY wday
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau_7d AS BIGINT) AS wau_7d
    FROM dau JOIN wau ON wau.wday = dau.day
    """,
)
def events_dau_wau(star: Star) -> DataFrame:
    du = star.events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    hi = du.agg(F.max("day").alias("_hi"))
    wau = (
        du.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("wday"),
            "user_id",
        )
        .crossJoin(F.broadcast(hi))
        .filter(F.col("wday") <= F.col("_hi"))
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    return dau.join(wau, dau["day"] == wau["wday"]).select(
        F.date_format(dau["day"], "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau_7d").cast("long").alias("wau_7d"),
    )


# Retention cohort matrix: users grouped by first-activity day, counted
# per trailing week offset — one distinct pass + a broadcast-joined
# per-user cohort frame + one (cohort, offset) aggregate.
@register(
    "events_retention_cohorts",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    cohort AS (
        SELECT user_id, min(day) AS cohort_day FROM du GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST((du.day - c.cohort_day) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_active
    FROM du JOIN cohort c USING (user_id)
    GROUP BY c.cohort_day, week_offset
    """,
)
def events_retention_cohorts(star: Star) -> DataFrame:
    du = star.events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    cohort = du.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        du.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.floor(F.datediff("day", "cohort_day") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis (signup → view → click → purchase): how many users
# complete each ordered prefix.  Spark side is the single-shuffle
# formulation — per-user event arrays walked by a higher-order
# F.aggregate state machine (stage advances on the first occurrence of
# the next expected step), so the funnel costs ONE user-keyed exchange
# regardless of funnel depth.  The oracle states the same semantics
# declaratively as chained conditional mins (t_k = min ts of step k
# after t_{k-1}) — equivalent given per-user-unique timestamps, which
# the fixture guarantees.  Per-user state is bounded by funnel-typed
# events only (same watermark-style caveat as sessionization).
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


@register(
    "events_funnel",
    f"""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(ts) AS t FROM events e JOIN s1 USING (user_id)
        WHERE event_type = '{_FUNNEL_STEPS[1]}' AND ts > s1.t GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(ts) AS t FROM events e JOIN s2 USING (user_id)
        WHERE event_type = '{_FUNNEL_STEPS[2]}' AND ts > s2.t GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(ts) AS t FROM events e JOIN s3 USING (user_id)
        WHERE event_type = '{_FUNNEL_STEPS[3]}' AND ts > s3.t GROUP BY e.user_id
    )
    SELECT 1 AS stage, '{_FUNNEL_STEPS[0]}' AS step,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 2, '{_FUNNEL_STEPS[1]}',
           CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL SELECT 3, '{_FUNNEL_STEPS[2]}',
           CAST((SELECT count(*) FROM s3) AS BIGINT)
    UNION ALL SELECT 4, '{_FUNNEL_STEPS[3]}',
           CAST((SELECT count(*) FROM s4) AS BIGINT)
    """,
)
def events_funnel(star: Star) -> DataFrame:
    steps_arr = F.array(*[F.lit(s) for s in _FUNNEL_STEPS])
    seq = (
        star.events.filter(F.col("event_type").isin(_FUNNEL_STEPS))
        .select("user_id", F.struct("ts", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("seq"))
    )
    reached = seq.select(
        F.aggregate(
            "seq",
            F.lit(0),
            lambda acc, e: F.when(
                (acc < len(_FUNNEL_STEPS))
                & (e["event_type"] == F.element_at(steps_arr, acc + 1)),
                acc + 1,
            ).otherwise(acc),
        ).alias("reached")
    )
    return (
        reached.filter(F.col("reached") > 0)
        .select(F.explode(F.sequence(F.lit(1), F.col("reached"))).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "stage",
            F.element_at(steps_arr, F.col("stage")).alias("step"),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (operators.sampling.dsir_logweights): rank the
# raw corpus by resemblance to a target domain via hashed n-gram
# (unigram + bigram) bag-of-features LMs — Data Selection via Importance
# Resampling (Xie et al., NeurIPS 2023).  Target slice here: the
# English documents (a stand-in for any curated in-domain set).  Both
# engines hash grams with the portable md5 hash64, aggregate to (doc,
# bucket) grain once, and compute the identical smoothed
# ln(p_b) - ln(q_b) op order before a 6-decimal round, so a 1-ulp ln
# divergence cannot move the value.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_TARGET_LANG = "en"

# unigrams + space-joined bigrams over the raw token sequence
_DSIR_GRAMS_SQL = (
    "list_concat(t, list_transform("
    "generate_series(1, greatest(len(t) - 1, 0)), i -> t[i] || ' ' || t[i + 1]))"
)


@register(
    "dsir_logweights",
    f"""
    WITH doctoks AS (
        SELECT doc_id, lang, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, unnest({_DSIR_GRAMS_SQL}) AS g FROM doctoks
    ),
    db AS (
        SELECT doc_id, lang,
               {_hash64_sql('g', 7)} % {_DSIR_BUCKETS} AS b,
               COUNT(*) AS cnt
        FROM grams GROUP BY 1, 2, 3
    ),
    q AS (SELECT b, SUM(cnt) AS q_cnt FROM db GROUP BY b),
    p AS (SELECT b, SUM(cnt) AS p_cnt FROM db
          WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
    nq AS (SELECT CAST(SUM(q_cnt) AS DOUBLE) AS nq FROM q),
    np AS (SELECT CAST(COALESCE(SUM(p_cnt), 0) AS DOUBLE) AS np FROM p),
    ratio AS (
        SELECT q.b,
               ln((CAST(COALESCE(p.p_cnt, 0) AS DOUBLE) + 1.0)
                  / (np.np + {_DSIR_BUCKETS}.0))
               - ln((CAST(q.q_cnt AS DOUBLE) + 1.0)
                    / (nq.nq + {_DSIR_BUCKETS}.0)) AS lr
        FROM q LEFT JOIN p ON q.b = p.b CROSS JOIN np CROSS JOIN nq
    )
    SELECT db.doc_id,
           CAST(SUM(db.cnt) AS BIGINT) AS n_grams,
           round(SUM(CAST(db.cnt AS DOUBLE) * ratio.lr), 6) AS dsir_logweight
    FROM db JOIN ratio ON db.b = ratio.b
    GROUP BY db.doc_id
    """,
)
def dsir_logweights_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import dsir_logweights

    return dsir_logweights(
        star.documents,
        star.documents.filter(F.col("lang") == _DSIR_TARGET_LANG),
        buckets=_DSIR_BUCKETS,
        seed=7,
    )


# ---------------------------------------------------------------------------
# Exact repeated-substring stats (operators.dedup.repeated_substring_stats):
# rolling width-token window fingerprints; a window recurring anywhere in
# the corpus beyond its first (min doc, min pos) occurrence marks its
# positions duplicated — the distributed stand-in for suffix-array
# substring dedup (Lee et al. 2021).  The oracle states covered-position
# counting as COUNT(DISTINCT position) over exploded window spans; the
# Spark side computes the identical quantity with an O(dups) interval
# merge — same semantics, no positions explode.
# ---------------------------------------------------------------------------

_RSS_W = 8


@register(
    "repeated_substring_stats",
    f"""
    WITH doctoks AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    wins AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(list_slice(t, i, i + {_RSS_W} - 1), ' ')) AS fp
        FROM doctoks, unnest(generate_series(1, len(t) - {_RSS_W} + 1)) AS u(i)
        WHERE len(t) >= {_RSS_W}
    ),
    marked AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
        FROM wins
    ),
    dups AS (SELECT doc_id, pos FROM marked WHERE rn > 1),
    dupstats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup FROM dups GROUP BY doc_id
    ),
    covered AS (
        SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS cov
        FROM dups, unnest(generate_series(pos, pos + {_RSS_W} - 1)) AS g(p)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(greatest(len(d.t) - {_RSS_W} + 1, 0) AS BIGINT) AS n_windows,
           COALESCE(ds.n_dup, 0) AS n_dup_windows,
           round(CAST(COALESCE(c.cov, 0) AS DOUBLE) / len(d.t), 6) AS dup_token_frac
    FROM doctoks d
    LEFT JOIN dupstats ds ON d.doc_id = ds.doc_id
    LEFT JOIN covered c ON d.doc_id = c.doc_id
    WHERE len(d.t) > 0
    """,
)
def repeated_substring_stats_q(star: Star) -> DataFrame:
    return D.repeated_substring_stats(star.documents, width=_RSS_W)


# ---------------------------------------------------------------------------
# Dense resample + gap fill (operators.temporal.resample_gapfill): the
# time_bucket_gapfill shape — per-supplier daily series on a dense date
# spine between each key's own first/last observation; absent days take
# 0 (flow measure) or the last observed value (locf, stock measure).
# Spine cardinality is Σ span_days(key), generated per key — never
# global_span × keys.
# ---------------------------------------------------------------------------

@register(
    "supplier_daily_gapfill",
    """
    WITH daily AS (
        SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY 1, 2
    ),
    bounds AS (
        SELECT suppkey, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
        SELECT suppkey, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    )
    SELECT s.suppkey, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.qty, 0) AS qty,
           last_value(d.sum_price IGNORE NULLS) OVER (
               PARTITION BY s.suppkey ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_price
    FROM spine s LEFT JOIN daily d ON s.suppkey = d.suppkey AND s.day = d.day
    """,
)
def supplier_daily_gapfill(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import resample_gapfill
    from sap_data_pipeline_spark.plans import star_mapping as sm

    daily = (
        star.lineitem.select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_shipdate").cast("date").alias("day"),
            "l_quantity",
            "l_extendedprice",
        )
        .groupBy("suppkey", "day")
        .agg(
            sm.dec_sum(F.col("l_quantity"), "qty"),
            sm.dec_sum(F.col("l_extendedprice"), "sum_price"),
        )
    )
    return resample_gapfill(
        daily, "suppkey", "day", fill_zero=["qty"], fill_forward=["sum_price"]
    ).select(
        "suppkey",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "qty",
        "sum_price",
    )


# ---------------------------------------------------------------------------
# Event transition matrix (operators.temporal.transition_matrix):
# first-order (state → next state) adjacency counts over each user's
# time-ordered event sequence — the clickstream path summary.  Per-user
# timestamps are unique in this schema, so the lead() order is total.
# ---------------------------------------------------------------------------

@register(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS to_state
        FROM events
    )
    SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE to_state IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transition_matrix(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import transition_matrix

    return transition_matrix(star.events, "user_id", "ts", "event_type")


# ---------------------------------------------------------------------------
# SemDeDup (operators.dedup.semantic_dedup): semantic near-dup clusters
# over embeddings — the paraphrase-level complement to MinHash lexical
# dedup (Abbas et al. 2023).  The oracle replays the cell-blocked pair
# CTE of embedding_near_dup_cells verbatim, then closes the pair graph
# with the same recursive-CTE fixpoint as near_dup_clusters; the min
# reachable id is unique, so Spark's iterative propagation agrees
# exactly.
# ---------------------------------------------------------------------------

_EMB_CAND_CTE = """
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeded AS (
        SELECT vec_id, v, md5('cell:' || CAST(vec_id AS VARCHAR)) AS r
        FROM e ORDER BY r, vec_id LIMIT 8
    ),
    cents AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS INT) AS cell,
               v AS cv
        FROM seeded
    ),
    dists AS (
        SELECT e.vec_id, c.cell,
               list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
        FROM e CROSS JOIN cents c
    ),
    probed AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM dists
        ) WHERE rk <= 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probed a JOIN probed b ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    simpairs AS (
        SELECT id_a, id_b
        FROM cand JOIN e ea ON ea.vec_id = cand.id_a
                  JOIN e eb ON eb.vec_id = cand.id_b
        WHERE round(list_dot_product(ea.v, eb.v)
                    / (sqrt(list_dot_product(ea.v, ea.v))
                       * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.3
    )
"""


@register(
    "semantic_dedup_clusters",
    f"""
    WITH RECURSIVE {_EMB_CAND_CTE},
    sedges AS (
        SELECT id_a AS src, id_b AS dst FROM simpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM simpairs
    ),
    sreach(src, dst) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.src, r.dst FROM sedges e JOIN sreach r ON r.src = e.dst
    ),
    scomp AS (
        SELECT src AS vec_id, MIN(dst) AS cluster_id FROM sreach GROUP BY src
    ),
    ssizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM scomp GROUP BY cluster_id
    )
    SELECT c.vec_id, c.cluster_id, s.cluster_size,
           c.vec_id = c.cluster_id AS is_survivor
    FROM scomp c JOIN ssizes s USING (cluster_id)
    """,
)
def semantic_dedup_clusters(star: Star) -> DataFrame:
    _, cc = _sem_index(star)
    return D.semantic_dedup(
        star.embeddings, **_SEM_PARAMS, cc=cc
    ).withColumn("cluster_size", F.col("cluster_size").cast("long"))


# ---------------------------------------------------------------------------
# Host-graph PageRank (operators.graph.pagerank): the standard crawl-
# curation authority signal (CCNet-style host tiering).  The synthetic
# host graph is derived deterministically from doc_id residues — two
# edge families give a many-to-many core (mod-89 × mod-83 endpoints
# share one label space) plus a pure-sink family (hosts 89..95 appear
# only as destinations), so the dangling-mass redistribution path is
# exercised, not just defined.  The oracle unrolls the 3 power
# iterations as CTEs — same math, aggregation order differs, and the
# driver's 6-decimal rounding absorbs the ~1e-16 float drift.
# ---------------------------------------------------------------------------

_PR_EDGE_SQL = """
    SELECT doc_id % 89 AS src, doc_id % 83 AS dst FROM documents
    UNION ALL
    SELECT doc_id % 89 AS src, 89 + (doc_id % 7) AS dst FROM documents
"""


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    ctes = [
        f"raw AS ({_PR_EDGE_SQL})",
        "e AS (SELECT DISTINCT src, dst FROM raw)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"""d{i} AS (
        SELECT COALESCE(SUM(r.pr), 0.0) AS dm
        FROM {p} r LEFT JOIN deg ON r.node = deg.src
        WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""c{i} AS (
        SELECT e.dst AS node, SUM(r.pr / deg.deg) AS m
        FROM {p} r JOIN deg ON r.node = deg.src
                   JOIN e   ON e.src  = r.node
        GROUP BY 1)"""
        )
        ctes.append(
            f"""r{i} AS (
        SELECT nodes.node,
               CAST({(1.0 - damping) / 1.0!r} AS DOUBLE) / (SELECT n FROM nn)
               + CAST({damping!r} AS DOUBLE)
                 * (COALESCE(c.m, 0.0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn))
                 AS pr
        FROM nodes LEFT JOIN c{i} c ON nodes.node = c.node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(node AS BIGINT) AS host_id, CAST(pr AS DOUBLE) AS pr
    FROM r{iterations}
    """
    )


@register("host_pagerank", _pagerank_oracle())
def host_pagerank(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import graph as G

    docs = star.documents
    e1 = docs.select(
        (F.col("doc_id") % 89).alias("src"), (F.col("doc_id") % 83).alias("dst")
    )
    e2 = docs.select(
        (F.col("doc_id") % 89).alias("src"),
        (F.lit(89) + F.col("doc_id") % 7).alias("dst"),
    )
    ranks = G.pagerank(e1.unionAll(e2), iterations=3)
    return ranks.select(
        F.col("node").cast("long").alias("host_id"),
        F.col("pr").cast("double").alias("pr"),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (operators.similarity.pq_topk): ADC scan over
# m-byte codes + exact-cosine rerank of the short list — the FAISS IVFPQ
# building block.  Rows-only by design: the codebooks come from a KMeans
# training pass (no cross-engine twin); recall is gated against
# brute_force_topk in tests instead.
#
# Train-once/serve-many: KMeans models (PQ codebooks, IVF centroids) are
# corpus artifacts, not query work — a production index trains them once
# and serves every query batch from the same codebooks.  The catalog
# mirrors that: models are cached per (sf_dir, params) and shared between
# ann_pq_topk and ann_ivfpq_topk, so only the encode/ADC/rerank stages
# run per call.  The cached values are plain Python float lists —
# session-independent, safe across SparkSession restarts.
# ---------------------------------------------------------------------------

_ANN_PQ_PARAMS = dict(dim=64, m=8, nbits=4, seed=7)
_ANN_IVF_PARAMS = dict(n_cells=8, seed=7)
_ann_model_cache: dict[tuple, object] = {}


def _model_cached(star: Star, kind: str, params: dict, train, *,
                  table: str = "embeddings") -> object:
    """Train-once model serving, three tiers like the pair-graph index:
    process cache → durable JSON artifact (a cold session LOADS the
    codebook/basis/merge table instead of re-running KMeans/the
    eigensolve/the BPE loop) → train + commit.  Synthetic stars train
    in-process only."""
    key = (kind, star.sf_dir, *sorted(params.items()))
    if key not in _ann_model_cache:
        from sap_data_pipeline_spark.sources import artifacts as A

        fp = A.corpus_fingerprint(
            getattr(star, "sf_dir", "") or "", table,
            params=f"{kind}|{sorted(params.items())}",
        )
        if fp is None:
            _ann_model_cache[key] = train()
        else:
            _ann_model_cache[key] = A.load_or_build_json(
                f"{kind}_model", fp, train
            )
    return _ann_model_cache[key]


def _pq_codebooks_cached(star: Star) -> list[list[list[float]]]:
    return _model_cached(
        star, "pq", _ANN_PQ_PARAMS,
        lambda: S.pq_train_codebooks(star.embeddings, **_ANN_PQ_PARAMS),
    )


def _ivf_centroids_cached(star: Star) -> list[list[float]]:
    return _model_cached(
        star, "ivf", _ANN_IVF_PARAMS,
        lambda: S.ivf_train_cells(star.embeddings, **_ANN_IVF_PARAMS)[1],
    )


@register("ann_pq_topk")
def ann_pq_topk(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.pq_topk(
        star.embeddings, queries, k=5, query_id_col="query_id",
        codebooks=_pq_codebooks_cached(star), **_ANN_PQ_PARAMS,
    )


# ---------------------------------------------------------------------------
# Skew-safe salted join, driver-evidenced (operators.relational.salted_join
# was test-only): revenue per market segment through the salted
# orders⋈customer join.  The salt NEVER changes results — the oracle is
# the PLAIN join — which is exactly the operator's contract: spread one
# hot key over `salt` reducers, keep row-identical output.
# ---------------------------------------------------------------------------

@register(
    "salted_join_segment_revenue",
    """
    SELECT c.c_mktsegment AS mktsegment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def salted_join_segment_revenue(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import relational as R
    from sap_data_pipeline_spark.plans import star_mapping as sm

    big = star.orders.select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    small = star.customer.select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        R.salted_join(big, small, ["custkey"], salt=8)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            sm.dec_sum(F.col("o_totalprice"), "revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Per-language quality z-scores: the curation signal behind
# "keep the top-X% per language" policies (a GLOBAL quality cut starves
# low-resource languages whose score distribution sits lower).  Moments
# aggregate per language through exact DECIMAL sums (order-independent,
# engine-portable — same trick as every dec_sum) and re-enter broadcast;
# the document frame itself never shuffles (a lang-partitioned window
# would put the dominant language's entire row set in one partition).
# ---------------------------------------------------------------------------

@register(
    "quality_zscore_by_lang",
    f"""
    WITH {_QUALITY_CTES},
    scored AS (
        SELECT d.doc_id, d.lang, q.quality
        FROM documents d JOIN quality q ON d.doc_id = q.doc_id
    ),
    mom AS (
        SELECT lang,
               CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(quality AS DECIMAL(18,6))
                        * CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS sq,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM scored GROUP BY 1
    )
    SELECT sc.doc_id, sc.lang, sc.quality,
           CASE WHEN (mom.sq / mom.n) - (mom.s / mom.n) * (mom.s / mom.n) > 1e-12
                THEN round((sc.quality - mom.s / mom.n)
                           / sqrt((mom.sq / mom.n) - (mom.s / mom.n) * (mom.s / mom.n)), 4)
                ELSE 0.0 END AS z
    FROM scored sc JOIN mom ON sc.lang = mom.lang
    """,
)
def quality_zscore_by_lang(star: Star) -> DataFrame:
    from pyspark.sql.types import DecimalType

    dec = DecimalType(18, 6)
    scored = star.documents.select(
        "doc_id", "lang", "text", X.tokens("text").alias("_toks")
    ).select(
        "doc_id", "lang",
        X.quality_score_from(F.col("text"), F.col("_toks")).alias("quality"),
    )
    mom = scored.groupBy("lang").agg(
        F.sum(F.col("quality").cast(dec)).cast("double").alias("s"),
        F.sum(F.col("quality").cast(dec) * F.col("quality").cast(dec))
        .cast("double").alias("sq"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    return (
        scored.join(F.broadcast(mom), "lang")
        .select(
            "doc_id",
            "lang",
            "quality",
            F.when(var > 1e-12, F.round((F.col("quality") - mean) / F.sqrt(var), 4))
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Robust daily anomaly flags (median/MAD): the ops-side health check for
# a continuously-ingesting pipeline — "did any event type's daily volume
# jump off its own baseline?"  Mean/stddev breaks on the very outliers
# it should find; median ± k·MAD is the standard robust rule.  Exact
# medians are safe HERE because they aggregate the per-(type, day)
# count frame — types × days rows, thousands at most — never raw events;
# the only corpus-scale pass is the first (type, day) count.
# Both engines interpolate the even-n median identically
# (Spark `percentile` ≡ DuckDB `quantile_cont`).
# ---------------------------------------------------------------------------

@register(
    "events_daily_anomaly_mad",
    """
    WITH daily AS (
        SELECT event_type, strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(n_events, 0.5) AS med
        FROM daily GROUP BY 1
    ),
    dev AS (
        SELECT d.event_type, d.day, d.n_events, m.med,
               abs(d.n_events - m.med) AS adev
        FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT dev.event_type, dev.day, dev.n_events,
           round(dev.med, 6) AS med, round(mad.mad, 6) AS mad,
           dev.adev > 3 * mad.mad AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    """,
)
def events_daily_anomaly_mad(star: Star) -> DataFrame:
    daily = (
        star.events.groupBy(
            "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("n_events", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type", "day", "n_events",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            (F.col("adev") > 3 * F.col("mad")).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Compression-ratio repetition proxy (operators.corpus.compression_ratio):
# rows-only — DuckDB has no zlib expression; the codec math is pinned by
# a differential test against direct zlib instead.
# ---------------------------------------------------------------------------

@register("compression_ratio_scores")
def compression_ratio_scores(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import corpus as CO

    return CO.compression_ratio(star.documents)


# ---------------------------------------------------------------------------
# Key-skew diagnostic: the pre-flight check before keying a 100 TB
# shuffle — per-key weight of the heaviest keys plus the skew ratio
# (max/avg).  A ratio ≫ spark.sql.adaptive.skewJoin thresholds says
# "salt this key or pre-aggregate" BEFORE the job strands one reducer.
# One count aggregate + a TakeOrdered top-k; the second moment rides the
# same pass (no re-scan).
# ---------------------------------------------------------------------------

_SKEW_K = 10

@register(
    "events_key_skew_report",
    f"""
    WITH per_key AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT CAST(MAX(n) AS DOUBLE) AS max_n,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_n
        FROM per_key
    )
    SELECT p.user_id, p.n,
           CAST(p.rk AS INT) AS rank,
           round(s.max_n / s.avg_n, 6) AS skew_ratio
    FROM (
        SELECT user_id, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rk
        FROM per_key
    ) p CROSS JOIN stats s
    WHERE p.rk <= {_SKEW_K}
    """,
)
def events_key_skew_report(star: Star) -> DataFrame:
    from pyspark.sql.window import Window

    # the expensive pass is the per-key count (full events scan +
    # map-side partial agg); BOTH consumers below read it through one
    # lazy localCheckpoint, so the corpus is scanned once, not twice
    per_key = star.events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=False)
    stats = per_key.agg(
        F.max("n").cast("double").alias("max_n"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_n"),
    )
    # top-k FIRST (TakeOrderedAndProject — k rows per partition, never a
    # global-sort window over every key), THEN rank the k survivors
    w = Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
    top = (
        per_key.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(_SKEW_K)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "user_id", "n", "rank",
        F.round(F.col("max_n") / F.col("avg_n"), 6).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Real BPE tokenization (operators.corpus.bpe_train/bpe_token_counts):
# train merges on the corpus word-frequency table (one distributed
# pass; the merge loop runs driver-side over the bounded table — the
# standard formulation), then bill every document's REAL token budget
# under the trained tokenizer.  Rows-only: iterative merge application
# has no SQL twin; the encoder is pinned by the canonical Sennrich
# walkthrough + direct-encode differential tests.
# ---------------------------------------------------------------------------

@register("bpe_token_stats")
def bpe_token_stats(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import corpus as CO

    merges = [
        tuple(p)  # JSON artifact round-trips tuples as lists
        for p in _model_cached(
            star, "bpe", {"n_merges": 100},
            lambda: CO.bpe_train(star.documents, n_merges=100),
            table="documents",
        )
    ]
    return CO.bpe_token_counts(star.documents, merges)


# ---------------------------------------------------------------------------
# Longest-prefix-match enrichment (the CIDR/ASN/geo lookup shape): each
# event synthesizes a deterministic IPv4 from its ids; a three-tier
# prefix dim (/8, /16, /24 — denser tiers built from residue classes so
# every tier actually matches) resolves by the LONGEST matching prefix.
# Scale shape: the row side expands to a FIXED 3 candidate keys
# (one per prefix width — never a theta/range join), the prefix dim
# broadcasts, and the winner is an argmax over ≤3 matches via one
# per-row aggregate — the fact never shuffles.
# ---------------------------------------------------------------------------

_PFX_SQL = """
    SELECT event_id,
           CAST(10 + event_id % 4 AS VARCHAR) || '.'
             || CAST(event_id % 256 AS VARCHAR) || '.'
             || CAST((event_id * 7) % 256 AS VARCHAR) || '.'
             || CAST((event_id * 13) % 256 AS VARCHAR) AS ip
    FROM events
"""
_PFX_DIM_SQL = """
    SELECT CAST(10 + r % 4 AS VARCHAR) || '.' AS prefix,
           8 AS bits, 'net8-' || CAST(r AS VARCHAR) AS asn
    FROM range(4) t(r)
    UNION ALL
    SELECT CAST(10 + r % 4 AS VARCHAR) || '.' || CAST(r AS VARCHAR) || '.' AS prefix,
           16 AS bits, 'net16-' || CAST(r AS VARCHAR) AS asn
    FROM range(64) t(r)
    UNION ALL
    SELECT CAST(10 + r % 4 AS VARCHAR) || '.' || CAST(r AS VARCHAR) || '.'
             || CAST((r * 7) % 256 AS VARCHAR) || '.' AS prefix,
           24 AS bits, 'net24-' || CAST(r AS VARCHAR) AS asn
    FROM range(16) t(r)
"""

@register(
    "events_prefix_match_enrich",
    f"""
    WITH ips AS ({_PFX_SQL}),
    dim AS ({_PFX_DIM_SQL}),
    cand AS (
        SELECT i.event_id, i.ip, d.bits, d.asn
        FROM ips i JOIN dim d
          ON d.prefix = CASE d.bits
               WHEN 8  THEN split_part(i.ip, '.', 1) || '.'
               WHEN 16 THEN split_part(i.ip, '.', 1) || '.' || split_part(i.ip, '.', 2) || '.'
               ELSE split_part(i.ip, '.', 1) || '.' || split_part(i.ip, '.', 2) || '.'
                      || split_part(i.ip, '.', 3) || '.'
             END
    )
    SELECT event_id, ip,
           CAST(MAX(bits) AS INT) AS matched_bits,
           MAX_BY(asn, bits) AS asn
    FROM cand GROUP BY 1, 2
    """,
)
def events_prefix_match_enrich(star: Star) -> DataFrame:
    e = star.events.select(
        "event_id",
        F.concat_ws(
            ".",
            (F.lit(10) + F.col("event_id") % 4).cast("string"),
            (F.col("event_id") % 256).cast("string"),
            ((F.col("event_id") * 7) % 256).cast("string"),
            ((F.col("event_id") * 13) % 256).cast("string"),
        ).alias("ip"),
    )
    spark = star.events.sparkSession
    dim_rows = (
        [(f"{10 + r % 4}.", 8, f"net8-{r}") for r in range(4)]
        + [(f"{10 + r % 4}.{r}.", 16, f"net16-{r}") for r in range(64)]
        + [(f"{10 + r % 4}.{r}.{(r * 7) % 256}.", 24, f"net24-{r}") for r in range(16)]
    )
    dim = spark.createDataFrame(dim_rows, "prefix string, bits int, asn string")
    # one broadcast LEFT join per prefix width + priority coalesce —
    # no explode, no fact-side shuffle, no re-aggregate: the fact rows
    # stream through three map-side hash probes (each dim tier is
    # prefix-unique, so every probe yields at most one match)
    parts = F.split(F.col("ip"), "\\.")
    keyed = e.select(
        "event_id", "ip",
        F.concat(parts[0], F.lit(".")).alias("_k8"),
        F.concat(parts[0], F.lit("."), parts[1], F.lit(".")).alias("_k16"),
        F.concat(parts[0], F.lit("."), parts[1], F.lit("."), parts[2], F.lit(".")).alias("_k24"),
    )
    out = keyed
    for bits in (8, 16, 24):
        tier = F.broadcast(
            dim.filter(F.col("bits") == bits)
            .select(F.col("prefix").alias(f"_p{bits}"), F.col("asn").alias(f"_asn{bits}"))
        )
        out = out.join(tier, F.col(f"_k{bits}") == F.col(f"_p{bits}"), "left")
    return out.select(
        "event_id", "ip",
        F.when(F.col("_asn24").isNotNull(), 24)
        .when(F.col("_asn16").isNotNull(), 16)
        .when(F.col("_asn8").isNotNull(), 8)
        .cast("int").alias("matched_bits"),
        F.coalesce("_asn24", "_asn16", "_asn8").alias("asn"),
    ).filter(F.col("matched_bits").isNotNull())


_ivfpq_index_cache: dict[tuple, DataFrame] = {}


def _ivfpq_encoded_cached(star: Star) -> DataFrame:
    """Materialized (neighbor_id, pq_code, ivf_cell) serving index for
    star.embeddings — the stored artifact a PQ deployment actually
    serves from (32× smaller than the float vectors).  Encoded ONCE per
    (session, sf_dir) with the cached models; session-keyed like the
    near-dup pair-graph index because a DataFrame cannot outlive its
    SparkSession."""
    spark = star.embeddings.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect has no sparkContext
        app_id = str(id(spark))
    key = (app_id, star.sf_dir)
    if key not in _ivfpq_index_cache:
        enc = S._assign_cells(
            S.pq_encode(
                star.embeddings.select(
                    F.col("vec_id").alias("neighbor_id"), "embedding"
                ),
                _pq_codebooks_cached(star),
            ),
            _ivf_centroids_cached(star), vec_col="embedding", nprobe=1,
        ).select("neighbor_id", "pq_code", "ivf_cell")
        _ivfpq_index_cache[key] = enc.localCheckpoint(eager=True)
    return _ivfpq_index_cache[key]


@register("ann_ivfpq_topk")
def ann_ivfpq_topk(star: Star) -> DataFrame:
    """IVF cells × PQ codes × cosine rerank — the composed FAISS IVFPQ
    layout; rows-only (KMeans-trained models, cached per sf_dir and
    shared with ann_pq_topk; the encoded index frame itself is the
    second-level cached artifact), recall-gated in tests like its IVF
    and PQ components."""
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivfpq_topk(
        star.embeddings, queries, k=5, dim=64, n_cells=8, nprobe=4,
        m=8, nbits=4, query_id_col="query_id",
        centroids=_ivf_centroids_cached(star),
        codebooks=_pq_codebooks_cached(star),
        encoded=_ivfpq_encoded_cached(star),
    )


# ---------------------------------------------------------------------------
# Gopher/MassiveText quality-gate battery (Rae et al. 2021, §A1.1,
# public paper): the document-level rule filters a pretraining pipeline
# runs BEFORE any model-based scoring.  Pure per-row column expressions
# (no shuffle, no UDF) over the shared tokenizer; the flags stay
# UNROUNDED internally (every input to a comparison is an exact count
# or an IEEE division of exact counts, so both engines decide each gate
# bit-identically) and the reported ratios round for display.  Line
# gates (bullets/ellipsis) are degenerate on the single-line testdata —
# their semantics are pinned by multi-line fixtures in test_cleaning.
# ---------------------------------------------------------------------------

@register(
    "gopher_quality_flags",
    f"""
    WITH feat AS (
        SELECT doc_id, text AS raw,
               {TOKSEQ_SQL.format(col='text')} AS toks,
               list_filter(list_transform(string_split(text, chr(10)),
                                          x -> trim(x)), x -> x <> '') AS lines
        FROM documents
    ),
    f2 AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) > 0
                    THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mwl,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(regexp_extract_all(raw, '(#|\\.\\.\\.|…)')) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS symr,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, t -> regexp_matches(t, '\\p{{L}}'))) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alphaf,
               CAST(len(list_distinct(list_filter(toks, t -> list_contains([{_EN_SW}], t)))) AS BIGINT) AS n_stop,
               CASE WHEN len(lines) > 0
                    THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
                         / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS bulletf,
               CASE WHEN len(lines) > 0
                    THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) AS DOUBLE)
                         / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS ellf
        FROM feat
    )
    SELECT doc_id, n_words,
           round(mwl, 4) AS mean_word_len,
           round(symr, 4) AS symbol_word_ratio,
           round(alphaf, 4) AS alpha_word_frac,
           n_stop,
           round(bulletf, 4) AS bullet_line_frac,
           round(ellf, 4) AS ellipsis_line_frac,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS INT) AS flag_words,
           CAST(CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS INT) AS flag_mwl,
           CAST(CASE WHEN symr <= 0.1 THEN 1 ELSE 0 END AS INT) AS flag_symbols,
           CAST(CASE WHEN alphaf >= 0.8 THEN 1 ELSE 0 END AS INT) AS flag_alpha,
           CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS flag_stopwords,
           CAST(CASE WHEN bulletf <= 0.9 THEN 1 ELSE 0 END AS INT) AS flag_bullets,
           CAST(CASE WHEN ellf <= 0.3 THEN 1 ELSE 0 END AS INT) AS flag_ellipsis,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 AND mwl >= 3.0 AND mwl <= 10.0
                      AND symr <= 0.1 AND alphaf >= 0.8 AND n_stop >= 2
                      AND bulletf <= 0.9 AND ellf <= 0.3
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM f2
    """,
)
def gopher_quality_flags(star: Star) -> DataFrame:
    base = star.documents.select(
        "doc_id", "text",
        X.tokens("text").alias("_t"), X.line_array("text").alias("_l"),
    )
    sig, gates = X.gopher_signals(F.col("_t"), F.col("_l"), "text")
    keep = None
    for g in gates.values():
        keep = g if keep is None else (keep & g)
    return base.select(
        "doc_id",
        sig["n_words"].alias("n_words"),
        F.round(sig["mean_word_len"], 4).alias("mean_word_len"),
        F.round(sig["symbol_word_ratio"], 4).alias("symbol_word_ratio"),
        F.round(sig["alpha_word_frac"], 4).alias("alpha_word_frac"),
        sig["n_stop"].alias("n_stop"),
        F.round(sig["bullet_line_frac"], 4).alias("bullet_line_frac"),
        F.round(sig["ellipsis_line_frac"], 4).alias("ellipsis_line_frac"),
        *[v.cast("int").alias(k) for k, v in gates.items()],
        keep.cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition CHAR-fraction metrics — the character-coverage
# complement of repetition_stats' count fractions: what share of the
# document's characters sit inside (a) the most common word 2-/3-gram,
# (b) lines that occur more than once.  Shuffle-free per-row
# expressions: the n-gram maxima use a sorted run-length scan
# (max_run_chars, O(n log n) per doc — n-gram arrays grow with the
# document where line arrays stay small).  Line metrics are degenerate
# on the single-line testdata; their semantics are pinned by multi-line
# fixtures in test_cleaning.
# ---------------------------------------------------------------------------

@register(
    "gopher_repetition_chars",
    f"""
    WITH base AS (
        SELECT doc_id,
               {TOKSEQ_SQL.format(col='text')} AS t,
               {NORM_SQL.format(col='text')} AS norm,
               list_filter(list_transform(string_split(text, chr(10)),
                                          x -> trim(x)), x -> x <> '') AS lines
        FROM documents
    ),
    g2 AS (
        SELECT doc_id, g, count(*) * length(g) AS chars
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> t[i] || ' ' || t[i + 1])) AS g
            FROM base)
        GROUP BY 1, 2
    ),
    g3 AS (
        SELECT doc_id, g, count(*) * length(g) AS chars
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 2, 0)),
                       i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
            FROM base)
        GROUP BY 1, 2
    ),
    top2 AS (SELECT doc_id, max(chars) AS c2 FROM g2 GROUP BY 1),
    top3 AS (SELECT doc_id, max(chars) AS c3 FROM g3 GROUP BY 1),
    lf AS (
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CASE WHEN len(lines) > 0
                    THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                         / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS dlf,
               CASE WHEN list_sum(list_transform(lines, x -> length(x))) > 0
                    THEN CAST(list_sum(list_transform(list_distinct(lines),
                             d -> CASE WHEN len(list_filter(lines, x -> x = d)) >= 2
                                       THEN len(list_filter(lines, x -> x = d)) * length(d)
                                       ELSE 0 END)) AS DOUBLE)
                         / CAST(list_sum(list_transform(lines, x -> length(x))) AS DOUBLE)
                    ELSE 0.0 END AS dlcf
        FROM base
    )
    SELECT b.doc_id,
           round(CASE WHEN length(b.norm) > 0
                      THEN CAST(coalesce(top2.c2, 0) AS DOUBLE) / CAST(length(b.norm) AS DOUBLE)
                      ELSE 0.0 END, 6) AS top_bigram_char_frac,
           round(CASE WHEN length(b.norm) > 0
                      THEN CAST(coalesce(top3.c3, 0) AS DOUBLE) / CAST(length(b.norm) AS DOUBLE)
                      ELSE 0.0 END, 6) AS top_trigram_char_frac,
           lf.n_lines,
           round(lf.dlf, 6) AS dup_line_frac,
           round(lf.dlcf, 6) AS dup_line_char_frac
    FROM base b
    LEFT JOIN top2 ON b.doc_id = top2.doc_id
    LEFT JOIN top3 ON b.doc_id = top3.doc_id
    JOIN lf ON b.doc_id = lf.doc_id
    """,
)
def gopher_repetition_chars(star: Star) -> DataFrame:
    toks = X.tokens("text")
    base = star.documents.select(
        "doc_id",
        toks.alias("_t"),
        X.normalize_text("text").alias("_norm"),
        X.line_array("text").alias("_l"),
    ).select(
        "doc_id",
        "_norm",
        "_l",
        X.ngrams_from(F.col("_t"), 2).alias("_g2"),
        X.ngrams_from(F.col("_t"), 3).alias("_g3"),
    )
    nchars = F.length(F.col("_norm")).cast("double")

    def cfrac(grams):
        return F.when(
            nchars > 0,
            F.round(X.max_run_chars(grams).cast("double") / nchars, 6),
        ).otherwise(F.lit(0.0))

    line_stats = X.dup_line_stats(F.col("_l"))
    return base.select(
        "doc_id",
        cfrac(F.col("_g2")).alias("top_bigram_char_frac"),
        cfrac(F.col("_g3")).alias("top_trigram_char_frac"),
        *line_stats,
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time enrichment — the CONSUMPTION side of
# scd2_customer_history: every order picks up the dimension version
# valid AT ITS ORDER DATE (equi-join on the key + validity-range
# residual, so Catalyst plans a broadcast HASH join with a filter —
# never a nested-loop range join).  History here is the deterministic
# two-batch synthetic (v1 effective 1995-01-01; custkey%3==0 gain +10
# balance effective 1998-01-01), giving the closed-form oracle: orders
# before 1998 see v1, later orders of the changed keys see v2.
# valid_from is inclusive, valid_to exclusive — the scd2_apply contract.
# ---------------------------------------------------------------------------

@register(
    "scd2_asof_enrich",
    """
    SELECT o.o_orderkey, o.o_custkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           c.c_mktsegment AS segment_at_order,
           CAST(c.c_acctbal AS DOUBLE)
             + CASE WHEN c.c_custkey % 3 = 0
                     AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
                    THEN 10.0 ELSE 0.0 END AS acctbal_at_order
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def scd2_asof_enrich(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.merge import scd2_apply

    base = star.customer.select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double")
    )
    batch1 = base.withColumn("eff", F.lit("1995-01-01"))
    batch2 = base.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal")),
    ).withColumn("eff", F.lit("1998-01-01"))
    h1 = scd2_apply(None, batch1, keys=["c_custkey"],
                    tracked=["c_mktsegment", "c_acctbal"], effective="eff")
    hist = scd2_apply(h1, batch2, keys=["c_custkey"],
                      tracked=["c_mktsegment", "c_acctbal"], effective="eff")
    od = F.col("o_orderdate").cast("date")
    return (
        star.orders.join(
            F.broadcast(hist),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (od >= F.col("valid_from").cast("date"))
            & (
                F.col("valid_to").isNull()
                | (od < F.col("valid_to").cast("date"))
            ),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format(od, "yyyy-MM-dd").alias("o_orderdate"),
            F.col("c_mktsegment").alias("segment_at_order"),
            F.col("c_acctbal").alias("acctbal_at_order"),
        )
    )


# ---------------------------------------------------------------------------
# Exact per-group percentiles — the interpolated order statistics every
# profiling/capacity query needs.  EXACT percentile sorts within each
# group, which is the right trade while groups are bounded (25 nations
# here; a per-customer grain would be millions of tiny sorts — still
# fine — but an UNGROUPED exact percentile over the full fact is a
# global sort: that path belongs to the GK-sketch approx variant,
# `curriculum_deciles`).  Spark's percentile() and DuckDB's
# quantile_cont use the same linear interpolation over exact doubles —
# verified bit-identical before registration.
# ---------------------------------------------------------------------------

@register(
    "customer_balance_quantiles_by_nation",
    """
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
           round(quantile_cont(c_acctbal, 0.95), 6) AS p95
    FROM customer GROUP BY 1
    """,
)
def customer_balance_quantiles_by_nation(star: Star) -> DataFrame:
    return star.customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.percentile("c_acctbal", 0.25), 6).alias("p25"),
        F.round(F.percentile("c_acctbal", 0.50), 6).alias("p50"),
        F.round(F.percentile("c_acctbal", 0.75), 6).alias("p75"),
        F.round(F.percentile("c_acctbal", 0.95), 6).alias("p95"),
    )


# ---------------------------------------------------------------------------
# Temperature-smoothed mixture planning (sampling.temperature_mixture_plan,
# alpha=0.5): target_s ∝ sqrt(observed share) — the multilingual
# exponential-smoothing rule.  Determinism contract: observed shares
# divide exact integer sums; smoothed weights quantize to integer
# micro-units before normalizing (exact integer sum, order-immune);
# alpha=0.5 rides sqrt, correctly rounded per IEEE in both engines.
# ---------------------------------------------------------------------------

@register(
    "temperature_mix_plan",
    """
    WITH avail AS (
        SELECT lang AS stratum, CAST(SUM(n_chars) AS DOUBLE) AS available
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(available) AS total FROM avail),
    weighted AS (
        SELECT stratum, available, available / total AS p,
               CAST(floor(sqrt(available / total) * 1000000.0 + 0.5) AS BIGINT) AS wmicro
        FROM avail, tot
    ),
    ws AS (SELECT SUM(wmicro) AS wsum FROM weighted),
    planned AS (
        SELECT stratum, available, p,
               CAST(wmicro AS DOUBLE) / CAST(wsum AS DOUBLE) AS target_share
        FROM weighted, ws
    ),
    tt AS (SELECT MIN(available / target_share) AS t FROM planned WHERE target_share > 0)
    SELECT stratum, available,
           round(p, 6) AS observed_share,
           round(target_share, 6) AS target_share,
           round(CASE WHEN target_share > 0
                      THEN target_share * t / available ELSE 0.0 END, 6)
               AS sampling_fraction
    FROM planned, tt
    """,
)
def temperature_mix_plan(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import temperature_mixture_plan

    return temperature_mixture_plan(
        star.documents, "lang", alpha=0.5, weight_col="n_chars"
    )


# ---------------------------------------------------------------------------
# BM25 keyword search (Robertson-Sparck Jones / Okapi BM25, public
# formula; k1=1.2, b=0.75): top-k documents for a fixed term set — the
# lexical-retrieval complement of the ANN embedding search.  One
# corpus aggregate (N, avgdl, per-term document frequencies — all
# exact integer sums) re-enters broadcast; scoring is a map-side
# expression over the token array; the top-k is TakeOrderedAndProject
# on (rounded score, doc_id).  The ln() inside idf is the one
# engine-library float; the final round(4) absorbs last-ulp drift.
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "hash", "merge"]
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "bm25_search_topk",
    f"""
    WITH doctoks AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    lens AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM doctoks),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
               {", ".join(
                   f"CAST(SUM(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END) AS DOUBLE) AS df_{w}"
                   for w in _BM25_TERMS)}
        FROM lens
    ),
    scored AS (
        SELECT l.doc_id,
               round({" + ".join(
                   f"(ln(1.0 + (s.n - s.df_{w} + 0.5) / (s.df_{w} + 0.5))"
                   f" * (CAST(len(list_filter(l.t, x -> x = '{w}')) AS DOUBLE) * {_BM25_K1 + 1.0})"
                   f" / (CAST(len(list_filter(l.t, x -> x = '{w}')) AS DOUBLE)"
                   f"    + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * l.dl / s.avgdl)))"
                   for w in _BM25_TERMS)}, 4) AS score
        FROM lens l, stats s
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def bm25_search_topk(star: Star) -> DataFrame:
    lens = star.documents.select(
        "doc_id", X.tokens("text").alias("t")
    ).withColumn("dl", F.size("t").cast("double"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("t", w), 1).otherwise(0)
            ).cast("double").alias(f"df_{w}")
            for w in _BM25_TERMS
        ],
    )
    score = None
    for w in _BM25_TERMS:
        tf = F.size(F.filter(F.col("t"), lambda x: x == F.lit(w))).cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("n") - F.col(f"df_{w}") + 0.5) / (F.col(f"df_{w}") + 0.5)
        )
        part = (
            idf
            * (tf * F.lit(_BM25_K1 + 1.0))
            / (
                tf
                + F.lit(_BM25_K1)
                * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return (
        lens.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# PNG decode under the closed-form oracle (operators.multimodal
# decode_png_pixels): the synthetic fixtures use row filters r % 5, so
# this query's value hash proves ALL FIVE PNG filter reconstructions
# (None/Sub/Up/Average/Paeth) and the zlib IDAT walk — any unfilter or
# chunk-framing bug changes mean/max luma.  channels = 3 + doc_id % 2
# exercises RGB and RGBA.  n_bytes is deliberately absent (zlib output
# size has no closed form).
# ---------------------------------------------------------------------------

@register(
    "image_meta_png",
    """
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
               3 + doc_id % 2 AS nch
        FROM documents
    ),
    rr AS (SELECT unnest(generate_series(0, 8)) AS r),
    cc AS (SELECT unnest(generate_series(0, 15)) AS c),
    chs AS (SELECT unnest(generate_series(0, 3)) AS ch),
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 11 * rr.r + 5 * cc.c + chs.ch) % 256 AS v
        FROM dims d, rr, cc, chs
        WHERE rr.r < d.h AND cc.c < d.w AND chs.ch < d.nch
    )
    SELECT d.doc_id AS media_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.nch AS INT) AS channels,
           CAST(CASE WHEN d.nch = 3 THEN 2 ELSE 6 END AS INT) AS color_type,
           CAST(SUM(p.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma,
           CAST(MAX(p.v) AS INT) AS max_luma
    FROM dims d JOIN px p ON p.doc_id = d.doc_id
    GROUP BY d.doc_id, d.w, d.h, d.nch
    """,
)
def image_meta_png(star: Star) -> DataFrame:
    return MM.extract_png_meta(MM.synth_png_media(star.documents))


# ---------------------------------------------------------------------------
# Recursive-hierarchy expansion (operators.graph.tree_root_depth): the
# capability a SQL Server user reaches RECURSIVE CTEs for (org charts,
# BOM explosion, category trees) — Spark has no recursive CTE, so the
# operator is a pointer-DOUBLING driver loop, O(log depth) rounds.  The
# oracle IS a recursive CTE (DuckDB), walking each node to the root —
# the two formulations agreeing is the semantic proof.  Synthetic
# hierarchy: binary tree over doc_id (parent = (id-1) DIV 2, root 0).
# ---------------------------------------------------------------------------

@register(
    "doc_tree_root_depth",
    """
    WITH RECURSIVE up AS (
        SELECT doc_id AS node, doc_id AS cur, CAST(0 AS BIGINT) AS d
        FROM documents
        UNION ALL
        SELECT node, (cur - 1) // 2, d + 1 FROM up WHERE cur > 0
    )
    SELECT node, CAST(0 AS BIGINT) AS root, MAX(d) AS depth
    FROM up GROUP BY node
    """,
)
def doc_tree_root_depth(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.graph import tree_root_depth

    edges = star.documents.filter(F.col("doc_id") > 0).select(
        F.col("doc_id").alias("child"),
        F.expr("(doc_id - 1) DIV 2").alias("parent"),
    )
    return tree_root_depth(edges).select(
        F.col("node").cast("long").alias("node"),
        F.col("root").cast("long").alias("root"),
        F.col("depth").cast("long").alias("depth"),
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frames — the frame type the reference's T-SQL
# RANGE/rows-preceding reports use and the bounded-interval complement
# of the sessionize/sliding-window family: per user, trailing-1-hour
# event count and value sum at every event.  RANGE frames bound by the
# ORDER-BY VALUE (peers included), not row position — both engines
# frame on the identical epoch-second BIGINT, and the windowed sum runs
# through DECIMAL so frame-internal summation order can't drift.  One
# user-keyed exchange; the frame evaluation is sort-local.
# ---------------------------------------------------------------------------

@register(
    "events_trailing_hour_stats",
    """
    SELECT event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def events_trailing_hour_stats(star: Star) -> DataFrame:
    from pyspark.sql.types import DecimalType

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return star.events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast(DecimalType(18, 6))).over(w)
        .cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# Shard integrity manifest — the verification artifact for bulk corpus
# movement (replication, engine migration, backup restore): per shard,
# row count, key bounds, and an ORDER-INSENSITIVE content digest
# (bit_xor of md5-derived 64-bit row hashes — XOR commutes and can't
# overflow, so the digest is layout/partitioning/visit-order invariant
# and any single changed/missing/duplicated row flips it).  One shuffle
# to shard grain, map-side combinable.
# ---------------------------------------------------------------------------

@register(
    "corpus_shard_manifest",
    f"""
    SELECT doc_id % 8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id,
           bit_xor({_hash64_sql("concat(CAST(doc_id AS VARCHAR), ':', text)", 5)}) AS content_digest
    FROM documents
    GROUP BY 1
    """,
)
def corpus_shard_manifest(star: Star) -> DataFrame:
    h = X.hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")),
        seed=5,
    )
    return (
        star.documents.select(
            (F.col("doc_id") % 8).alias("shard"), "doc_id", h.alias("h")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.expr("bit_xor(h)").alias("content_digest"),
        )
    )


# ---------------------------------------------------------------------------
# µ-law audio decode under the closed-form oracle: the synthetic G.711
# payloads decode through the REAL RIFF chunk walk + vectorized µ-law
# expansion (stdlib wave rejects format 7, so this exercises the
# non-PCM fallback path end-to-end), while the DuckDB twin applies the
# G.711 formula arithmetically — any chunk-walk or expansion bug
# changes rms/peak.
# ---------------------------------------------------------------------------

@register(
    "audio_meta_ulaw",
    """
    WITH dims AS (
        SELECT doc_id, 50 + doc_id % 100 AS n FROM documents
    ),
    ii AS (SELECT unnest(generate_series(0, 149)) AS i),
    samp AS (
        SELECT d.doc_id,
               255 - (d.doc_id * 7 + ii.i * 13) % 256 AS u
        FROM dims d, ii WHERE ii.i < d.n
    ),
    expanded AS (
        SELECT doc_id,
               CASE WHEN u >= 128
                    THEN -((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
                    ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
               END AS v
        FROM samp
    )
    SELECT d.doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(d.n AS BIGINT) AS n_frames,
           CAST(d.n * 1000 // 8000 AS BIGINT) AS duration_ms,
           round(sqrt(CAST(SUM(CAST(e.v AS BIGINT) * CAST(e.v AS BIGINT)) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)), 6) AS rms_amplitude,
           CAST(MAX(abs(e.v)) AS INT) AS peak_amplitude
    FROM dims d JOIN expanded e ON e.doc_id = d.doc_id
    GROUP BY d.doc_id, d.n
    """,
)
def audio_meta_ulaw(star: Star) -> DataFrame:
    import pandas as pd_  # noqa: F401

    media = MM.synth_ulaw_media(star.documents)

    from pyspark.sql import types as T_

    schema = T_.StructType([
        T_.StructField("media_id", T_.LongType(), False),
        T_.StructField("sample_rate", T_.IntegerType(), True),
        T_.StructField("n_channels", T_.IntegerType(), True),
        T_.StructField("n_frames", T_.LongType(), True),
        T_.StructField("duration_ms", T_.LongType(), True),
        T_.StructField("rms_amplitude", T_.DoubleType(), True),
        T_.StructField("peak_amplitude", T_.IntegerType(), True),
    ])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n_ch, nf, dur, rms, peak = MM.decode_wav_meta(bytes(payload))
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["n_frames"].append(nf)
                out["duration_ms"].append(dur)
                out["rms_amplitude"].append(round(rms, 6) if rms is not None else None)
                out["peak_amplitude"].append(peak)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# GIF decode under the closed-form oracle: real variable-width LZW
# (dictionary growth + clear codes) and, for odd doc_ids, the 4-pass
# interlace reorder — `pos_weighted_sum` is position-dependent, so an
# interlace bug breaks the hash even though mean/max wouldn't notice.
# ---------------------------------------------------------------------------

@register(
    "image_meta_gif",
    """
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
               4 + doc_id % 5 AS nc, CAST(doc_id % 2 AS INT) AS il
        FROM documents
    ),
    rr AS (SELECT unnest(generate_series(0, 8)) AS r),
    cc AS (SELECT unnest(generate_series(0, 15)) AS c),
    chs AS (SELECT unnest(generate_series(0, 2)) AS ch),
    px AS (
        SELECT d.doc_id,
               (((d.doc_id + 3 * rr.r + 5 * cc.c) % d.nc)
                * CASE chs.ch WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END) % 256 AS v,
               31 * rr.r + 7 * cc.c + chs.ch + 1 AS wgt
        FROM dims d, rr, cc, chs
        WHERE rr.r < d.h AND cc.c < d.w
    )
    SELECT d.doc_id AS media_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           d.il AS interlaced,
           CAST(SUM(p.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_rgb,
           CAST(MAX(p.v) AS INT) AS max_rgb,
           CAST(SUM(CAST(p.v AS BIGINT) * p.wgt) AS BIGINT) AS pos_weighted_sum
    FROM dims d JOIN px p ON p.doc_id = d.doc_id
    GROUP BY d.doc_id, d.w, d.h, d.il
    """,
)
def image_meta_gif(star: Star) -> DataFrame:
    return MM.extract_gif_meta(MM.synth_gif_media(star.documents))


# ---------------------------------------------------------------------------
# VariantType semi-structured path (Spark 4): parse the JSON props
# column ONCE into a Variant, then run typed extractions off the
# binary-encoded value — the parse-once/extract-many pattern that
# replaces per-field get_json_object re-parsing (each get_json_object
# call re-parses the string; a Variant parses once and field access is
# an offset lookup).  The oracle states the same semantics over
# DuckDB's JSON extraction; schema_of_variant's constant inferred
# schema rides along as evidence the typed view is what we claim.
# ---------------------------------------------------------------------------

@register(
    "events_variant_props",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           'OBJECT<k: BIGINT>' AS inferred_schema
    FROM events GROUP BY event_type
    """,
)
def events_variant_props(star: Star) -> DataFrame:
    v = star.events.select(
        "event_type", F.parse_json("props").alias("_v")
    )
    k = F.variant_get("_v", "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
        F.min(F.schema_of_variant(F.col("_v"))).alias("inferred_schema"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (similarity.hard_negatives_topk): the
# contrastive-training staple — per query, the most-similar vectors
# with a DIFFERENT label (same-label hits are false negatives and are
# excluded, which is exactly what separates this from plain ANN).
# ---------------------------------------------------------------------------

@register(
    "hard_negatives_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM e WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
               round(list_dot_product(q.qv, c.v)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        FROM q CROSS JOIN e c
        WHERE q.query_id <> c.vec_id AND c.label IS DISTINCT FROM q.qlabel
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def hard_negatives_topk_q(star: Star) -> DataFrame:
    queries = star.embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return S.hard_negatives_topk(
        star.embeddings, queries, k=5, query_id_col="query_id"
    )


# ---------------------------------------------------------------------------
# Length-bucketed inference batching: group documents into batches of
# similar token length so padding waste stays bounded (batch cost is
# max-length × batch-size; mixing a 10-token doc into a 2,000-token
# batch pays 200× padding).  Buckets = exact corpus length quartiles
# (both engines interpolate identically); batches chunk WITHIN
# (bucket, exact length) — same-length batches carry zero padding
# waste, and the window partitions on (bucket, n_tokens) so no
# partition ever holds more than one length's documents (a window
# keyed on bucket alone would put a quarter of the corpus in one
# partition at 100 TB).  One percentile aggregate re-enters broadcast.
# At scale the quartiles come from the GK sketch (approx_percentile) —
# the batching semantics are unchanged.
# ---------------------------------------------------------------------------

@register(
    "length_bucket_batches",
    f"""
    WITH lens AS (
        SELECT doc_id, CAST(len({TOKSEQ_SQL.format(col='text')}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    qs AS (
        SELECT quantile_cont(n_tokens, 0.25) AS q1,
               quantile_cont(n_tokens, 0.50) AS q2,
               quantile_cont(n_tokens, 0.75) AS q3
        FROM lens
    ),
    bucketed AS (
        SELECT l.doc_id, l.n_tokens,
               CASE WHEN l.n_tokens <= qs.q1 THEN 0
                    WHEN l.n_tokens <= qs.q2 THEN 1
                    WHEN l.n_tokens <= qs.q3 THEN 2
                    ELSE 3 END AS bucket
        FROM lens l, qs
    )
    SELECT doc_id, n_tokens, CAST(bucket AS INT) AS bucket,
           CAST((ROW_NUMBER() OVER (PARTITION BY bucket, n_tokens
                                    ORDER BY doc_id) - 1) // 16 AS INT)
               AS batch_idx
    FROM bucketed
    """,
)
def length_bucket_batches(star: Star) -> DataFrame:
    from pyspark.sql.window import Window

    lens = star.documents.select(
        "doc_id", F.size(X.tokens("text")).cast("long").alias("n_tokens")
    )
    qs = F.broadcast(
        lens.agg(
            F.percentile("n_tokens", 0.25).alias("q1"),
            F.percentile("n_tokens", 0.50).alias("q2"),
            F.percentile("n_tokens", 0.75).alias("q3"),
        )
    )
    bucketed = lens.crossJoin(qs).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") <= F.col("q1"), 0)
        .when(F.col("n_tokens") <= F.col("q2"), 1)
        .when(F.col("n_tokens") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket"),
    )
    w = Window.partitionBy("bucket", "n_tokens").orderBy("doc_id")
    return bucketed.withColumn(
        "batch_idx", ((F.row_number().over(w) - 1) / 16).cast("int")
    )


# ---------------------------------------------------------------------------
# Dedup-quality audit (dedup.cluster_quality_report): density per
# near-dup cluster.  A clique (density 1.0) collapses safely; a CHAIN
# (density → 2/n) reached its size through transitivity and
# keep-one-per-cluster risks dropping non-duplicates — chain_risk
# flags the clusters to route through a verify pass before deletion.
# Oracle: the same recursive-CTE closure as near_dup_clusters plus an
# edge count per component.
# ---------------------------------------------------------------------------

@register(
    "near_dup_cluster_quality",
    f"""
    WITH RECURSIVE {_CAND_CTE},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM cands
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM cands
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM edges e JOIN reach r ON r.src = e.dst
    ),
    comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    sizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM comp GROUP BY cluster_id HAVING COUNT(*) >= 2
    ),
    ec AS (
        SELECT c.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM (SELECT DISTINCT id_a, id_b FROM cands) p
        JOIN comp c ON c.doc_id = p.id_a
        GROUP BY c.cluster_id
    )
    SELECT s.cluster_id, s.n_nodes,
           COALESCE(ec.n_edges, 0) AS n_edges,
           round(COALESCE(ec.n_edges, 0)
                 / (CAST(s.n_nodes AS DOUBLE) * (s.n_nodes - 1) / 2), 6) AS density,
           CAST(CASE WHEN COALESCE(ec.n_edges, 0)
                          / (CAST(s.n_nodes AS DOUBLE) * (s.n_nodes - 1) / 2) < 0.5
                     THEN 1 ELSE 0 END AS INT) AS chain_risk
    FROM sizes s LEFT JOIN ec USING (cluster_id)
    """,
)
def near_dup_cluster_quality(star: Star) -> DataFrame:
    pairs, cc = _near_dup_index(star)
    return D.cluster_quality_report(star.documents.select("doc_id"), pairs, cc=cc)


# ---------------------------------------------------------------------------
# CUSUM drift detection, batch twin (streaming/stateful.py
# cusum_drift_alarms — Page 1954): the same one-sided cumulative-sum
# fold with restart-on-alarm, run per key over the ts-ordered event
# history, returning FINAL state (n_seen, s_hi, s_lo) plus total
# high/low alarm counts.  The fold is order-dependent, so the Spark
# side uses array_sort(collect_list(struct(ts, value))) + a
# higher-order aggregate() — JVM-side, no UDF; per-key history must fit
# one executor (bounded per-key cardinality — the streaming operator is
# the unbounded-scale path, this is its audit/backfill twin).  The
# oracle replays the identical IEEE fold as a recursive-CTE step
# relation; sort ties (equal ts) break on value, and equal (ts, value)
# elements contribute identically, so both folds are deterministic.
# ---------------------------------------------------------------------------

_CUSUM_TARGET, _CUSUM_SLACK, _CUSUM_THRESHOLD = 50.0, 10.0, 200.0

@register(
    "events_cusum_alarms",
    f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, value)
                   AS rn
        FROM events
    ),
    fold(user_id, rn, shi, slo, nhigh, nlow) AS (
        SELECT user_id, CAST(0 AS BIGINT),
               CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM (SELECT DISTINCT user_id FROM ev)
        UNION ALL
        SELECT f.user_id, f.rn + 1,
               CASE WHEN greatest(0.0, f.shi + (e.value - {_CUSUM_TARGET} - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                      OR greatest(0.0, f.slo + ({_CUSUM_TARGET} - e.value - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                    THEN 0.0
                    ELSE greatest(0.0, f.shi + (e.value - {_CUSUM_TARGET} - {_CUSUM_SLACK})) END,
               CASE WHEN greatest(0.0, f.shi + (e.value - {_CUSUM_TARGET} - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                      OR greatest(0.0, f.slo + ({_CUSUM_TARGET} - e.value - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                    THEN 0.0
                    ELSE greatest(0.0, f.slo + ({_CUSUM_TARGET} - e.value - {_CUSUM_SLACK})) END,
               f.nhigh + CASE WHEN greatest(0.0, f.shi + (e.value - {_CUSUM_TARGET} - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                              THEN 1 ELSE 0 END,
               f.nlow + CASE WHEN NOT (greatest(0.0, f.shi + (e.value - {_CUSUM_TARGET} - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD})
                              AND greatest(0.0, f.slo + ({_CUSUM_TARGET} - e.value - {_CUSUM_SLACK})) > {_CUSUM_THRESHOLD}
                              THEN 1 ELSE 0 END
        FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
    ),
    last AS (SELECT user_id, MAX(rn) AS mr FROM fold GROUP BY 1)
    SELECT f.user_id, f.rn AS n_seen, f.shi AS s_hi, f.slo AS s_lo,
           f.nhigh AS n_high, f.nlow AS n_low
    FROM fold f JOIN last l ON l.user_id = f.user_id AND f.rn = l.mr
    """,
)
def events_cusum_alarms(star: Star) -> DataFrame:
    T, S, TH = _CUSUM_TARGET, _CUSUM_SLACK, _CUSUM_THRESHOLD

    def step(acc, x):
        shi1 = F.greatest(F.lit(0.0), acc["shi"] + (x["value"] - F.lit(T) - F.lit(S)))
        slo1 = F.greatest(F.lit(0.0), acc["slo"] + (F.lit(T) - x["value"] - F.lit(S)))
        hi = shi1 > F.lit(TH)
        lo = (~hi) & (slo1 > F.lit(TH))
        reset = hi | lo
        return F.struct(
            F.when(reset, F.lit(0.0)).otherwise(shi1).alias("shi"),
            F.when(reset, F.lit(0.0)).otherwise(slo1).alias("slo"),
            (acc["nhigh"] + F.when(hi, F.lit(1)).otherwise(F.lit(0)).cast("long")).alias("nhigh"),
            (acc["nlow"] + F.when(lo, F.lit(1)).otherwise(F.lit(0)).cast("long")).alias("nlow"),
        )

    acc0 = F.struct(
        F.lit(0.0).alias("shi"),
        F.lit(0.0).alias("slo"),
        F.lit(0).cast("long").alias("nhigh"),
        F.lit(0).cast("long").alias("nlow"),
    )
    return (
        star.events.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("seq"))
        .select(
            "user_id",
            F.size("seq").cast("long").alias("n_seen"),
            F.aggregate("seq", acc0, step).alias("st"),
        )
        .select(
            "user_id", "n_seen",
            F.col("st.shi").alias("s_hi"),
            F.col("st.slo").alias("s_lo"),
            F.col("st.nhigh").alias("n_high"),
            F.col("st.nlow").alias("n_low"),
        )
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters, batch twin (streaming/stateful.py
# heavy_hitters / misra_gries_batch — Misra & Gries 1982): the same
# bounded-counter fold the streaming monitor runs, replayed over the
# (ts, item)-ordered per-key history via array_sort(collect_list) + a
# higher-order aggregate() whose accumulator is the (item, cnt) counter
# array — the events_cusum_alarms pattern with list-valued state.  The
# oracle replays the identical fold as a recursive-CTE step relation
# carrying (items, counts) LIST columns; note DuckDB's list_position
# returns 0 (not NULL) on miss, so membership tests use `> 0` — Spark's
# array_position has the same convention.  Final emission: top-5
# counters per key, count desc / item-string asc.
# ---------------------------------------------------------------------------

_MG_K, _MG_TOP = 8, 5

@register(
    "events_heavy_hitters",
    f"""
    WITH RECURSIVE ev AS (
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               user_id,
               row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, user_id) AS rn
        FROM events
    ),
    fold(event_type, day, rn, items, counts) AS (
        SELECT event_type, day, CAST(0 AS BIGINT),
               CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
        FROM (SELECT DISTINCT event_type, day FROM ev)
        UNION ALL
        SELECT f.event_type, f.day, f.rn + 1,
               CASE WHEN list_position(f.items, e.user_id) > 0 THEN f.items
                    WHEN len(f.items) < {_MG_K}
                    THEN list_append(f.items, e.user_id)
                    ELSE list_transform(
                           list_filter(generate_series(1, len(f.items)),
                                       i -> f.counts[i] > 1),
                           i -> f.items[i]) END,
               CASE WHEN list_position(f.items, e.user_id) > 0
                    THEN list_transform(generate_series(1, len(f.counts)),
                           i -> CASE WHEN i = list_position(f.items, e.user_id)
                                     THEN f.counts[i] + 1
                                     ELSE f.counts[i] END)
                    WHEN len(f.items) < {_MG_K}
                    THEN list_append(f.counts, CAST(1 AS BIGINT))
                    ELSE list_transform(
                           list_filter(generate_series(1, len(f.counts)),
                                       i -> f.counts[i] > 1),
                           i -> f.counts[i] - 1) END
        FROM fold f JOIN ev e ON e.event_type = f.event_type
                             AND e.day = f.day AND e.rn = f.rn + 1
    ),
    last AS (
        SELECT event_type, day, MAX(rn) AS mr FROM fold GROUP BY 1, 2
    ),
    final AS (
        SELECT f.event_type, f.day, f.rn AS n_seen, f.items, f.counts
        FROM fold f JOIN last l ON l.event_type = f.event_type
                               AND l.day = f.day AND f.rn = l.mr
    ),
    exploded AS (
        SELECT event_type, day, n_seen,
               CAST(items[i] AS VARCHAR) AS item, counts[i] AS est_count
        FROM final, unnest(generate_series(1, len(items))) AS t(i)
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY event_type, day
                       ORDER BY est_count DESC, item ASC) AS INT) AS rank
        FROM exploded
    )
    SELECT event_type, day, item, est_count, n_seen, rank
    FROM ranked WHERE rank <= {_MG_TOP}
    """,
)
def events_heavy_hitters(star: Star) -> DataFrame:
    """Daily heavy-hitter replay: the (event_type, day) grain keeps the
    recursive oracle's iteration count at the max PER-DAY history (the
    recursion steps once per fold position), and is the natural batch
    shape anyway — 'who dominated each key each day'."""
    from sap_data_pipeline_spark.streaming.stateful import misra_gries_batch

    ev = star.events.withColumn(
        "day", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    )
    return misra_gries_batch(
        ev, key_cols=("event_type", "day"), item_col="user_id",
        ts_col="ts", k=_MG_K, emit_top=_MG_TOP,
    )


# ---------------------------------------------------------------------------
# Windowed distinct-count HLL, batch twin (streaming/ingest.py
# windowed_approx_distinct — Flajolet et al. 2007): the streaming
# monitor serves estimates from Spark's DataSketches HLL
# (hll_sketch_agg); this is its auditable batch replay with the SAME
# register semantics re-derived over the portable hash64, so the whole
# sketch — bucket split, rank (rho) extraction, register max-merge,
# harmonic mean, linear-counting fallback — is value-hashed against
# DuckDB.  Everything is integer-exact by construction: the harmonic
# denominator sums 2^(57-M_j) terms (M_j <= 57 for a 56-bit rank
# domain, so the sum fits a 64-bit long at m=16), the single float
# division uses one shared literal numerator, and the linear-counting
# branch reads m*ln(m/V) from a 16-entry literal table instead of
# calling ln() — no libm, no float-order nondeterminism anywhere.
# m=16 is deliberately small so the day-grain distinct counts (~50-70
# users) exercise BOTH estimator branches on the test data; the
# streaming monitor's lg_k=12 is the accuracy path, gated separately in
# tests.  exact_distinct rides the same shuffle: buckets partition the
# hash space, so per-bucket COUNT(DISTINCT h) sums to the global
# distinct — the error is visible inline at zero extra passes.
# ---------------------------------------------------------------------------

_HLL_P = 4                     # 2^4 = 16 registers
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P           # hash64 is 60-bit; rank domain width
_HLL_SCALE = _HLL_W + 1        # 2^(SCALE - M_j) terms are integers
_HLL_ALPHA = 0.673             # standard HLL alpha for m=16
_HLL_NUMER = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_SCALE)
_HLL_LIN = [_HLL_M * math.log(_HLL_M / v) for v in range(1, _HLL_M + 1)]
_HLL_SEED = 31


@register(
    "events_windowed_distinct_hll",
    f"""
    WITH ev AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
               {_hash64_sql('CAST(user_id AS VARCHAR)', _HLL_SEED)} AS h
        FROM events
    ),
    b AS (
        SELECT day, event_type, h & {_HLL_M - 1} AS j, h >> {_HLL_P} AS x
        FROM ev
    ),
    r AS (
        SELECT day, event_type, j,
               MAX(CASE WHEN x = 0 THEN {_HLL_SCALE}
                        ELSE {_HLL_SCALE} - length(bin(x)) END) AS m_j,
               COUNT(*) AS n_ev, COUNT(DISTINCT x) AS nd
        FROM b GROUP BY 1, 2, 3
    ),
    a AS (
        SELECT day, event_type,
               CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_SCALE} - m_j)) AS BIGINT)
                   AS occ_sum,
               COUNT(*) AS n_occ,
               CAST(SUM(n_ev) AS BIGINT) AS n_events,
               CAST(SUM(nd) AS BIGINT) AS exact_distinct
        FROM r GROUP BY 1, 2
    )
    SELECT day, event_type, n_events, exact_distinct,
           CAST({_HLL_M} - n_occ AS INT) AS v_zero,
           CAST(round(
               CASE WHEN {_HLL_NUMER!r}
                         / CAST(occ_sum + ({_HLL_M} - n_occ)
                                * {1 << _HLL_SCALE} AS DOUBLE) <= {2.5 * _HLL_M!r}
                         AND n_occ < {_HLL_M}
                    THEN [{', '.join(repr(v) for v in _HLL_LIN)}][{_HLL_M} - n_occ]
                    ELSE {_HLL_NUMER!r}
                         / CAST(occ_sum + ({_HLL_M} - n_occ)
                                * {1 << _HLL_SCALE} AS DOUBLE)
               END, 3) AS DOUBLE) AS approx_distinct
    FROM a
    """,
)
def events_windowed_distinct_hll(star: Star) -> DataFrame:
    ev = star.events.select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        "event_type",
        X.hash64(F.col("user_id").cast("string"), _HLL_SEED).alias("h"),
    )
    b = ev.select(
        "day", "event_type",
        F.col("h").bitwiseAND(F.lit(_HLL_M - 1)).alias("j"),
        F.shiftright("h", _HLL_P).alias("x"),
    )
    # Per-register partials: one shuffle keyed (day, event_type, j);
    # the register merge is a plain MAX, so map-side combine applies and
    # the second aggregate re-keys m=16 rows per group — the exact
    # mergeable-register shape the streaming monitor exploits, and the
    # same two-level cascade a 1000-executor backfill would want.
    r = b.groupBy("day", "event_type", "j").agg(
        F.max(
            F.when(F.col("x") == 0, F.lit(_HLL_SCALE)).otherwise(
                F.lit(_HLL_SCALE) - F.length(F.bin("x"))
            )
        ).alias("m_j"),
        F.count(F.lit(1)).alias("n_ev"),
        F.countDistinct("x").alias("nd"),
    )
    a = r.groupBy("day", "event_type").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SCALE} - m_j)")
        ).alias("occ_sum"),
        F.count(F.lit(1)).alias("n_occ"),
        F.sum("n_ev").alias("n_events"),
        F.sum("nd").alias("exact_distinct"),
    )
    denom = (
        F.col("occ_sum")
        + (F.lit(_HLL_M) - F.col("n_occ")) * F.lit(1 << _HLL_SCALE)
    ).cast("double")
    e_raw = F.lit(_HLL_NUMER) / denom
    lin = F.element_at(
        F.array(*[F.lit(v) for v in _HLL_LIN]),
        (F.lit(_HLL_M) - F.col("n_occ")).cast("int"),
    )
    return a.select(
        "day", "event_type", "n_events", "exact_distinct",
        (F.lit(_HLL_M) - F.col("n_occ")).cast("int").alias("v_zero"),
        F.round(
            F.when(
                (e_raw <= F.lit(2.5 * _HLL_M)) & (F.col("n_occ") < _HLL_M),
                lin,
            ).otherwise(e_raw),
            3,
        ).alias("approx_distinct"),
    )


# ---------------------------------------------------------------------------
# Interval-overlap join — user activity intervals vs maintenance windows.
# The theta-join shape (ON a.start <= b.end AND b.start <= a.end) that
# Catalyst would plan as BroadcastNestedLoopJoin; the operator rewrites
# it as an equi hash join on quantized axis bins with emit-once-at-
# first-overlap-bin semantics (operators/temporal.interval_overlap_join).
# Windows are synthesized deterministically (120 x 90-minute windows
# every 6 h from 2024-01-01 UTC) with an identical DuckDB CTE twin.
# ---------------------------------------------------------------------------

_EPOCH_2024 = 1704067200  # 2024-01-01 00:00:00 UTC, shared literal


@register(
    "activity_window_overlap",
    f"""
    WITH activity AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS a_start,
               CAST(floor(epoch(max(ts))) AS BIGINT) AS a_end
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT CAST(i AS BIGINT) AS window_id,
               {_EPOCH_2024} + CAST(i AS BIGINT) * 21600 AS w_start,
               {_EPOCH_2024} + CAST(i AS BIGINT) * 21600 + 5400 AS w_end
        FROM (SELECT unnest(generate_series(0, 119)) AS i)
    )
    SELECT a.user_id, strftime(a.day, '%Y-%m-%d') AS day, w.window_id,
           least(a.a_end, w.w_end) - greatest(a.a_start, w.w_start)
               AS overlap_sec
    FROM activity a JOIN win w
      ON a.a_start <= w.w_end AND w.w_start <= a.a_end
    """,
)
def activity_window_overlap(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    activity = star.events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.unix_timestamp(F.min("ts")).alias("a_start"),
        F.unix_timestamp(F.max("ts")).alias("a_end"),
    )
    windows = star.events.sparkSession.range(120).select(
        F.col("id").alias("window_id"),
        (F.lit(_EPOCH_2024) + F.col("id") * 21600).alias("w_start"),
        (F.lit(_EPOCH_2024) + F.col("id") * 21600 + 5400).alias("w_end"),
    )
    joined = interval_overlap_join(
        activity, windows,
        left_start="a_start", left_end="a_end",
        right_start="w_start", right_end="w_end",
        bin_size=21600,
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "window_id",
        (F.least("a_end", "w_end") - F.greatest("a_start", "w_start"))
        .cast("long")
        .alias("overlap_sec"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis-Spirakis A-Res): inclusion probability
# proportional to document length — the "sample long documents more"
# curation knob, content-addressed so retries/replicas agree
# (operators/sampling.weighted_sample_n).
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_by_length",
    f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               round(ln((CAST({_hash64_sql("CAST(doc_id AS VARCHAR)", 23)}
                              % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
                     / CAST(n_chars AS DOUBLE), 9) AS priority
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY priority DESC, doc_id ASC
        ) AS rk
        FROM scored
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, priority
    FROM ranked WHERE rk <= 20
    """,
)
def weighted_sample_by_length(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import weighted_sample_n

    out = weighted_sample_n(
        star.documents.select("doc_id", "lang", "n_chars"),
        ["lang"], 20, key="doc_id", weight_col="n_chars", seed=23,
    )
    return out.select(
        "doc_id", "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        "priority",  # part of weighted_sample_n's documented contract
    )


# ---------------------------------------------------------------------------
# PCA whitening of the embedding column (operators.similarity.pca_train /
# pca_project): dimensionality reduction + isotropy normalization ahead
# of cosine-threshold dedup and ANN.  Rows-only by design — the basis
# comes from a distributed eigensolve with no cross-engine twin; the
# subspace/whitening contracts are differential-tested against numpy in
# test_dedup_similarity.  Train-once: the basis is a corpus artifact,
# cached per (sf_dir, params) beside the ANN codebooks.
# ---------------------------------------------------------------------------

_PCA_PARAMS = dict(dim=64, k=8, seed=7)


def _pca_model_cached(star: Star) -> dict:
    return _model_cached(
        star, "pca", _PCA_PARAMS,
        lambda: S.pca_train(star.embeddings, **_PCA_PARAMS),
    )


@register("embedding_pca_whiten")
def embedding_pca_whiten(star: Star) -> DataFrame:
    out = S.pca_project(
        star.embeddings, _pca_model_cached(star), whiten=True
    )
    return out.select("vec_id", "label", F.col("pca").alias("pca_whitened"))


# ---------------------------------------------------------------------------
# Fixed-literal-basis projection (r8 verdict #7): embedding_pca_whiten is
# rows-only because the eigensolve's basis is data-dependent; THIS query
# runs the exact same production projection kernel (pca_project →
# _project_cols: shared centered array, zip_with/aggregate dot folds,
# whitening division, 6 dp rounding) with a deterministic literal model,
# so the projection math itself gets a cross-engine value hash.  The
# basis/mean/std literals are generated once here and embedded in BOTH
# the Spark plan and the oracle SQL; the fold order (i ascending,
# left-assoc, double arithmetic on float32 inputs) is identical on both
# engines, and the 6 dp round absorbs any last-ulp divergence.
# ---------------------------------------------------------------------------

_FB_DIM, _FB_K = 64, 4


def _fb_model() -> dict:
    import random

    rng = random.Random(20260815)
    mean = [round((rng.random() - 0.5) / 10, 6) for _ in range(_FB_DIM)]
    comps = [
        [round(rng.random() - 0.5, 6) for _ in range(_FB_DIM)]
        for _ in range(_FB_K)
    ]
    return {"mean": mean, "components": comps,
            "comp_std": [0.5, 1.0, 2.0, 0.25]}


def _fb_oracle() -> str:
    m = _fb_model()
    outs = []
    for j in range(_FB_K):
        terms = " + ".join(
            f"(CAST(embedding[{i + 1}] AS DOUBLE) - {m['mean'][i]!r})"
            f" * {m['components'][j][i]!r}"
            for i in range(_FB_DIM)
        )
        outs.append(
            f"round((0.0 + {terms}) / {m['comp_std'][j] + 1e-12!r}, 6)"
            f" AS pc{j + 1}"
        )
    return (
        "SELECT vec_id, label, " + ", ".join(outs) + " FROM embeddings"
    )


@register("embedding_fixed_basis_project", _fb_oracle())
def embedding_fixed_basis_project(star: Star) -> DataFrame:
    out = S.pca_project(star.embeddings, _fb_model(), whiten=True)
    return out.select(
        "vec_id", "label",
        *[F.col("pca")[j].alias(f"pc{j + 1}") for j in range(_FB_K)],
    )


# ---------------------------------------------------------------------------
# Label-propagation communities over the synthetic host graph
# (operators.graph.label_propagation): dense-region detection (mirror
# farms / link rings) where CC would merge the whole web into one
# component.  Deterministic min-label tie-break makes the fixed-round
# algorithm SQL-expressible — the oracle unrolls the rounds as CTEs,
# exactly like the PageRank twin.
# ---------------------------------------------------------------------------


def _lpa_oracle(iterations: int = 4) -> str:
    ctes = [
        f"raw AS ({_PR_EDGE_SQL})",
        """fwd AS (
        SELECT src, dst FROM raw
        UNION SELECT dst AS src, src AS dst FROM raw)""",
        "e AS (SELECT DISTINCT src, dst FROM fwd WHERE src <> dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"""c{i} AS (
        SELECT node, lbl, COUNT(*) AS cnt FROM (
            SELECT e.dst AS node, l.lbl
            FROM {p} l JOIN e ON l.node = e.src
            UNION ALL
            SELECT node, lbl FROM {p}
        ) GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""l{i} AS (
        SELECT node, lbl FROM (
            SELECT node, lbl, row_number() OVER (
                PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
            FROM c{i})
        WHERE rn = 1)"""
        )
    last = f"l{iterations}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f""",
    sz AS (SELECT lbl, COUNT(*) AS community_size FROM {last} GROUP BY 1)
    SELECT CAST(l.node AS BIGINT) AS host_id,
           CAST(l.lbl AS BIGINT) AS community,
           CAST(sz.community_size AS BIGINT) AS community_size
    FROM {last} l JOIN sz ON l.lbl = sz.lbl
    """
    )


@register("host_communities_lpa", _lpa_oracle())
def host_communities_lpa(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import graph as G

    docs = star.documents
    e1 = docs.select(
        (F.col("doc_id") % 89).alias("src"), (F.col("doc_id") % 83).alias("dst")
    )
    e2 = docs.select(
        (F.col("doc_id") % 89).alias("src"),
        (F.lit(89) + F.col("doc_id") % 7).alias("dst"),
    )
    lab = G.label_propagation(e1.unionAll(e2), iterations=4)
    sizes = lab.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return lab.join(sizes, "community").select(
        F.col("node").cast("long").alias("host_id"),
        F.col("community").cast("long").alias("community"),
        "community_size",
    )


# ---------------------------------------------------------------------------
# Corpus k-NN graph (operators.similarity.knn_graph): every vector's
# top-k cosine neighbors within its deterministic quantizer cells — the
# building block for graph-based curation (SemDeDup communities,
# density pruning).  The seeded-sample quantizer makes the WHOLE graph
# SQL-replayable, so unlike the trained-IVF query batch this gets a
# full value-hash oracle.  The oracle re-derives the PRODUCTION auto
# cell count n_cells = clamp(floor(sqrt(N·nprobe)), 8, 2048) from the
# corpus (r11 verdict #3: the old fixture pinned n_cells=8 — the
# DuckDB-LIMIT-8 convenience — and the sf1 checkpoint measured that
# anti-scale shape at a 35× quadratic wall while the auto default
# lands ~N^1.5; the hashed evidence now IS the 100 TB plan).
# ---------------------------------------------------------------------------

@register(
    "knn_graph_cells",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nc AS (
        SELECT GREATEST(8, LEAST(2048,
                   CAST(floor(sqrt(COUNT(*) * 2.0)) AS BIGINT))) AS n
        FROM e
    ),
    cents AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS INT) AS cell,
               v AS cv
        FROM (
            SELECT vec_id, v,
                   md5('cell:' || CAST(vec_id AS VARCHAR)) AS r,
                   ROW_NUMBER() OVER (
                       ORDER BY md5('cell:' || CAST(vec_id AS VARCHAR)),
                                vec_id) AS rn
            FROM e
        ) s, nc WHERE s.rn <= nc.n
    ),
    dists AS (
        SELECT e.vec_id, c.cell,
               list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
        FROM e CROSS JOIN cents c
    ),
    probed AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cell) AS rk
            FROM dists
        ) WHERE rk <= 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
        FROM probed a JOIN probed b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    scored AS (
        SELECT cand.vec_id, cand.neighbor_id,
               round(list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v))
                        * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
        FROM cand JOIN e ea ON ea.vec_id = cand.vec_id
                  JOIN e eb ON eb.vec_id = cand.neighbor_id
    )
    SELECT vec_id, neighbor_id, cosine, CAST(rk AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def knn_graph_cells(star: Star) -> DataFrame:
    # n_cells=None → the production auto default √(N·nprobe): the
    # driver-hashed query and the scale path are the SAME plan
    out = S.knn_graph(star.embeddings, k=3, nprobe=2)
    return out.select(
        "vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


# ---------------------------------------------------------------------------
# Per-host triangle counts / clustering coefficient
# (operators.graph.triangle_counts): neighborhood-density curation
# signal (organic hosts close triangles, link farms spray) — the
# per-node refinement of the near-dup cluster-quality audit.  Oriented
# two-join enumeration is fully SQL-expressible, so the whole frame is
# value-hash-oracled.
# ---------------------------------------------------------------------------

@register(
    "host_triangle_stats",
    f"""
    WITH raw AS ({_PR_EDGE_SQL}),
    und AS (
        SELECT src AS a, dst AS b FROM raw
        UNION SELECT dst AS a, src AS b FROM raw),
    e AS (SELECT DISTINCT a, b FROM und WHERE a <> b),
    ori AS (SELECT a, b FROM e WHERE a < b),
    deg AS (SELECT a AS node, COUNT(*) AS degree FROM e GROUP BY 1),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM ori e1 JOIN ori e2 ON e1.b = e2.a
                    JOIN ori e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
        SELECT node, COUNT(*) AS triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri
        ) GROUP BY 1
    )
    SELECT CAST(d.node AS BIGINT) AS host_id,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * COALESCE(pn.triangles, 0)
                           / (d.degree * (d.degree - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN pn ON d.node = pn.node
    """,
)
def host_triangle_stats(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators import graph as G

    docs = star.documents
    e1 = docs.select(
        (F.col("doc_id") % 89).alias("src"), (F.col("doc_id") % 83).alias("dst")
    )
    e2 = docs.select(
        (F.col("doc_id") % 89).alias("src"),
        (F.lit(89) + F.col("doc_id") % 7).alias("dst"),
    )
    out = G.triangle_counts(e1.unionAll(e2))
    return out.select(
        F.col("node").cast("long").alias("host_id"),
        "degree", "triangles", "clustering",
    )


# ---------------------------------------------------------------------------
# Keyed interval-overlap self-join: pairs of users whose same-type
# daily activity intervals overlap, aggregated per event type — drives
# interval_overlap_join's `on`-keys path (the bin key composes with a
# real equi key) and its self-join shape through the oracle gate.
# ---------------------------------------------------------------------------


@register(
    "concurrent_activity_pairs",
    """
    WITH act AS (
        SELECT event_type, user_id, CAST(ts AS DATE) AS day,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS s,
               CAST(floor(epoch(max(ts))) AS BIGINT) AS e
        FROM events GROUP BY 1, 2, 3
    )
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
               AS total_overlap_sec
    FROM act a JOIN act b
      ON a.event_type = b.event_type
     AND a.user_id < b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    """,
)
def concurrent_activity_pairs(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import interval_overlap_join

    act = star.events.groupBy(
        "event_type", "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.unix_timestamp(F.min("ts")).alias("s"),
        F.unix_timestamp(F.max("ts")).alias("e"),
    )
    left = act.select(
        "event_type", F.col("user_id").alias("user_a"),
        F.col("day").alias("day_a"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = act.select(
        "event_type", F.col("user_id").alias("user_b"),
        F.col("day").alias("day_b"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    joined = interval_overlap_join(
        left, right, on=["event_type"],
        left_start="sa", left_end="ea",
        right_start="sb", right_end="eb", bin_size=21600,
    ).filter(F.col("user_a") < F.col("user_b"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlapping_pairs"),
        F.sum(
            F.least("ea", "eb") - F.greatest("sa", "sb")
        ).cast("long").alias("total_overlap_sec"),
    )


# ---------------------------------------------------------------------------
# ExactSubstr excision (operators.dedup.exact_substring_excise): rewrite
# every document with repeated width-token spans removed, keeping only
# the corpus-canonical first occurrence (min doc, then min position) —
# the production excise pass of Lee et al. 2021 whose MEASUREMENT twin
# is repeated_substring_stats.  Width 8 against the synthetic corpus's
# ~54-token documents plays the role 50 plays in production.  The
# Spark side marks duplicates via row_number over md5 window
# fingerprints; the oracle ranks the raw gram strings — identical
# verdicts absent an md5 collision.  Both sides use their own
# consistent position base (Spark 0-based, DuckDB 1-based).
# ---------------------------------------------------------------------------

_XS_W = 8

@register(
    "exact_substring_excise",
    f"""
    WITH d AS (SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents),
    pos AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {_XS_W - 1}, 0))) AS i
        FROM d
    ),
    wins AS (
        SELECT doc_id, i,
               array_to_string(list_slice(t, i, i + {_XS_W - 1}), ' ') AS g
        FROM pos
    ),
    hits AS (
        SELECT doc_id, i FROM wins
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY doc_id, i) > 1
    ),
    dropsets AS (
        SELECT doc_id,
               list_distinct(flatten(list(generate_series(i, i + {_XS_W - 1}))))
                   AS dp
        FROM hits GROUP BY doc_id
    ),
    kept AS (
        SELECT d.doc_id, t,
               CASE WHEN dp IS NULL THEN t
                    ELSE list_filter(t, (x, j) -> NOT list_contains(dp, j))
               END AS k
        FROM d LEFT JOIN dropsets USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(k) AS BIGINT) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
           COALESCE(array_to_string(k, ' '), '') AS clean_text
    FROM kept
    """,
)
def exact_substring_excise_q(star: Star) -> DataFrame:
    return D.exact_substring_excise(star.documents, width=_XS_W)


# ---------------------------------------------------------------------------
# Per-host boilerplate removal (operators.corpus.
# host_boilerplate_removal): the RefinedWeb-style site-chrome filter —
# lines repeating across ≥ threshold% of ONE host's documents are
# removed without touching corpus-global frequencies.  Hosts and chrome
# lines are synthesized deterministically (doc_id residues) exactly as
# line_dedup_c4 synthesizes its global boilerplate: NAV/COPYRIGHT lines
# repeat on 100% of a host's docs (removed), the promo line on ~20%
# (kept), the doc's own text is host-unique (kept).  The 50% cut
# compares 100·line_docs ≥ 50·host_docs in integer arithmetic.
# ---------------------------------------------------------------------------

_HB_HOSTS = 23
_HB_DIRTY_SQL = f"""
    SELECT doc_id, doc_id % {_HB_HOSTS} AS host,
           'NAV menu host ' || CAST(doc_id % {_HB_HOSTS} AS VARCHAR) || chr(10)
           || 'COPYRIGHT host ' || CAST(doc_id % {_HB_HOSTS} AS VARCHAR) || chr(10)
           || text || chr(10)
           || 'promo ' || CAST(doc_id % 5 AS VARCHAR)
           || ' host ' || CAST(doc_id % {_HB_HOSTS} AS VARCHAR) AS t
    FROM documents
"""

@register(
    "host_boilerplate_lines",
    f"""
    WITH dirty AS ({_HB_DIRTY_SQL}),
    lines AS (
        SELECT doc_id, host,
               generate_subscripts(string_split(t, chr(10)), 1) - 1 AS idx,
               unnest(string_split(t, chr(10))) AS line
        FROM dirty
    ),
    hostdocs AS (
        SELECT host, COUNT(DISTINCT doc_id) AS hd FROM lines GROUP BY host
    ),
    linedocs AS (
        SELECT host, line, COUNT(DISTINCT doc_id) AS ld
        FROM lines GROUP BY host, line
    ),
    boiler AS (
        SELECT l.host, l.line
        FROM linedocs l JOIN hostdocs h USING (host)
        WHERE h.hd >= 3 AND l.ld * 100 >= h.hd * 50
    )
    SELECT l.doc_id,
           CAST(l.host AS BIGINT) AS host,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE b.line IS NOT NULL) AS BIGINT)
               AS n_boilerplate_removed,
           COALESCE(string_agg(l.line, chr(10) ORDER BY l.idx)
                        FILTER (WHERE b.line IS NULL), '') AS cleaned_text
    FROM lines l LEFT JOIN boiler b ON l.host = b.host AND l.line = b.line
    GROUP BY l.doc_id, l.host
    """,
)
def host_boilerplate_lines_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import host_boilerplate_removal

    host = F.pmod(F.col("doc_id"), F.lit(_HB_HOSTS))
    dirty = star.documents.select(
        "doc_id",
        host.alias("host"),
        F.concat(
            F.lit("NAV menu host "), host.cast("string"), F.lit("\n"),
            F.lit("COPYRIGHT host "), host.cast("string"), F.lit("\n"),
            F.col("text"), F.lit("\n"),
            F.lit("promo "),
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            F.lit(" host "), host.cast("string"),
        ).alias("text"),
    )
    return host_boilerplate_removal(
        dirty, host_col="host", threshold_pct=50, min_docs=3
    )


# ---------------------------------------------------------------------------
# Distribution-drift PSI (operators.quality.drift_psi): Population
# Stability Index of the current corpus slice vs the reference slice,
# per feature — the admit/investigate gate a pipeline runs on every new
# crawl before mixing it in.  The ref/cur split is the deterministic
# doc_id parity (the synthetic stand-in for crawl_date <= cutoff);
# buckets are fixed-edge (lang, source, capped n_chars/100 decile) so
# bucket ids are scale-stable.  Both engines floor shares at 1e-6 and
# round the final PSI to 6 decimals.
# ---------------------------------------------------------------------------

_PSI_LEN_BUCKET = "CAST(least(CAST(floor(n_chars / 100) AS BIGINT), 9) AS VARCHAR)"

@register(
    "source_drift_psi",
    f"""
    WITH ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    cur AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    rb AS (
        SELECT feature, COALESCE(bucket, '<null>') AS bucket, COUNT(*) AS ref_cnt
        FROM (
            SELECT 'lang' AS feature, lang AS bucket FROM ref
            UNION ALL SELECT 'len_bucket', {_PSI_LEN_BUCKET} FROM ref
            UNION ALL SELECT 'source', source FROM ref
        ) GROUP BY 1, 2
    ),
    cb AS (
        SELECT feature, COALESCE(bucket, '<null>') AS bucket, COUNT(*) AS cur_cnt
        FROM (
            SELECT 'lang' AS feature, lang AS bucket FROM cur
            UNION ALL SELECT 'len_bucket', {_PSI_LEN_BUCKET} FROM cur
            UNION ALL SELECT 'source', source FROM cur
        ) GROUP BY 1, 2
    ),
    j AS (
        SELECT COALESCE(rb.feature, cb.feature) AS feature,
               COALESCE(rb.ref_cnt, 0) AS ref_cnt,
               COALESCE(cb.cur_cnt, 0) AS cur_cnt
        FROM rb FULL OUTER JOIN cb
          ON rb.feature = cb.feature AND rb.bucket = cb.bucket
    ),
    p AS (
        SELECT feature,
               greatest(ref_cnt * 1.0 / SUM(ref_cnt) OVER (PARTITION BY feature),
                        1e-06) AS pr,
               greatest(cur_cnt * 1.0 / SUM(cur_cnt) OVER (PARTITION BY feature),
                        1e-06) AS pc
        FROM j
    )
    SELECT feature,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           round(SUM((pc - pr) * ln(pc / pr)), 6) AS psi
    FROM p GROUP BY feature
    """,
)
def source_drift_psi_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.quality import drift_psi

    ref = star.documents.filter(F.pmod("doc_id", F.lit(2)) == 0)
    cur = star.documents.filter(F.pmod("doc_id", F.lit(2)) == 1)
    features = {
        "lang": F.col("lang"),
        "source": F.col("source"),
        "len_bucket": F.least(
            F.floor(F.col("n_chars") / 100).cast("long"), F.lit(9).cast("long")
        ),
    }
    return drift_psi(ref, cur, features)


# ---------------------------------------------------------------------------
# Exact-size proportional holdout (operators.sampling.
# proportional_holdout): largest-remainder (Hamilton) apportionment of
# an exact global total across language strata + lowest-md5-hash picks
# within each stratum — the eval-set builder whose size is a CONTRACT
# (hash-fraction splits drift ±sqrt(n); uniform caps distort the mix).
# Shares are exact-integer products divided once (bit-identical doubles
# on both engines); remainder ties break to the smaller stratum.
# ---------------------------------------------------------------------------

_HOLDOUT_TOTAL = 100
_HOLDOUT_SEED = 41

@register(
    "eval_holdout_exact",
    f"""
    WITH counts AS (
        SELECT lang AS stratum, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM counts),
    alloc0 AS (
        SELECT stratum,
               CAST(floor(({_HOLDOUT_TOTAL} * n) / nn) AS BIGINT) AS base,
               ({_HOLDOUT_TOTAL} * n) / nn
                   - floor(({_HOLDOUT_TOTAL} * n) / nn) AS rem
        FROM counts CROSS JOIN tot
    ),
    alloc AS (
        SELECT stratum,
               base + CASE WHEN row_number()
                               OVER (ORDER BY rem DESC, stratum ASC)
                           <= {_HOLDOUT_TOTAL}
                              - (SELECT SUM(base) FROM alloc0)
                      THEN 1 ELSE 0 END AS quota
        FROM alloc0
    ),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_hash64_sql('CAST(doc_id AS VARCHAR)', _HOLDOUT_SEED)} ASC,
                            doc_id ASC
               ) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM ranked r JOIN alloc a ON a.stratum = r.lang
    WHERE r.rk <= a.quota
    """,
)
def eval_holdout_exact_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import proportional_holdout

    return proportional_holdout(
        star.documents.select("doc_id", "lang"),
        "lang", _HOLDOUT_TOTAL, key="doc_id", seed=_HOLDOUT_SEED,
    )


# ---------------------------------------------------------------------------
# k-anonymity release gate (operators.quality.k_anonymity_report):
# quasi-identifier groups below k are re-identification risks — the
# audit run before publishing corpus metadata or sampling
# user-adjacent records into a training set.  QIDs here are the
# realistic metadata triple (lang, source, n_chars decile); k = 5.
# ---------------------------------------------------------------------------

_KANON_K = 5

@register(
    "k_anonymity_risk",
    f"""
    SELECT lang, source,
           CAST(least(CAST(floor(n_chars / 100) AS BIGINT), 9) AS BIGINT)
               AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < {_KANON_K}
    """,
)
def k_anonymity_risk_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.quality import k_anonymity_report

    qid = star.documents.select(
        "lang",
        "source",
        F.least(
            F.floor(F.col("n_chars") / 100).cast("long"), F.lit(9).cast("long")
        ).alias("len_bucket"),
    )
    return k_anonymity_report(qid, ["lang", "source", "len_bucket"], _KANON_K)


# ---------------------------------------------------------------------------
# Token-level OOV drift (operators.corpus.oov_drift): share of the
# current snapshot's token OCCURRENCES outside the reference vocabulary
# (ref tokens with count >= 2) — the tokenizer-coverage gate that
# catches content drifting under a frozen tokenizer, complementing the
# metadata-level source_drift_psi.  Same deterministic doc_id-parity
# ref/cur split; occurrences count with multiplicity.
# ---------------------------------------------------------------------------

_OOV_MIN_COUNT = 2

@register(
    "vocab_oov_drift",
    f"""
    WITH ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    cur AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    vocab AS (
        SELECT tok FROM (
            SELECT unnest({TOKSEQ_SQL.format(col='text')}) AS tok FROM ref
        ) GROUP BY tok HAVING COUNT(*) >= {_OOV_MIN_COUNT}
    ),
    cur_toks AS (
        SELECT lang, unnest({TOKSEQ_SQL.format(col='text')}) AS tok FROM cur
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
           round(CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate
    FROM cur_toks c LEFT JOIN vocab v USING (tok)
    GROUP BY lang
    """,
)
def vocab_oov_drift_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import oov_drift

    ref = star.documents.filter(F.pmod("doc_id", F.lit(2)) == 0)
    cur = star.documents.filter(F.pmod("doc_id", F.lit(2)) == 1)
    return oov_drift(ref, cur, group_col="lang", min_count=_OOV_MIN_COUNT)


# ---------------------------------------------------------------------------
# Leakage-safe split (operators.sampling.dedup_safe_split): the split
# hash key is the CONTENT fingerprint, not the row id — exact
# duplicates / re-crawls land in the same band by construction, closing
# the train/test-leakage hole an id-keyed split (train_test_split)
# leaves open.  Stateless scan, zero shuffles: group-atomicity needs no
# group-by because equal texts hash equal.
# ---------------------------------------------------------------------------

_DSS_SEED = 31
_DSS_H = _hash64_sql("fingerprint", _DSS_SEED)

@register(
    "dedup_safe_split",
    f"""
    WITH fp AS (
        SELECT doc_id, md5({NORM_SQL.format(col='text')}) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           CAST({_DSS_H} % 100 AS BIGINT) AS bucket,
           CASE WHEN {_DSS_H} % 100 < 80 THEN 'train'
                WHEN {_DSS_H} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM fp
    """,
)
def dedup_safe_split_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split

    return dedup_safe_split(
        star.documents, seed=_DSS_SEED
    ).select("doc_id", "fingerprint", "bucket", "split")


# ---------------------------------------------------------------------------
# Host-level quality blocklist (operators.quality.host_quality_gate):
# the domain-tier admission cut (CCNet buckets / RefinedWeb blocklists)
# — a host whose documents are majority low-quality is blocked
# wholesale, with a min-docs evidence gate so small hosts never block.
# Per-doc verdict reuses the hash-verified quality_score kernel; the
# gate itself is exact integer arithmetic (100·n_low >= pct·n_docs).
# Hosts are synthesized from doc_id residues exactly as the
# host-graph / boilerplate queries do.
# ---------------------------------------------------------------------------

_HQB_HOSTS = 23
_HQB_LOW = 0.81      # per-doc low-quality cut (corpus median at sf0.01)
_HQB_MIN_DOCS = 5
_HQB_PCT = 50

@register(
    "host_quality_blocklist",
    f"""
    WITH {_QUALITY_CTES},
    hostq AS (
        SELECT doc_id % {_HQB_HOSTS} AS host, quality FROM quality
    )
    SELECT CAST(host AS BIGINT) AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN quality < {_HQB_LOW} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low,
           (COUNT(*) >= {_HQB_MIN_DOCS}
            AND SUM(CASE WHEN quality < {_HQB_LOW} THEN 1 ELSE 0 END) * 100
                >= COUNT(*) * {_HQB_PCT}) AS blocked
    FROM hostq GROUP BY host
    """,
)
def host_quality_blocklist_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.quality import host_quality_gate

    scored = star.documents.select(
        "doc_id", "text", X.tokens("text").alias("_toks")
    ).select(
        F.pmod(F.col("doc_id"), F.lit(_HQB_HOSTS)).cast("long").alias("host"),
        (X.quality_score_from(F.col("text"), F.col("_toks")) < _HQB_LOW)
        .alias("is_low"),
    )
    return host_quality_gate(
        scored, min_docs=_HQB_MIN_DOCS, max_low_pct=_HQB_PCT
    )


# ---------------------------------------------------------------------------
# Host link-graph extraction (operators.corpus.link_host_graph): the
# web-graph construction pass feeding the host-authority family — the
# PageRank/LPA/triangle queries consume exactly this (src, dst, weight)
# edge list.  HTML is synthesized deterministically (same recipe family
# as html_text_extract): two absolute anchors per doc (one https, one
# http — exercising the scheme alternation) plus a relative href that
# carries no host signal and must be ignored by the extractor.
# ---------------------------------------------------------------------------

_LG_HOSTS = 7

@register(
    "html_link_graph",
    f"""
    WITH dirty AS (
        SELECT 'host' || CAST(doc_id % {_LG_HOSTS} AS VARCHAR)
                   || '.example.com' AS src_host,
               '<html><body><p>' || text
               || '</p><a href="https://host'
               || CAST((doc_id + 1) % {_LG_HOSTS} AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR)
               || '">x</a><a href="/nav">n</a><a href="http://host'
               || CAST((doc_id * 2 + 3) % {_LG_HOSTS} AS VARCHAR)
               || '.example.com/q">y</a><a HREF = ''https://host'
               || CAST((doc_id * 3 + 1) % {_LG_HOSTS} AS VARCHAR)
               || '.example.com/r''>z</a><a href=//host'
               || CAST((doc_id * 5 + 2) % {_LG_HOSTS} AS VARCHAR)
               || '.example.com/s>w</a></body></html>' AS html
        FROM documents
    ),
    edges AS (
        SELECT src_host,
               unnest(regexp_extract_all(html,
                   '(?i)href\\s*=\\s*["'']?(?:https?:)?//([^/"''\\s>]+)', 1))
                   AS dst_host
        FROM dirty
    )
    SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
    FROM edges GROUP BY 1, 2
    """,
)
def html_link_graph_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import link_host_graph

    def host(e):
        return F.concat(F.lit("host"), e.cast("string"), F.lit(".example.com"))

    d = F.col("doc_id")
    dirty = star.documents.select(
        host(F.pmod(d, F.lit(_LG_HOSTS))).alias("src_host"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"),
            F.lit('</p><a href="https://'),
            host(F.pmod(d + 1, F.lit(_LG_HOSTS))),
            F.lit("/p/"), d.cast("string"),
            F.lit('">x</a><a href="/nav">n</a><a href="http://'),
            host(F.pmod(d * 2 + 3, F.lit(_LG_HOSTS))),
            # messy-HTML variants the broadened pattern must catch
            # (ADVICE r10): uppercase HREF + spaced `=` + single quotes,
            # and an unquoted protocol-relative link
            F.lit("/q\">y</a><a HREF = 'https://"),
            host(F.pmod(d * 3 + 1, F.lit(_LG_HOSTS))),
            F.lit("/r'>z</a><a href=//"),
            host(F.pmod(d * 5 + 2, F.lit(_LG_HOSTS))),
            F.lit("/s>w</a></body></html>"),
        ).alias("html"),
    )
    return link_host_graph(dirty)


# ---------------------------------------------------------------------------
# Cross-snapshot admission dedup (operators.dedup.snapshot_admission):
# the batch twin of the streaming incremental near-dedup — a new crawl
# batch is admitted against the already-ingested corpus: within-batch
# keep-first (min id per exact fingerprint) THEN an anti-join against
# the reference snapshot's fingerprint set.  The batch is synthesized
# deterministically: one third re-crawls (same text — must be
# rejected), one third edits (' rev2' suffix — admitted), one third
# templated batch pages sharing ~50 texts (admitted ONCE each, the
# within-batch dedup path).
# ---------------------------------------------------------------------------

_SA_OFFSET = 100_000

@register(
    "snapshot_dedup_admission",
    f"""
    WITH cur AS (
        SELECT doc_id + {_SA_OFFSET} AS doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text
                    WHEN doc_id % 3 = 1 THEN text || ' rev2'
                    ELSE 'new page batch ' || CAST(doc_id % 50 AS VARCHAR)
               END AS text
        FROM documents
    ),
    ref_fp AS (
        SELECT DISTINCT md5({NORM_SQL.format(col='text')}) AS fingerprint
        FROM documents
    ),
    grp AS (
        SELECT md5({NORM_SQL.format(col='text')}) AS fingerprint,
               MIN(doc_id) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM cur GROUP BY 1
    )
    SELECT g.fingerprint, g.doc_id, g.n_copies
    FROM grp g LEFT JOIN ref_fp r USING (fingerprint)
    WHERE r.fingerprint IS NULL
    """,
)
def snapshot_dedup_admission_q(star: Star) -> DataFrame:
    d = F.col("doc_id")
    cur = star.documents.select(
        (d + _SA_OFFSET).alias("doc_id"),
        F.when(F.pmod(d, F.lit(3)) == 0, F.col("text"))
        .when(F.pmod(d, F.lit(3)) == 1, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(
            F.concat(
                F.lit("new page batch "),
                F.pmod(d, F.lit(50)).cast("string"),
            )
        )
        .alias("text"),
    )
    return D.snapshot_admission(star.documents, cur).select(
        "fingerprint", "doc_id", "n_copies"
    )


# ---------------------------------------------------------------------------
# Perceptual image near-dup (operators.multimodal.image_ahash +
# ahash_near_dup_pairs): the image-modality twin of the SimHash text
# near-dup — aHash fingerprints over the REAL BMP decode path
# (nearest-neighbor 8×8 lattice, integer cell sums, cross-multiplied
# strict-> mean threshold), four 16-bit Hamming bands, exact
# bit_count(xor) verify at radius 3 (pigeonhole-complete).  Fixtures
# are templated closed-form BMPs (template = structure, brightness
# shift = the invariance the hash must absorb), so the oracle
# value-hashes decode → hash → band → verify end-to-end — the
# image_meta_bmp precedent applied to the dedup family.
# ---------------------------------------------------------------------------

_AH_TEMPLATES = 100
_AH_RADIUS = 3

# Shared CTE chain: closed-form templated BMPs -> integer aHash cells ->
# 64-bit hash words -> 16-bit bands -> candidate pairs -> verified pairs.
# Used by both image_ahash_pairs (the pair list) and image_ahash_clusters
# (its transitive closure).
_AH_CTES = f"""
    imgs AS (
        SELECT doc_id,
               doc_id % {_AH_TEMPLATES} AS t,
               doc_id % 3 AS bright,
               4 + (doc_id % {_AH_TEMPLATES}) % 13 AS w,
               3 + (doc_id % {_AH_TEMPLATES}) % 7 AS h
        FROM documents
    ),
    grid AS (
        SELECT gr, gc, gr * 8 + gc AS idx
        FROM (SELECT unnest(range(8)) AS gr), (SELECT unnest(range(8)) AS gc)
    ),
    cells AS (
        SELECT i.doc_id, g.idx,
               (((i.t % 13 + 2) * ((g.gr * i.h) // 8)
                 + (i.t % 11 + 3) * ((g.gc * i.w) // 8)
                                  * ((g.gr * i.h) // 8 + 1)
                 + 41 * (i.t // 13) + 0) % 250)
             + (((i.t % 13 + 2) * ((g.gr * i.h) // 8)
                 + (i.t % 11 + 3) * ((g.gc * i.w) // 8)
                                  * ((g.gr * i.h) // 8 + 1)
                 + 41 * (i.t // 13) + 1) % 250)
             + (((i.t % 13 + 2) * ((g.gr * i.h) // 8)
                 + (i.t % 11 + 3) * ((g.gc * i.w) // 8)
                                  * ((g.gr * i.h) // 8 + 1)
                 + 41 * (i.t // 13) + 2) % 250)
             + 3 * i.bright AS cell
        FROM imgs i CROSS JOIN grid g
    ),
    tot AS (SELECT doc_id, SUM(cell) AS total FROM cells GROUP BY doc_id),
    hashes AS (
        SELECT c.doc_id,
               CAST(SUM(CASE WHEN c.idx < 32 AND 64 * c.cell > t.total
                             THEN (CAST(1 AS BIGINT) << (31 - c.idx))
                             ELSE 0 END) AS BIGINT) AS hash_hi,
               CAST(SUM(CASE WHEN c.idx >= 32 AND 64 * c.cell > t.total
                             THEN (CAST(1 AS BIGINT) << (63 - c.idx))
                             ELSE 0 END) AS BIGINT) AS hash_lo
        FROM cells c JOIN tot t USING (doc_id)
        GROUP BY c.doc_id
    ),
    bands AS (
        SELECT doc_id, hash_hi, hash_lo,
               0 AS band_idx, hash_hi // 65536 AS band_val FROM hashes
        UNION ALL SELECT doc_id, hash_hi, hash_lo, 1, hash_hi % 65536
        FROM hashes
        UNION ALL SELECT doc_id, hash_hi, hash_lo, 2, hash_lo // 65536
        FROM hashes
        UNION ALL SELECT doc_id, hash_hi, hash_lo, 3, hash_lo % 65536
        FROM hashes
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
               l.hash_hi AS hi_a, l.hash_lo AS lo_a,
               r.hash_hi AS hi_b, r.hash_lo AS lo_b
        FROM bands l JOIN bands r
          ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         AND l.doc_id < r.doc_id
    ),
    apairs AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(hi_a, hi_b))
                    + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
              <= {_AH_RADIUS}
    )
"""

@register(
    "image_ahash_pairs",
    f"""
    WITH {_AH_CTES}
    SELECT id_a, id_b, hamming FROM apairs
    """,
)
def image_ahash_pairs_q(star: Star) -> DataFrame:
    media = MM.synth_bmp_media_templated(
        star.documents, n_templates=_AH_TEMPLATES
    )
    hashes = MM.image_ahash(media)
    return MM.ahash_near_dup_pairs(hashes, max_hamming=_AH_RADIUS).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Anchor-text index (operators.corpus.anchor_text_terms): what the web
# CALLS a host — the terms inside <a> tags pointing at it — is the
# classic curation relevance/quality signal the host's own content
# cannot fake.  Extraction is two aligned regexp_extract_all passes
# (group 1 = host, group 2 = anchor text) zipped positionally; terms
# ride the corpus tokenizer; top-k per destination host with an exact
# (count DESC, term ASC) tie rule so both engines rank identically.
# HTML synth extends the link-graph recipe with word-bearing anchors.
# ---------------------------------------------------------------------------

_AT_K = 5
_AT_DIRTY_SQL = f"""
    SELECT '<p>' || text || '</p><a href="https://host'
           || CAST((doc_id + 1) % {_LG_HOSTS} AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           || '" class="x">click best site '
           || CAST(doc_id % 5 AS VARCHAR)
           || '</a><a href="/nav">skip this one</a><a href="http://host'
           || CAST((doc_id * 2 + 3) % {_LG_HOSTS} AS VARCHAR)
           || '.example.com/q">read more '
           || CAST(doc_id % 4 AS VARCHAR)
           || '</a><a HREF = ''//host'
           || CAST((doc_id * 3 + 1) % {_LG_HOSTS} AS VARCHAR)
           || '.example.com/r''>mirror page '
           || CAST(doc_id % 3 AS VARCHAR) || '</a>' AS html
    FROM documents
"""

@register(
    "anchor_text_terms",
    f"""
    WITH dirty AS ({_AT_DIRTY_SQL}),
    z AS (
        SELECT unnest(list_zip(
            regexp_extract_all(html, '(?i)href\\s*=\\s*["''](?:https?:)?//([^/"'']+)[^"'']*["''][^>]*>([^<]*)<', 1),
            regexp_extract_all(html, '(?i)href\\s*=\\s*["''](?:https?:)?//([^/"'']+)[^"'']*["''][^>]*>([^<]*)<', 2)
        )) AS s
        FROM dirty
    ),
    terms AS (
        SELECT s[1] AS dst_host,
               unnest({TOKSEQ_SQL.format(col='s[2]')}) AS term
        FROM z
    ),
    counts AS (
        SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) AS n
        FROM terms GROUP BY 1, 2
    )
    SELECT dst_host, term, n, CAST(rk AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY dst_host ORDER BY n DESC, term ASC
        ) AS rk
        FROM counts
    )
    WHERE rk <= {_AT_K}
    """,
)
def anchor_text_terms_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import anchor_text_terms

    def host(e):
        return F.concat(F.lit("host"), e.cast("string"), F.lit(".example.com"))

    d = F.col("doc_id")
    dirty = star.documents.select(
        F.concat(
            F.lit("<p>"), F.col("text"),
            F.lit('</p><a href="https://'),
            host(F.pmod(d + 1, F.lit(_LG_HOSTS))),
            F.lit("/p/"), d.cast("string"),
            F.lit('" class="x">click best site '),
            F.pmod(d, F.lit(5)).cast("string"),
            F.lit('</a><a href="/nav">skip this one</a><a href="http://'),
            host(F.pmod(d * 2 + 3, F.lit(_LG_HOSTS))),
            F.lit('/q">read more '),
            F.pmod(d, F.lit(4)).cast("string"),
            # messy-HTML anchor the broadened pattern must catch
            # (ADVICE r10): uppercase HREF, spaced `=`, single quotes,
            # protocol-relative target
            F.lit("</a><a HREF = '//"),
            host(F.pmod(d * 3 + 1, F.lit(_LG_HOSTS))),
            F.lit("/r'>mirror page "),
            F.pmod(d, F.lit(3)).cast("string"),
            F.lit("</a>"),
        ).alias("html"),
    )
    return anchor_text_terms(dirty, k=_AT_K).select(
        "dst_host", "term", F.col("n").cast("long").alias("n"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup (functions.text.canonicalize_url): the
# crawl-frontier dedup that exact text dedup runs too late for — one
# page crawled under tracking params / fragments / default ports /
# case-varied authorities / trailing slashes is one document.  Pure
# regex codegen chain; the oracle replays every transform (RE2
# backrefs \1 where Spark uses $1 — outputs verified byte-identical)
# then keep-first groups by the canonical form.  Messy URLs are
# synthesized per doc: group = doc_id // 6 (six consecutive docs share
# one page), variant = doc_id % 6 — so EVERY variant, including the
# two adversarial regression rows below, is exercised at every sf
# (the old doc_id // 200 selector never reached variant 3 at sf0.01).
# Variants 0-3 canonicalize to one URL; the two r11-verdict-#7
# adversarial rows stay DISTINCT canonicals and pin the ADVICE-hardened
# tracking-param anchor: 4 carries `?myutm_a=1`, which the unanchored
# r10 regex corrupted to `?my` (must survive untouched), and 5 carries
# `?keep=2&UTM_SOURCE=..&fbclid=x`, an uppercase + run-of-two tracking
# tail after a kept param (must canonicalize to exactly `?keep=2`).
# ---------------------------------------------------------------------------

_UC_VARIANT_SQL = """
    CASE doc_id % 6
      WHEN 0 THEN 'https://Host' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.Example.com/page/' || CAST((doc_id // 6) % 80 AS VARCHAR) || '/'
      WHEN 1 THEN 'https://host' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.example.com/page/' || CAST((doc_id // 6) % 80 AS VARCHAR)
                  || '?utm_source=s' || CAST(doc_id % 7 AS VARCHAR)
                  || '&utm_campaign=c'
      WHEN 2 THEN 'https://host' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.example.com:443/page/' || CAST((doc_id // 6) % 80 AS VARCHAR)
      WHEN 3 THEN 'HTTPS://HOST' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.EXAMPLE.COM/page/' || CAST((doc_id // 6) % 80 AS VARCHAR)
                  || '#sec' || CAST(doc_id % 5 AS VARCHAR)
      WHEN 4 THEN 'https://host' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.example.com/page/' || CAST((doc_id // 6) % 80 AS VARCHAR)
                  || '?myutm_a=1'
      ELSE 'https://host' || CAST((doc_id // 6) % 50 AS VARCHAR)
                  || '.example.com/page/' || CAST((doc_id // 6) % 80 AS VARCHAR)
                  || '?keep=2&UTM_SOURCE=S' || CAST(doc_id % 7 AS VARCHAR)
                  || '&fbclid=x'
    END
"""

@register(
    "url_canonical_dedup",
    f"""
    WITH raw AS (SELECT doc_id, {_UC_VARIANT_SQL} AS url FROM documents),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
    s2 AS (SELECT doc_id, regexp_replace(u, '(?i)([?&])((utm_[a-z]+|gclid|fbclid)=[^&]*&?)+', '\\1', 'g') AS u FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(regexp_replace(u, '\\?&', '?'), '[?&]$', '') AS u FROM s2),
    s4 AS (SELECT doc_id,
                  regexp_replace(
                      regexp_replace(u, '(?i)^(http://[^/:]+):80(/|$)', '\\1\\2'),
                      '(?i)^(https://[^/:]+):443(/|$)', '\\1\\2') AS u
           FROM s3),
    s5 AS (SELECT doc_id,
                  lower(regexp_extract(u, '(?i)^(https?://[^/]+)', 1))
                  || substr(u, length(regexp_extract(u, '(?i)^(https?://[^/]+)', 1)) + 1)
                      AS u
           FROM s4),
    canon AS (SELECT doc_id, regexp_replace(u, '/$', '') AS canonical_url
              FROM s5)
    SELECT canonical_url,
           MIN(doc_id) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM canon GROUP BY 1
    """,
)
def url_canonical_dedup_q(star: Star) -> DataFrame:
    d = F.col("doc_id")
    grp = F.floor(d / 6)
    host_n = F.pmod(grp, F.lit(50)).cast("string")
    page_n = F.pmod(grp, F.lit(80)).cast("string")
    v = F.pmod(d, F.lit(6))
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://Host"), host_n, F.lit(".Example.com/page/"),
            page_n, F.lit("/")))
        .when(v == 1, F.concat(
            F.lit("https://host"), host_n, F.lit(".example.com/page/"),
            page_n, F.lit("?utm_source=s"),
            F.pmod(d, F.lit(7)).cast("string"), F.lit("&utm_campaign=c")))
        .when(v == 2, F.concat(
            F.lit("https://host"), host_n, F.lit(".example.com:443/page/"),
            page_n))
        .when(v == 3, F.concat(
            F.lit("HTTPS://HOST"), host_n, F.lit(".EXAMPLE.COM/page/"),
            page_n, F.lit("#sec"), F.pmod(d, F.lit(5)).cast("string")))
        # adversarial regression rows (r11 verdict #7): a param that
        # merely CONTAINS "utm_" must survive the anchored strip...
        .when(v == 4, F.concat(
            F.lit("https://host"), host_n, F.lit(".example.com/page/"),
            page_n, F.lit("?myutm_a=1")))
        # ...and an UPPERCASE tracking run after a kept param must strip
        # down to exactly that kept param
        .otherwise(F.concat(
            F.lit("https://host"), host_n, F.lit(".example.com/page/"),
            page_n, F.lit("?keep=2&UTM_SOURCE=S"),
            F.pmod(d, F.lit(7)).cast("string"), F.lit("&fbclid=x")))
    )
    return (
        star.documents.select(
            d, X.canonicalize_url(url).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .select("canonical_url", "doc_id", "n_variants")
    )


# ---------------------------------------------------------------------------
# Percent-encoding normalization (functions.text.percent_normalize_url
# — RFC 3986 §6.2.2, public spec): %2f and %2F are the SAME octet and
# %7Euser the same path as ~user, but string equality sees different
# URLs — so crawl dedup, frontier joins, and the recrawl ledger all
# silently miss without this step.  Uppercase every triplet's hex
# (§6.2.2.1), decode triplets encoding UNRESERVED chars (ALPHA/DIGIT/
# -._~ — decoding anything else would CHANGE the URL, §6.2.2.2),
# malformed '%' runs verbatim.  Sentinel-split single pass (the
# xml_unescape construction); the fixture cycles lowercase-hex,
# unreserved-decode, already-normal, truncated-%, and reserved-stays
# variants.
# ---------------------------------------------------------------------------

def _pct_norm_sql(x: str) -> str:
    """DuckDB twin of functions.text.percent_normalize_url — the same
    sentinel-split single-pass normalization."""
    hx = f"regexp_extract(p, '^%([0-9a-fA-F]{{2}})', 1)"
    code = f"TRY_CAST('0x' || {hx} AS INT)"
    rest = "regexp_replace(p, '^%[0-9a-fA-F]{2}', '')"
    return f"""array_to_string(list_transform(
      string_split(replace({x}, '%', chr(1) || '%'), chr(1)),
      p -> CASE
        WHEN NOT regexp_matches(p, '^%[0-9a-fA-F]{{2}}') THEN p
        WHEN ({code} BETWEEN 48 AND 57) OR ({code} BETWEEN 65 AND 90)
             OR ({code} BETWEEN 97 AND 122) OR {code} IN (45, 46, 95, 126)
             THEN chr({code}) || {rest}
        ELSE '%' || upper({hx}) || {rest} END), '')"""

_PCT_URL_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/a%2fb/c?q=%41%7e'
      WHEN 1 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR) || '/plain/p'
      WHEN 2 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/%7euser/%2E%2e/x'
      WHEN 3 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/bad%4%zzq'
      ELSE 'https://h' || CAST(doc_id % 30 AS VARCHAR) || '/mix%2F%2f%20z'
    END
"""

@register(
    "url_percent_normalize",
    f"""
    WITH raw AS (SELECT {_PCT_URL_SQL} AS url FROM documents),
    n AS (
        SELECT url, {_pct_norm_sql('url')} AS norm_url,
               CAST(len(regexp_extract_all(url, '%[0-9a-fA-F][0-9a-fA-F]'))
                    AS BIGINT) AS n_triplets
        FROM raw
    )
    SELECT url, norm_url, norm_url <> url AS changed, n_triplets
    FROM n
    """,
)
def url_percent_normalize_q(star: Star) -> DataFrame:
    d = F.col("doc_id")
    h = F.pmod(d, F.lit(30)).cast("string")
    url = (
        F.when(F.pmod(d, F.lit(5)) == 0,
               F.concat(F.lit("https://h"), h, F.lit("/a%2fb/c?q=%41%7e")))
        .when(F.pmod(d, F.lit(5)) == 1,
              F.concat(F.lit("https://h"), h, F.lit("/plain/p")))
        .when(F.pmod(d, F.lit(5)) == 2,
              F.concat(F.lit("https://h"), h, F.lit("/%7euser/%2E%2e/x")))
        .when(F.pmod(d, F.lit(5)) == 3,
              F.concat(F.lit("https://h"), h, F.lit("/bad%4%zzq")))
        .otherwise(F.concat(F.lit("https://h"), h, F.lit("/mix%2F%2f%20z")))
    )
    u = star.documents.select(url.alias("url"))
    norm = X.percent_normalize_url(F.col("url"))
    return u.select(
        "url", norm.alias("norm_url"),
        (norm != F.col("url")).alias("changed"),
        F.size(F.regexp_extract_all(
            F.col("url"), F.lit("%[0-9a-fA-F][0-9a-fA-F]"), F.lit(0)
        )).cast("long").alias("n_triplets"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator-quality audit (operators.dedup.
# minhash_estimate_audit — Broder 1997): signature-agreement estimate
# vs the EXACT shingle-set Jaccard it estimates, per candidate pair,
# with |error|.  The dashboard that says whether NUM_PERM is adequate:
# dedup thresholds tuned on the estimate drift silently when the
# permutation count is too small for the similarity band in play.
# Distinct from ngram_jaccard_pairs, whose verify stage deliberately
# scores the finer TOKEN sets and therefore cannot audit the
# estimator.  Reuses _CAND_CTE verbatim (sig + cands).
# ---------------------------------------------------------------------------

_MJE_MATCHES = " + ".join(
    f"CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END"
    for s in range(D.NUM_PERM)
)

@register(
    "minhash_jaccard_estimate",
    f"""
    WITH {_CAND_CTE},
    shingsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - {D.SHINGLE_N - 1}, 0)),
                   i -> {_SHINGLE_CONCAT})) AS sh
        FROM doctoklists
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               round(({_MJE_MATCHES}) / {D.NUM_PERM}.0, 6) AS est_jaccard,
               round(CAST(len(list_intersect(ha.sh, hb.sh)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(ha.sh, hb.sh)))
                            AS DOUBLE), 6) AS exact_jaccard
        FROM cands c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b
        JOIN shingsets ha ON ha.doc_id = c.id_a
        JOIN shingsets hb ON hb.doc_id = c.id_b
    )
    SELECT id_a, id_b, est_jaccard, exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
    FROM scored
    """,
)
def minhash_jaccard_estimate_q(star: Star) -> DataFrame:
    return D.minhash_estimate_audit(star.documents)


# ---------------------------------------------------------------------------
# Video scene-change detection (operators.multimodal.video_scene_cuts):
# shot boundaries via the classic sum-of-absolute-pixelwise-luma-diff
# between consecutive frames, exact int64, integer cross-multiply
# verdict — the pass a video pipeline runs before frame sampling so
# samples spread across SHOTS, not within one static shot.  The
# scene-structured fixture keeps every pixel below the mod-256 wrap,
# so each transition's diff is exactly w·h·|ΔL| — closed-form in
# (doc_id, f) — and the oracle recomputes every transition
# arithmetically while Spark decodes the REAL Y4M bytes.
# ---------------------------------------------------------------------------

@register(
    "video_scene_cuts",
    f"""
    WITH vparams AS (
        SELECT doc_id,
               8 + 2 * (doc_id % 5) AS w, 6 + 2 * (doc_id % 3) AS h,
               2 + doc_id % 3 AS slen, 2 + doc_id % 4 AS nsc
        FROM documents
    ),
    vtrans AS (
        SELECT doc_id, w, h, f,
               20 + (doc_id * 31 + (f // slen) * 97) % 160 AS l1,
               20 + (doc_id * 31 + ((f + 1) // slen) * 97) % 160 AS l2
        FROM vparams, generate_series(0, 30) g(f)
        WHERE f < slen * nsc - 1
    )
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
           CAST(w * h * abs(l2 - l1) AS BIGINT) AS diff,
           100 * w * h * abs(l2 - l1) > 10 * w * h * 255 AS is_cut
    FROM vtrans
    """,
)
def video_scene_cuts_q(star: Star) -> DataFrame:
    return MM.video_scene_cuts(
        MM.synth_y4m_media_scenes(star.documents), threshold_pct=10
    )


# ---------------------------------------------------------------------------
# Corpus-global keep-first line dedup (operators.corpus.
# global_line_keep_first — C4's actual rule: all but ONE occurrence of
# a repeated line drop; Raffel et al. 2020 §2.2 at line grain).
# Completes the line-dedup coverage matrix: threshold-drop
# (line_dedup_c4 drops ALL occurrences), per-host conditioning
# (host_boilerplate_lines), within-doc (intra_doc_line_dedup), and now
# corpus-global keep-ONE.  The fixture interleaves cross-doc shared
# lines (content keyed (doc_id + i·17) % 23, so each shared line's
# first occurrence is a specific (doc, idx) both engines must agree
# on) with per-doc unique lines; blank-line exemption exercised.
# ---------------------------------------------------------------------------

_GLKF_LINE_SQL = (
    "CASE WHEN i % 4 = 3 THEN '' "
    "     WHEN i % 2 = 0 THEN 'shared line ' "
    "          || CAST((doc_id + i * 17) % 23 AS VARCHAR) "
    "     ELSE 'unique ' || CAST(doc_id AS VARCHAR) || '-' "
    "          || CAST(i AS VARCHAR) END"
)

@register(
    "global_line_keep_first",
    f"""
    WITH built AS (
        SELECT doc_id, i AS idx, {_GLKF_LINE_SQL} AS line
        FROM documents, generate_series(0, 8) g(i)
        WHERE i <= 3 + doc_id % 5
    ),
    ranked AS (
        SELECT doc_id, idx, line,
               ROW_NUMBER() OVER (PARTITION BY line
                                  ORDER BY doc_id, idx) AS rk
        FROM built
    ),
    flagged AS (
        SELECT doc_id, idx, line,
               rk = 1 OR trim(line) = '' AS keep
        FROM ranked
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped_dupes,
           COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                               ORDER BY idx), '') AS cleaned_text
    FROM flagged GROUP BY doc_id
    """,
)
def global_line_keep_first_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import global_line_keep_first

    d = F.col("doc_id")
    line = lambda i: (  # noqa: E731
        F.when(i % 4 == 3, F.lit(""))
        .when(i % 2 == 0,
              F.concat(F.lit("shared line "),
                       F.pmod(d + i * 17, F.lit(23)).cast("string")))
        .otherwise(F.concat(F.lit("unique "), d.cast("string"),
                            F.lit("-"), i.cast("string")))
    )
    text = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), (F.lit(3) + F.pmod(d, F.lit(5))).cast("int")),
            line,
        ),
    )
    return global_line_keep_first(
        star.documents.select("doc_id", text.alias("text"))
    )


# ---------------------------------------------------------------------------
# Crawler-trap detection (operators.corpus.url_trap_signals — the
# Mercator-era frontier-hygiene battery): calendars that paginate
# forever, session ids that make one page look like many, symlink
# loops that repeat path segments — each signal its own column so the
# dashboard can attribute drops, is_trap = any.  Pure per-row split +
# array ops + RE2-safe regexes; the fixture cycles one URL shape per
# signal plus a clean control.
# ---------------------------------------------------------------------------

_TRAP_URL_SQL = """
    CASE doc_id % 6
      WHEN 0 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR) || '/a/b/a/b/a'
      WHEN 1 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR) || '/p/q'
      WHEN 2 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/d0/d1/d2/d3/d4/d5/d6/d7/d8/d9/d10/d11/d12'
      WHEN 3 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/page?sid=0123456789abcde' || CAST(doc_id % 10 AS VARCHAR)
      WHEN 4 THEN 'https://h' || CAST(doc_id % 30 AS VARCHAR)
                  || '/blog/2024/' || CAST(1 + doc_id % 12 AS VARCHAR)
                  || '/15/post'
      ELSE 'https://h' || CAST(doc_id % 30 AS VARCHAR) || '/'
           || repeat('x', 520)
    END
"""

@register(
    "url_trap_detector",
    f"""
    WITH raw AS (SELECT {_TRAP_URL_SQL} AS url FROM documents),
    parsed AS (
        SELECT url,
               regexp_replace(
                   '/' || COALESCE(regexp_extract(
                       regexp_replace(url,
                           '^([A-Za-z][A-Za-z0-9+.-]*:)?//', ''),
                       '^[^/]*/(.*)$', 1), ''),
                   '[?#].*$', '') AS path
        FROM raw
    ),
    segged AS (
        SELECT url, path,
               list_filter(string_split(path, '/'), x -> x <> '') AS segs
        FROM parsed
    ),
    sig AS (
        SELECT url,
               CAST(len(segs) AS BIGINT) AS depth,
               CAST(len(segs) - len(list_distinct(segs)) AS BIGINT)
                   AS seg_repeats,
               len(segs) - len(list_distinct(segs)) >= 2 AS repeat_trap,
               len(segs) > 12 AS too_deep,
               length(url) > 512 AS too_long,
               regexp_matches(url,
                   '[?&][A-Za-z0-9_.-]*=[0-9a-fA-F]{{16,}}') AS session_id,
               regexp_matches(path,
                   '/(19|20)[0-9]{{2}}/[0-9]{{1,2}}(/[0-9]{{1,2}})?(/|$)')
                   AS calendar
        FROM segged
    )
    SELECT url, depth, seg_repeats, repeat_trap, too_deep, too_long,
           session_id, calendar,
           repeat_trap OR too_deep OR too_long OR session_id OR calendar
               AS is_trap
    FROM sig
    """,
)
def url_trap_detector_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import url_trap_signals

    d = F.col("doc_id")
    h = F.pmod(d, F.lit(30)).cast("string")
    url = (
        F.when(F.pmod(d, F.lit(6)) == 0,
               F.concat(F.lit("https://h"), h, F.lit("/a/b/a/b/a")))
        .when(F.pmod(d, F.lit(6)) == 1,
              F.concat(F.lit("https://h"), h, F.lit("/p/q")))
        .when(F.pmod(d, F.lit(6)) == 2,
              F.concat(F.lit("https://h"), h,
                       F.lit("/d0/d1/d2/d3/d4/d5/d6/d7/d8/d9/d10/d11/d12")))
        .when(F.pmod(d, F.lit(6)) == 3,
              F.concat(F.lit("https://h"), h, F.lit("/page?sid=0123456789abcde"),
                       F.pmod(d, F.lit(10)).cast("string")))
        .when(F.pmod(d, F.lit(6)) == 4,
              F.concat(F.lit("https://h"), h, F.lit("/blog/2024/"),
                       (F.lit(1) + F.pmod(d, F.lit(12))).cast("string"),
                       F.lit("/15/post")))
        .otherwise(F.concat(F.lit("https://h"), h, F.lit("/"),
                            F.repeat(F.lit("x"), 520)))
    )
    return url_trap_signals(star.documents.select(url.alias("url")))


# ---------------------------------------------------------------------------
# Image near-dup CLUSTERS: the aHash pair graph closed transitively —
# perceptual dups chain exactly like text near-dups (A~B~C with A≁C),
# so keep-one-per-cluster needs components, not pairs.  Reuses the
# text family's connected-components operator (pointer jumping,
# O(log d) rounds) over the image pair graph; the oracle closes the
# SAME pair CTEs with a recursive CTE — the min-reachable-id fixpoint
# is unique, so both strategies agree exactly.
# ---------------------------------------------------------------------------

@register(
    "image_ahash_clusters",
    f"""
    WITH RECURSIVE {_AH_CTES},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM apairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM apairs
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM edges e JOIN reach r ON r.src = e.dst
    ),
    comp AS (
        SELECT src AS media_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    csizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY cluster_id
    )
    SELECT c.media_id, c.cluster_id, s.cluster_size,
           c.media_id = c.cluster_id AS is_canonical
    FROM comp c JOIN csizes s USING (cluster_id)
    """,
)
def image_ahash_clusters_q(star: Star) -> DataFrame:
    hashes = MM.image_ahash(
        MM.synth_bmp_media_templated(star.documents, n_templates=_AH_TEMPLATES)
    )
    pairs = MM.ahash_near_dup_pairs(hashes, max_hamming=_AH_RADIUS)
    # node set = hashes.select(media_id) VALUE-wise, but synth + ahash
    # emit exactly one row per document with media_id = doc_id, so the
    # documents scan IS that id set — the CC operator's singleton
    # anti-join and label init then read 584 KB of parquet instead of
    # re-running the Arrow BMP synth+decode chain (r13 optimization;
    # the oracle's reach base is literally `SELECT doc_id, doc_id FROM
    # documents`, the same identity)
    ids = star.documents.select(F.col("doc_id").alias("media_id"))
    return D.near_dup_clusters(ids, id_col="media_id", pairs=pairs)


# ---------------------------------------------------------------------------
# Code-vs-prose router (functions.text.code_signals / is_code_verdict):
# the routing pass a mixed web corpus needs before training — code
# documents leave the prose pipeline for code-specific processing.
# Pure regexp_count/length arithmetic with an exact integer-vote
# verdict; every regex is RE2-compatible and the DuckDB twin replays
# them verbatim (len(regexp_extract_all) = regexp_count).  A third of
# docs get a deterministic code snippet appended so both verdicts and
# both vote paths are exercised.
# ---------------------------------------------------------------------------

_CODE_KW_SQL = (
    r"\b(def|class|import|return|function|var|const|let|if|else|for|"
    r"while|public|private|static|void|int|float|struct|enum|lambda|"
    r"print|printf|println)\b"
)

@register(
    "code_prose_router",
    f"""
    WITH mixed AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN
                 text || chr(10) || 'def f_' || CAST(doc_id AS VARCHAR)
                 || '(x):' || chr(10) || '    return x + '
                 || CAST(doc_id % 7 AS VARCHAR) || ';' || chr(10)
                 || '    y = [1, 2];' || chr(10) || '    print(y)'
               ELSE text END AS t
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               CAST(length(t) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(t, chr(10))) + 1 AS BIGINT)
                   AS n_lines,
               CAST(len(regexp_extract_all(t, '[{{}}\\[\\]();=<>]')) AS BIGINT)
                   AS sym_hits,
               CAST(len(regexp_extract_all(t, '{_CODE_KW_SQL}')) AS BIGINT)
                   AS kw_hits,
               CAST(len(regexp_extract_all(t, '(?m)^(?:    |\\t)')) AS BIGINT)
                   AS indent_lines
        FROM mixed
    )
    SELECT doc_id, n_chars, n_lines, sym_hits, kw_hits, indent_lines,
           (CAST(sym_hits * 100 >= n_chars * 4 AS INT)
            + CAST(kw_hits * 100 >= n_chars AS INT)
            + CAST(indent_lines * 5 >= n_lines AS INT)) >= 2 AS is_code
    FROM sig
    """,
)
def code_prose_router_q(star: Star) -> DataFrame:
    d = F.col("doc_id")
    snippet = F.concat(
        F.col("text"), F.lit("\ndef f_"), d.cast("string"),
        F.lit("(x):\n    return x + "),
        F.pmod(d, F.lit(7)).cast("string"),
        F.lit(";\n    y = [1, 2];\n    print(y)"),
    )
    mixed = star.documents.select(
        d,
        F.when(F.pmod(d, F.lit(3)) == 0, snippet)
        .otherwise(F.col("text")).alias("t"),
    )
    s = X.code_signals(F.col("t"))
    return mixed.select(
        "doc_id",
        s["n_chars"].alias("n_chars"),
        s["n_lines"].alias("n_lines"),
        s["sym_hits"].alias("sym_hits"),
        s["kw_hits"].alias("kw_hits"),
        s["indent_lines"].alias("indent_lines"),
    ).withColumn(
        "is_code",
        X.is_code_verdict({
            "n_chars": F.col("n_chars"), "n_lines": F.col("n_lines"),
            "sym_hits": F.col("sym_hits"), "kw_hits": F.col("kw_hits"),
            "indent_lines": F.col("indent_lines"),
        }),
    )


# ---------------------------------------------------------------------------
# Recrawl scheduler (operators.temporal.url_change_rate): per-URL
# content change rate from the fetch ledger → revisit priority.  The
# fetch history is synthesized from events (url per user bucket; the
# content hash flips when a per-URL-width time bucket rolls over, so
# change rates genuinely vary across URLs).  priority multiplies two
# exactly-derived doubles — no transcendentals — so the value hash
# holds bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "url_change_rate",
    """
    WITH hist AS (
        SELECT event_id,
               'u' || CAST(user_id % 500 AS VARCHAR) AS url,
               ts AS fetch_ts,
               md5('u' || CAST(user_id % 500 AS VARCHAR) || ':' ||
                   CAST(CAST(floor(epoch(ts)
                        / (86400 * (1 + (user_id % 500) % 5))) AS BIGINT)
                        AS VARCHAR)) AS content_hash
        FROM events
    ),
    seq AS (
        SELECT url, fetch_ts, content_hash,
               lag(content_hash) OVER (
                   PARTITION BY url ORDER BY fetch_ts, event_id
               ) AS prev_hash
        FROM hist
    ),
    per_url AS (
        SELECT url,
               CAST(COUNT(*) AS BIGINT) AS n_fetches,
               CAST(SUM(CASE WHEN prev_hash IS NOT NULL
                              AND content_hash <> prev_hash
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               MAX(fetch_ts) AS last_ts
        FROM seq GROUP BY url
    ),
    gmax AS (SELECT MAX(fetch_ts) AS g FROM hist)
    SELECT url, n_fetches, n_changes,
           round(CAST(n_changes AS DOUBLE)
                 / CAST(greatest(n_fetches - 1, 1) AS DOUBLE), 6)
               AS change_rate,
           round(CAST(CAST(floor(epoch(g)) AS BIGINT)
                      - CAST(floor(epoch(last_ts)) AS BIGINT) AS DOUBLE)
                 / 86400.0, 6) AS days_stale,
           round(round(CAST(n_changes AS DOUBLE)
                 / CAST(greatest(n_fetches - 1, 1) AS DOUBLE), 6)
                 * round(CAST(CAST(floor(epoch(g)) AS BIGINT)
                        - CAST(floor(epoch(last_ts)) AS BIGINT) AS DOUBLE)
                        / 86400.0, 6), 6) AS priority
    FROM per_url, gmax
    """,
)
def url_change_rate_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import url_change_rate

    u = F.pmod(F.col("user_id"), F.lit(500))
    width = (F.lit(86400) * (F.lit(1) + F.pmod(u, F.lit(5)))).cast("long")
    url = F.concat(F.lit("u"), u.cast("string"))
    hist = star.events.select(
        "event_id",
        url.alias("url"),
        F.col("ts").alias("fetch_ts"),
        F.md5(F.concat(
            url, F.lit(":"),
            F.floor(F.unix_timestamp("ts").cast("double") / width)
            .cast("long").cast("string"),
        )).alias("content_hash"),
    )
    return url_change_rate(hist, order_tiebreak="event_id")


# ---------------------------------------------------------------------------
# DoReMi-style domain rebalancing (operators.sampling.domain_reweight_mw):
# one multiplicative-weights step over per-source excess loss.  Weights
# and losses are derived EXACTLY from documents (integer sums divided
# once), so the whole update is bit-replayable; the (1 + ηx) linearized
# factor replaces exp(ηx) precisely to avoid cross-libm ulps.
# ---------------------------------------------------------------------------

@register(
    "domain_reweight_mw",
    """
    WITH per AS (
        SELECT source AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents GROUP BY source
    ),
    gstats AS (
        SELECT CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS gavg,
               CAST(COUNT(*) AS BIGINT) AS gtotal
        FROM documents
    ),
    base AS (
        SELECT domain,
               CAST(n_docs AS DOUBLE) / gtotal AS weight,
               (avg_chars - gavg) / gavg AS x
        FROM per, gstats
    ),
    upd AS (
        SELECT domain, weight, x,
               weight * greatest(1.0 + 0.5 * x, 0.05) AS raw
        FROM base
    ),
    tot AS (SELECT SUM(raw) AS t FROM upd)
    SELECT domain, weight,
           round(x, 6) AS excess_loss,
           round(raw / t, 6) AS new_weight
    FROM upd, tot
    """,
)
def domain_reweight_mw_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import domain_reweight_mw

    per = star.documents.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("n_chars").cast("double")
         / F.count(F.lit(1))).alias("avg_chars"),
    )
    glob = star.documents.agg(
        (F.sum("n_chars").cast("double")
         / F.count(F.lit(1))).alias("gavg"),
        F.count(F.lit(1)).cast("long").alias("gtotal"),
    )
    base = per.crossJoin(F.broadcast(glob)).select(
        "domain",
        (F.col("n_docs").cast("double") / F.col("gtotal")).alias("weight"),
        ((F.col("avg_chars") - F.col("gavg")) / F.col("gavg"))
        .alias("excess_loss"),
    )
    weights = base.select("domain", "weight")
    losses = base.select("domain", "excess_loss")
    return domain_reweight_mw(weights, losses, eta=0.5)


# ---------------------------------------------------------------------------
# Snapshot diff audit (operators.relational.snapshot_diff_stats): the
# id-keyed added/removed/modified/unchanged dashboard between two crawl
# snapshots, per source.  The "next crawl" is simulated
# deterministically: every 11th doc vanishes, every 7th is edited,
# every 13th contributes a brand-new id.  Distinct from
# snapshot_dedup_admission (content-keyed ingest decision): this audits
# deletions and edits the admission path never sees.
# ---------------------------------------------------------------------------

@register(
    "corpus_snapshot_diff",
    f"""
    WITH ref AS (
        SELECT doc_id, source,
               md5({NORM_SQL.format(col='text')}) AS fp
        FROM documents
    ),
    cur AS (
        SELECT doc_id, source,
               md5({NORM_SQL.format(col="text || CASE WHEN doc_id % 7 = 0 THEN ' upd' ELSE '' END")}) AS fp
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, source,
               md5({NORM_SQL.format(col="text || ' new'")}) AS fp
        FROM documents WHERE doc_id % 13 = 0
    ),
    j AS (
        SELECT COALESCE(r.doc_id, c.doc_id) AS doc_id,
               COALESCE(c.source, r.source) AS source,
               r.fp AS rfp, c.fp AS cfp
        FROM ref r FULL OUTER JOIN cur c ON r.doc_id = c.doc_id
    )
    SELECT CASE WHEN rfp IS NULL THEN 'added'
                WHEN cfp IS NULL THEN 'removed'
                WHEN rfp <> cfp THEN 'modified'
                ELSE 'unchanged' END AS status,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY 1, 2
    """,
)
def corpus_snapshot_diff_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.relational import (
        snapshot_diff_stats,
    )

    d = F.col("doc_id")
    ref = star.documents.select(
        d, "source",
        F.md5(X.normalize_text("text")).alias("fingerprint"),
    )
    kept = star.documents.filter(F.pmod(d, F.lit(11)) != 0).select(
        d, "source",
        F.md5(X.normalize_text(
            F.concat(
                F.col("text"),
                F.when(F.pmod(d, F.lit(7)) == 0, F.lit(" upd"))
                .otherwise(F.lit("")),
            )
        )).alias("fingerprint"),
    )
    new = star.documents.filter(F.pmod(d, F.lit(13)) == 0).select(
        (d + F.lit(1000000)).alias("doc_id"), "source",
        F.md5(X.normalize_text(
            F.concat(F.col("text"), F.lit(" new"))
        )).alias("fingerprint"),
    )
    return snapshot_diff_stats(
        ref, kept.unionByName(new), group_col="source"
    )


# ---------------------------------------------------------------------------
# Bloom seen-set gate (operators.corpus.bloom_bitmap / bloom_probe):
# frontier membership — "have we fetched this URL before?" — as an
# m-bit filter probed MAP-SIDE against one 32 KiB array literal,
# replacing the exact anti-join against the full fetched set.  False
# negatives impossible; false positives at the documented (1-e^-kn/m)^k
# rate, and the oracle replays the identical md5-position arithmetic
# (a false positive is a deterministic hash fact, not noise — both
# engines flag the same URLs).  Fixture: every even doc's URL is seen;
# candidates are those plus an equal set of never-seen URLs.
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 12
_BLOOM_K = 4
_BLOOM_SEED = 7

def _bloom_pos_sql(expr: str, i: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5('b{_BLOOM_SEED}:{i}:' || {expr}), 1, 15))"
        f" AS BIGINT) % {_BLOOM_M}"
    )

@register(
    "url_seen_bloom",
    f"""
    WITH seen AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url FROM documents
        WHERE doc_id % 2 = 0
    ),
    pos AS (
        {" UNION ".join(f"SELECT DISTINCT {_bloom_pos_sql('url', i)} AS p FROM seen" for i in range(_BLOOM_K))}
    ),
    cand AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url FROM documents
        WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 'u' || CAST(doc_id + 10000000 AS VARCHAR) AS url FROM documents
    )
    SELECT url,
           CAST({" + ".join(f"CASE WHEN {_bloom_pos_sql('url', i)} IN (SELECT p FROM pos) THEN 1 ELSE 0 END" for i in range(_BLOOM_K))} AS INT)
               AS bloom_hits,
           ({" AND ".join(f"{_bloom_pos_sql('url', i)} IN (SELECT p FROM pos)" for i in range(_BLOOM_K))})
               AS maybe_seen
    FROM cand
    """,
)
def url_seen_bloom_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import (
        bloom_bitmap,
        bloom_probe,
    )

    d = F.col("doc_id")
    url = F.concat(F.lit("u"), d.cast("string"))
    seen = star.documents.filter(F.pmod(d, F.lit(2)) == 0).select(
        url.alias("url")
    )
    bm = bloom_bitmap(seen, "url", m_bits=_BLOOM_M, k=_BLOOM_K,
                      seed=_BLOOM_SEED)
    cand = seen.unionByName(
        star.documents.select(
            F.concat(F.lit("u"), (d + F.lit(10000000)).cast("string"))
            .alias("url")
        )
    )
    return bloom_probe(cand, bm, "url", m_bits=_BLOOM_M, k=_BLOOM_K,
                       seed=_BLOOM_SEED)


# ---------------------------------------------------------------------------
# Interpolated-bigram LM scoring (operators.corpus.bigram_logprob): the
# word-ORDER quality gate — shuffled/keyword-stuffed text has ordinary
# unigrams but improbable transitions.  λ=0.75 so both engines write
# exactly-representable literals; ln parity rides the unigram
# precedent (6dp rounding absorbs 1-ulp libm differences).
# ---------------------------------------------------------------------------

@register(
    "bigram_logprob_scores",
    f"""
    WITH doctoks AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS t FROM documents
    ),
    raw AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(t) - 1, 0)),
                   i -> t[i])) AS w1,
               unnest(list_transform(
                   generate_series(1, greatest(len(t) - 1, 0)),
                   i -> t[i + 1])) AS w2
        FROM doctoks
    ),
    pairs AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM raw GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM pairs),
    win AS (
        SELECT doc_id, cnt,
               SUM(cnt) OVER (PARTITION BY w1, w2) AS c12,
               SUM(cnt) OVER (PARTITION BY w1) AS c1,
               SUM(cnt) OVER (PARTITION BY w2) AS c2
        FROM pairs
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           round(SUM(CAST(cnt AS DOUBLE) *
                     (-ln(0.75 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                          + 0.25 * (CAST(c2 AS DOUBLE) / n))))
                 / SUM(CAST(cnt AS DOUBLE)), 6) AS avg_neg_logprob
    FROM win, tot
    GROUP BY doc_id
    """,
)
def bigram_logprob_scores_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import bigram_logprob

    return bigram_logprob(star.documents, lam=0.75)


# ---------------------------------------------------------------------------
# Admission funnel (operators.quality.admission_funnel): the final gate
# with per-REASON accounting — each doc gets exactly one verdict (the
# first failing rule, in order), so the funnel sums exactly to the
# corpus; overlapping per-filter stats never reconcile.  Rules compose
# the already-hash-verified kernels: token count, the code-router
# votes, the quality score.
# ---------------------------------------------------------------------------

@register(
    "admission_funnel",
    f"""
    WITH {_QUALITY_CTES},
    toks AS (
        SELECT doc_id, CAST(len({TOKSEQ_SQL.format(col='text')}) AS BIGINT)
                   AS ntok
        FROM documents
    ),
    code AS (
        SELECT doc_id,
               (CAST(CAST(len(regexp_extract_all(text, '[{{}}\\[\\]();=<>]')) AS BIGINT) * 100
                     >= length(text) * 4 AS INT)
                + CAST(CAST(len(regexp_extract_all(text, '{_CODE_KW_SQL}')) AS BIGINT) * 100
                       >= length(text) AS INT)
                + CAST(CAST(len(regexp_extract_all(text, '(?m)^(?:    |\\t)')) AS BIGINT) * 5
                       >= len(regexp_extract_all(text, chr(10))) + 1 AS INT)
               ) >= 2 AS is_code
        FROM documents
    ),
    verdicts AS (
        SELECT d.source,
               CASE WHEN t.ntok < 20 THEN 'too_short'
                    WHEN c.is_code THEN 'code'
                    WHEN q.quality < 0.5 THEN 'low_quality'
                    ELSE 'admitted' END AS reason
        FROM documents d
        JOIN toks t USING (doc_id)
        JOIN code c USING (doc_id)
        JOIN quality q USING (doc_id)
    )
    SELECT reason, source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM verdicts GROUP BY 1, 2
    """,
)
def admission_funnel_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.quality import admission_funnel

    # tokenize ONCE per row: the funnel's verdict previously re-expanded
    # the split(trim(regexp_replace(lower(text)))) chain ~10× per row
    # (token count + the quality score's stopword/word-length terms) —
    # Catalyst does not CSE interpreted higher-order chains, so the
    # token array gets its own projection tier (r11 verdict #2)
    s = X.code_signals(F.col("text"))
    enriched = star.documents.select(
        "source", "text", X.tokens("text").alias("_toks"),
    ).select(
        "source",
        F.size("_toks").alias("_ntok"),
        X.is_code_verdict(s).alias("_is_code"),
        X.quality_score_from(F.col("text"), F.col("_toks")).alias("_q"),
    )
    return admission_funnel(
        enriched,
        {
            "too_short": F.col("_ntok") < 20,
            "code": F.col("_is_code"),
            "low_quality": F.col("_q") < 0.5,
        },
        group_col="source",
    )


# ---------------------------------------------------------------------------
# Crawl-cycle scheduling (operators.temporal.crawl_schedule): spend an
# exact global fetch budget across hosts ∝ revisit-priority mass
# (Hamilton quotas over integer micro-units — no float-sum-order
# dependence), fill each quota with the host's highest-priority URLs.
# Composition of the verified url_change_rate and
# proportional_allocation kernels; fixture extends the fetch-history
# recipe with host-ful URLs across all three prefix shapes
# (scheme-ful http://, protocol-relative //, bare) so the hashed query
# exercises the scheme-strip host derivation (r11 ADVICE).
# ---------------------------------------------------------------------------

_CS_BUDGET = 200

# scheme prefix cycles with user_id so the SAME host appears under all
# three URL spellings and must still pool into one politeness budget
_CS_URL_SQL = (
    "CASE WHEN user_id % 3 = 0 THEN 'http://' "
    "WHEN user_id % 3 = 1 THEN '//' ELSE '' END "
    "|| 'h' || CAST(user_id % 40 AS VARCHAR) || '/p' "
    "|| CAST(user_id % 500 AS VARCHAR)"
)

# The WITH chain (history -> rates -> Hamilton alloc -> per-host rank)
# is shared by crawl_schedule and its crawl-delay-capped variant.
_CS_CORE_CTES = f"""
    hist AS (
        SELECT event_id,
               {_CS_URL_SQL} AS url,
               ts AS fetch_ts,
               md5({_CS_URL_SQL} || ':' ||
                   CAST(CAST(floor(epoch(ts)
                        / (86400 * (1 + (user_id % 500) % 5))) AS BIGINT)
                        AS VARCHAR)) AS content_hash
        FROM events
    ),
    seq AS (
        SELECT url, fetch_ts, content_hash,
               lag(content_hash) OVER (
                   PARTITION BY url ORDER BY fetch_ts, event_id
               ) AS prev_hash
        FROM hist
    ),
    per_url AS (
        SELECT url,
               CAST(COUNT(*) AS BIGINT) AS n_fetches,
               CAST(SUM(CASE WHEN prev_hash IS NOT NULL
                              AND content_hash <> prev_hash
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               MAX(fetch_ts) AS last_ts
        FROM seq GROUP BY url
    ),
    gmax AS (SELECT MAX(fetch_ts) AS g FROM hist),
    rates AS (
        SELECT url,
               round(round(CAST(n_changes AS DOUBLE)
                     / CAST(greatest(n_fetches - 1, 1) AS DOUBLE), 6)
                     * round(CAST(CAST(floor(epoch(g)) AS BIGINT)
                            - CAST(floor(epoch(last_ts)) AS BIGINT) AS DOUBLE)
                            / 86400.0, 6), 6) AS priority,
               string_split(regexp_replace(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*:)?//', ''), '/')[1] AS host
        FROM per_url, gmax
    ),
    mass AS (
        SELECT host, SUM(CAST(round(priority * 1000000) AS BIGINT)) AS m
        FROM rates GROUP BY host
        HAVING SUM(CAST(round(priority * 1000000) AS BIGINT)) > 0
    ),
    tot AS (SELECT CAST(SUM(m) AS DOUBLE) AS mm FROM mass),
    alloc0 AS (
        SELECT host,
               CAST(floor(({_CS_BUDGET} * m) / mm) AS BIGINT) AS base,
               ({_CS_BUDGET} * m) / mm - floor(({_CS_BUDGET} * m) / mm) AS rem
        FROM mass CROSS JOIN tot
    ),
    alloc AS (
        SELECT host,
               base + CASE WHEN row_number()
                               OVER (ORDER BY rem DESC, host ASC)
                           <= {_CS_BUDGET} - (SELECT SUM(base) FROM alloc0)
                      THEN 1 ELSE 0 END AS quota
        FROM alloc0
    ),
    ranked AS (
        SELECT url, host, priority,
               CAST(row_number() OVER (
                   PARTITION BY host ORDER BY priority DESC, url ASC
               ) AS INT) AS rank_in_host
        FROM rates
    )
"""

@register(
    "crawl_schedule",
    f"""
    WITH {_CS_CORE_CTES}
    SELECT r.url, r.host, r.priority, r.rank_in_host
    FROM ranked r JOIN alloc a USING (host)
    WHERE r.rank_in_host <= a.quota
    """,
)
def crawl_schedule_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import crawl_schedule

    u = F.pmod(F.col("user_id"), F.lit(500))
    h = F.pmod(F.col("user_id"), F.lit(40))
    width = (F.lit(86400) * (F.lit(1) + F.pmod(u, F.lit(5)))).cast("long")
    prefix = (
        F.when(F.pmod(F.col("user_id"), F.lit(3)) == 0, F.lit("http://"))
        .when(F.pmod(F.col("user_id"), F.lit(3)) == 1, F.lit("//"))
        .otherwise(F.lit(""))
    )
    url = F.concat(prefix, F.lit("h"), h.cast("string"),
                   F.lit("/p"), u.cast("string"))
    hist = star.events.select(
        "event_id",
        url.alias("url"),
        F.col("ts").alias("fetch_ts"),
        F.md5(F.concat(
            url, F.lit(":"),
            F.floor(F.unix_timestamp("ts").cast("double") / width)
            .cast("long").cast("string"),
        )).alias("content_hash"),
    )
    return crawl_schedule(hist, _CS_BUDGET, order_tiebreak="event_id")


# ---------------------------------------------------------------------------
# TIFF metadata battery (operators.multimodal.extract_tiff_meta): REAL
# stdlib decode of the scanned-document container, BOTH byte orders
# exercised per doc (TIFF is the only common image format where
# endianness is a per-file fact) — closed-form fixture, so every
# column value-hashes like the BMP/PNG/GIF batteries.
# ---------------------------------------------------------------------------

@register(
    "image_meta_tiff",
    """
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
        FROM documents
    ),
    rr AS (SELECT unnest(generate_series(0, 8)) AS r),
    cc AS (SELECT unnest(generate_series(0, 15)) AS c),
    chs AS (SELECT unnest(generate_series(0, 2)) AS ch),
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 11 * rr.r + 5 * cc.c + chs.ch) % 256 AS v
        FROM dims d, rr, cc, chs
        WHERE rr.r < d.h AND cc.c < d.w
    )
    SELECT d.doc_id AS media_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           d.doc_id % 2 = 1 AS big_endian,
           CAST(SUM(p.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma,
           CAST(MAX(p.v) AS INT) AS max_luma
    FROM dims d JOIN px p ON p.doc_id = d.doc_id
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def image_meta_tiff(star: Star) -> DataFrame:
    return MM.extract_tiff_meta(MM.synth_tiff_media(star.documents))


# ===========================================================================
# r12 additions — curation / crawl / embedding-profile operators
# ===========================================================================

# ---------------------------------------------------------------------------
# Within-document line dedup (operators.corpus.intra_doc_line_dedup):
# scraped pages repeat nav blocks / banners / footers INSIDE one page
# body; the keep-first-occurrence rewrite is a pure per-row projection
# (zero shuffles — the only line-dedup arm needing no cross-document
# context).  Testdata documents are single-line, so the fixture
# synthesizes multi-line text deterministically: 4 + doc_id % 5 lines,
# every third line the same repeated chrome string, body lines cycling
# mod 9 so longer docs collide within themselves too.
# ---------------------------------------------------------------------------

_IDL_LINE_SQL = (
    "CASE WHEN i % 3 = 0 THEN 'nav menu item' "
    "ELSE 'body line ' || CAST((doc_id + i * i) % 9 AS VARCHAR) END"
)

@register(
    "intra_doc_line_dedup",
    f"""
    WITH built AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 3 THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(generate_series(0, 3 + doc_id % 5),
                                        i -> {_IDL_LINE_SQL}) END AS l
        FROM documents
    ),
    kept AS (
        SELECT doc_id, l,
               list_transform(
                   list_filter(generate_series(1, len(l)),
                               i -> list_position(l, l[i]) = i),
                   i -> l[i]) AS k
        FROM built
    )
    SELECT doc_id,
           CAST(len(l) AS BIGINT) AS n_lines,
           CAST(len(k) AS BIGINT) AS n_kept,
           CAST(len(l) - len(k) AS BIGINT) AS n_dupes_removed,
           CAST(COALESCE(list_sum(list_transform(l, x -> length(x))), 0)
                - COALESCE(list_sum(list_transform(k, x -> length(x))), 0)
                AS BIGINT) AS chars_removed,
           COALESCE(list_aggregate(k, 'string_agg', chr(10)), '')
               AS clean_text
    FROM kept
    """,
)
def intra_doc_line_dedup_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import intra_doc_line_dedup

    d = F.col("doc_id")
    line = lambda i: F.when(  # noqa: E731
        i % 3 == 0, F.lit("nav menu item")
    ).otherwise(F.concat(F.lit("body line "),
                         F.pmod(d + i * i, F.lit(9)).cast("string")))
    text = F.when(
        # all-blank doc (whitespace-only): must emit the zero row, not
        # vanish from the audit (r12 ADVICE; one variant per 11 docs)
        F.pmod(d, F.lit(11)) == 3, F.lit("  \n \n"),
    ).otherwise(F.concat_ws(
        "\n",
        F.transform(F.sequence(F.lit(0), (F.lit(3) + F.pmod(d, F.lit(5))).cast("int")),
                    line),
    ))
    return intra_doc_line_dedup(
        star.documents.select("doc_id", text.alias("text"))
    )


# ---------------------------------------------------------------------------
# C4 line-shape filters (operators.corpus.c4_line_filters — Raffel et
# al. 2020 §2.2, public paper): keep a line only if it ends in terminal
# punctuation AND has ≥3 words; the line-REWRITE battery that runs
# before any document scoring (Gopher's line gates only score whole
# docs).  Same multi-line synthesis convention as intra_doc_line_dedup;
# the four line shapes cycle so every rule fires in every doc.
# ---------------------------------------------------------------------------

_C4L_LINE_SQL = (
    "CASE i % 4"
    " WHEN 0 THEN 'this is sentence number ' || CAST(doc_id + i AS VARCHAR)"
    "             || ' of the body.'"
    " WHEN 1 THEN 'short line'"
    " WHEN 2 THEN 'a trailing line without terminal punctuation mark '"
    "             || CAST(i AS VARCHAR)"
    " ELSE 'is this a question line number ' || CAST(i AS VARCHAR) || '?'"
    " END"
)

@register(
    "c4_line_filters",
    f"""
    WITH built AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 3 THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(generate_series(0, 4 + doc_id % 4),
                                        i -> {_C4L_LINE_SQL}) END AS l
        FROM documents
    ),
    shaped AS (
        SELECT doc_id, l,
               list_filter(l, x -> len(string_split_regex(x, '\\s+')) >= 3
                                    AND regexp_matches(x, '[.!?"]$')) AS k,
               list_filter(l, x -> len(string_split_regex(x, '\\s+')) < 3)
                   AS short_l,
               list_filter(l, x -> len(string_split_regex(x, '\\s+')) >= 3
                                    AND NOT regexp_matches(x, '[.!?"]$'))
                   AS noterm_l
        FROM built
    )
    SELECT doc_id,
           CAST(len(l) AS BIGINT) AS n_lines,
           CAST(len(k) AS BIGINT) AS n_kept,
           CAST(len(short_l) AS BIGINT) AS n_dropped_short,
           CAST(len(noterm_l) AS BIGINT) AS n_dropped_terminal,
           COALESCE(list_aggregate(k, 'string_agg', chr(10)), '') AS clean_text
    FROM shaped
    """,
)
def c4_line_filters_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import c4_line_filters

    d = F.col("doc_id")

    def line(i):
        m = i % 4
        return (
            F.when(m == 0, F.concat(
                F.lit("this is sentence number "),
                (d + i).cast("string"), F.lit(" of the body.")))
            .when(m == 1, F.lit("short line"))
            .when(m == 2, F.concat(
                F.lit("a trailing line without terminal punctuation mark "),
                i.cast("string")))
            .otherwise(F.concat(
                F.lit("is this a question line number "),
                i.cast("string"), F.lit("?")))
        )

    text = F.when(
        # all-blank doc: must emit the all-zero row (r12 ADVICE)
        F.pmod(d, F.lit(11)) == 3, F.lit(" \n  \n"),
    ).otherwise(F.concat_ws(
        "\n",
        F.transform(F.sequence(F.lit(0), (F.lit(4) + F.pmod(d, F.lit(4))).cast("int")),
                    line),
    ))
    return c4_line_filters(
        star.documents.select("doc_id", text.alias("text"))
    )


# ---------------------------------------------------------------------------
# robots.txt politeness gate (operators.corpus.robots_disallow_gate —
# RFC 9309 precedence: longest matching rule wins, allow beats
# disallow on ties, no match ⇒ allowed; §2.2.3 wildcards: '*' matches
# any character sequence, trailing '$' anchors to the path end).
# Rules are hosts-sized and broadcast; the fixture exercises every
# precedence branch (longer allow under a disallow, an exact-length
# allow/disallow tie, a rule-less host, scheme-ful / protocol-relative
# / bare URL spellings) PLUS the wildcard battery (r12 verdict #2,
# permanent rows per the ef87cfd precedent): a mid-rule '*' ('/*/w'
# flips the previously rule-less /free/w to disallowed), a wildcard
# beating a shorter literal ('/a/x*' allow over '/a' disallow), a '$'
# anchor that matches exactly one path and nothing under it ('/a$'),
# and an equal-length wildcard allow/disallow tie ('/d*p/z' vs
# '/dup/*' on /dup/z — allow wins).  The frontier dedups identical
# URLs through the same rank-1 window on both engines.
# ---------------------------------------------------------------------------

_RB_HOSTS = 20

def _rb_rule_re_sql(rule: str) -> str:
    """DuckDB twin of operators.corpus.robots_rule_regex — the same
    escape → '*'→'.*' → anchor translation, character for character
    (both emit only ^, escaped literals, .*, and an optional trailing
    $, which Java regex and RE2 interpret identically)."""
    strip = (f"CASE WHEN {rule} LIKE '%$' THEN "
             f"substr({rule}, 1, length({rule})-1) ELSE {rule} END")
    esc = (f"regexp_replace({strip}, "
           r"'([.+?(){}\[\]|^$\\])', '\\\1', 'g')")
    return (f"'^' || replace({esc}, '*', '.*') || "
            f"CASE WHEN {rule} LIKE '%$' THEN '$' ELSE '' END")

_RB_URL_SQL = f"""
    CASE doc_id % 6
      WHEN 0 THEN 'https://h' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR)
                  || '/a/x' || CAST(doc_id % 7 AS VARCHAR)
      WHEN 1 THEN 'https://h' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR)
                  || '/a/pub/y'
      WHEN 2 THEN '//h' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR) || '/dup/z'
      WHEN 3 THEN 'h' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR) || '/free/w'
      WHEN 4 THEN 'https://h' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR) || '/a'
      ELSE 'https://z' || CAST(doc_id % {_RB_HOSTS} AS VARCHAR) || '/a/x'
    END
"""

_RB_RULES_SQL = f"""
    SELECT 'h' || CAST(h AS VARCHAR) AS host, r.path_prefix, r.allow
    FROM generate_series(0, {_RB_HOSTS - 1}) g(h),
         (VALUES ('/a', false), ('/a/pub', true),
                 ('/dup', true), ('/dup', false),
                 ('/*/w', false), ('/a/x*', true), ('/a$', true),
                 ('/d*p/z', false), ('/dup/*', true))
         r(path_prefix, allow)
"""

@register(
    "robots_disallow_gate",
    f"""
    WITH frontier AS (SELECT {_RB_URL_SQL} AS url FROM documents),
    rules AS ({_RB_RULES_SQL}),
    parsed AS (
        SELECT url,
               string_split(regexp_replace(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*:)?//', ''), '/')[1] AS host,
               '/' || COALESCE(regexp_extract(regexp_replace(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*:)?//', ''),
                   '^[^/]*/(.*)$', 1), '') AS path
        FROM frontier
    ),
    rules_re AS (
        SELECT host, path_prefix, allow,
               NOT (path_prefix LIKE '%*%' OR path_prefix LIKE '%$')
                   AS plain,
               {_rb_rule_re_sql('path_prefix')} AS re
        FROM rules
    ),
    cand AS (
        SELECT p.url, p.host, p.path,
               CASE WHEN r.path_prefix IS NOT NULL
                         AND (CASE WHEN r.plain
                              THEN starts_with(p.path, r.path_prefix)
                              ELSE regexp_matches(p.path, r.re) END)
                    THEN r.path_prefix END AS mp,
               CASE WHEN r.path_prefix IS NOT NULL
                         AND (CASE WHEN r.plain
                              THEN starts_with(p.path, r.path_prefix)
                              ELSE regexp_matches(p.path, r.re) END)
                    THEN r.allow END AS al
        FROM parsed p LEFT JOIN rules_re r USING (host)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY url
                   ORDER BY length(mp) DESC NULLS LAST,
                            al DESC NULLS LAST,
                            mp ASC NULLS LAST) AS rk
        FROM cand
    )
    SELECT url, host, path, mp AS matched_prefix,
           COALESCE(al, true) AS allowed
    FROM ranked WHERE rk = 1
    """,
)
def robots_disallow_gate_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import robots_disallow_gate

    d = F.col("doc_id")
    h = F.pmod(d, F.lit(_RB_HOSTS)).cast("string")
    url = (
        F.when(F.pmod(d, F.lit(6)) == 0, F.concat(
            F.lit("https://h"), h, F.lit("/a/x"),
            F.pmod(d, F.lit(7)).cast("string")))
        .when(F.pmod(d, F.lit(6)) == 1,
              F.concat(F.lit("https://h"), h, F.lit("/a/pub/y")))
        .when(F.pmod(d, F.lit(6)) == 2,
              F.concat(F.lit("//h"), h, F.lit("/dup/z")))
        .when(F.pmod(d, F.lit(6)) == 3,
              F.concat(F.lit("h"), h, F.lit("/free/w")))
        .when(F.pmod(d, F.lit(6)) == 4,
              F.concat(F.lit("https://h"), h, F.lit("/a")))
        .otherwise(F.concat(F.lit("https://z"), h, F.lit("/a/x")))
    )
    frontier = star.documents.select(url.alias("url"))
    spark = star.documents.sparkSession
    rules = spark.createDataFrame(
        [(f"h{i}", p, a) for i in range(_RB_HOSTS)
         for (p, a) in [("/a", False), ("/a/pub", True),
                        ("/dup", True), ("/dup", False),
                        ("/*/w", False), ("/a/x*", True), ("/a$", True),
                        ("/d*p/z", False), ("/dup/*", True)]],
        "host string, path_prefix string, allow boolean",
    )
    return robots_disallow_gate(frontier, rules)


# ---------------------------------------------------------------------------
# Per-source embedding centroids + distance-to-centroid outliers
# (operators.similarity.group_centroids / centroid_outliers): the
# domain-consistency gate — a doc whose embedding sits far from its
# source's centroid is mislabeled, spam, or a scrape artifact.  The
# centroid is a DISTRIBUTED dimension-wise aggregate over exact 1e-9
# integer micro-units (the crawl_schedule mass precedent), so the mean
# is engine-exact and the whole profile value-hashes — the one KMeans
# UPDATE step the rows-only trained-ANN family could never hash.
# ---------------------------------------------------------------------------

_SCO_GROUPS = 6
_SCO_THRESH = 0.0

@register(
    "source_centroid_outliers",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               vec_id % {_SCO_GROUPS} AS grp
        FROM embeddings
    ),
    -- generate_series takes constants only: 64 = the embeddings
    -- fixture dim (the Spark operator is dim-agnostic via posexplode);
    -- the i <= len(v) guard keeps the twin honest if the dim changes
    dims AS (
        SELECT grp, i, CAST(round(v[i] * 1000000000) AS BIGINT) AS xq
        FROM e, generate_series(1, 64) g(i)
        WHERE i <= len(v)
    ),
    per_dim AS (
        SELECT grp, i, SUM(xq) AS s, COUNT(*) AS n
        FROM dims GROUP BY 1, 2
    ),
    cents AS (
        SELECT grp,
               list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
                    ORDER BY i) AS c
        FROM per_dim GROUP BY grp
    ),
    scored AS (
        SELECT e.vec_id, e.grp,
               round(list_dot_product(e.v, c.c)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(c.c, c.c))), 6) AS cos
        FROM e JOIN cents c USING (grp)
    )
    SELECT vec_id, CAST(grp AS BIGINT) AS source_grp,
           cos AS cosine_to_centroid,
           cos < {_SCO_THRESH} AS is_outlier
    FROM scored
    """,
)
def source_centroid_outliers_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.similarity import centroid_outliers

    emb = star.embeddings.select(
        "vec_id", "embedding",
        F.pmod(F.col("vec_id"), F.lit(_SCO_GROUPS)).alias("source_grp"),
    )
    return centroid_outliers(
        emb, "source_grp", threshold=_SCO_THRESH
    ).select(
        "vec_id", F.col("source_grp").cast("long").alias("source_grp"),
        "cosine_to_centroid", "is_outlier",
    )


# ---------------------------------------------------------------------------
# Hashing-trick linear scorer (functions.text.hashed_linear_score —
# the fastText/CCNet-style quality-filter SERVING arithmetic, public):
# tokens + word bigrams hash into a FIXED 64-bucket feature space via
# the portable seeded md5, then a frozen literal weight vector scores
# each doc map-side.  Distinct from quality_classifier_score_fixed
# (engineered features): this value-hashes the HASH-BUCKET feature
# map itself, the part of a fastText filter that must be reproducible
# across engines and re-trainings.
# ---------------------------------------------------------------------------

_HNS_BUCKETS = 64
_HNS_SEED = 5
# frozen deterministic pseudo-weights in [-0.5, 0.5), 6dp-exact
_HNS_WEIGHTS = [
    round(((b * 37 + 11) % 199) / 199.0 - 0.5, 6) for b in range(_HNS_BUCKETS)
]
_HNS_W_SQL = "[" + ", ".join(f"{w!r}" for w in _HNS_WEIGHTS) + "]::DOUBLE[]"

@register(
    "hashed_ngram_score",
    f"""
    WITH t AS (
        SELECT doc_id, {TOKSEQ_SQL.format(col='text')} AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_concat(toks,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS grams
        FROM t
    ),
    b AS (
        SELECT doc_id,
               list_transform(grams,
                   x -> CAST({_hash64_sql('x', _HNS_SEED)} % {_HNS_BUCKETS}
                             AS INT)) AS bk
        FROM g
    )
    SELECT doc_id,
           CAST(len(bk) AS BIGINT) AS n_grams,
           CASE WHEN len(bk) > 0
                THEN round(list_reduce(
                         list_transform(bk, x -> ({_HNS_W_SQL})[x + 1]),
                         (acc, x) -> acc + x)
                     / CAST(len(bk) AS DOUBLE), 6)
                ELSE 0.0 END AS score
    FROM b
    """,
)
def hashed_ngram_score_q(star: Star) -> DataFrame:
    # two projection tiers: tokenize once, hash the grams once — the
    # score and the gram count then reference the bucket array for free
    return (
        star.documents.select(
            "doc_id", X.tokens("text").alias("_toks")
        )
        .select(
            "doc_id",
            X.hashed_gram_buckets(
                F.col("_toks"), n_buckets=_HNS_BUCKETS, seed=_HNS_SEED
            ).alias("_bk"),
        )
        .select(
            "doc_id",
            F.size("_bk").cast("long").alias("n_grams"),
            X.hashed_linear_score_from(F.col("_bk"), _HNS_WEIGHTS)
            .alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Packing-efficiency audit (operators.sampling.pack_efficiency_report):
# the training-batch dashboard over the doc_pack_offset packing — per
# (shard, bin) document count, carried units, fill ratio vs the budget,
# and the straddle-overflow flag the sequence writer's carry implies.
# One bins-sized aggregate over the already-verified packing window.
# ---------------------------------------------------------------------------

@register(
    "pack_efficiency_report",
    f"""
    WITH packed AS (
        SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard, n_chars,
               CAST(floor((SUM(n_chars) OVER w - n_chars)
                    / {_PACK_BUDGET}) AS BIGINT) AS bin
        FROM documents
        WINDOW w AS (PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT shard, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS units,
           round(CAST(SUM(n_chars) AS DOUBLE) / {_PACK_BUDGET}.0, 6) AS fill,
           SUM(n_chars) > {_PACK_BUDGET} AS overflow
    FROM packed GROUP BY 1, 2
    """,
)
def pack_efficiency_report_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import (
        pack_by_offset,
        pack_efficiency_report,
    )

    sized = star.documents.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).alias("shard"),
        "n_chars",
    )
    packed = pack_by_offset(
        sized, "n_chars", budget=_PACK_BUDGET, shard_col="shard",
        order_by=["doc_id"],
    )
    return pack_efficiency_report(
        packed, budget=_PACK_BUDGET, size_col="n_chars"
    )


# ---------------------------------------------------------------------------
# Crawl-delay-capped schedule (operators.temporal.crawl_schedule with
# delays): robots.txt Crawl-delay makes a host's physical per-cycle
# ceiling floor(cycle/delay) — quotas above it are unspendable, so the
# Hamilton quota is capped AFTER apportionment (the budget stays a
# ceiling; freed quota is surfaced, not silently reallocated).  The
# fixture assigns delays to EVEN-numbered hosts only, so the capped,
# uncapped, and rule-less paths all hash.
# ---------------------------------------------------------------------------

_CSD_CYCLE = 10

@register(
    "crawl_schedule_delay_capped",
    f"""
    WITH {_CS_CORE_CTES},
    delays AS (
        SELECT 'h' || CAST(h AS VARCHAR) AS host,
               1 + (h // 2) % 7 AS crawl_delay_sec
        FROM generate_series(0, 38, 2) g(h)
    ),
    capped AS (
        SELECT a.host,
               CASE WHEN d.crawl_delay_sec IS NOT NULL
                    THEN least(a.quota,
                               CAST(floor({_CSD_CYCLE} / d.crawl_delay_sec)
                                    AS BIGINT))
                    ELSE a.quota END AS quota
        FROM alloc a LEFT JOIN delays d USING (host)
    )
    SELECT r.url, r.host, r.priority, r.rank_in_host
    FROM ranked r JOIN capped c USING (host)
    WHERE r.rank_in_host <= c.quota
    """,
)
def crawl_schedule_delay_capped_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import crawl_schedule

    u = F.pmod(F.col("user_id"), F.lit(500))
    h = F.pmod(F.col("user_id"), F.lit(40))
    width = (F.lit(86400) * (F.lit(1) + F.pmod(u, F.lit(5)))).cast("long")
    prefix = (
        F.when(F.pmod(F.col("user_id"), F.lit(3)) == 0, F.lit("http://"))
        .when(F.pmod(F.col("user_id"), F.lit(3)) == 1, F.lit("//"))
        .otherwise(F.lit(""))
    )
    url = F.concat(prefix, F.lit("h"), h.cast("string"),
                   F.lit("/p"), u.cast("string"))
    hist = star.events.select(
        "event_id",
        url.alias("url"),
        F.col("ts").alias("fetch_ts"),
        F.md5(F.concat(
            url, F.lit(":"),
            F.floor(F.unix_timestamp("ts").cast("double") / width)
            .cast("long").cast("string"),
        )).alias("content_hash"),
    )
    spark = star.events.sparkSession
    delays = spark.createDataFrame(
        [(f"h{i}", 1 + (i // 2) % 7) for i in range(0, 39, 2)],
        "host string, crawl_delay_sec int",
    )
    return crawl_schedule(
        hist, _CS_BUDGET, order_tiebreak="event_id",
        delays=delays, cycle_seconds=_CSD_CYCLE,
    )


# ---------------------------------------------------------------------------
# robots.txt parsing (operators.corpus.parse_robots_txt): raw robots
# bodies → the (host, path_prefix, allow, crawl_delay_sec) rules frame
# the gate and the delay-capped scheduler consume — the first stage of
# the politeness pipeline, fully relational (posexplode + one
# host-keyed lag/running-sum window pair turns UA lines into block
# ids; no per-file fold).  The fixture exercises the grammar: a
# non-star group that must NOT emit, consecutive UA lines sharing a
# group, trailing comments, an empty Disallow (allow-all, skipped),
# case-insensitive keys, and Crawl-delay on a subset of hosts.
# ---------------------------------------------------------------------------

def _rp_files(star: Star) -> DataFrame:
    """The shared robots.txt body fixture (Spark side of _RP_BODY_SQL):
    one robots.txt corpus, two verified readings — robots_rules_parse
    (group-scoped directives) and robots_sitemap_urls (the
    group-independent Sitemap lines the parser must skip)."""
    d = F.col("doc_id")
    nl = F.lit("\n")
    p = F.pmod(d, F.lit(5)).cast("string")
    body = F.concat(
        F.lit("User-agent: googlebot"), nl,
        F.lit("Disallow: /google-only"), nl,
        # group-independent Sitemap line INSIDE a foreign group: the
        # rules parser must skip it; robots_sitemap_urls must read it
        F.lit("Sitemap: https://h"), d.cast("string"),
        F.lit("/sitemap.xml"), nl,
        F.lit("User-agent: *"), nl,
        F.when(F.pmod(d, F.lit(3)) == 0,
               F.concat(F.lit("User-agent: testbot"), nl)).otherwise(F.lit("")),
        F.lit("Disallow: /p"), p, F.lit("   # rule"), nl,
        F.when(F.pmod(d, F.lit(2)) == 0,
               F.concat(F.lit("Allow: /p"), p, F.lit("/pub"), nl))
        .otherwise(F.lit("")),
        F.when(F.pmod(d, F.lit(4)) == 0,
               F.concat(F.lit("Crawl-delay: "),
                        (F.lit(1) + F.pmod(d, F.lit(5))).cast("string"), nl))
        .otherwise(F.lit("")),
        F.lit("Disallow:"),
        F.when(F.pmod(d, F.lit(2)) == 0,  # duplicate listing: dedups
               F.concat(nl, F.lit("Sitemap: https://h"), d.cast("string"),
                        F.lit("/sitemap.xml"))).otherwise(F.lit("")),
        F.when(F.pmod(d, F.lit(3)) == 0,  # case-insensitive key
               F.concat(nl, F.lit("SITEMAP: https://h"), d.cast("string"),
                        F.lit("/s2.xml"))).otherwise(F.lit("")),
    )
    return star.documents.filter(d < 40).select(
        F.concat(F.lit("h"), d.cast("string")).alias("host"),
        body.alias("robots_txt"),
    )


_RP_BODY_SQL = """
           'User-agent: googlebot' || chr(10) ||
           'Disallow: /google-only' || chr(10) ||
           'Sitemap: https://h' || CAST(doc_id AS VARCHAR)
               || '/sitemap.xml' || chr(10) ||
           'User-agent: *' || chr(10) ||
           CASE WHEN doc_id % 3 = 0
                THEN 'User-agent: testbot' || chr(10) ELSE '' END ||
           'Disallow: /p' || CAST(doc_id % 5 AS VARCHAR)
               || '   # rule' || chr(10) ||
           CASE WHEN doc_id % 2 = 0
                THEN 'Allow: /p' || CAST(doc_id % 5 AS VARCHAR)
                     || '/pub' || chr(10) ELSE '' END ||
           CASE WHEN doc_id % 4 = 0
                THEN 'Crawl-delay: ' || CAST(1 + doc_id % 5 AS VARCHAR)
                     || chr(10) ELSE '' END ||
           'Disallow:' ||
           CASE WHEN doc_id % 2 = 0
                THEN chr(10) || 'Sitemap: https://h' || CAST(doc_id AS VARCHAR)
                     || '/sitemap.xml' ELSE '' END ||
           CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'SITEMAP: https://h' || CAST(doc_id AS VARCHAR)
                     || '/s2.xml' ELSE '' END
"""

@register(
    "robots_rules_parse",
    f"""
    WITH files AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
               {_RP_BODY_SQL} AS txt
        FROM documents WHERE doc_id < 40
    ),
    rawlines AS (
        -- generate_series takes constants only: 16 bounds the fixture's
        -- line count; the i <= len guard keeps the twin honest
        SELECT host, i AS idx,
               trim(regexp_replace(string_split(txt, chr(10))[i],
                                   '#.*$', '')) AS line
        FROM files, generate_series(1, 16) g(i)
        WHERE i <= len(string_split(txt, chr(10)))
    ),
    typed AS (
        SELECT host, idx,
               lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS k,
               trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS v
        FROM rawlines WHERE line <> ''
    ),
    t2 AS (
        SELECT * FROM typed
        WHERE k IN ('user-agent', 'disallow', 'allow', 'crawl-delay')
    ),
    marked AS (
        SELECT host, idx, k, v,
               CASE WHEN k = 'user-agent'
                     AND COALESCE(LAG(k) OVER (
                         PARTITION BY host ORDER BY idx), '')
                         <> 'user-agent'
                    THEN 1 ELSE 0 END AS is_start
        FROM t2
    ),
    blocked AS (
        SELECT *, SUM(is_start) OVER (
                   PARTITION BY host ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS block
        FROM marked
    ),
    star_blocks AS (
        SELECT host, block FROM blocked
        WHERE k = 'user-agent' AND block > 0
        GROUP BY host, block
        HAVING MAX(CASE WHEN lower(v) = '*' THEN 1 ELSE 0 END) = 1
    ),
    d AS (
        SELECT b.host, b.k, b.v
        FROM blocked b JOIN star_blocks s USING (host, block)
        WHERE b.k <> 'user-agent'
    )
    -- hash-friendly projection: the operator returns NULLs for the
    -- not-applicable fields, but nullable boolean/int columns stringify
    -- differently across pandas dtypes ('<NA>' vs 'None'), so the
    -- hashed query sentinel-encodes: allow_i -1 = delay row, '' = no
    -- prefix, delay -1 = rule row
    SELECT host, v AS path_prefix,
           CAST(CASE WHEN k = 'allow' THEN 1 ELSE 0 END AS INT) AS allow_i,
           CAST(-1 AS INT) AS crawl_delay_sec
    FROM d WHERE k IN ('disallow', 'allow') AND v <> ''
    UNION ALL
    SELECT host, '', CAST(-1 AS INT), CAST(v AS INT)
    FROM d WHERE k = 'crawl-delay' AND regexp_matches(v, '^[0-9]+$')
    """,
)
def robots_rules_parse_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import parse_robots_txt

    files = _rp_files(star)
    # sentinel-encoded hash projection (see the oracle comment): the
    # operator's NULL-based API is exercised verbatim by the unit tests
    return parse_robots_txt(files).select(
        "host",
        F.coalesce("path_prefix", F.lit("")).alias("path_prefix"),
        F.coalesce(F.col("allow").cast("int"), F.lit(-1)).alias("allow_i"),
        F.coalesce("crawl_delay_sec", F.lit(-1)).alias("crawl_delay_sec"),
    )


# ---------------------------------------------------------------------------
# robots.txt Sitemap discovery (operators.corpus.robots_sitemap_urls):
# the crawl-seeding handshake's FIRST hop — robots.txt names the
# host's sitemaps, sitemap_url_extract then reads them.  The directive
# is group-independent per the sitemaps protocol, so the fixture
# plants one INSIDE the googlebot group (the rules parser must skip
# it; this operator must read it), a duplicate listing (dedups), and
# an upper-case SITEMAP: key (case-insensitive).  Same body fixture as
# robots_rules_parse: one robots.txt corpus, two verified readings.
# ---------------------------------------------------------------------------

@register(
    "robots_sitemap_urls",
    f"""
    WITH files AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
               {_RP_BODY_SQL} AS txt
        FROM documents WHERE doc_id < 40
    ),
    rawlines AS (
        SELECT host,
               trim(regexp_replace(string_split(txt, chr(10))[i],
                                   '#.*$', '')) AS line
        FROM files, generate_series(1, 16) g(i)
        WHERE i <= len(string_split(txt, chr(10)))
    ),
    kv AS (
        SELECT host,
               lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS k,
               trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS v
        FROM rawlines WHERE line <> ''
    )
    SELECT DISTINCT host, v AS sitemap_url
    FROM kv WHERE k = 'sitemap' AND v <> ''
    """,
)
def robots_sitemap_urls_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import robots_sitemap_urls

    files = _rp_files(star)
    return robots_sitemap_urls(files)


# ---------------------------------------------------------------------------
# Sitemap extraction (operators.corpus.sitemap_url_extract): sitemap
# XML → frontier candidates with the lastmod/changefreq/priority
# signals the recrawl scheduler consumes — the crawl-seeding companion
# of robots_rules_parse.  Fixture exercises multi-line entries, tag
# case variation, all-optional-field combinations, a loc-less entry
# (skipped), and a non-numeric priority (NULL).  priority is the only
# nullable non-string output (float: both engines stringify NaN
# identically in the hash).  r13 (r12 verdict #3) adds the permanent
# adversarial rows (ef87cfd precedent): an entity-escaped query-string
# loc (?a=1&amp;b=2 + decimal/hex numeric refs + &apos; + an
# out-of-range &#955; that must pass through VERBATIM), a lastmod
# whose '-' arrives as &#45; (decode must run before the 10-char
# substr), a CDATA loc whose content — raw '&' AND a literal '&amp;'
# — must survive UNdecoded (XML decodes nothing inside CDATA), and a
# changefreq arriving as &#87;EEKLY (decode before lowercase).
# ---------------------------------------------------------------------------

def _xml_unescape_sql(x: str) -> str:
    """DuckDB twin of functions.text.xml_unescape — the same
    sentinel-split single-pass decode (five named entities + ASCII
    32-126 numeric references, malformed/out-of-range verbatim)."""
    num_dec = "TRY_CAST(regexp_extract(p, '^&#([0-9]{1,7});', 1) AS INT)"
    num_hex = ("TRY_CAST('0x' || regexp_extract(p, "
               "'^&#[xX]([0-9a-fA-F]{1,6});', 1) AS INT)")
    code = (f"CASE WHEN regexp_matches(p, '^&#[0-9]{{1,7}};') THEN {num_dec} "
            f"WHEN regexp_matches(p, '^&#[xX][0-9a-fA-F]{{1,6}};') "
            f"THEN {num_hex} END")
    return f"""array_to_string(list_transform(
      string_split(replace({x}, '&', chr(1) || '&'), chr(1)),
      p -> CASE
        WHEN p LIKE '&amp;%'  THEN '&'  || substr(p, 6)
        WHEN p LIKE '&lt;%'   THEN '<'  || substr(p, 5)
        WHEN p LIKE '&gt;%'   THEN '>'  || substr(p, 5)
        WHEN p LIKE '&quot;%' THEN '"'  || substr(p, 7)
        WHEN p LIKE '&apos;%' THEN chr(39) || substr(p, 7)
        WHEN COALESCE(({code}) BETWEEN 32 AND 126, false)
             THEN chr(COALESCE({num_dec}, {num_hex}))
                  || regexp_replace(p,
                     '^&#(?:[0-9]{{1,7}}|[xX][0-9a-fA-F]{{1,6}});', '')
        ELSE p END), '')"""

_SM_XML_SQL = """
           '<urlset>' ||
           '<url>' || chr(10) || '  <loc> https://h' || CAST(doc_id AS VARCHAR)
               || '/p' || CAST(doc_id % 7 AS VARCHAR) || ' </loc>' || chr(10)
               || '<lastmod>2024-0' || CAST(1 + doc_id % 9 AS VARCHAR)
               || '-15T10:00:00Z</lastmod>'
               || '<priority>0.' || CAST(doc_id % 10 AS VARCHAR)
               || '</priority></url>' ||
           '<URL><loc>https://h' || CAST(doc_id AS VARCHAR) || '/q</loc>'
               || CASE WHEN doc_id % 2 = 0
                       THEN '<changefreq>DAILY</changefreq>' ELSE '' END
               || '</URL>' ||
           '<url><priority>0.5</priority></url>' ||
           CASE WHEN doc_id % 3 = 0
                THEN '<url><loc>https://h' || CAST(doc_id AS VARCHAR)
                     || '/r</loc><priority>abc</priority></url>'
                ELSE '' END ||
           '<url><loc>https://h' || CAST(doc_id AS VARCHAR)
               || '/s?a=1&amp;b=2&#47;c&#x2F;d&apos;e&#955;</loc>'
               || '<lastmod>2024&#45;02-20T08:00:00Z</lastmod></url>' ||
           '<url><loc><![CDATA[https://h' || CAST(doc_id AS VARCHAR)
               || '/cd?x=1&y=2&amp;z]]></loc>'
               || '<changefreq>&#87;EEKLY</changefreq></url>' ||
           '</urlset>'
"""

@register(
    "sitemap_url_extract",
    f"""
    WITH files AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
               {_SM_XML_SQL} AS xml
        FROM documents WHERE doc_id < 40
    ),
    entries AS (
        SELECT host,
               unnest(regexp_extract_all(xml,
                   '(?is)<url\\b[^>]*>(.*?)</url>', 1)) AS e
        FROM files
    ),
    raws AS (
        SELECT host,
               trim(regexp_extract(e, '(?is)<loc\\s*>\\s*(.*?)\\s*</loc>', 1))
                   AS rloc,
               regexp_extract(e,
                   '(?is)<lastmod\\s*>\\s*([^<]*?)\\s*</lastmod>', 1) AS rlast,
               regexp_extract(e,
                   '(?is)<changefreq\\s*>\\s*([^<]*?)\\s*</changefreq>', 1)
                   AS rfreq,
               regexp_extract(e,
                   '(?is)<priority\\s*>\\s*([^<]*?)\\s*</priority>', 1) AS rprio
        FROM entries
    ),
    parsed AS (
        SELECT host,
               CASE WHEN regexp_matches(rloc, '(?s)^<!\\[CDATA\\[.*\\]\\]>$')
                    THEN regexp_extract(rloc,
                         '(?s)^<!\\[CDATA\\[(.*)\\]\\]>$', 1)
                    ELSE {_xml_unescape_sql('rloc')} END AS url,
               NULLIF(substr({_xml_unescape_sql('rlast')}, 1, 10), '')
                   AS lastmod,
               NULLIF(lower({_xml_unescape_sql('rfreq')}), '') AS changefreq,
               TRY_CAST(NULLIF(rprio, '') AS DOUBLE) AS priority
        FROM raws
    )
    SELECT host, url, lastmod, changefreq, priority
    FROM parsed WHERE url <> ''
    """,
)
def sitemap_url_extract_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import sitemap_url_extract

    d = F.col("doc_id")
    nl = F.lit("\n")
    h = d.cast("string")
    xml = F.concat(
        F.lit("<urlset>"),
        F.lit("<url>"), nl, F.lit("  <loc> https://h"), h, F.lit("/p"),
        F.pmod(d, F.lit(7)).cast("string"), F.lit(" </loc>"), nl,
        F.lit("<lastmod>2024-0"),
        (F.lit(1) + F.pmod(d, F.lit(9))).cast("string"),
        F.lit("-15T10:00:00Z</lastmod>"),
        F.lit("<priority>0."), F.pmod(d, F.lit(10)).cast("string"),
        F.lit("</priority></url>"),
        F.lit("<URL><loc>https://h"), h, F.lit("/q</loc>"),
        F.when(F.pmod(d, F.lit(2)) == 0,
               F.lit("<changefreq>DAILY</changefreq>")).otherwise(F.lit("")),
        F.lit("</URL>"),
        F.lit("<url><priority>0.5</priority></url>"),
        F.when(F.pmod(d, F.lit(3)) == 0,
               F.concat(F.lit("<url><loc>https://h"), h,
                        F.lit("/r</loc><priority>abc</priority></url>")))
        .otherwise(F.lit("")),
        # r13 adversarial rows: entity-escaped query-string loc (decimal
        # + hex refs, &apos;, out-of-range &#955; stays verbatim),
        # entity-bearing lastmod, CDATA loc (content verbatim — raw '&'
        # AND a literal '&amp;' survive undecoded), entity changefreq.
        F.lit("<url><loc>https://h"), h,
        F.lit("/s?a=1&amp;b=2&#47;c&#x2F;d&apos;e&#955;</loc>"
              "<lastmod>2024&#45;02-20T08:00:00Z</lastmod></url>"),
        F.lit("<url><loc><![CDATA[https://h"), h,
        F.lit("/cd?x=1&y=2&amp;z]]></loc>"
              "<changefreq>&#87;EEKLY</changefreq></url>"),
        F.lit("</urlset>"),
    )
    files = star.documents.filter(d < 40).select(
        F.concat(F.lit("h"), h).alias("host"), xml.alias("sitemap_xml")
    )
    return sitemap_url_extract(files)


# ---------------------------------------------------------------------------
# Audio energy fingerprint (operators.multimodal.audio_energy_
# fingerprint): REAL WAV decode → int64 window energies → sign-of-delta
# bits — the audio arm of the perceptual-dedup family (image twin:
# image_ahash).  The varied-energy fixture is closed-form in (doc_id,
# i), so the oracle recomputes every window energy arithmetically while
# Spark decodes the real bytes: any header/frame misparse or windowing
# drift breaks the hash.
# ---------------------------------------------------------------------------

@register(
    "audio_energy_fingerprint",
    f"""
    WITH params AS (
        SELECT doc_id, 256 + doc_id % 257 AS n FROM documents
    ),
    samples AS (
        -- generate_series takes constants: 512 bounds the fixture
        SELECT doc_id, i, ((doc_id * 7 + i * i) % 2001) - 1000 AS s,
               i // {MM.AUDIO_FP_WINDOW} AS w
        FROM params, generate_series(0, 511) g(i)
        WHERE i < n
    ),
    energies AS (
        SELECT s.doc_id, s.w, SUM(s.s * s.s) AS e
        FROM samples s JOIN params p USING (doc_id)
        WHERE s.w < p.n // {MM.AUDIO_FP_WINDOW}
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT doc_id, w, e,
               LEAD(e) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
        FROM energies
    )
    SELECT doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(e) AS BIGINT) AS total_energy,
           CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL
                                   AND w < {MM.AUDIO_FP_MAX_BITS}
                                   AND nxt > e
                              THEN (CAST(1 AS BIGINT) << w)
                              ELSE 0 END), 0) AS BIGINT) AS fingerprint
    FROM deltas GROUP BY doc_id
    """,
)
def audio_energy_fingerprint_q(star: Star) -> DataFrame:
    return MM.audio_energy_fingerprint(
        MM.synth_wav_media_varied(star.documents)
    )


# ===========================================================================
# r13 additions
# ===========================================================================

# ---------------------------------------------------------------------------
# Audio near-dup PAIRS + CLUSTERS (operators.multimodal.audio_fp_pairs
# + the shared connected-components closure): the audio arm of the
# perceptual-dedup family completed to parity with the image arm
# (image_ahash_pairs / image_ahash_clusters) — r12 verdict #4.  The
# templated fixture makes template peers the SAME recording under
# different integer gains (fingerprint provably gain-invariant) and
# every fifth template COPY a near-dup (a +400 spike in window 2 perturbs
# at most the two delta bits touching it); window energies are exactly
# 64·gain²·amp², closed-form in (doc_id, w), so the oracle recomputes
# every energy arithmetically while Spark decodes the REAL WAV bytes.
# ---------------------------------------------------------------------------

_AFP_TEMPLATES, _AFP_RADIUS = 40, 3

# Used by both audio_fp_pairs (the pair list) and audio_fp_clusters
# (its transitive closure) — the _AH_CTES convention, audio edition.
_AFP_CTES = f"""
    aparams AS (
        SELECT doc_id, doc_id % {_AFP_TEMPLATES} AS t,
               1 + doc_id % 3 AS g,
               CASE WHEN (doc_id // {_AFP_TEMPLATES}) % 5 = 0
                    THEN 400 ELSE 0 END AS spike,
               24 + (doc_id % {_AFP_TEMPLATES}) % 9 AS n_w
        FROM documents
    ),
    awin AS (
        SELECT doc_id, w,
               64 * g * g
                  * (100 + ((t + 1) * 48271 * (w + 1) * (w + 2)) % 900
                     + CASE WHEN w = 2 THEN spike ELSE 0 END)
                  * (100 + ((t + 1) * 48271 * (w + 1) * (w + 2)) % 900
                     + CASE WHEN w = 2 THEN spike ELSE 0 END) AS e
        FROM aparams, generate_series(0, 32) gs(w)
        WHERE w < n_w
    ),
    adeltas AS (
        SELECT doc_id, w, e,
               LEAD(e) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
        FROM awin
    ),
    afp AS (
        SELECT doc_id,
               CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL
                                       AND w < {MM.AUDIO_FP_MAX_BITS}
                                       AND nxt > e
                                  THEN (CAST(1 AS BIGINT) << w)
                                  ELSE 0 END), 0) AS BIGINT) AS fp
        FROM adeltas GROUP BY doc_id
    ),
    afbands AS (
        SELECT doc_id, fp, 0 AS band_idx, (fp // 16777216) % 256 AS band_val
        FROM afp
        UNION ALL SELECT doc_id, fp, 1, (fp // 65536) % 256 FROM afp
        UNION ALL SELECT doc_id, fp, 2, (fp // 256) % 256 FROM afp
        UNION ALL SELECT doc_id, fp, 3, fp % 256 FROM afp
    ),
    afcand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
               l.fp AS fp_a, r.fp AS fp_b
        FROM afbands l JOIN afbands r
          ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         AND l.doc_id < r.doc_id
    ),
    afpairs AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
        FROM afcand
        WHERE bit_count(xor(fp_a, fp_b)) <= {_AFP_RADIUS}
    )
"""

@register(
    "audio_fp_pairs",
    f"""
    WITH {_AFP_CTES}
    SELECT id_a, id_b, hamming FROM afpairs
    """,
)
def audio_fp_pairs_q(star: Star) -> DataFrame:
    fps = MM.audio_energy_fingerprint(
        MM.synth_wav_media_templated(star.documents,
                                     n_templates=_AFP_TEMPLATES)
    )
    return MM.audio_fp_pairs(fps, max_hamming=_AFP_RADIUS).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register(
    "audio_fp_clusters",
    f"""
    WITH RECURSIVE {_AFP_CTES},
    aedges AS (
        SELECT id_a AS src, id_b AS dst FROM afpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM afpairs
    ),
    areach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM aedges e JOIN areach r ON r.src = e.dst
    ),
    acomp AS (
        SELECT src AS media_id, MIN(dst) AS cluster_id FROM areach GROUP BY src
    ),
    acsizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM acomp GROUP BY cluster_id
    )
    SELECT c.media_id, c.cluster_id, s.cluster_size,
           c.media_id = c.cluster_id AS is_canonical
    FROM acomp c JOIN acsizes s USING (cluster_id)
    """,
)
def audio_fp_clusters_q(star: Star) -> DataFrame:
    fps = MM.audio_energy_fingerprint(
        MM.synth_wav_media_templated(star.documents,
                                     n_templates=_AFP_TEMPLATES)
    )
    pairs = MM.audio_fp_pairs(fps, max_hamming=_AFP_RADIUS)
    # node set from the documents scan, not the WAV-decode chain — same
    # identity argument as image_ahash_clusters (one fingerprint row per
    # doc, media_id = doc_id; oracle reach base reads documents)
    ids = star.documents.select(F.col("doc_id").alias("media_id"))
    return D.near_dup_clusters(ids, id_col="media_id", pairs=pairs)


# ---------------------------------------------------------------------------
# Video near-dup FINGERPRINT + PAIRS + CLUSTERS (operators.multimodal.
# video_luma_fingerprint / video_fp_pairs + the shared connected-
# components closure): the video arm of the perceptual-dedup family,
# completing the image/audio/video triad (r12 verdict #4 finished the
# audio arm; this is its video twin).  The templated fixture makes
# template peers the SAME footage under different uniform brightness
# offsets (fingerprint provably brightness-invariant) and every fifth
# template COPY a near-dup (a +80 perturbation inside frame 2's mod-160
# level congruence perturbs at most the two delta bits touching it);
# frame f's luma sum is exactly w·h·(L(f)+b) + T with closed-form
# texture total T, so the oracle recomputes every frame sum
# arithmetically while Spark decodes the REAL Y4M bytes.
# ---------------------------------------------------------------------------

_VFP_TEMPLATES, _VFP_RADIUS = 40, 3

# Used by all three video queries — the _AFP_CTES convention, video
# edition.  vfp carries n_frames/total_luma too so the fingerprint
# query is a plain projection of it.
_VFP_CTES = f"""
    vparams AS (
        SELECT doc_id, doc_id % {_VFP_TEMPLATES} AS t,
               10 * (doc_id % 3) AS b,
               CASE WHEN (doc_id // {_VFP_TEMPLATES}) % 5 = 0
                    THEN 80 ELSE 0 END AS spike,
               8 + 2 * ((doc_id % {_VFP_TEMPLATES}) % 5) AS w,
               6 + 2 * ((doc_id % {_VFP_TEMPLATES}) % 3) AS h,
               24 + (doc_id % {_VFP_TEMPLATES}) % 9 AS nf
        FROM documents
    ),
    vframes AS (
        SELECT doc_id, f,
               (20 + ((t + 1) * 48271 * (f + 1) * (f + 2)
                      + CASE WHEN f = 2 THEN spike ELSE 0 END) % 160
                + b) * w * h
               + 3 * w * ((h - 1) * h // 2)
               + h * ((w - 1) * w // 2) AS s
        FROM vparams, generate_series(0, 32) gs(f)
        WHERE f < nf
    ),
    vdeltas AS (
        SELECT doc_id, f, s,
               LEAD(s) OVER (PARTITION BY doc_id ORDER BY f) AS nxt
        FROM vframes
    ),
    vfp AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(s) AS BIGINT) AS total_luma,
               CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL
                                       AND f < {MM.VIDEO_FP_MAX_BITS}
                                       AND nxt > s
                                  THEN (CAST(1 AS BIGINT) << f)
                                  ELSE 0 END), 0) AS BIGINT) AS fp
        FROM vdeltas GROUP BY doc_id
    ),
    vfbands AS (
        SELECT doc_id, fp, 0 AS band_idx, (fp // 16777216) % 256 AS band_val
        FROM vfp
        UNION ALL SELECT doc_id, fp, 1, (fp // 65536) % 256 FROM vfp
        UNION ALL SELECT doc_id, fp, 2, (fp // 256) % 256 FROM vfp
        UNION ALL SELECT doc_id, fp, 3, fp % 256 FROM vfp
    ),
    vfcand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
               l.fp AS fp_a, r.fp AS fp_b
        FROM vfbands l JOIN vfbands r
          ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         AND l.doc_id < r.doc_id
    ),
    vfpairs AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
        FROM vfcand
        WHERE bit_count(xor(fp_a, fp_b)) <= {_VFP_RADIUS}
    )
"""

@register(
    "video_luma_fingerprint",
    f"""
    WITH {_VFP_CTES}
    SELECT doc_id AS media_id, n_frames, total_luma, fp AS fingerprint
    FROM vfp
    """,
)
def video_luma_fingerprint_q(star: Star) -> DataFrame:
    return MM.video_luma_fingerprint(
        MM.synth_y4m_media_templated(star.documents,
                                     n_templates=_VFP_TEMPLATES)
    )


@register(
    "video_fp_pairs",
    f"""
    WITH {_VFP_CTES}
    SELECT id_a, id_b, hamming FROM vfpairs
    """,
)
def video_fp_pairs_q(star: Star) -> DataFrame:
    fps = MM.video_luma_fingerprint(
        MM.synth_y4m_media_templated(star.documents,
                                     n_templates=_VFP_TEMPLATES)
    )
    return MM.video_fp_pairs(fps, max_hamming=_VFP_RADIUS).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register(
    "video_fp_clusters",
    f"""
    WITH RECURSIVE {_VFP_CTES},
    vedges AS (
        SELECT id_a AS src, id_b AS dst FROM vfpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM vfpairs
    ),
    vreach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.dst FROM vedges e JOIN vreach r ON r.src = e.dst
    ),
    vcomp AS (
        SELECT src AS media_id, MIN(dst) AS cluster_id FROM vreach GROUP BY src
    ),
    vcsizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM vcomp GROUP BY cluster_id
    )
    SELECT c.media_id, c.cluster_id, s.cluster_size,
           c.media_id = c.cluster_id AS is_canonical
    FROM vcomp c JOIN vcsizes s USING (cluster_id)
    """,
)
def video_fp_clusters_q(star: Star) -> DataFrame:
    fps = MM.video_luma_fingerprint(
        MM.synth_y4m_media_templated(star.documents,
                                     n_templates=_VFP_TEMPLATES)
    )
    pairs = MM.video_fp_pairs(fps, max_hamming=_VFP_RADIUS)
    # node set from the documents scan, not the Y4M-decode chain — same
    # identity argument as image_ahash_clusters (one fingerprint row per
    # doc, media_id = doc_id; oracle reach base reads documents)
    ids = star.documents.select(F.col("doc_id").alias("media_id"))
    return D.near_dup_clusters(ids, id_col="media_id", pairs=pairs)


# ---------------------------------------------------------------------------
# Sitemap INDEX extraction (operators.corpus.sitemap_index_extract):
# the missing hop in the crawl-seeding handshake — robots Sitemap:
# lines name index files on large sites, the index names the child
# sitemaps, sitemap_url_extract reads those.  Fixture plants CDATA and
# entity-escaped locs, a loc-less block, and a <url> urlset block that
# the <sitemap>-block regex must NOT pick up.
# ---------------------------------------------------------------------------

@register(
    "sitemap_index_extract",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id % 40 AS hid FROM documents WHERE doc_id < 40
    )
    SELECT 'h' || hid AS host,
           'https://h' || hid || path AS sitemap_url,
           lastmod
    FROM hosts, (
        VALUES
            ('/sitemap-a.xml.gz', '2024-03-01'),
            ('/sitemap-b.xml?page=1&cursor=2', '2024-03-02'),
            ('/cd?x=1&y=2&amp;z', NULL)
    ) AS v(path, lastmod)
    """,
)
def sitemap_index_extract_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import sitemap_index_extract

    d = F.col("doc_id")
    h = d.cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        # plain child sitemap with lastmod (full timestamp → date cut)
        F.lit("<sitemap><loc>https://h"), h,
        F.lit("/sitemap-a.xml.gz</loc>"
              "<lastmod>2024-03-01T00:00:00Z</lastmod></sitemap>"),
        # entity-escaped loc + lastmod present
        F.lit("<SITEMAP ><loc> https://h"), h,
        F.lit("/sitemap-b.xml?page=1&amp;cursor=2 </loc>"
              "<lastmod>2024-03-02</lastmod></sitemap>"),
        # CDATA loc kept VERBATIM (raw & and literal &amp; both
        # survive), no lastmod
        F.lit("<sitemap><loc><![CDATA[https://h"), h,
        F.lit("/cd?x=1&y=2&amp;z]]></loc></sitemap>"),
        # loc-less block: skipped
        F.lit("<sitemap><lastmod>2024-01-01</lastmod></sitemap>"),
        # a urlset-style <url> block: NOT a <sitemap> block, ignored
        F.lit("<url><loc>https://h"), h,
        F.lit("/not-an-index</loc></url>"),
        F.lit("</sitemapindex>"),
    )
    files = star.documents.filter(d < 40).select(
        F.concat(F.lit("h"), h).alias("host"), xml.alias("sitemap_xml")
    )
    return sitemap_index_extract(files)


# ---------------------------------------------------------------------------
# HTTP revalidation planning (operators.temporal.http_revalidation_
# plan): the RFC 9111 freshness ladder (no-store/no-cache → max-age →
# Expires−Date → the §4.2.2 10% heuristic capped at 24h) + RFC 9110
# §13.1 validator precedence (ETag over Last-Modified).  The fixture
# formats REAL IMF-fixdate header strings from closed-form epochs (the
# operator parses them back with try_to_timestamp); the oracle
# recomputes every lifetime arithmetically from doc_id, so a parse,
# clamp, cap, or precedence drift breaks the hash.  Variants: quoted
# max-age, no-cache beating a co-present max-age, no-store forcing
# unconditional past a stored ETag, past-Expires clamped to 0, the
# heuristic cap binding, a malformed Last-Modified degrading to NULL,
# and an x-max-age=5 extension that the token regex must NOT match.
# ---------------------------------------------------------------------------

_REVAL_NOW = 1_700_050_000

@register(
    "http_revalidation_plan",
    f"""
    WITH p AS (
        SELECT doc_id, doc_id % 8 AS v,
               1700000000 + (doc_id * 197) % 100000 AS fetched
        FROM documents
    ),
    lif AS (
        SELECT doc_id, v, fetched,
               CASE v
                   WHEN 0 THEN 3600
                   WHEN 4 THEN greatest(0, (doc_id % 1000) - 250)
                   WHEN 5 THEN least((doc_id * 431) % 200000, 86400)
                   WHEN 7 THEN 10
                   ELSE 0
               END AS lifetime
        FROM p
    )
    SELECT 'https://h' || (doc_id % 50) || '/p' || doc_id AS url,
           CAST(lifetime AS BIGINT) AS freshness_lifetime_sec,
           CAST(fetched + lifetime AS BIGINT) AS fresh_until,
           {_REVAL_NOW} < fetched + lifetime AS is_fresh,
           CASE WHEN {_REVAL_NOW} < fetched + lifetime THEN 'fresh'
                WHEN v IN (0, 1, 7) THEN 'if-none-match'
                WHEN v IN (2, 5) THEN 'if-modified-since'
                ELSE 'unconditional'
           END AS mode
    FROM lif
    """,
)
def http_revalidation_plan_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import (
        IMF_FIXDATE_FMT,
        http_revalidation_plan,
    )

    d = F.col("doc_id")
    v = F.pmod(d, F.lit(8))
    fetched = (F.lit(1_700_000_000) + F.pmod(d * 197, F.lit(100_000))).cast(
        "long"
    )

    def imf(epoch_col):
        return F.date_format(
            F.timestamp_seconds(epoch_col), IMF_FIXDATE_FMT
        )

    cc = (
        F.when(v == 0, F.lit("public, max-age=3600"))
        .when(v == 1, F.lit('max-age="0"'))
        .when(v == 2, F.lit("no-cache, max-age=9999"))
        .when(v == 3, F.lit("no-store"))
        .when(v == 7, F.lit("x-max-age=5, stale-while-revalidate=30"))
    )
    etag = F.when(
        v.isin(0, 1, 3, 7), F.concat(F.lit('"e'), d.cast("string"), F.lit('"'))
    )
    lm = (
        F.when(v == 2, imf(fetched - F.lit(5000)))
        .when(v == 5, imf(fetched - F.pmod(d * 431, F.lit(200_000)) * 10))
        .when(v == 6, F.lit("not-a-date"))
        .when(v == 7, imf(fetched - F.lit(100)))
    )
    expires = F.when(
        v == 4, imf(fetched + F.pmod(d, F.lit(1000)) - F.lit(250))
    )
    date = F.when(v.isin(2, 4, 5, 7), imf(fetched))
    log = star.documents.select(
        F.concat(
            F.lit("https://h"), F.pmod(d, F.lit(50)).cast("string"),
            F.lit("/p"), d.cast("string"),
        ).alias("url"),
        fetched.alias("fetched_at"),
        etag.alias("etag"),
        lm.alias("last_modified"),
        cc.alias("cache_control"),
        expires.alias("expires"),
        date.alias("date"),
    )
    out = http_revalidation_plan(log, now=_REVAL_NOW)
    return out.select(
        "url",
        F.col("freshness_lifetime_sec").cast("long"),
        F.col("fresh_until").cast("long"),
        "is_fresh", "mode",
    )


# ---------------------------------------------------------------------------
# Charset sniffing (operators.multimodal.charset_sniff): WHATWG BOM
# sniff + HTML meta prescan over REAL bytes — BOM beats a conflicting
# meta, utf-32le beats the utf-16le BOM it contains, charset= outside
# a meta tag and a meta past the 1024-byte prescan window are both
# ignored, high-byte no-declaration pages default to windows-1252.
# The fixture is closed-form in doc_id % 9, so the oracle recomputes
# the expected verdicts while Spark sniffs the bytes.
# ---------------------------------------------------------------------------

@register(
    "charset_sniff",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 9
               WHEN 0 THEN 'utf-8'    WHEN 1 THEN 'utf-16le'
               WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'utf-32le'
               WHEN 4 THEN 'utf-32be'
           END AS bom_charset,
           CASE doc_id % 9
               WHEN 0 THEN 'iso-8859-1' WHEN 5 THEN 'shift_jis'
               WHEN 6 THEN 'iso-8859-7'
           END AS meta_charset,
           CASE doc_id % 9
               WHEN 0 THEN 'utf-8'    WHEN 1 THEN 'utf-16le'
               WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'utf-32le'
               WHEN 4 THEN 'utf-32be' WHEN 5 THEN 'shift_jis'
               WHEN 6 THEN 'iso-8859-7'
               WHEN 7 THEN 'us-ascii'
               WHEN 8 THEN 'windows-1252'
           END AS charset
    FROM documents
    """,
)
def charset_sniff_q(star: Star) -> DataFrame:
    return MM.charset_sniff(MM.synth_charset_media(star.documents))


# ---------------------------------------------------------------------------
# Curriculum interleave (operators.sampling.curriculum_interleave):
# the source-interleaved quality ORDER a curriculum loader actually
# reads — round-robin across sources by per-source quality rank, with
# the global position computed ARITHMETICALLY from the sources-sized
# count table (no single-partition global sort; the oracle's window
# twin proves the arithmetic IS the bijection).  The fixture trims
# per-source counts unequally (keep every m-th copy, m = 1 + s%4) so
# sources genuinely run dry mid-curriculum and the drop-out term is
# exercised.
# ---------------------------------------------------------------------------

@register(
    "curriculum_interleave",
    """
    WITH kept AS (
        SELECT doc_id, source, n_chars FROM documents
        WHERE (doc_id // 20) % (1 + (doc_id % 20) % 4) = 0
    ),
    cnts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY source
    ),
    ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS BIGINT) AS rank_in_source
        FROM kept
    )
    SELECT k.doc_id, k.source, k.rank_in_source,
           CAST((SELECT SUM(LEAST(n, k.rank_in_source - 1)) FROM cnts)
                + (SELECT COUNT(*) FROM cnts c
                   WHERE c.n >= k.rank_in_source AND c.source < k.source)
                + 1 AS BIGINT) AS global_pos
    FROM ranked k
    """,
)
def curriculum_interleave_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.sampling import (
        curriculum_interleave,
    )

    d = F.col("doc_id")
    kept = star.documents.filter(
        F.pmod(
            F.expr("doc_id div 20"),
            F.lit(1) + F.pmod(F.pmod(d, F.lit(20)), F.lit(4)),
        )
        == 0
    ).select("doc_id", "source", "n_chars")
    return curriculum_interleave(kept, "n_chars")


# ---------------------------------------------------------------------------
# HTTP response-head parsing (operators.temporal.parse_http_response_
# head): RFC 9112 status line + header fields → the typed columns
# http_revalidation_plan and charset_sniff consume.  The fixture
# builds REAL CRLF wire heads (obs-fold continuation, duplicate
# Cache-Control lines that must comma-join, duplicate Date lines where
# the first wins, a header-shaped string inside another header's
# VALUE that line-anchoring must ignore, junk Content-Length, a
# malformed status line) and the oracle recomputes the expected parse
# closed-form from doc_id — an independent derivation, not the same
# regexes replayed.  Nullable INT outputs sentinel-encode to -1 (the
# robots_rules_parse hashing precedent).
# ---------------------------------------------------------------------------

_HTTP_HEADERS_PARSE_SQL = """
    SELECT 'u' || doc_id AS url,
           CAST(CASE doc_id % 6
               WHEN 0 THEN 200 WHEN 1 THEN 304 WHEN 2 THEN -1
               WHEN 3 THEN 404 WHEN 4 THEN 200 WHEN 5 THEN 200
           END AS INTEGER) AS status_code,
           CASE doc_id % 6
               WHEN 0 THEN 'OK' WHEN 1 THEN 'Not Modified'
               WHEN 3 THEN 'Not Found' WHEN 5 THEN 'OK'
           END AS reason,
           CASE doc_id % 6
               WHEN 0 THEN 'text/html' WHEN 3 THEN 'application/json'
               WHEN 4 THEN 'text/plain'
           END AS content_type,
           CASE doc_id % 6
               WHEN 0 THEN 'utf-8' WHEN 4 THEN 'iso-8859-1'
           END AS charset,
           CAST(CASE doc_id % 6
               WHEN 0 THEN doc_id % 5000 ELSE -1
           END AS BIGINT) AS content_length,
           CASE doc_id % 6
               WHEN 0 THEN '"e' || doc_id || '"'
               WHEN 1 THEN 'W/"x' || doc_id || '"'
           END AS etag,
           CASE doc_id % 6
               WHEN 1 THEN 'Tue, 14 Nov 2023 22:13:20 GMT'
           END AS last_modified,
           CASE doc_id % 6
               WHEN 0 THEN 'public, max-age=3600'
               WHEN 5 THEN 'no-store'
           END AS cache_control,
           CASE doc_id % 6
               WHEN 4 THEN 'Thu, 16 Nov 2023 10:00:00 GMT'
           END AS expires,
           CASE doc_id % 6
               WHEN 0 THEN 'Tue, 14 Nov 2023 22:13:20 GMT'
               WHEN 2 THEN 'Wed, 15 Nov 2023 00:00:00 GMT'
               WHEN 5 THEN 'Mon, 01 Jan 2024 00:00:00 GMT'
           END AS date
    FROM documents
    """


def _http_wire_heads(star: Star) -> DataFrame:
    """(url, raw_head) wire-head fixture shared by http_headers_parse
    and http_revalidation_funnel — six closed-form CRLF variants, see
    the http_headers_parse comment block for the per-variant traps."""
    d = F.col("doc_id")
    s = d.cast("string")
    v = F.pmod(d, F.lit(6))
    head = (
        F.when(v == 0, F.concat(
            F.lit("HTTP/1.1 200 OK\r\n"
                  "Date: Tue, 14 Nov 2023 22:13:20 GMT\r\n"
                  "Content-Type: text/html; charset=UTF-8\r\n"
                  "Cache-Control: public\r\n"
                  "Cache-Control: max-age=3600\r\n"
                  'ETag: "e'), s,
            F.lit('"\r\nContent-Length: '),
            F.pmod(d, F.lit(5000)).cast("string"), F.lit("\r\n"),
        ))
        .when(v == 1, F.concat(
            F.lit('HTTP/1.1 304 Not Modified\r\netag: W/"x'), s,
            F.lit('"\r\nlast-modified: Tue, 14\r\n'
                  " Nov 2023 22:13:20 GMT\r\n"),
        ))
        .when(v == 2, F.lit(
            "ICY 200 OK\r\n"
            "Date: Wed, 15 Nov 2023 00:00:00 GMT\r\n"
            "X-Note: see Date: trap value\r\n"))
        .when(v == 3, F.lit(
            "HTTP/1.0 404 Not Found\r\n"
            "Content-Type: APPLICATION/JSON\r\n"
            "Content-Length: junk\r\n"))
        .when(v == 4, F.lit(
            "HTTP/1.1 200\r\n"
            'Content-Type: text/plain;charset="iso-8859-1"\r\n'
            "Expires: Thu, 16 Nov 2023 10:00:00 GMT\r\n"))
        .otherwise(F.lit(
            "HTTP/1.1 200 OK\r\n"
            "Date: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
            "Date: Tue, 02 Jan 2024 00:00:00 GMT\r\n"
            "Cache-Control: no-store\r\n"))
    )
    return star.documents.select(
        F.concat(F.lit("u"), s).alias("url"), head.alias("raw_head"),
    )


@register("http_headers_parse", _HTTP_HEADERS_PARSE_SQL)
def http_headers_parse_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import (
        parse_http_response_head,
    )

    out = parse_http_response_head(_http_wire_heads(star))
    return out.select(
        "url",
        F.coalesce(F.col("status_code"), F.lit(-1)).cast("int")
        .alias("status_code"),
        "reason", "content_type", "charset",
        F.coalesce(F.col("content_length"), F.lit(-1)).cast("long")
        .alias("content_length"),
        "etag", "last_modified", "cache_control", "expires", "date",
    )


# ---------------------------------------------------------------------------
# HTTP revalidation FUNNEL (parse_http_response_head →
# http_revalidation_plan, chained end-to-end): raw CRLF wire heads in,
# per-mode fetch-plan counts out — the producer/consumer handshake the
# two operators exist for, value-hashed THROUGH both stages against a
# closed-form twin.  A field the parser misreads (say, the comma-joined
# Cache-Control losing its max-age directive, or the duplicate-Date
# first-wins rule flipping) changes the downstream freshness verdicts
# and breaks the hash — composition evidence neither single-stage
# query provides.  Head variant v=0 carries max-age=3600, so its docs
# split fresh / if-none-match on their per-doc fetch offset; v=1 (304
# + validators, no lifetime source) revalidates by ETag; v=2-5
# (validator-less, Expires-without-Date, no-store) are unconditional.
# The fetch offset is bounded mod 49 000 (< the 50 000 now-gap) so
# every fetch precedes `now` and freshness comes from LIFETIME, never
# from a future-clock fetched_at — without the bound, clock-skew rows
# make any variant read fresh and the closed-form mode model is wrong.
# ---------------------------------------------------------------------------

@register(
    "http_revalidation_funnel",
    """
    WITH m AS (
        SELECT doc_id, doc_id % 6 AS v,
               (doc_id * 197) % 49000 AS off
        FROM documents
    ),
    planned AS (
        SELECT CASE
                   WHEN v = 0 AND off + 3600 > 50000 THEN 'fresh'
                   WHEN v IN (0, 1) THEN 'if-none-match'
                   ELSE 'unconditional'
               END AS mode,
               CASE WHEN v = 0 THEN 3600 ELSE 0 END AS lifetime
        FROM m
    )
    SELECT mode, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(lifetime) AS BIGINT) AS sum_lifetime_sec
    FROM planned GROUP BY mode
    """,
)
def http_revalidation_funnel_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.temporal import (
        http_revalidation_plan,
        parse_http_response_head,
    )

    d = F.col("doc_id")
    fetched = (F.lit(1_700_000_000) + F.pmod(d * 197, F.lit(49_000))).cast(
        "long"
    )
    fetch_log = star.documents.select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        fetched.alias("fetched_at"),
    )
    parsed = parse_http_response_head(_http_wire_heads(star)).join(
        fetch_log, "url"
    )
    plan = http_revalidation_plan(parsed, now=_REVAL_NOW)
    return plan.groupBy("mode").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum("freshness_lifetime_sec").cast("long")
        .alias("sum_lifetime_sec"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit (operators.similarity.matryoshka_
# agreement): top-1 agreement between prefix-k and full-dim cosine
# retrieval on a bounded sample — the audit behind the "serve at dim
# k" decision for nested-prefix embeddings.  Oracle re-derives every
# per-k top-1 with window ranking over the same rounded cosines
# (list slicing + DOUBLE[] casts per the float32 gotcha); Spark's
# max_by-struct argmax must agree with the oracle's
# ROW_NUMBER(ORDER BY cos DESC, nid ASC) on every query or the hash
# breaks.
# ---------------------------------------------------------------------------

_MATRYOSHKA_SAMPLE = 200

@register(
    "matryoshka_dim_agreement",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE vec_id < {_MATRYOSHKA_SAMPLE}
          -- zero-norm smallest-prefix guard, mirroring the operator
          -- (prefix norms are monotone in k, so one guard covers all)
          AND list_dot_product(CAST(embedding AS DOUBLE[])[1:8],
                               CAST(embedding AS DOUBLE[])[1:8]) > 0
    ),
    pairs AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid, a.v AS av, b.v AS bv
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    scored AS (
        SELECT qid, nid,
               round(list_dot_product(av, bv)
                     / (sqrt(list_dot_product(av, av))
                        * sqrt(list_dot_product(bv, bv))), 6) AS cf,
               round(list_dot_product(av[1:8], bv[1:8])
                     / (sqrt(list_dot_product(av[1:8], av[1:8]))
                        * sqrt(list_dot_product(bv[1:8], bv[1:8]))), 6) AS c8,
               round(list_dot_product(av[1:16], bv[1:16])
                     / (sqrt(list_dot_product(av[1:16], av[1:16]))
                        * sqrt(list_dot_product(bv[1:16], bv[1:16]))), 6)
                   AS c16,
               round(list_dot_product(av[1:32], bv[1:32])
                     / (sqrt(list_dot_product(av[1:32], av[1:32]))
                        * sqrt(list_dot_product(bv[1:32], bv[1:32]))), 6)
                   AS c32
        FROM pairs
    ),
    tf AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cf DESC, nid ASC) AS rn FROM scored
    ) WHERE rn = 1),
    t8 AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY c8 DESC, nid ASC) AS rn FROM scored
    ) WHERE rn = 1),
    t16 AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY c16 DESC, nid ASC) AS rn FROM scored
    ) WHERE rn = 1),
    t32 AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY c32 DESC, nid ASC) AS rn FROM scored
    ) WHERE rn = 1),
    joined AS (
        SELECT tf.qid, tf.nid AS nf, t8.nid AS n8, t16.nid AS n16,
               t32.nid AS n32
        FROM tf JOIN t8 USING (qid) JOIN t16 USING (qid)
               JOIN t32 USING (qid)
    )
    SELECT CAST(8 AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n8 = nf THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
    FROM joined
    UNION ALL
    SELECT CAST(16 AS INTEGER), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n16 = nf THEN 1 ELSE 0 END) AS BIGINT)
    FROM joined
    UNION ALL
    SELECT CAST(32 AS INTEGER), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n32 = nf THEN 1 ELSE 0 END) AS BIGINT)
    FROM joined
    """,
)
def matryoshka_dim_agreement_q(star: Star) -> DataFrame:
    return S.matryoshka_agreement(
        star.embeddings.filter(F.col("vec_id") < _MATRYOSHKA_SAMPLE),
        ks=(8, 16, 32),
    )


# ---------------------------------------------------------------------------
# Crawl-seeding FUNNEL (robots_sitemap_urls → sitemap_index_extract →
# sitemap_url_extract, chained end-to-end): robots bodies in, frontier
# candidates out, value-hashed THROUGH all three parsers and the two
# fetch-joins between them.  The joins are the teeth: each stage's
# extracted URL keys the next stage's fetched body, so an
# entity-decode drift (&amp; kept verbatim in an index loc) makes the
# child fetch-join MISS, rows vanish, and the hash breaks — the exact
# real-world failure the sitemap XML decoding exists to prevent, now
# load-bearing inside one oracled query.  Per host: robots names the
# index (twice, case-varied — dedup to one), the index names two
# entity-escaped children, each child carries one escaped-loc URL and
# one CDATA-verbatim URL.
# ---------------------------------------------------------------------------

@register(
    "crawl_seed_funnel",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id AS hid FROM documents WHERE doc_id < 40
    )
    SELECT 'h' || hid AS host,
           'https://h' || hid || '/' || c || path AS url,
           lastmod,
           CAST(priority AS DOUBLE) AS priority
    FROM hosts, (VALUES
        ('a', '/p1?x=1&y=2', '2024-04-01', 0.8),
        ('b', '/p1?x=1&y=2', '2024-04-02', 0.8),
        ('a', '/cd?q=1&z=2&amp;w', NULL, NULL),
        ('b', '/cd?q=1&z=2&amp;w', NULL, NULL)
    ) v(c, path, lastmod, priority)
    """,
)
def crawl_seed_funnel_q(star: Star) -> DataFrame:
    from sap_data_pipeline_spark.operators.corpus import (
        robots_sitemap_urls,
        sitemap_index_extract,
        sitemap_url_extract,
    )

    d = F.col("doc_id")
    h = d.cast("string")
    hosts = star.documents.filter(d < 40).select(
        F.concat(F.lit("h"), h).alias("host"), h.alias("_h")
    )
    hh = F.col("_h")

    robots = hosts.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\n"
                  "Sitemap: https://h"), hh, F.lit("/idx.xml\n"
                  "SITEMAP: https://h"), hh, F.lit("/idx.xml\n"),
        ).alias("robots_txt"),
    )
    # stage 1: robots -> index refs (dup directive dedups to one)
    discovered = robots_sitemap_urls(robots)

    # "fetch" the index bodies, keyed by the URL robots named
    index_docs = hosts.select(
        "host",
        F.concat(F.lit("https://h"), hh, F.lit("/idx.xml"))
        .alias("sitemap_url"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>https://h"), hh,
            F.lit("/a.xml?p=1&amp;q=2</loc>"
                  "<lastmod>2024-03-05</lastmod></sitemap>"
                  "<sitemap><loc> https://h"), hh,
            F.lit("/b.xml?p=1&amp;q=2 </loc></sitemap></sitemapindex>"),
        ).alias("sitemap_xml"),
    )
    fetched_idx = discovered.join(index_docs, ["host", "sitemap_url"])

    # stage 2: index -> child refs (entity-decoded locs)
    children = sitemap_index_extract(fetched_idx).select(
        "host", F.col("sitemap_url")
    )

    # "fetch" the child bodies, keyed by the DECODED child URL
    def child_xml(c, lastmod):
        return F.concat(
            F.lit(f"<urlset><url><loc>https://h"), hh,
            F.lit(f"/{c}/p1?x=1&amp;y=2</loc>"
                  f"<lastmod>{lastmod}T09:00:00Z</lastmod>"
                  "<priority>0.8</priority></url>"
                  "<url><loc><![CDATA[https://h"), hh,
            F.lit(f"/{c}/cd?q=1&z=2&amp;w]]></loc></url></urlset>"),
        )

    child_docs = hosts.select(
        "host",
        F.explode(F.array(
            F.struct(
                F.concat(F.lit("https://h"), hh, F.lit("/a.xml?p=1&q=2"))
                .alias("sitemap_url"),
                child_xml("a", "2024-04-01").alias("sitemap_xml"),
            ),
            F.struct(
                F.concat(F.lit("https://h"), hh, F.lit("/b.xml?p=1&q=2"))
                .alias("sitemap_url"),
                child_xml("b", "2024-04-02").alias("sitemap_xml"),
            ),
        )).alias("_c"),
    ).select("host", "_c.sitemap_url", "_c.sitemap_xml")
    fetched_children = children.join(
        child_docs, ["host", "sitemap_url"]
    )

    # stage 3: children -> frontier candidates
    return sitemap_url_extract(fetched_children).select(
        "host", "url", "lastmod", "priority"
    )
