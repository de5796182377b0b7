"""Vector expression library for the embeddings table.

Dot products / norms / cosine as native ``F.aggregate``/``F.zip_with``
higher-order functions — runs in the JVM, no Python per row.  The DuckDB
oracle uses ``list_dot_product``/``list_cosine_similarity`` on the same
arrays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def double_array_lit(values) -> Column:
    """Arbitrarily nested float-list literal as ONE ``F.expr`` call.

    ``F.lit`` on a nested Python list builds one py4j round-trip per
    element — measured 1.0-1.8 s of pure driver time for a 63×32
    centroid matrix, which dominated the CONSTRUCTION cost of every
    fixed-model/seeded-quantizer query (r13 optimization).  Rendering
    the whole matrix as a single SQL ``array(array(1.0D, …))`` string is
    one round-trip parsed JVM-side (~5 ms) and bit-exact: ``repr`` emits
    the shortest digits that round-trip to the same double, and the SQL
    ``D``-suffixed literal parses those digits straight to DOUBLE
    (verified including exponent forms and -0.0).
    """
    return F.expr(double_array_sql(values))


def double_array_sql(values) -> str:
    """The SQL text behind :func:`double_array_lit` — exposed so callers
    that already build a larger ``F.expr`` string can embed the literal
    in the same single parse round-trip."""
    if isinstance(values, (list, tuple)):
        return "array(" + ",".join(double_array_sql(x) for x in values) + ")"
    return repr(float(values)) + "D"


def long_array_lit(values) -> Column:
    """Flat int64-list literal as ONE ``F.expr`` call — the BIGINT twin
    of :func:`double_array_lit` (same py4j round-trip-per-element
    finding; a 4096-word Bloom bitmap cost ~0.5 s through ``F.lit``).
    ``L``-suffixed literals parse straight to BIGINT.  Long.MIN_VALUE
    needs the subtraction form: ``-9223372036854775808L`` lexes as
    unary minus on an out-of-range positive literal."""
    def render(v) -> str:
        v = int(v)
        if v == -(1 << 63):
            return "(-9223372036854775807L - 1L)"
        return f"{v}L"

    return F.expr("array(" + ",".join(render(v) for v in values) + ")")


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    # Plain column names take the parsed-SQL path: each Python-lambda
    # higher-order build costs ~30 ms of py4j round-trips vs ~0.5 ms for
    # one F.expr parse (guide §4 — measured r14; the ANN/knn queries
    # call these dozens of times per construction).  Same Catalyst
    # expression either way — values are bit-identical (verified).
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with(`{a}`, `{b}`,"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " 0.0D, (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: ColumnOrName) -> Column:
    if isinstance(a, str):
        return F.expr(
            f"sqrt(aggregate(`{a}`, 0.0D,"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: ColumnOrName) -> Column:
    n = norm(a)
    return F.transform(_c(a), lambda x: x.cast("double") / n)


def abs_max(a: ColumnOrName) -> Column:
    """max(|x|) over the vector — the symmetric-quantization range."""
    return F.array_max(F.transform(_c(a), lambda x: F.abs(x.cast("double"))))


def quantize_int8(a: ColumnOrName) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i * 127/max|x| + 0.5).

    ``floor(x + 0.5)`` instead of ``round``: round-half semantics are an
    engine policy (HALF_UP vs banker's), while ``floor`` is IEEE-defined
    — the identical expression in DuckDB produces bit-identical codes,
    so the quantizer carries a full value-hash oracle.  The 4× size cut
    (plus 4× memory-bandwidth cut in ANN scans) is the standard first
    step before IVF/PQ at corpus scale; recall impact is gated in tests
    against the float pipeline.  All-zero vectors quantize to zeros.
    """
    m = abs_max(a)
    return F.transform(
        _c(a),
        lambda x: F.when(m > 0, F.floor(x.cast("double") * (F.lit(127.0) / m) + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def dequant_scale(a: ColumnOrName) -> Column:
    """Per-vector dequantization scale (max|x| / 127); 0 for zero vectors."""
    m = abs_max(a)
    return F.when(m > 0, m / F.lit(127.0)).otherwise(F.lit(0.0))


def sign_bits_word(a: ColumnOrName, start: int, width: int = 32) -> Column:
    """Pack ``width`` sign bits of an embedding slice into ONE BIGINT,
    MSB-first: bit for element ``start + i`` (1-based) lands at position
    ``width - 1 - i``.  Words stay in the positive BIGINT range (width
    ≤ 32), so they survive any engine's signed-integer semantics — the
    same reason the 64-bit SimHash uses two hash words.

    Binary (1-bit) embedding quantization: 32× smaller than float32,
    and Hamming distance over the packed words (``bit_count(xor)``)
    approximates angular distance — the memory-bound regime's ANN
    representation.
    """
    if isinstance(a, str):
        return F.expr(
            f"aggregate(sequence({start}, {start + width - 1}),"
            " CAST(0 AS BIGINT),"
            " (acc, i) -> acc * 2 + CAST(CASE WHEN"
            f" element_at(`{a}`, CAST(i AS INT)) > 0"
            " THEN 1 ELSE 0 END AS BIGINT))"
        )
    idx = F.sequence(F.lit(start), F.lit(start + width - 1))
    return F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.element_at(_c(a), i.cast("int")) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )
