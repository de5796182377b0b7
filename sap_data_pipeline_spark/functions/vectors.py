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


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: ColumnOrName) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: ColumnOrName) -> Column:
    n = norm(a)
    return F.transform(_c(a), lambda x: x.cast("double") / n)
