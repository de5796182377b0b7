"""Scalar cleaning expression library (SURVEY §2.8, F1-F20).

Every function here returns a native Spark ``Column`` expression — zero
Python UDFs.  These are the SAP value-encoding semantics the reference
implements with pandas string ops; expressed as Catalyst expressions they
run inside whole-stage codegen and vectorize on the JVM side.

Reference provenance (file:line refers to /root/reference):
  * fast_numeric / clean_number    pipelines/etl_utils.py:18-34
  * trim / whitespace collapse     pipelines/etl_zmb51.py:55, etl_zrssale.py:52
  * lstrip zeros                   pipelines/etl_zmmidr_oun.py:29
  * '-' as NULL                    pipelines/etl_zmachk.py:79-80
  * date parse/format              pipelines/etl_zmb51.py:56, etl_zmachk.py:78
  * week-range generator           sap_scripts/sap_utils.py:201-232
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ColumnOrName = Column | str


def _c(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_numeric_str(c: ColumnOrName) -> Column:
    """Normalize a SAP numeric string without casting.

    Strips thousands commas and rewrites the SAP trailing-minus form
    ``"1234.5-"`` to ``"-1234.5"`` (reference ``pipelines/etl_utils.py:29-34``).

    String ops, not regex: ``translate`` + slice are branch-free codegen;
    the reference's regex (``^([\\d.]+)-$``) only gates which strings get
    the minus moved — strings it rejects fail the downstream numeric cast
    either way, so sliced-rewrite-then-try_cast yields identical nulls.
    """
    no_commas = F.translate(_c(c), ",", "")
    flipped = F.concat(
        F.lit("-"), no_commas.substr(F.lit(1), F.length(no_commas) - 1)
    )
    return F.when(no_commas.endswith("-"), flipped).otherwise(no_commas)


def fast_numeric(c: ColumnOrName, dtype: str = "decimal(18,6)") -> Column:
    """SAP numeric parse: commas stripped, trailing minus, cast-or-null.

    Vectorized equivalent of ``fast_numeric`` (``pipelines/etl_utils.py:29-34``);
    un-parseable values become NULL (NaN→NULL policy, the documented choice
    from the reference's two divergent cleaners, SURVEY §1.2).
    """
    return clean_numeric_str(c).try_cast(dtype)


def clean_number(c: ColumnOrName, dtype: str = "double") -> Column:
    """Scalar-cleaner alias (``pipelines/etl_utils.py:18-27``), NULL stays NULL."""
    return fast_numeric(c, dtype)


def dash_to_null(c: ColumnOrName) -> Column:
    """``'-'`` is SAP's NULL marker (``pipelines/etl_zmachk.py:79-80``)."""
    return F.nullif(_c(c), F.lit("-"))


def strip_leading_zeros(c: ColumnOrName) -> Column:
    """Article numbers arrive zero-padded (``pipelines/etl_zmmidr_oun.py:29``).

    All-zero input normalizes to ``'0'`` (pandas ``lstrip`` yields ``''``;
    we keep one digit so the key stays non-empty — documented divergence).
    """
    stripped = F.regexp_replace(_c(c), "^0+", "")
    return F.when(F.length(stripped) == 0, F.lit("0")).otherwise(stripped)


def collapse_whitespace(c: ColumnOrName) -> Column:
    """Collapse runs of whitespace to one space and trim
    (``pipelines/etl_zrssale.py:52``)."""
    return F.trim(F.regexp_replace(_c(c), r"\s+", " "))


def strip_dot_zero_suffix(c: ColumnOrName) -> Column:
    """Remove a literal ``'.0'`` float-artifact suffix.

    The reference replaces ``'.0'`` anywhere in the string
    (``pipelines/etl_zin_mch.py:26``) — a bug for ids like ``'1.05'``; we
    anchor to end-of-string (SURVEY §2.8 F8).
    """
    return F.regexp_replace(_c(c), r"\.0$", "")


def parse_sap_date(c: ColumnOrName, fmt: str = "MM/dd/yyyy") -> Column:
    """Parse the export date format (``pipelines/etl_zmb51.py:56``)."""
    return F.try_to_timestamp(_c(c), F.lit(fmt)).cast("date")


def format_iso_date(c: ColumnOrName) -> Column:
    """yyyy-MM-dd formatting (``pipelines/etl_zmachk.py:78``)."""
    return F.date_format(_c(c), "yyyy-MM-dd")


def negate(c: ColumnOrName) -> Column:
    """Movement types 251/252 are issues: quantities sign-invert
    (``pipelines/etl_zmb51.py:73-74``)."""
    return -_c(c)


def surrogate_key(*cols: ColumnOrName) -> Column:
    """Concatenated surrogate key, e.g. ``Article NoDC`` = DC‖Article
    (``pipelines/etl_zmmidr_oun.py:171``)."""
    return F.concat(*[_c(c) for c in cols])


def week_range(start: ColumnOrName, stop: ColumnOrName) -> Column:
    """Weekly ``[start, start+7d, ...]`` sequence (array column) — the
    calendar-maintenance generator (``sap_scripts/sap_utils.py:201-232``).
    Explode the result for one row per week."""
    return F.sequence(_c(start), _c(stop), F.expr("interval 7 days"))


def pack_ascii8(c: ColumnOrName) -> Column:
    """Order-preserving BIGINT encoding of a short ASCII string.

    Big-endian packs the first 8 bytes (NUL right-padded) so that signed
    64-bit numeric order == lexicographic string order.  Contract: ASCII
    (≤ 0x7F) input — the first byte then never sets the sign bit; strings
    longer than 8 chars compare by their first 8 only.

    Why: Spark's ``HashAggregateExec`` requires mutable fixed-width
    aggregation buffers, so ``min(<string>)`` silently downgrades the
    whole aggregate to ``SortAggregate`` — an O(n log n) sort of the full
    scan *before* the partial agg.  ``min(pack_ascii8(c))`` keeps the
    streaming hash aggregate; ``unpack_ascii8`` restores the string after
    the agg.  Unit-of-measure codes (BUn/SUn/OUn, NVARCHAR(10) of ASCII,
    ≤ 3 chars in practice) satisfy the contract exactly.
    """
    col = _c(c)
    return F.conv(F.hex(F.rpad(col, 8, "\x00")), 16, 10).cast("long")


def unpack_ascii8(c: ColumnOrName) -> Column:
    """Inverse of :func:`pack_ascii8` (post-aggregation decode)."""
    col = _c(c)
    return F.regexp_replace(
        F.decode(F.unhex(F.lpad(F.hex(col), 16, "0")), "UTF-8"), "\x00+$", ""
    )


def cast_to_schema(df: DataFrame, schema: T.StructType, *, strict: bool = False,
                   keep: Iterable[str] = ()) -> DataFrame:
    """Coerce a string-typed DataFrame to a declared schema.

    Spark-side equivalent of ``clean_df_by_sql_schema``
    (``pipelines/etl_utils.py:86-142``): for each target field, numeric
    types go through the SAP numeric cleaner, dates through the SAP date
    parser (ISO accepted too), strings are trimmed.  Columns missing from
    ``df`` become NULL (or raise if ``strict``); extra columns drop —
    except ``keep`` columns, passed through untouched (e.g. the
    ``_source_file``/``_source_line`` ordering columns a downstream
    keep-last dedup needs).
    """
    out: list[Column] = [F.col(k) for k in keep]
    for f in schema.fields:
        if f.name not in df.columns:
            if strict:
                raise ValueError(f"missing column {f.name!r}")
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, (T.DecimalType, T.DoubleType, T.FloatType,
                                   T.IntegerType, T.LongType, T.ShortType)):
            expr = clean_numeric_str(c).try_cast(f.dataType.simpleString())
        elif isinstance(f.dataType, T.DateType):
            expr = F.coalesce(
                F.try_to_timestamp(c, F.lit("MM/dd/yyyy")),
                F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
            ).cast("date")
        elif isinstance(f.dataType, T.TimestampType):
            expr = c.try_cast("timestamp")
        elif isinstance(f.dataType, T.StringType):
            expr = F.trim(c)
        else:
            expr = c.cast(f.dataType)
        out.append(expr.alias(f.name))
    return df.select(*out)


def fill_string_nulls(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """``fillna("")`` for string columns (``pipelines/etl_utils.py:128``)."""
    targets = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and (cols is None or f.name in set(cols))
    ]
    return df.na.fill("", subset=targets)


def rename_canonical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename to canonical names after header normalization
    (``pipelines/etl_zmb51.py:63-68``); headers are stripped first (F4/P4)."""
    normalized = {c: c.strip() for c in df.columns}
    df = df.withColumnsRenamed(normalized)
    return df.withColumnsRenamed({k.strip(): v for k, v in mapping.items()})
