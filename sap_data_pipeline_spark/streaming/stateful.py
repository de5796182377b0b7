"""Custom stateful streaming operators (``applyInPandasWithState``).

Native operators cover the engine's declared semantics (session windows =
``F.session_window``, tumbling windows = ``F.window``); this module is the
escape hatch for state machines Spark lacks.  ``running_totals`` is the
canonical shape: per-key accumulator state, Arrow-batched updates, state
evicted by timeout so a 100 TB keyspace cannot pin executor memory.

Streaming-only by Spark contract (batch DataFrames raise) — batch parity
is a plain groupBy, which is what the test asserts against.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (n_events, total_value), emitted on every update.

    State = one (count, sum) pair per key — O(keys) not O(events).  With
    ``idle_timeout_ms`` set, keys quiet for that long are emitted once
    more (final totals) and their state dropped — the eviction knob that
    makes unbounded keyspaces safe.
    """
    out_schema = f"{key_col} long, n_events long, total_value double"
    state_schema = "n long, total double"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total_value": [total]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def cusum_drift_alarms(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    target: float,
    slack: float,
    threshold: float,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key CUSUM change-point detector (Page 1954, the classic
    sequential drift test): maintains one-sided cumulative sums

        s⁺ ← max(0, s⁺ + (x − target − slack))
        s⁻ ← max(0, s⁻ + (target − x − slack))

    and emits a row per processed batch with the running statistics and
    ``alarm`` ∈ {none, high, low} when either sum crosses
    ``threshold`` — the streaming data-quality monitor for "this
    source's metric drifted" (ingest-rate collapse, price-feed shift,
    sensor bias) where a plain windowed mean reacts slowly and a
    point threshold false-alarms on noise.

    On alarm the sums reset (standard restart semantics), so repeated
    drifts re-alarm instead of saturating.  State is two floats + a
    count per key — O(keys); ``idle_timeout_ms`` evicts quiet keys
    (emitting a final ``evicted`` row) so an unbounded keyspace cannot
    pin executor memory.  Streaming-only by Spark contract; the batch
    twin is a plain Python fold, which the test asserts against.
    """
    out_schema = (
        f"{key_col} long, n_seen long, s_hi double, s_lo double, alarm string"
    )
    state_schema = "n long, shi double, slo double"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, shi, slo = state.get
            state.remove()
            yield pd.DataFrame({
                key_col: [key[0]], "n_seen": [n], "s_hi": [shi],
                "s_lo": [slo], "alarm": ["evicted"],
            })
            return
        n, shi, slo = state.get if state.exists else (0, 0.0, 0.0)
        alarm = "none"
        for pdf in pdfs:
            for x in pdf[value_col]:
                x = float(x)
                n += 1
                shi = max(0.0, shi + (x - target - slack))
                slo = max(0.0, slo + (target - x - slack))
                if shi > threshold:
                    alarm, shi, slo = "high", 0.0, 0.0
                elif slo > threshold:
                    alarm, slo, shi = "low", 0.0, 0.0
        state.update((n, shi, slo))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            key_col: [key[0]], "n_seen": [n], "s_hi": [shi],
            "s_lo": [slo], "alarm": [alarm],
        })

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def heavy_hitters(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 8,
    emit_top: int = 5,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming heavy hitters via Misra-Gries summaries
    (Misra & Gries 1982) — "which items dominate this stream" with
    state that CANNOT grow: at most ``k`` (item, count) counters per
    key, independent of stream length or item cardinality, where an
    exact streaming top-N must hold every distinct item.

    The deterministic sequential guarantee (order-robust, which is what
    the tests pin): after N items, every item with true frequency
    > N/(k+1) holds a counter, and each estimate undercounts its true
    frequency by at most N/(k+1) (never overcounts).  Per micro-batch
    the operator emits the current ``emit_top`` counters
    (count desc, item asc) plus the items-processed total; rows from
    later batches supersede earlier ones (take max ``n_seen`` per key
    downstream).  Items fold in (ts, item) order within each batch so
    replays are deterministic.

    ``idle_timeout_ms`` evicts quiet keys with a final ``evicted=true``
    emission — the same unbounded-keyspace guard as the other stateful
    operators.  Streaming-only by Spark contract; the error-bound
    contract is asserted against exact batch counts in tests.
    """
    out_schema = (
        f"{key_col} string, item string, est_count long, n_seen long, "
        "rank int, evicted boolean"
    )
    state_schema = "items array<string>, counts array<long>, n long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def emit(key, counters: dict, n: int, evicted: bool) -> pd.DataFrame:
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_top]
        if not top:
            # empty counter table (decrement step emptied it, or a
            # timeout fired right after): emit nothing rather than a
            # NULL-item placeholder a "max n_seen per key" consumer
            # would surface as a phantom heavy hitter
            return pd.DataFrame({
                key_col: pd.Series([], dtype=object),
                "item": pd.Series([], dtype=object),
                "est_count": pd.Series([], dtype="int64"),
                "n_seen": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int32"),
                "evicted": pd.Series([], dtype=bool),
            })
        return pd.DataFrame({
            key_col: [key] * len(top),
            "item": [i for i, _ in top],
            "est_count": [c for _, c in top],
            "n_seen": [n] * len(top),
            "rank": list(range(1, len(top) + 1)),
            "evicted": [evicted] * len(top),
        })

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            items, counts, n = state.get
            state.remove()
            yield emit(key[0], dict(zip(items, counts)), n, True)
            return
        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", item_col], kind="mergesort")
            for x in pdf[item_col].astype(str):
                n += 1
                if x in counters:
                    counters[x] += 1
                elif len(counters) < k:
                    counters[x] = 1
                else:  # decrement-all step: every counter pays one
                    counters = {i: c - 1 for i, c in counters.items() if c > 1}
        state.update((list(counters), [counters[i] for i in counters], n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield emit(key[0], counters, n, False)

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", timeout
        )
    )


def misra_gries_batch(
    df: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_type",),
    item_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 8,
    emit_top: int = 5,
) -> DataFrame:
    """Batch/audit twin of :func:`heavy_hitters`: the identical
    Misra-Gries fold replayed over the (``ts_col``, ``item_col``)-ordered
    per-key history as ONE declarative aggregate —
    ``array_sort(collect_list(...))`` + a higher-order ``aggregate()``
    whose accumulator is the bounded (item, cnt) counter array.
    JVM-side, no UDF; per-key history must fit one executor (the same
    contract as the CUSUM batch twin — the streaming operator is the
    unbounded-scale path, this is its backfill/verification twin, and
    it is SQL-replayable as a recursive-CTE step relation for
    cross-engine checking).

    Fold order is (ts, native item) — exactly the order
    :func:`heavy_hitters` feeds items within micro-batches — so a
    single-batch streaming run and this fold produce identical counter
    tables.  ``key_cols`` may be composite (e.g. key + day for a daily
    monitor replay).  Returns (*key_cols, item, est_count, n_seen,
    rank): the final ``emit_top`` counters per key (count desc,
    item-string asc), items cast to string to match the streaming
    emission schema.
    """
    from pyspark.sql.window import Window

    key_cols = list(key_cols)
    item_t = df.schema[item_col].dataType.simpleString()
    acc0 = F.expr(f"CAST(array() AS array<struct<item:{item_t},cnt:bigint>>)")

    def step(acc, x):
        item = x["item"]
        seen = F.exists(acc, lambda a: a["item"] == item)
        inc = F.transform(
            acc,
            lambda a: F.struct(
                a["item"].alias("item"),
                (a["cnt"] + F.when(a["item"] == item, 1).otherwise(0))
                .alias("cnt"),
            ),
        )
        ins = F.concat(
            acc,
            F.array(
                F.struct(
                    item.alias("item"), F.lit(1).cast("long").alias("cnt")
                )
            ),
        )
        dec = F.filter(
            F.transform(
                acc,
                lambda a: F.struct(
                    a["item"].alias("item"), (a["cnt"] - 1).alias("cnt")
                ),
            ),
            lambda a: a["cnt"] > 0,
        )
        return F.when(seen, inc).when(F.size(acc) < k, ins).otherwise(dec)

    folded = (
        df.groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"),
                             F.col(item_col).alias("item"))
                )
            ).alias("seq")
        )
        .select(
            *key_cols,
            F.size("seq").cast("long").alias("n_seen"),
            F.aggregate("seq", acc0, step).alias("counters"),
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("est_count").desc(), F.col("item").asc()
    )
    return (
        folded.select(
            *key_cols, "n_seen", F.explode("counters").alias("c")
        )
        .select(
            *key_cols,
            F.col("c.item").cast("string").alias("item"),
            F.col("c.cnt").alias("est_count"),
            "n_seen",
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= emit_top)
        .select(*key_cols, "item", "est_count", "n_seen", "rank")
    )
