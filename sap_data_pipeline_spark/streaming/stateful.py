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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
