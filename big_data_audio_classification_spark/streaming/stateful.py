"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.B streaming surface: the escape hatch when built-in windowed
aggs can't express the state machine).

Exemplar: per-user running counters with inactivity timeout — the state
per key is O(1) (count + sum), the grouping shuffle is keyed by user, and
timed-out state is emitted and dropped, so state size stays bounded on an
unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, closed boolean"
STATE_SCHEMA = "n long, s double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s], "closed": [True]}
        )
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(60_000)  # 1 min of inactivity closes the key
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "closed": [False]}
    )


def running_user_counters(events_stream: DataFrame) -> DataFrame:
    """Stream → per-user stateful counters with processing-time timeout."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
