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


# ---------------------------------------------------------------------------
# Spark 4.x transformWithStateInPandas: the successor stateful API —
# typed state handles (value/list/map state, timers) instead of a single
# tuple, and per-key Arrow iteration.
# ---------------------------------------------------------------------------
try:  # Spark >= 4.0, and a working protobuf (the TWS state server
    # speaks protobuf to the Python worker — absent/broken protobuf
    # fails at stream start, so gate on it here)
    from google.protobuf import descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningMaxProcessor(StatefulProcessor):
        """Per-user running maximum with O(1) ValueState per key."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._mx = handle.getValueState("mx", "mx double")

        def handleInputRows(self, key, rows, timerValues):
            mx = self._mx.get()[0] if self._mx.exists() else float("-inf")
            n = 0
            for pdf in rows:
                n += len(pdf)
                batch_max = float(pdf["value"].max())
                if batch_max > mx:
                    mx = batch_max
            self._mx.update((mx,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "max_value": [mx], "batch_rows": [n]}
            )

        def close(self) -> None:
            pass

    def running_user_max(events_stream: DataFrame) -> DataFrame:
        """Stream → per-user running max via transformWithStateInPandas."""
        return events_stream.groupBy("user_id").transformWithStateInPandas(
            RunningMaxProcessor(),
            outputStructType="user_id long, max_value double, batch_rows long",
            outputMode="Update",
            timeMode="None",
        )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TWS = False


# Ship THIS module's code to Python workers by value: the driver harness
# may run with a cwd/PYTHONPATH where this repo is not importable, and
# the Arrow-batched kernels above reference module-level helpers that
# cloudpickle would otherwise serialize as import references.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
