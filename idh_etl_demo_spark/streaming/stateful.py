"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming operators (SURVEY §2.8); this is the
beyond-reference scale path for continuous aggregation: per-key mutable
state maintained by the engine, Arrow-batched Python logic, emitting an
updated snapshot per key per micro-batch.

State is intentionally tiny (count, sum, last-seen) — at 100 TB the state
store shards by key across executors; the Python function only ever sees
one key's rows per call.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "last_ts": [last_ts]}
    )


def user_running_totals(events_stream: DataFrame) -> DataFrame:
    """Continuously-updated per-user totals over an event stream.

    Emits one snapshot row per user per micro-batch the user appears in;
    state carries (count, sum) across batches.
    """
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x StatefulProcessor API)
# ---------------------------------------------------------------------------
# The successor API to applyInPandasWithState: typed state handles
# (value/list/map state), timers, and state-schema evolution. Same
# semantics as user_running_totals above — kept side by side so the two
# stateful APIs are directly comparable. Requires the RocksDB state store
# provider (virtually-unbounded keyed state, incremental checkpoints —
# the 100 TB state backend; the HDFS-backed store keeps state on-heap).

try:  # pragma: no cover - import guard exercised via tests
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # the TWS driver worker speaks protobuf to the JVM state server; the
    # API import succeeds without it, so probe the real dependency too
    import google.protobuf  # noqa: F401

    _HAS_TWS = True
except ImportError:  # older Spark, or protobuf not installed
    if "StatefulProcessor" not in dir():
        StatefulProcessor = object  # type: ignore[assignment]
    _HAS_TWS = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user (count, sum, last_ts) accumulator as a StatefulProcessor."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        (user_id,) = key
        if self._totals.exists():
            n, s = self._totals.get()
        else:
            n, s = 0, 0.0
        last_ts = None
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            ts_max = pdf["ts"].max()
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        self._totals.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [last_ts],
            }
        )

    def close(self) -> None:  # noqa: D401 - API hook
        pass


def user_running_totals_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas flavor of ``user_running_totals`` —
    identical output contract, engine-managed typed state."""
    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithState requires Spark >= 4.0 and the protobuf "
            "package (the TWS driver worker's state-server protocol)"
        )
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
