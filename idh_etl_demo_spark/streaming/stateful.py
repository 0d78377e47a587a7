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
        StructField("last_us", LongType()),  # last event ts, epoch micros
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        if not pd.isna(ts_max):
            # pandas ns → µs: exact while sources are µs-precision
            # (Spark SQL TimestampType / parquet TIMESTAMP_MICROS). A
            # future ns-precision source would lose sub-µs detail here
            # relative to a batch oracle's max(ts) — keep the state in
            # nanos if that ever lands.
            us = int(ts_max.value // 1000)
            last_us = us if last_us is None else max(last_us, us)
    # last_ts is STATE, not a per-batch scalar: the final snapshot must
    # carry the stream-global last event time, so it rides the state
    # tuple (as epoch micros, the same trick as the funnel operator)
    state.update((n, s, last_us))
    last_ts = pd.Timestamp(last_us * 1000) if last_us is not None else None
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
            n, s, last_us = self._totals.get()
        else:
            n, s, last_us = 0, 0.0, None
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            ts_max = pdf["ts"].max()
            if not pd.isna(ts_max):
                us = int(ts_max.value // 1000)
                last_us = us if last_us is None else max(last_us, us)
        self._totals.update((n, s, last_us))
        last_ts = pd.Timestamp(last_us * 1000) if last_us is not None else None
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


# ---------------------------------------------------------------------------
# Streaming funnel: cross-batch stage machine (view → click → purchase)
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", LongType(), False),
        StructField("stage_ts", TimestampType(), True),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("t_us", LongType()),  # stage timestamp, epoch micros
    ]
)

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


def _update_funnel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    stage, t_us = state.get if state.exists else (0, None)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        if stage >= len(_FUNNEL_STEPS):
            break
        ts_us = int(ts.value // 1000)  # pandas ns → µs
        if stage == 0:
            if etype == _FUNNEL_STEPS[0]:
                stage, t_us = 1, ts_us
        elif etype == _FUNNEL_STEPS[stage] and t_us is not None and (
            t_us <= ts_us < t_us + _FUNNEL_WINDOW_US
        ):
            stage, t_us = stage + 1, ts_us
    state.update((stage, t_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage": [stage],
            "stage_ts": [pd.Timestamp(t_us, unit="us") if t_us is not None else None],
        }
    )


def funnel_stages(events_stream: DataFrame) -> DataFrame:
    """Continuous ordered-funnel tracking — the STREAMING twin of the
    batch ``event_funnel`` catalog entry: per-user stage machine
    (view → click → purchase, 24 h conversion window per step) whose
    state survives micro-batches, so a click in batch N converts a view
    from batch N-1. Emits the user's stage snapshot on every batch they
    appear in.

    Greedy earliest-next-step semantics match the batch entry for
    in-order arrivals; late events beyond a batch boundary are evaluated
    in arrival order (the standard streaming-funnel approximation — pair
    with a watermarked dedup upstream for bounded disorder)."""
    return (
        events_stream.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
