"""Gap+cap sessionization on the Spark 4 ``transformWithStateInPandas``
API (StatefulProcessor) — the successor to ``applyInPandasWithState``.

Same semantics as ``sessionize.py`` (see that module's docstring): a
session closes when an event arrives more than ``gap`` after the open
session's end or would exceed ``max_events``, and trailing sessions
close by event-time timer once the watermark passes ``end + gap``.

Why both implementations exist: ``applyInPandasWithState`` is the
stable API this engine standardizes on today; this module tracks the
new processor API (explicit named state, first-class timers, TTL,
RocksDB-backed state store) that large deployments migrate to — the
unit test pins both to the same batch reference so the two paths
cannot drift. Requires
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
AND the python ``protobuf`` package (Spark's state-server protocol for
this API is protobuf-based). protobuf is NOT installed in this build
container, so here the operator is import-gated: ``sessionize_tws``
raises a clear error up front (and the pinning test skips) instead of
crashing inside the streaming python runner. The
``applyInPandasWithState`` twin in ``sessionize.py`` is the fully
tested operator of record.

State is one fixed-width tuple per user (O(users), not O(events)),
and stale timers are deleted on every update, so timer count is also
O(users).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from marketing_attribution_etl_framework__maef_spark.streaming.sessionize import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _US,
    _emit,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the state-server protocol needs python protobuf at runtime
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:  # pragma: no cover - absent in the build container
    HAS_PROTOBUF = False


class SessionProcessor(StatefulProcessor):
    """Per-user open-session state + one close timer."""

    def __init__(self, gap_minutes: int, max_events: int):
        self._gap_us = gap_minutes * 60 * _US
        self._max_events = max_events

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState("open", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(rows)).sort_values("ts")
        cur = self._open.get() if self._open.exists() else None
        out: list[pd.DataFrame] = []
        for ts, channel in zip(batch["ts"], batch["channel_name"]):
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if cur is not None and (
                ts_us - cur[1] > self._gap_us or cur[2] >= self._max_events
            ):
                out.append(_emit(user_id, *cur))
                cur = None
            if cur is None:
                cur = (ts_us, ts_us, 1, str(channel))
            else:
                cur = (cur[0], ts_us, cur[2] + 1, cur[3] + "," + str(channel))
        if cur is not None:
            self._open.update(cur)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer((cur[1] + self._gap_us) // 1000)  # millis
        yield from out

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._open.exists():
            cur = self._open.get()
            # a stale timer (session extended since registration) must
            # not close the session early
            if (cur[1] + self._gap_us) // 1000 <= expiredTimerInfo.getExpiryTimeInMs():
                self._open.clear()
                yield _emit(user_id, *cur)

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 20,
    watermark: str | None = None,
) -> DataFrame:
    """events-shaped stream -> completed session rows (append mode),
    on the transformWithStateInPandas API. Interface-compatible with
    ``sessionize.sessionize``."""
    if not HAS_PROTOBUF:
        raise ImportError(
            "transformWithStateInPandas needs the python 'protobuf' package "
            "(not installed here); use streaming.sessionize.sessionize instead"
        )
    sess = events.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("channel_name")
    )
    if watermark is not None:
        sess = sess.withWatermark("ts", watermark)
    return sess.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_minutes, max_events),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
