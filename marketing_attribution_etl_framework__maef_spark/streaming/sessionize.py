"""Custom stateful streaming operator: per-user sessionization with a
gap timeout AND a max-events cap, via ``applyInPandasWithState``.

Spark's native ``session_window`` covers pure gap-based sessions; the
event-count cap (close a session after N events regardless of gaps —
the same cap discipline as the reference's API chunker,
``src/api/ihc_api.py:14-15``) is not expressible natively, which is
exactly the case SURVEY §2.9 reserves for a custom stateful operator.

Semantics:
- events are grouped by user; state holds the open session
  (start, end, n_events, channel sequence);
- an arriving event that is more than ``gap`` after the open session's
  end, or that would exceed ``max_events``, closes the session (emitted
  immediately) and opens a new one;
- an open session with no successor is closed by event-time timeout
  once the watermark passes ``end + gap``.

State is per-user and O(1) — no event buffering, only the running
aggregate — so state size scales with the user population, not the
event volume.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, channels string"
)
STATE_SCHEMA = "start long, end long, n int, channels string"

_US = 1_000_000  # state timestamps are kept as epoch micros (long)


def _emit(user_id: int, start_us: int, end_us: int, n: int, channels: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "channels": [channels],
        }
    )


def make_sessionizer(gap_minutes: int, max_events: int):
    """Build the applyInPandasWithState function (module-level factory
    so executors can unpickle it with the parameters baked in)."""
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, channels = state.get
            state.remove()
            yield _emit(user_id, start_us, end_us, n, channels)
            return

        frames = list(pdfs)
        batch = pd.concat(frames)
        # deterministic within-timestamp order when the caller supplies
        # a tie-break column (the batch twin orders by (ts, event_id);
        # without it equal timestamps sort arbitrarily)
        batch = batch.sort_values(
            ["ts", "_tb"] if "_tb" in batch.columns else "ts"
        )
        cur = state.get if state.exists else None
        out: list[pd.DataFrame] = []
        for ts, channel in zip(batch["ts"], batch["channel_name"]):
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if cur is not None and (ts_us - cur[1] > gap_us or cur[2] >= max_events):
                out.append(_emit(user_id, *cur))
                cur = None
            if cur is None:
                cur = (ts_us, ts_us, 1, str(channel))
            else:
                cur = (cur[0], ts_us, cur[2] + 1, cur[3] + "," + str(channel))
        if cur is not None:
            state.update(cur)
            # close by timeout once the watermark passes end + gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # millis
        yield from out

    return fn


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 20,
    watermark: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """events-shaped stream -> completed session rows (append mode).

    ``watermark``: pass a delay string only if the input stream is not
    already watermarked (``stream_events`` watermarks at intake;
    redefining it downstream is disallowed).

    ``tiebreak``: optional column name ordering events that share a
    timestamp (the batch twin's (ts, event_id) order)."""
    cols = ["user_id", "ts", F.col("event_type").alias("channel_name")]
    if tiebreak is not None:
        cols.append(F.col(tiebreak).alias("_tb"))
    sess = events.filter(F.col("event_type") != "purchase").select(*cols)
    if watermark is not None:
        sess = sess.withWatermark("ts", watermark)
    return sess.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_minutes, max_events),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
