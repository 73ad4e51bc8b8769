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

r12 optimization (guide §4.2: hand whole batches to vectorized native
code instead of looping rows in Python): sessions are CONTIGUOUS runs
of the per-user event sequence, so the per-event Python loop is
replaced by array arithmetic — gap breaks are one vectorized diff,
and within a maximal gap-run the cap closes a session at every
``max_events``-th event, so the session index is just
``position_in_gap_segment // max_events``.  Per-session aggregates
(start/end/count/channel join) then run over session slices, not
events.  Bit-identical to the loop by construction: both define a new
session exactly at (first event) OR (gap > gap_us from predecessor)
OR (open session already holds max_events), and sessions are closed
in chronological order (pinned by tests/test_r12_opt.py and the
batch-twin parity tests).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
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
        batch = frames[0] if len(frames) == 1 else pd.concat(frames)
        cur = state.get if state.exists else None
        n_ev = len(batch)
        if n_ev == 0:
            if cur is not None:
                state.update(cur)
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
            return

        # deterministic within-timestamp order when the caller supplies
        # a tie-break column (the batch twin orders by (ts, event_id);
        # without it equal timestamps sort arbitrarily)
        ts_us = batch["ts"].to_numpy("datetime64[ns]").astype(np.int64) // 1000
        ch = batch["channel_name"].astype(str).to_numpy(dtype=object)
        if "_tb" in batch.columns:
            order = np.lexsort((batch["_tb"].to_numpy(), ts_us))
        else:
            order = np.argsort(ts_us, kind="stable")
        ts_us = ts_us[order]
        ch = ch[order]

        # does the first event continue the carried open session?
        continuing = (
            cur is not None and ts_us[0] - cur[1] <= gap_us and cur[2] < max_events
        )

        # gap segments: maximal runs with every consecutive diff <= gap
        new_seg = np.ones(n_ev, dtype=bool)
        if n_ev > 1:
            np.greater(ts_us[1:] - ts_us[:-1], gap_us, out=new_seg[1:])
        if continuing:
            new_seg[0] = False  # leading run extends the carried session
        # position within the gap segment (offset by the carried count
        # for the leading run), cap split every max_events
        idx = np.arange(n_ev)
        seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
        pos = idx - seg_start
        if continuing:
            # the leading run (seg_start still 0) already holds cur[2] events
            pos = pos + np.where(seg_start == 0, cur[2], 0)
        sub = pos // max_events
        sess_change = new_seg.copy()
        if n_ev > 1:
            sess_change[1:] |= sub[1:] != sub[:-1]
        sess_change[0] = True  # first event always indexes session 0

        bounds = np.flatnonzero(sess_change)
        ends = np.append(bounds[1:], n_ev) - 1
        starts_us = ts_us[bounds].tolist()
        ends_us = ts_us[ends].tolist()
        counts = (np.append(bounds[1:], n_ev) - bounds).tolist()
        chans = [",".join(ch[b : e + 1]) for b, e in zip(bounds, ends)]

        closed: list[tuple] = []
        if cur is not None:
            if continuing:
                starts_us[0] = cur[0]
                counts[0] += cur[2]
                chans[0] = cur[3] + "," + chans[0]
            else:
                closed.append(cur)  # carried session closes first
        closed.extend(
            (int(starts_us[i]), int(ends_us[i]), int(counts[i]), chans[i])
            for i in range(len(bounds) - 1)
        )
        new_state = (
            int(starts_us[-1]),
            int(ends_us[-1]),
            int(counts[-1]),
            chans[-1],
        )
        state.update(new_state)
        # close by timeout once the watermark passes end + gap
        state.setTimeoutTimestamp((new_state[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(closed), user_id, dtype=np.int64),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": np.array([c[2] for c in closed], dtype=np.int32),
                    "channels": [c[3] for c in closed],
                }
            )

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
