"""Round-12 optimization equivalence tests.

Each test pins a rewritten compute path to its previous formulation
bit-for-bit, per the optimization-round rule that a restructured query
must prove equivalence before shipping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from marketing_attribution_etl_framework__maef_spark.streaming.sessionize import (
    make_sessionizer,
)

_US = 1_000_000


# --------------------------------------------------------------------------
# L27 stateful sessionizer: vectorized form == the original per-event loop
# --------------------------------------------------------------------------


def _reference_loop(gap_minutes: int, max_events: int, cur, batch: pd.DataFrame):
    """The pre-r12 per-event loop, verbatim semantics: returns
    (closed_sessions, new_state) for one micro-batch of one user."""
    gap_us = gap_minutes * 60 * _US
    batch = batch.sort_values(["ts", "_tb"] if "_tb" in batch.columns else "ts")
    out = []
    for ts, channel in zip(batch["ts"], batch["channel_name"]):
        ts_us = int(ts.value // 1000)
        if cur is not None and (ts_us - cur[1] > gap_us or cur[2] >= max_events):
            out.append(cur)
            cur = None
        if cur is None:
            cur = (ts_us, ts_us, 1, str(channel))
        else:
            cur = (cur[0], ts_us, cur[2] + 1, cur[3] + "," + str(channel))
    return out, cur


class _MockState:
    """Just enough of GroupState for make_sessionizer's fn."""

    def __init__(self, value=None):
        self.hasTimedOut = False
        self._value = value
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _run_vectorized(gap_minutes, max_events, cur, batch):
    fn = make_sessionizer(gap_minutes, max_events)
    state = _MockState(cur)
    frames = list(fn((7,), [batch], state))
    closed = []
    for f in frames:
        for _, r in f.iterrows():
            closed.append(
                (
                    int(r["session_start"].value // 1000),
                    int(r["session_end"].value // 1000),
                    int(r["n_events"]),
                    str(r["channels"]),
                )
            )
    return closed, state._value, state.timeout_ms


def _batch(rows):
    """rows: list of (ts_us, channel[, tb])."""
    has_tb = len(rows[0]) == 3 if rows else False
    d = {
        "ts": pd.to_datetime([r[0] for r in rows], unit="us"),
        "channel_name": [r[1] for r in rows],
    }
    if has_tb:
        d["_tb"] = [r[2] for r in rows]
    return pd.DataFrame(d)


GAP_MIN = 30
GAP_US = GAP_MIN * 60 * _US


CASES = [
    # single event
    [(0, "a")],
    # one session, several events
    [(0, "a"), (GAP_US, "b"), (2 * GAP_US, "c")],
    # gap break exactly at the boundary (gap == gap_us stays in session)
    [(0, "a"), (GAP_US, "b"), (2 * GAP_US + 1, "c")],
    # several gap breaks
    [(0, "a"), (GAP_US + 1, "b"), (3 * GAP_US + 3, "c"), (10 * GAP_US, "d")],
    # equal timestamps
    [(5, "a"), (5, "b"), (5, "c"), (GAP_US + 10, "d")],
]


@pytest.mark.parametrize("rows", CASES)
@pytest.mark.parametrize(
    "cur",
    [
        None,
        (-GAP_US, -5, 3, "x,y,z"),  # continues (gap small, below cap)
        (-10 * GAP_US, -3 * GAP_US, 2, "x,y"),  # closed by gap
        (-GAP_US, -5, 4, "w,x,y,z"),  # closed by cap (max_events=4)
    ],
)
def test_sessionizer_matches_reference_loop(rows, cur):
    max_events = 4
    batch = _batch(rows)
    ref_closed, ref_state = _reference_loop(GAP_MIN, max_events, cur, batch)
    vec_closed, vec_state, timeout_ms = _run_vectorized(
        GAP_MIN, max_events, cur, batch
    )
    assert vec_closed == ref_closed
    assert vec_state == ref_state
    assert timeout_ms == (ref_state[1] + GAP_US) // 1000


def test_sessionizer_matches_reference_loop_randomized():
    rng = np.random.default_rng(42)
    for trial in range(200):
        n = int(rng.integers(1, 60))
        max_events = int(rng.integers(1, 6))
        # mix of tiny and session-breaking gaps, unsorted arrival order
        gaps = rng.choice(
            [0, 1, GAP_US // 2, GAP_US, GAP_US + 1, 3 * GAP_US], size=n
        )
        ts = np.cumsum(gaps).astype(np.int64)
        perm = rng.permutation(n)
        rows = [
            (int(ts[i]), f"c{int(rng.integers(0, 5))}", int(i)) for i in perm
        ]
        cur = None
        if rng.random() < 0.7:
            cur = (
                -int(rng.integers(1, 3) * GAP_US),
                -int(rng.integers(0, GAP_US)),
                int(rng.integers(1, max_events + 1)),
                "s0",
            )
        batch = _batch(rows)
        ref_closed, ref_state = _reference_loop(GAP_MIN, max_events, cur, batch)
        vec_closed, vec_state, _ = _run_vectorized(GAP_MIN, max_events, cur, batch)
        assert vec_closed == ref_closed, (trial, cur, rows)
        assert vec_state == ref_state, (trial, cur, rows)


def test_sessionizer_timed_out_state_emits_and_clears():
    fn = make_sessionizer(GAP_MIN, 4)
    state = _MockState((0, 5, 2, "a,b"))
    state.hasTimedOut = True
    frames = list(fn((7,), [], state))
    assert len(frames) == 1
    r = frames[0].iloc[0]
    assert (
        int(r["session_start"].value // 1000),
        int(r["session_end"].value // 1000),
        int(r["n_events"]),
        r["channels"],
    ) == (0, 5, 2, "a,b")
    assert state._value is None
