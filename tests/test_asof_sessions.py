"""Unit tests for the as-of join operator and the batch sessionizer."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import domain
from marketing_attribution_etl_framework__maef_spark.operators.asof import asof_join
from marketing_attribution_etl_framework__maef_spark.operators.sessions import sessionize_batch

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def quotes(spark):
    # (key, time, px) — the classic asof right side
    return spark.createDataFrame(
        [
            ("a", _ts(0), 100),
            ("a", _ts(10), 110),
            ("a", _ts(20), 120),
            ("b", _ts(5), 500),
        ],
        "sym string, qt timestamp, px int",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(-1), 1),   # before any quote -> no match
            ("a", _ts(10), 2),   # exactly at a quote -> inclusive match
            ("a", _ts(15), 3),   # between quotes -> the earlier one
            ("a", _ts(300), 4),  # far after -> beyond tolerance
            ("b", _ts(6), 5),
            ("c", _ts(1), 6),    # key with no right rows
        ],
        "sym string, tt timestamp, qty int",
    )


def test_asof_backward(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        tolerance_us=60 * 60 * 1_000_000,
    ).select("sym", "qty", "r_px").collect()
    got = {r.qty: r.r_px for r in out}
    assert got == {1: None, 2: 110, 3: 110, 4: None, 5: 500, 6: None}


def test_asof_backward_no_tolerance(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt"
    ).select("qty", "r_px").collect()
    got = {r.qty: r.r_px for r in out}
    # without tolerance the far-future trade keeps its stale match
    assert got[4] == 120 and got[1] is None


def test_asof_forward(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        direction="forward",
    ).select("qty", "r_px").collect()
    got = {r.qty: r.r_px for r in out}
    # nearest quote at-or-after: trade 1 (t=-1) -> quote t=0; trade 2
    # (t=10) -> inclusive 110; trade 4 (t=300) -> none
    assert got == {1: 100, 2: 110, 3: 120, 4: None, 5: None, 6: None}


def test_asof_tie_break(spark):
    right = spark.createDataFrame(
        [("a", _ts(0), 1, "lo"), ("a", _ts(0), 9, "hi")],
        "k string, rt timestamp, pri int, v string",
    )
    left = spark.createDataFrame([("a", _ts(1))], "k string, lt timestamp")
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", tiebreak="pri"
    ).collect()
    assert out[0].r_v == "hi"  # greatest tiebreak wins deterministically


def test_asof_row_count_preserved(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_time="tt", right_time="qt")
    assert out.count() == trades.count()  # pure left semantics, no fan-out


GAP_MIN, MAX_EVENTS = 30, 3


def _expected(events_pdf: pd.DataFrame):
    """Sequential reference automaton (same as the streaming twin's
    test reference, tests/test_bucketing_sessionize.py)."""
    closed = set()
    for uid, grp in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        cur = None
        for ts, ch in zip(grp["ts"], grp["channel_name"]):
            if cur is not None and (
                (ts - cur[1]).total_seconds() > GAP_MIN * 60 or cur[2] >= MAX_EVENTS
            ):
                closed.add((uid, cur[0], cur[1], cur[2], cur[3]))
                cur = None
            if cur is None:
                cur = (ts, ts, 1, str(ch))
            else:
                cur = (cur[0], ts, cur[2] + 1, cur[3] + "," + str(ch))
        if cur is not None:
            closed.add((uid, cur[0], cur[1], cur[2], cur[3]))
    return closed


def test_sessionize_batch_handmade(spark):
    rows = [
        # user 1: 4 events in a burst (cap=3 splits 3+1), then a gap
        (1, 10, _ts(0), "click", 1.0, None),
        (1, 11, _ts(1), "view", 1.0, None),
        (1, 12, _ts(2), "click", 1.0, None),
        (1, 13, _ts(3), "view", 1.0, None),
        (1, 14, _ts(100), "click", 1.0, None),
        # purchases are excluded
        (1, 15, _ts(101), "purchase", 5.0, None),
        # user 2: single event
        (2, 20, _ts(0), "view", 1.0, None),
    ]
    ev = spark.createDataFrame(
        [(u, e, ts, t, v, p) for (u, e, ts, t, v, p) in rows],
        "user_id long, event_id long, ts timestamp, event_type string, value double, props string",
    )
    out = sessionize_batch(ev, gap_minutes=GAP_MIN, max_events=MAX_EVENTS)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.channels)
        for r in out.collect()
    }
    assert got == {
        (1, _ts(0), _ts(2), 3, "click,view,click"),
        (1, _ts(3), _ts(3), 1, "view"),
        (1, _ts(100), _ts(100), 1, "click"),
        (2, _ts(0), _ts(0), 1, "view"),
    }


def test_sessionize_batch_matches_sequential_reference(spark, sf_dir):
    ev = domain.load_table(spark, sf_dir, "events")
    out = sessionize_batch(ev, gap_minutes=GAP_MIN, max_events=MAX_EVENTS)
    got = {
        (r.user_id, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end),
         r.n_events, r.channels)
        for r in out.collect()
    }
    pdf = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_id", "ts", F.col("event_type").alias("channel_name"))
        .toPandas()
    )
    expected = _expected(pdf)
    assert got == expected
    assert any(n == MAX_EVENTS for (_, _, _, n, _) in got)  # the cap binds


def test_percentile_disc_exact(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import percentile_disc

    rows = [("g", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90]]  # n=9
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.p: r.v for r in percentile_disc(df, ["g"], "v", ps=[0.25, 0.5, 0.75, 1.0]).collect()}
    # ceil(.25*9)=3 -> 30; ceil(.5*9)=5 -> 50; ceil(.75*9)=7 -> 70; 9 -> 90
    assert out == {0.25: 30, 0.5: 50, 0.75: 70, 1.0: 90}

    # ties: percentile value is still an element and deterministic
    df2 = spark.createDataFrame([("g", v) for v in [1, 1, 1, 9]], "g string, v long")
    got = {r.p: r.v for r in percentile_disc(df2, ["g"], "v", ps=[0.5]).collect()}
    assert got == {0.5: 1}


def _plan_of(df) -> str:
    import contextlib
    import io as pyio

    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_join_single_exchange(spark, trades, quotes):
    """Scale pin: the as-of operator contributes exactly ONE exchange
    (on the join key) — no range fan-out, no extra shuffles."""
    plan = _plan_of(
        asof_join(trades, quotes, on=["sym"], left_time="tt", right_time="qt")
    )
    import re

    exchanges = re.findall(r"hashpartitioning\((\w+)", plan)
    assert [e for e in exchanges] == ["sym"], exchanges


def test_sessionize_batch_single_exchange(spark):
    """Scale pin: gap+cap sessionization = one shuffle on user_id;
    both window passes and the final aggregate reuse that partitioning."""
    ev = spark.createDataFrame(
        [(1, 10, T0, "click", 1.0, None)],
        "user_id long, event_id long, ts timestamp, event_type string, value double, props string",
    )
    plan = _plan_of(sessionize_batch(ev))
    import re

    exchanges = re.findall(r"hashpartitioning\((\w+)", plan)
    assert [e for e in exchanges] == ["user_id"], exchanges


def test_asof_tie_break_numeric_order(spark):
    """Regression: a numeric tiebreak must order numerically (10 > 9),
    not lexicographically ('10' < '9')."""
    right = spark.createDataFrame(
        [("a", _ts(0), 9, "nine"), ("a", _ts(0), 10, "ten")],
        "k string, rt timestamp, pri int, v string",
    )
    left = spark.createDataFrame([("a", _ts(1))], "k string, lt timestamp")
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", tiebreak="pri"
    ).collect()
    assert out[0].r_v == "ten"


def test_rolling_user_features_exact(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.features import rolling_user_features

    rows = [
        (1, 1, T0, "a", 1.0, None),
        (2, 1, T0 + dt.timedelta(days=3), "a", 2.0, None),
        (3, 1, T0 + dt.timedelta(days=8), "a", 4.0, None),   # day-0 event left the 7d window
        (4, 1, T0 + dt.timedelta(days=10), "a", 8.0, None),  # window holds days 3,8,10
        (5, 2, T0, "a", 16.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    out = {r.event_id: r for r in rolling_user_features(ev, window_days=7).collect()}
    assert (out[1].n_window, out[1].value_cents_window, out[1].usecs_since_prev) == (1, 100, None)
    assert (out[2].n_window, out[2].value_cents_window) == (2, 300)
    assert (out[3].n_window, out[3].value_cents_window) == (2, 600)
    assert (out[4].n_window, out[4].value_cents_window) == (3, 1400)
    assert out[4].usecs_since_prev == 2 * 86400 * 1_000_000
    assert (out[5].n_window, out[5].value_cents_window) == (1, 1600)
