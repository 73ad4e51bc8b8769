"""Attribution model contract (SURVEY §2.6): weights >= 0, sum(ihc) per
conversion == 1 (the reference API's verified invariant), plus
model-specific exact weights on hand-built journeys."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def journeys(spark):
    rows = []
    # c1: 4 sessions; closer_engagement on s2, holder on s1/s3
    base = [
        ("c1", "s1", "2023-08-01 10:00:00", "Search", 1, 0, 0),
        ("c1", "s2", "2023-08-03 10:00:00", "Email", 0, 1, 0),
        ("c1", "s3", "2023-08-05 10:00:00", "Social", 1, 0, 0),
        ("c1", "s4", "2023-08-07 10:00:00", "Direct", 0, 0, 1),
        # c2: single session
        ("c2", "s9", "2023-08-02 00:00:00", "Search", 0, 0, 0),
        # c3: two sessions, no engagement flags at all
        ("c3", "sa", "2023-08-01 00:00:00", "Search", 0, 0, 0),
        ("c3", "sb", "2023-08-02 00:00:00", "Email", 0, 0, 0),
    ]
    for conv_id, sid, t, ch, h, c, i in base:
        rows.append((conv_id, sid, ts("2023-08-08 00:00:00"), ts(t), ch, h, c, i, 0, 100.0))
    return spark.createDataFrame(
        rows,
        "conversion_id string, session_id string, conv_ts timestamp, event_ts timestamp, "
        "channel_label string, holder_engagement int, closer_engagement int, "
        "impression_interaction int, conversion int, revenue double",
    )


def weights(df):
    return {(r.conv_id, r.session_id): r.ihc for r in df.collect()}


@pytest.mark.parametrize("model", sorted(attr.MODELS))
def test_invariants(journeys, model):
    df = attr.attribute(journeys, model)
    assert df.columns == ["conv_id", "session_id", "ihc"]
    rows = df.collect()
    assert all(r.ihc >= 0 for r in rows)
    sums = {
        r.conv_id: r.s
        for r in df.groupBy("conv_id").agg(F.sum("ihc").alias("s")).collect()
    }
    for conv_id, s in sums.items():
        assert abs(s - 1.0) < 1e-9, (model, conv_id, s)


def test_linear(journeys):
    w = weights(attr.attribute_linear(journeys))
    assert w[("c1", "s1")] == pytest.approx(0.25)
    assert w[("c2", "s9")] == pytest.approx(1.0)


def test_first_last(journeys):
    wf = weights(attr.attribute_first_touch(journeys))
    wl = weights(attr.attribute_last_touch(journeys))
    assert wf[("c1", "s1")] == 1.0 and wf[("c1", "s4")] == 0.0
    assert wl[("c1", "s4")] == 1.0 and wl[("c1", "s1")] == 0.0


def test_u_shaped(journeys):
    w = weights(attr.attribute_u_shaped(journeys))
    assert w[("c1", "s1")] == pytest.approx(0.4)
    assert w[("c1", "s4")] == pytest.approx(0.4)
    assert w[("c1", "s2")] == pytest.approx(0.1)
    assert w[("c2", "s9")] == pytest.approx(1.0)
    assert w[("c3", "sa")] == pytest.approx(0.5)


def test_time_decay_monotone(journeys):
    w = weights(attr.attribute_time_decay(journeys))
    c1 = [w[("c1", s)] for s in ["s1", "s2", "s3", "s4"]]
    assert c1 == sorted(c1)  # newer sessions weigh more
    # halflife 7d: s4 (1d old) has 2x weight of an 8d-old session — check ratio s4/s2 (5d apart)
    assert w[("c1", "s4")] / w[("c1", "s2")] == pytest.approx(2 ** (4 / 7), rel=1e-9)


def test_ihc_phases(journeys):
    w = weights(attr.attribute_ihc(journeys))
    # c1: initializer 0.3 -> s1; closer 0.4 -> s2 (only closer_engagement);
    # holder 0.3 split s1/s3 (holder_engagement)
    assert w[("c1", "s1")] == pytest.approx(0.3 + 0.15)
    assert w[("c1", "s2")] == pytest.approx(0.4)
    assert w[("c1", "s3")] == pytest.approx(0.15)
    assert w[("c1", "s4")] == pytest.approx(0.0)
    # c3: no flags -> closer falls back to last session, holder splits linearly
    assert w[("c3", "sa")] == pytest.approx(0.3 + 0.15)
    assert w[("c3", "sb")] == pytest.approx(0.4 + 0.15)


def test_ihc_redistribution(journeys):
    p = attr.IHCParams(redistribution_channel_labels=["Direct"])
    w = weights(attr.attribute_ihc(journeys, p))
    assert w[("c1", "s4")] == 0.0  # Direct credit redistributed
    assert sum(v for (c, _), v in w.items() if c == "c1") == pytest.approx(1.0)


def test_unknown_model(journeys):
    with pytest.raises(ValueError):
        attr.attribute(journeys, "nope")


def test_ihc_directional_redistribution(spark):
    """earlier_sessions_only: a losing session's credit flows only to
    kept sessions before it; a loser with no earlier kept receiver
    keeps its credit. Hand-computed on [view, click, view] with no
    engagement flags: raws (0.4, 0.1, 0.5) -> finals (0.4, 0.6, 0.0)."""
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators.attribution import IHCParams, attribute_ihc

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", "sA", t0, "view", 0, 0),
        ("c1", "sB", t0 + dt.timedelta(hours=1), "click", 0, 0),
        ("c1", "sC", t0 + dt.timedelta(hours=2), "view", 0, 0),
    ]
    j = spark.createDataFrame(
        rows,
        "conversion_id string, session_id string, event_ts timestamp, "
        "channel_label string, holder_engagement int, closer_engagement int",
    )
    params = IHCParams(
        redistribution_channel_labels=["view"],
        redistribution_direction="earlier_sessions_only",
    )
    got = {r.session_id: round(r.ihc, 9) for r in attribute_ihc(j, params).collect()}
    assert got == {"sA": 0.4, "sB": 0.6, "sC": 0.0}

    # later_sessions_only mirror: loser A redistributes to kept B (the
    # only kept session after it); loser C has no later receiver.
    params2 = IHCParams(
        redistribution_channel_labels=["view"],
        redistribution_direction="later_sessions_only",
    )
    got2 = {r.session_id: round(r.ihc, 9) for r in attribute_ihc(j, params2).collect()}
    assert got2 == {"sA": 0.0, "sB": 0.5, "sC": 0.5}

    # weights still sum to one per conversion in both modes
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert abs(sum(got2.values()) - 1.0) < 1e-9
