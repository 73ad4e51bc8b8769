"""J1 boundary semantics (SURVEY §2.8.1 + FIXTURES.md generation
constraints): boundary timestamp, strict vs <=, multi-conversion users,
user with no sessions, lookback cut."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.operators.journeys import build_journeys, group_journeys, journey_entries


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def fixture(spark):
    conversions = spark.createDataFrame(
        [
            ("c1", "u1", ts("2023-08-10 12:00:00"), 100.0),
            ("c2", "u1", ts("2023-08-20 12:00:00"), 50.0),   # same user converts twice
            ("c3", "u2", ts("2023-08-15 00:00:00"), 10.0),   # user with no sessions
        ],
        "conv_id string, user_id string, conv_ts timestamp, revenue double",
    )
    sessions = spark.createDataFrame(
        [
            ("s1", "u1", ts("2023-08-01 09:00:00"), "Paid Search", 1, 0, 0),
            ("s2", "u1", ts("2023-08-10 12:00:00"), "Direct", 0, 1, 0),   # == c1 ts exactly
            ("s3", "u1", ts("2023-08-15 10:00:00"), "Email", 1, 1, 0),    # between c1 and c2
            ("s4", "u1", ts("2023-06-01 00:00:00"), "Display", 0, 0, 1),  # outside 30d lookback of c1
            ("s5", "u3", ts("2023-08-05 00:00:00"), "Social", 0, 0, 0),   # user never converts
        ],
        "session_id string, user_id string, event_ts timestamp, channel_name string, "
        "holder_engagement int, closer_engagement int, impression_interaction int",
    )
    return conversions, sessions


def pairs(df):
    return {(r.conversion_id, r.session_id) for r in df.collect()}


def test_default_includes_boundary_session(spark, fixture):
    conv, sess = fixture
    j = build_journeys(conv, sess)
    assert ("c1", "s2") in pairs(j)
    flags = {r.session_id: r.conversion for r in j.filter(F.col("conversion_id") == "c1").collect()}
    assert flags["s2"] == 1  # boundary session flagged conversion=1
    assert flags["s1"] == 0


def test_strict_mode_drops_boundary(spark, fixture):
    conv, sess = fixture
    j = build_journeys(conv, sess, strict_before=True)
    assert ("c1", "s2") not in pairs(j)
    # strict mode -> the conversion=1 branch is dead (reference behavior)
    assert j.filter(F.col("conversion") == 1).count() == 0


def test_multi_conversion_user_shares_earlier_sessions(spark, fixture):
    conv, sess = fixture
    p = pairs(build_journeys(conv, sess))
    # earlier sessions belong to both journeys of u1
    assert ("c1", "s1") in p and ("c2", "s1") in p
    # s3 is after c1, before c2
    assert ("c1", "s3") not in p and ("c2", "s3") in p


def test_no_session_user_dropped_not_failed(spark, fixture):
    conv, sess = fixture
    j = build_journeys(conv, sess)
    assert j.filter(F.col("conversion_id") == "c3").count() == 0


def test_never_converting_user_absent(spark, fixture):
    conv, sess = fixture
    assert build_journeys(conv, sess).filter(F.col("session_id") == "s5").count() == 0


def test_lookback_cuts_old_sessions(spark, fixture):
    conv, sess = fixture
    p_all = pairs(build_journeys(conv, sess))
    p_30 = pairs(build_journeys(conv, sess, lookback_days=30))
    assert ("c1", "s4") in p_all
    assert ("c1", "s4") not in p_30


def test_journey_entries_contract(spark, fixture):
    conv, sess = fixture
    e = journey_entries(build_journeys(conv, sess))
    assert e.columns == [
        "conversion_id", "session_id", "timestamp", "channel_label",
        "holder_engagement", "closer_engagement", "conversion",
        "impression_interaction",
    ]
    row = e.filter((F.col("conversion_id") == "c1") & (F.col("session_id") == "s1")).first()
    assert row.timestamp == "2023-08-01 09:00:00"


def test_group_journeys_ordered(spark, fixture):
    conv, sess = fixture
    g = group_journeys(build_journeys(conv, sess)).filter(F.col("conversion_id") == "c2").first()
    ids = [s.session_id for s in g.sessions]
    assert ids == ["s4", "s1", "s2", "s3"]  # time order
    assert g.n_sessions == 4


def test_salted_join_equivalent(spark, sf_dir):
    """Skew salting must not change the result set — same journeys,
    spread over (user_id, salt) instead of user_id."""
    from marketing_attribution_etl_framework__maef_spark import domain

    conv = domain.conversions(spark, sf_dir)
    sess = domain.session_sources(spark, sf_dir)
    plain = build_journeys(conv, sess, lookback_days=30)
    salted = build_journeys(conv, sess, lookback_days=30, salt_buckets=8)
    assert "_salt" not in salted.columns
    a = {(r.conversion_id, r.session_id) for r in plain.select("conversion_id", "session_id").collect()}
    b = {(r.conversion_id, r.session_id) for r in salted.select("conversion_id", "session_id").collect()}
    assert a == b and len(a) > 0
