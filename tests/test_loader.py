"""Loader path (SURVEY P2/P7/P12, A5/A6/A8, S10, W3): envelope
dispatch, validation, dedup, upsert, sanity checks — the FIXTURES.md
'dirty attribution input' constraints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import schemas
from marketing_attribution_etl_framework__maef_spark.operators import loader


@pytest.fixture(scope="module")
def envelopes(spark):
    rows = [
        (200, [("c1", "s1", 0.2, 0.3, 0.5, 0.4), ("c1", "s2", 0.0, 0.0, 0.0, 0.6)], []),
        (200, [("c2", "s3", 0.0, 0.0, 0.0, None)], []),          # missing ihc -> 0.0
        (200, [(None, "s4", 0.0, 0.0, 0.0, 0.1), ("", "s5", 0.0, 0.0, 0.0, 0.1)], []),  # bad ids
        (500, None, ["boom"]),                                     # error envelope
        (None, None, None),                                        # malformed
        (200, [("c1", "s1", 0.0, 0.0, 0.0, 0.35)], []),            # duplicate key, lower ihc
    ]
    return spark.createDataFrame(rows, schemas.API_RESPONSE_ENVELOPE)


def test_explode_and_validate(spark, envelopes):
    rows = loader.validate_results(loader.explode_envelopes(envelopes))
    got = {(r.conv_id, r.session_id): r.ihc for r in rows.collect()}
    assert ("c2", "s3") in got and got[("c2", "s3")] == 0.0   # ihc defaulted
    assert all(k[0] not in (None, "") for k in got)           # bad ids dropped


def test_dedup_first_wins_deterministic(spark, envelopes):
    rows = loader.validate_results(loader.explode_envelopes(envelopes))
    deduped = loader.dedup_results(rows)
    got = {(r.conv_id, r.session_id): r.ihc for r in deduped.collect()}
    assert got[("c1", "s1")] == 0.4  # highest-ihc wins (deterministic rule)
    assert deduped.count() == deduped.select("conv_id", "session_id").distinct().count()


def test_error_histogram(spark, envelopes):
    hist = {r.error_code: r["count"] for r in loader.error_counts(envelopes).collect()}
    assert hist["status_500"] == 1
    assert hist["missing_status"] == 1
    assert hist["ok"] == 4


def test_invalid_samples_limit(spark, envelopes):
    assert loader.invalid_samples(envelopes, limit=1).count() == 1


def test_total_ihc_guard(spark):
    good = spark.createDataFrame([("c", "s", 0.5)], "conv_id string, session_id string, ihc double")
    assert loader.check_total_ihc(good) == 0.5
    bad = spark.createDataFrame([("c", "s", 0.0)], "conv_id string, session_id string, ihc double")
    with pytest.raises(ValueError):
        loader.check_total_ihc(bad)


def test_positive_ihc_count(spark):
    df = spark.createDataFrame(
        [("c", "s1", 0.5), ("c", "s2", 0.0)], "conv_id string, session_id string, ihc double"
    )
    assert loader.positive_ihc_count(df) == 1


def test_upsert_incoming_wins(spark):
    existing = spark.createDataFrame(
        [("c1", "s1", 0.1), ("c2", "s2", 0.9)], "conv_id string, session_id string, ihc double"
    )
    incoming = spark.createDataFrame(
        [("c1", "s1", 0.7), ("c3", "s3", 0.2)], "conv_id string, session_id string, ihc double"
    )
    got = {(r.conv_id, r.session_id): r.ihc for r in loader.upsert(existing, incoming).collect()}
    assert got == {("c1", "s1"): 0.7, ("c2", "s2"): 0.9, ("c3", "s3"): 0.2}
