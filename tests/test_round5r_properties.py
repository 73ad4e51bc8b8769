"""Property-based tests for the round-5-rerun operators: algebraic
laws checked on random inputs against brute-force Python references
(SURVEY §5.4 style; small example counts — every example is a Spark
job)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.operators.planning import (
    mann_kendall_trend,
    theil_sen_slope,
)
from marketing_attribution_etl_framework__maef_spark.llm.text import word_simpson

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

Q = 1 << 20


def _daily_events(spark, counts):
    rows, eid = [], 0
    for d, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 10:00:00", eid, "c", 1.0))
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@settings(**_SETTINGS)
@given(st.lists(st.integers(1, 9), min_size=2, max_size=10))
def test_mann_kendall_matches_bruteforce(spark, counts):
    r = mann_kendall_trend(_daily_events(spark, counts)).first()
    n = len(counts)
    s = sum(
        (1 if counts[j] > counts[i] else -1 if counts[j] < counts[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for c in counts:
        ties[c] = ties.get(c, 0) + 1
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    assert (r["n_days"], r["s_stat"], r["var18"]) == (n, s, var18)


@settings(**_SETTINGS)
@given(st.lists(st.integers(1, 9), min_size=2, max_size=8))
def test_theil_sen_matches_bruteforce_lower_median(spark, counts):
    r = theil_sen_slope(_daily_events(spark, counts)).first()
    n = len(counts)
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            dy, dx = counts[j] - counts[i], j - i
            pairs.append((Fraction(dy, dx), dy, dx, i, j))
    pairs.sort()
    med = pairs[(len(pairs) + 1) // 2 - 1]
    assert (r["dy"], r["dx"]) == (med[1], med[2])
    # slope_q20 is the signed half-away-from-zero rounding of dy/dx
    frac = med[0] * Q
    if frac >= 0:
        want = (2 * frac.numerator + frac.denominator) // (2 * frac.denominator)
    else:
        fpos = -frac
        want = -((2 * fpos.numerator + fpos.denominator) // (2 * fpos.denominator))
    assert r["slope_q20"] == want


@settings(**_SETTINGS)
@given(st.lists(st.sampled_from("abc"), min_size=1, max_size=20))
def test_word_simpson_identities(spark, toks):
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    r = word_simpson(docs).first()
    n = len(toks)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    ssq = sum(c * c for c in counts.values())
    assert (r["n_words"], r["n_distinct_words"], r["sum_sq"]) == (n, len(counts), ssq)
    # exact half-up of n^2/ssq in q20
    assert r["inv_simpson_q20"] == (2 * n * n * Q + ssq) // (2 * ssq)
    # bounds: 1 <= inv-Simpson <= n_distinct (up to rounding granularity)
    assert Q - 1 <= r["inv_simpson_q20"] <= len(counts) * Q + 1
