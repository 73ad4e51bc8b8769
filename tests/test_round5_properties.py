"""Property-based tests for the round-5 operators (SURVEY §5.4 style):
algebraic laws checked on random inputs against brute-force Python
references.  Example counts are small — every example is a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketing_attribution_etl_framework__maef_spark.operators.concentration import gini_by_group
from marketing_attribution_etl_framework__maef_spark.operators.concurrency import peak_concurrency
from marketing_attribution_etl_framework__maef_spark.operators.skyline import skyline_2d

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

Q = 1 << 20


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=12))
def test_gini_matches_bruteforce_and_bounds(spark, cents):
    df = spark.createDataFrame(
        [("g", i, c) for i, c in enumerate(cents)], "g string, u long, cents long"
    )
    got = gini_by_group(df, "g", "u", "cents").first()["gini_q20"]
    n, s = len(cents), sum(cents)
    if s == 0:
        assert got == 0
        return
    xs = sorted(cents)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    assert got == (num * Q) // (n * s)
    # bounds: 0 <= G <= (n-1)/n
    assert 0 <= got <= ((n - 1) * Q) // n


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=14
    )
)
def test_skyline_matches_quadratic_definition(spark, pts):
    rows = [(i, c, b) for i, (c, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, cost long, ben long")
    got = {r["id"] for r in skyline_2d(df, "cost", "ben").collect()}
    want = {
        i
        for i, c, b in rows
        if not any(
            qc <= c and qb >= b and (qc < c or qb > b) for _, qc, qb in rows
        )
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 2000), st.integers(0, 500)),
        min_size=1,
        max_size=12,
    )
)
def test_peak_concurrency_matches_bruteforce(spark, iv):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for i, (s, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, session_start timestamp, session_end timestamp"
    )
    got = {r["day"]: r["peak"] for r in peak_concurrency(df).collect()}
    # brute force: closed-interval concurrency evaluated at every boundary
    bounds = sorted({t for _, s, e in rows for t in (s, e)})
    brute: dict[str, int] = {}
    for t in bounds:
        c = sum(1 for _, s, e in rows if s <= t <= e)
        day = t.strftime("%Y-%m-%d")
        brute[day] = max(brute.get(day, 0), c)
    # the sweep only SEES days with boundaries; compare on those
    for day, peak in got.items():
        assert peak == brute[day], (day, peak, brute)
    assert set(got) == set(brute)
