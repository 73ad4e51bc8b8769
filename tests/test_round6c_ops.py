"""Round-6 session-C operator pins: next-best-channel policy,
inter-purchase cadence, Holt linear forecast, arrival-order novelty,
content-defined chunking, and cluster-conditional embedding outliers —
each on a handmade fixture with the expected answer derived by hand (or
by an in-test Python replica of the hash device)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.llm import embquality as emq
from marketing_attribution_etl_framework__maef_spark.operators import markov as mkv
from marketing_attribution_etl_framework__maef_spark.operators import survival as surv
from marketing_attribution_etl_framework__maef_spark.operators import timeseries as tsr

Q20 = 1 << 20


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def test_next_best_channel_smoothed_argmax(spark):
    # journeys: c1 = a->b, c2 = a->b, c3 = a->c
    rows = []
    for cid, path in [("c1", "ab"), ("c2", "ab"), ("c3", "ac")]:
        for i, ch in enumerate(path):
            rows.append((cid, ch, _ts(1 + i), f"s{cid}{i}"))
    j = spark.createDataFrame(
        rows, "conversion_id string, channel_label string, event_ts timestamp, session_id string"
    )
    out = {r["src"]: r for r in mkv.next_best_channel(j).collect()}
    # transitions: (start)->a x3; a->b x2, a->c x1; b->(conv) x2, c->(conv) x1
    # dst vocabulary = {a, b, c, (conversion)} -> V = 4
    assert out["a"]["best_next"] == "b"
    assert out["a"]["n_best"] == 2 and out["a"]["n_total"] == 3 and out["a"]["n_dst"] == 4
    # p = (2+1)/(3+4); half-up q20
    assert out["a"]["prob_q20"] == (2 * 3 * Q20 + 7) // (2 * 7)
    assert out["(start)"]["best_next"] == "a"
    assert out["(start)"]["prob_q20"] == (2 * 4 * Q20 + 7) // (2 * 7)
    # b converts always: p = (2+1)/(2+4)
    assert out["b"]["best_next"] == "(conversion)"
    assert out["b"]["prob_q20"] == (2 * 3 * Q20 + 6) // (2 * 6)


def test_interpurchase_cadence_buckets_and_bounds(spark):
    rows = []
    eid = 0
    # u1: 2 purchases 1h apart -> bucket 2-3, one gap = 3600s
    for h in (1, 2):
        rows.append((eid, _ts(h), 1, "purchase", 1.0))
        eid += 1
    # u2: 4 purchases 2h apart -> bucket 4-5, three gaps = 7200s
    for h in (1, 3, 5, 7):
        rows.append((eid, _ts(h), 2, "purchase", 1.0))
        eid += 1
    # u3: 6 purchases 1h apart -> bucket 6+, five gaps = 3600s
    for h in range(1, 7):
        rows.append((eid, _ts(h), 3, "purchase", 1.0))
        eid += 1
    # noise: single-purchase user (no gap) + a session event
    rows.append((eid, _ts(9), 4, "purchase", 1.0))
    rows.append((eid + 1, _ts(9), 1, "paid_search", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["cadence_bucket"]: r for r in surv.interpurchase_cadence(ev).collect()}
    assert set(out) == {"2-3", "4-5", "6+"}
    assert out["2-3"]["n_users"] == 1 and out["2-3"]["n_gaps"] == 1
    assert out["4-5"]["n_gaps"] == 3 and out["6+"]["n_gaps"] == 5

    def lb(x: int) -> int:
        g = max(x.bit_length() - 3, 0)
        return (x >> g) << g

    assert out["2-3"]["p50_gap_lb"] == lb(3_600_000_000)
    assert out["4-5"]["p90_gap_lb"] == lb(7_200_000_000)
    assert out["6+"]["p50_gap_lb"] == lb(3_600_000_000)


def _tdiv(a: int, d: int) -> int:
    return -((-a) // d) if a < 0 else a // d


def test_holt_linear_forecast_recursion(spark):
    # one channel, 4 consecutive days of cents 100, 200, 300, 400
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), 1, "paid_search", float(100 * (i + 1)) / 100.0)
        for i in range(4)
    ]
    # cents column is round(value*100) -> 100, 200, 300, 400
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = tsr.holt_linear_forecast(ev).collect()
    assert len(out) == 1
    r = out[0]
    ys = [100, 200, 300, 400]
    lev, tr, sae = Q20 * ys[0], Q20 * (ys[1] - ys[0]), 0
    for t in range(1, 4):
        f = lev + tr
        sae += abs(Q20 * ys[t] - f)
        lev_new = _tdiv(Q20 * ys[t] + 3 * f, 4)
        tr = _tdiv((lev_new - lev) + 3 * tr, 4)
        lev = lev_new
    assert r["n_days"] == 4
    assert r["level_cents_q20"] == lev and r["trend_cents_q20"] == tr
    assert r["fc1_cents_q20"] == lev + tr and r["fc7_cents_q20"] == lev + 7 * tr
    assert r["mae_onestep_cents_q20"] == _tdiv(sae, 3)
    # a perfect linear ramp: the learned trend stays within 25% of the
    # true +100c/day slope even after only 3 updates
    assert abs(tr - 100 * Q20) < 25 * Q20


def test_holt_dense_spine_fills_gap_days(spark):
    # day 2 missing -> y = [100, 0, 100]; n_days must count the gap
    rows = [
        (0, dt.datetime(2024, 1, 1, 12), 1, "a", 1.0),
        (1, dt.datetime(2024, 1, 3, 12), 1, "a", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = tsr.holt_linear_forecast(ev).collect()[0]
    assert r["n_days"] == 3
    ys = [100, 0, 100]
    lev, tr, sae = Q20 * ys[0], Q20 * (ys[1] - ys[0]), 0
    for t in range(1, 3):
        f = lev + tr
        sae += abs(Q20 * ys[t] - f)
        lev_new = _tdiv(Q20 * ys[t] + 3 * f, 4)
        tr = _tdiv((lev_new - lev) + 3 * tr, 4)
        lev = lev_new
    assert r["level_cents_q20"] == lev and r["trend_cents_q20"] == tr


def test_doc_novelty_first_owner_wins(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " iota kappa lambda mu nu")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dd.doc_novelty(docs).collect()}
    # doc 1: 8 words -> 4 distinct 5-shingles, all first-seen
    assert out[1]["n_shingles"] == 4 and out[1]["n_novel"] == 4
    assert out[1]["novelty_q20"] == Q20
    # doc 2: 13 words -> 9 shingles; the 4 from doc 1 are owned by doc 1
    assert out[2]["n_shingles"] == 9 and out[2]["n_novel"] == 5
    assert out[2]["novelty_q20"] == (2 * 5 * Q20 + 9) // (2 * 9)


def _cdc_expected(text: str, w: int = 3, modulus: int = 8) -> list[str]:
    """Python replica of cdc_chunk_stats' boundary device."""
    ws = " ".join(text.lower().strip().split()).split(" ")
    n = len(ws)
    cuts = []
    for i0 in range(max(n - w + 1, 1)):
        sh = " ".join(ws[i0 : i0 + w])
        h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
        if h % modulus == 0 and i0 + w < n:
            cuts.append(i0 + w)
    bounds = [0] + cuts + [n]
    return [
        hashlib.md5(" ".join(ws[bounds[j - 1] : bounds[j]]).encode()).hexdigest()
        for j in range(1, len(bounds))
    ]


def test_cdc_chunk_stats_matches_python_replica(spark):
    words = [f"w{i * 7 % 23}x{i}" for i in range(40)]
    t1 = " ".join(words)
    t2 = " ".join(["prefixword"] + words)  # insertion at the head
    docs = spark.createDataFrame(
        [(1, t1, "s1"), (2, t2, "s1")], "doc_id long, text string, source string"
    )
    exp = _cdc_expected(t1) + _cdc_expected(t2)
    out = dd.cdc_chunk_stats(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_chunks"] == len(exp)
    assert r["n_distinct_chunks"] == len(set(exp))
    dup = len(exp) - len(set(exp))
    assert r["dup_chunk_ratio_q20"] == (2 * dup * Q20 + len(exp)) // (2 * len(exp))
    # content-defined boundaries recover the shared tail despite the
    # head insertion: at least one chunk hash is shared between docs
    # (this is the property fixed-width blocking would destroy) —
    # guaranteed here because t1 has an interior cut (else 1 chunk each)
    if len(_cdc_expected(t1)) > 1:
        assert dup > 0


def test_centroid_distance_outliers_worst_decile(spark):
    rows = []
    # centroids: vec 0 = x-axis, vec 1 = y-axis (vec_id < 2)
    rows.append((0, [1.0, 0.0]))
    rows.append((1, [0.0, 1.0]))
    # 10 x-cluster members: 9 tight, one at 45 degrees minus epsilon
    for i in range(9):
        rows.append((10 + i, [1.0, 0.01 * i]))
    rows.append((19, [1.0, 0.99]))  # worst x-member
    # 10 y-cluster members: 9 tight, one far
    for i in range(9):
        rows.append((30 + i, [0.01 * i, 1.0]))
    rows.append((39, [0.99, 1.0001]))  # worst y-member
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = emq.centroid_distance_outliers(e, e.filter(F.col("vec_id") < 2))
    got = sorted((r["cluster"], r["vec_id"], r["rnk"]) for r in out.collect())
    # 11 members per cluster (centroid assigns to itself) -> floor(11/10) = 1 row each
    assert got == [(0, 19, 1), (1, 39, 1)]


def test_ann_recall_audit_counts_misses(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.95]),  # cluster 0, cos(q)=.986 — the true #1
            (11, [1.0, 0.1]),   # cluster 0
            (20, [0.0, 1.0]),   # cluster 1
            (21, [0.2, 1.0]),   # cluster 1, cos(q)=.902
            (22, [0.5, 1.0]),   # cluster 1, cos(q)=.984 — the true #2
            (23, [0.1, 1.0]),   # cluster 1
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(99, [0.6, 0.8])], "vec_id long, embedding array<double>")
    # probe=1: the query probes only cluster 1, missing the true #1
    r1 = sim.ann_recall_audit(corpus, q, cents, k=2, probe=1).collect()
    assert len(r1) == 1 and r1[0]["n_hits"] == 1
    assert r1[0]["recall_q20"] == (2 * 1 * Q20 + 2) // 4
    # probe=2 covers every cluster -> exact
    r2 = sim.ann_recall_audit(corpus, q, cents, k=2, probe=2).collect()
    assert r2[0]["n_hits"] == 2 and r2[0]["recall_q20"] == Q20


def test_dow_seasonal_index_integer_dow(spark):
    # 2024-01-01 is a Monday (dow 0); 2024-01-02 Tuesday (dow 1)
    rows = [
        (0, dt.datetime(2024, 1, 1, 9), 1, "a", 1.0),
        (1, dt.datetime(2024, 1, 1, 10), 2, "a", 1.0),
        (2, dt.datetime(2024, 1, 2, 9), 3, "a", 2.0),
        (3, dt.datetime(2024, 1, 1, 9), 1, "purchase", 9.0),  # excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["dow"]: r for r in tsr.dow_seasonal_index(ev).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_sessions"] == 2 and out[0]["cents"] == 200
    assert out[1]["n_sessions"] == 1 and out[1]["cents"] == 200
    # 7 * 200 / 400 = 3.5 flat-week multiples, exactly representable
    assert out[0]["index_q20"] == 7 * 200 * Q20 // 400
    assert out[1]["index_q20"] == 7 * 200 * Q20 // 400


def test_dow_seasonal_index_zero_cents_channel(spark):
    """ADVICE r06 #1: a channel whose summed value rounds to 0 cents
    must emit index_q20 = 0, not throw on DECIMAL div-by-zero."""
    rows = [
        (0, dt.datetime(2024, 1, 1, 9), 1, "a", 0.0),
        (1, dt.datetime(2024, 1, 2, 9), 2, "a", 0.001),  # rounds to 0 cents
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["dow"]: r for r in tsr.dow_seasonal_index(ev).collect()}
    assert set(out) == {0, 1}
    assert all(r["cents"] == 0 and r["index_q20"] == 0 for r in out.values())


def test_mix_drift_chi2_cells(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import experiments as xpr

    rows, eid = [], 0
    D = dt.datetime(2024, 1, 20, 12)

    def add(channel, age, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, D - dt.timedelta(days=age), eid, channel, 1.0))
            eid += 1

    add("a", 0, 6)   # current
    add("a", 8, 3)   # baseline
    add("b", 2, 2)   # current
    add("b", 9, 9)   # baseline
    add("c", 1, 5)   # NEW channel: current only
    add("d", 13, 4)  # stale channel: baseline only
    add("a", 20, 99)  # outside both windows -> ignored
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["channel"]: r for r in xpr.mix_drift_chi2(ev).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    # baseline-present cells: a (6,3), b (2,9), d (0,4) -> n=8, m=16
    n, m = 8, 16
    for ch, (o, b) in {"a": (6, 3), "b": (2, 9), "d": (0, 4)}.items():
        assert out[ch]["n_cur"] == o and out[ch]["n_base"] == b
        num = (o * m - n * b) ** 2
        den = n * b * m
        assert out[ch]["chi2_contrib_q20"] == (2 * num * Q20 + den) // (2 * den)
    # new channel: counted, not chi-squared
    assert out["c"]["n_cur"] == 5 and out["c"]["n_base"] == 0
    assert out["c"]["chi2_contrib_q20"] is None


def test_forecast_topdown_coherence_and_hamilton(spark):
    rows, eid = [], 0
    # 3 days of total spend: day1 a=1.00; day2 a=2.00,b=1.00; day3 a=2.00,b=3.00
    plan = [
        (1, [("a", 1.00)]),
        (2, [("a", 2.00), ("b", 1.00)]),
        (3, [("a", 2.00), ("b", 3.00)]),
    ]
    for day, items in plan:
        for ch, v in items:
            rows.append((eid, dt.datetime(2024, 1, day, 12), eid, ch, v))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["channel"]: r for r in tsr.forecast_topdown(ev).collect()}
    # expected F from the Holt replica over total cents [100, 300, 500]
    ys = [100, 300, 500]
    lev, tr = Q20 * ys[0], Q20 * (ys[1] - ys[0])
    for t in range(1, 3):
        f = lev + tr
        lev_new = _tdiv(Q20 * ys[t] + 3 * f, 4)
        tr = _tdiv((lev_new - lev) + 3 * tr, 4)
        lev = lev_new
    F_q20 = max(lev + tr, 0)
    # trailing 7 days covers everything: a=500c, b=400c
    ca, cb, C = 500, 400, 900
    base_a, base_b = F_q20 * ca // C, F_q20 * cb // C
    rem_a, rem_b = F_q20 * ca % C, F_q20 * cb % C
    left = F_q20 - base_a - base_b
    alloc = {"a": base_a, "b": base_b}
    for ch in sorted(alloc, key=lambda c: (-(rem_a if c == "a" else rem_b), c))[:left]:
        alloc[ch] += 1
    assert out["a"]["trail_cents"] == 500 and out["b"]["trail_cents"] == 400
    assert out["a"]["alloc_fc1_cents_q20"] == alloc["a"]
    assert out["b"]["alloc_fc1_cents_q20"] == alloc["b"]
    # the coherence invariant: allocations sum EXACTLY to the forecast
    assert out["a"]["alloc_fc1_cents_q20"] + out["b"]["alloc_fc1_cents_q20"] == F_q20


def test_top_decile_share_whale(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import concentration as conc

    # 10 users: nine spend 100c, one whale spends 9100c -> whale is the
    # top decile (rank 10; 10*10 > 9*10) holding 9100/10000 of revenue
    rows = [("a", u, 100) for u in range(9)] + [("a", 9, 9100)]
    facts = spark.createDataFrame(rows, "channel string, user_id long, cents long")
    r = conc.top_decile_share(facts, "channel", "user_id", "cents").collect()[0]
    assert r["n_units"] == 10 and r["total_cents"] == 10000
    assert r["top_users"] == 1 and r["top_cents"] == 9100
    assert r["share_q20"] == (2 * 9100 * Q20 + 10000) // (2 * 10000)


def test_activity_streaks_islands(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import sessions as sess

    rows, eid = [], 0
    # u1 active Jan 1,2,3 + Jan 10          -> longest 3
    # u2 active Jan 5 (twice: dedup to one) -> longest 1
    # u3 active Jan 1,2 + Jan 4,5,6,7       -> longest 4
    for u, days in [(1, [1, 2, 3, 10]), (2, [5, 5]), (3, [1, 2, 4, 5, 6, 7])]:
        for day in days:
            rows.append((eid, dt.datetime(2024, 1, day, 9 + eid % 3), u, "a", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["streak_days"]: r["n_users"] for r in sess.activity_streaks(ev).collect()}
    assert out == {3: 1, 1: 1, 4: 1}


def test_cdc_cross_source_shared_tail(spark):
    words = [f"q{i * 11 % 29}z{i}" for i in range(40)]
    t1 = " ".join(words)
    t2 = " ".join(["syndicated", "byline"] + words)  # same body, new head
    t3 = "totally different text with no shared content at all"
    docs = spark.createDataFrame(
        [(1, t1, "sA"), (2, t2, "sB"), (3, t3, "sC")],
        "doc_id long, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): r["shared_chunks"]
           for r in dd.cdc_cross_source(docs).collect()}
    exp1, exp2 = set(_cdc_expected(t1)), set(_cdc_expected(t2))
    shared = len(exp1 & exp2)
    if len(exp1) > 1:  # interior cut exists -> the tail realigns
        assert shared > 0
        assert out[("sA", "sB")] == shared
    assert ("sA", "sC") not in out and ("sB", "sC") not in out


def test_dow_mad_outliers_weekday_stratified(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import anomaly as anm

    rows, eid = [], 0
    # channel 'a': Mondays (Jan 1/8/15/22/29 2024) at 100c except one
    # 1000c spike; Saturdays (Jan 6/13/20/27) at 900c — high but NORMAL
    # for Saturdays.  The unconditional screen would flag Saturdays;
    # the stratified one flags only the Monday spike.
    for day, cents in [(1, 100), (8, 100), (15, 1000), (22, 100), (29, 100),
                       (6, 900), (13, 900), (20, 900), (27, 900)]:
        rows.append((eid, dt.datetime(2024, 1, day, 12), eid, "a", cents / 100.0))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_day"]: r for r in anm.dow_mad_outliers(ev).collect()}
    # Mondays: med=100, deviations (0,0,900,0,0) -> MAD=0; spike flagged
    assert out["2024-01-15"]["dow"] == 0 and out["2024-01-15"]["is_anomaly"] == 1
    assert out["2024-01-08"]["is_anomaly"] == 0
    # Saturdays: med=900, all deviations 0 -> no flags
    for d in ("2024-01-06", "2024-01-13", "2024-01-20", "2024-01-27"):
        assert out[d]["dow"] == 5 and out[d]["is_anomaly"] == 0


def test_cac_payback_breakeven_month(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt

    # channel 'a': cost 5.000 in Jan + 5.000 in Feb; last-touch revenue
    # 4.00 in Jan, 7.00 in Feb -> cum Jan 400c vs 5000mil (no),
    # cum Feb 1100c vs 10000mil (1100*10 >= 10000 -> YES Feb)
    j = spark.createDataFrame(
        [
            ("c1", "s1", dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 14), "a", 4.00),
            ("c2", "s2", dt.datetime(2024, 2, 15), dt.datetime(2024, 2, 14), "a", 7.00),
            # multi-touch: earlier touch on channel b must NOT get credit
            ("c2", "s0", dt.datetime(2024, 2, 15), dt.datetime(2024, 2, 13), "b", 7.00),
        ],
        "conversion_id string, session_id string, conv_ts timestamp, "
        "event_ts timestamp, channel_label string, revenue double",
    )
    sess = spark.createDataFrame(
        [
            ("k1", "a", dt.datetime(2024, 1, 10)),
            ("k2", "a", dt.datetime(2024, 2, 10)),
        ],
        "session_id string, channel_name string, event_ts timestamp",
    )
    costs = spark.createDataFrame(
        [("k1", 5.0), ("k2", 5.0)], "session_id string, cost double"
    )
    out = {r["channel"]: r for r in rpt.cac_payback(j, sess, costs).collect()}
    assert out["a"]["payback_month"] == "2024-02"
    assert out["a"]["total_rev_cents"] == 1100 and out["a"]["total_cost_mils"] == 10000
    # channel b: a touch but never the last one -> no revenue, no cost rows
    assert "b" not in out or out["b"]["total_rev_cents"] == 0
