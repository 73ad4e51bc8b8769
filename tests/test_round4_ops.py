"""Round-4 operator tests: sketch-gated curation, plus regression
tests for the ADVICE r03 fixes (bloom duplicate safety, IVM negative
count detection, fuzzy equi-join plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import curation as cur
from marketing_attribution_etl_framework__maef_spark.operators import fuzzy, ivm, sketches


def test_sketch_length_gate_handmade(spark):
    """Values 1..10, one group, sub_bits=2: buckets are the value itself
    below 8, then [8,9]->8 and 10->10.  p10 bound = bucket 1, p90 bound
    = bucket 8 (cum 9 of 10), so the gate keeps 1..9 and drops 10."""
    df = spark.createDataFrame([("g", v) for v in range(1, 11)], "grp string, x long")
    got = sorted(
        r.x for r in cur.sketch_length_gate(df, ["grp"], "x", (1, 10), (9, 10)).collect()
    )
    assert got == list(range(1, 10))


def test_curate_corpus_sketch(spark):
    """10 same-length docs + 1 exact dup + 1 huge outlier: the sketch
    gate drops the outlier (its bucket is above the p90 bound), exact
    dedup drops the dup, and the split is deterministic."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [(i, f"{base} tail{chr(97 + i)}") for i in range(10)]
    rows.append((100, rows[0][1]))  # exact duplicate of doc 0
    rows.append((200, " ".join(f"zz{chr(97 + i)} yy{chr(97 + i)}" for i in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in cur.curate_corpus_sketch(docs).collect()}
    assert set(got) == set(range(10))
    assert all(r.split in ("train", "val", "test") for r in got.values())
    again = {r.doc_id: r.split for r in cur.curate_corpus_sketch(docs).collect()}
    assert again == {d: r.split for d, r in got.items()}


def test_bloom_duplicate_probe_rows_no_false_negative(spark):
    """ADVICE r03: duplicate probe rows must not break the no-false-
    negative contract (sum(hit) is compared to count(*), not k)."""
    members = spark.createDataFrame([("a",), ("b",)], "v string")
    bloom = sketches.bloom_build(members, "v", m_bits=256, k_hashes=4)
    probes = spark.createDataFrame([("a",), ("a",), ("c",)], "v string")
    got = {r.v: r.might_contain for r in
           sketches.bloom_might_contain(bloom, probes, "v", m_bits=256, k_hashes=4).collect()}
    assert got["a"] == 1  # true member, duplicated probe rows
    assert set(got) == {"a", "c"}  # one row per distinct item


def test_ivm_negative_count_raises(spark):
    """Retracting a row absent from the snapshot must fail loudly, not
    vanish as a clean delete; on_negative='drop' opts back out."""
    facts = spark.createDataFrame([("x", 5)], "k string, v long")
    snap = ivm.aggregate_snapshot(facts, ["k"], {"sv": F.col("v")})
    bad_delta = spark.createDataFrame(
        [("y", 3, -1)], "k string, v long, op int"
    )
    out = ivm.apply_aggregate_delta(snap, bad_delta, ["k"], {"sv": F.col("v")})
    with pytest.raises(Exception, match="negative maintained count"):
        out.collect()
    dropped = ivm.apply_aggregate_delta(
        snap, bad_delta, ["k"], {"sv": F.col("v")}, on_negative="drop"
    ).collect()
    assert {r.k for r in dropped} == {"x"}


def test_ivm_clean_retraction_still_drops(spark):
    facts = spark.createDataFrame([("x", 5), ("y", 2)], "k string, v long")
    snap = ivm.aggregate_snapshot(facts, ["k"], {"sv": F.col("v")})
    delta = spark.createDataFrame([("y", 2, -1)], "k string, v long, op int")
    got = ivm.apply_aggregate_delta(snap, delta, ["k"], {"sv": F.col("v")}).collect()
    assert {(r.k, r.n, r.sv) for r in got} == {("x", 1, 5)}


def test_session_window_parity(spark, sf_dir):
    """VERDICT r03 #8: the Spark-native session_window sessionizer must
    agree with the hand-rolled prefix-sum twin whenever the event cap
    is not binding (pure gap sessions)."""
    from marketing_attribution_etl_framework__maef_spark import domain
    from marketing_attribution_etl_framework__maef_spark.operators import sessions as sx

    ev = domain.events(spark, sf_dir)
    a = sx.sessionize_batch(ev, gap_minutes=30, max_events=10**9)
    b = sx.sessionize_native(ev, gap_minutes=30)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_session_window_gap_boundary_semantics(spark):
    """Exact-boundary pin: an event exactly gap after its predecessor
    merges in BOTH forms — session_window treats windows touching at a
    point as overlapping (merge on diff <= gap), the same closed
    interval the hand-rolled prefix-sum uses. This equality is what
    makes the blanket parity test above safe on real data."""
    from marketing_attribution_etl_framework__maef_spark.operators import sessions as sx

    rows = [
        (1, "u", "click", "2024-01-01 00:00:00"),
        (2, "u", "view", "2024-01-01 00:30:00"),  # exactly 30 min later
        (3, "u", "click", "2024-01-01 01:00:01"),  # 1s past the gap
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id string, event_type string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = sorted(sx.sessionize_batch(ev, gap_minutes=30, max_events=100).collect(),
                   key=lambda r: r.session_start)
    native = sorted(sx.sessionize_native(ev, gap_minutes=30).collect(),
                    key=lambda r: r.session_start)
    assert [r.n_events for r in batch] == [2, 1]
    assert [(r.session_start, r.session_end, r.n_events, r.channels) for r in batch] == [
        (r.session_start, r.session_end, r.n_events, r.channels) for r in native
    ]


def test_mad_day_outliers_handmade(spark):
    """7 identical days + 1 extreme day in one channel: the extreme day
    flags (median/MAD unmoved by it), the rest do not — and the same
    shape would NOT flag under a mean/std gate distorted by the outlier."""
    from marketing_attribution_etl_framework__maef_spark.operators import anomaly

    rows = [(i, "u", "click", f"2024-01-0{i+1} 08:00:00", 10.0) for i in range(7)]
    rows.append((99, "u", "click", "2024-01-08 08:00:00", 10000.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_day: r for r in anomaly.mad_day_outliers(ev, k=3).collect()}
    assert got["2024-01-08"].is_anomaly == 1
    assert all(r.is_anomaly == 0 for d, r in got.items() if d != "2024-01-08")
    assert got["2024-01-01"].median_cents == 1000
    assert got["2024-01-01"].mad_cents == 0


def test_decayed_daily_sum_handmade(spark):
    """Three consecutive days of 100 cents: day 3's decayed sum is
    100*(2^20 + 2^19 + 2^18); a gap day contributes nothing."""
    from marketing_attribution_etl_framework__maef_spark.operators import timeseries as ts

    rows = [
        (1, "u", "click", "2024-01-01 08:00:00", 1.0),
        (2, "u", "click", "2024-01-02 08:00:00", 1.0),
        (3, "u", "click", "2024-01-03 08:00:00", 1.0),
        (4, "u", "click", "2024-01-05 08:00:00", 1.0),  # gap on the 4th
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_day: r.decay_cents_q20 for r in ts.decayed_daily_sum(ev, 21).collect()}
    q = 1 << 20
    assert got["2024-01-01"] == 100 * q
    assert got["2024-01-02"] == 100 * (q + q // 2)
    assert got["2024-01-03"] == 100 * (q + q // 2 + q // 4)
    # 3rd at d=2, 2nd at d=3, 1st at d=4 — the gap day itself adds 0
    assert got["2024-01-05"] == 100 * (q + q // 4 + q // 8 + q // 16)


def test_budget_allocation_sums_exactly(spark):
    """Hamilton apportionment: a budget indivisible by the shares must
    still sum to the budget exactly, remainder cents going to the
    largest remainders (alphabetical ties)."""
    from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt

    rows = [
        (1, "u", "a_chan", "2024-01-01 08:00:00", 1.0),
        (2, "u", "b_chan", "2024-01-01 08:01:00", 1.0),
        (3, "u", "c_chan", "2024-01-01 08:02:00", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.channel: r.alloc_cents for r in
           rpt.budget_allocation(ev, budget_cents=100).collect()}
    # 100/3 = 33 each, remainder 1; all remainders equal -> alphabetical
    assert got == {"a_chan": 34, "b_chan": 33, "c_chan": 33}
    assert sum(got.values()) == 100


def test_channel_assists_handmade(spark):
    """Journey A: x -> y (y closes, x assists). Journey B: y only
    (y closes). x: touched 1, closed 0, assists 1; y: touched 2,
    closed 2, assists 0."""
    from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt

    j = spark.createDataFrame(
        [
            ("A", "s1", "2024-01-01 08:00:00", "x"),
            ("A", "s2", "2024-01-01 09:00:00", "y"),
            ("B", "s3", "2024-01-02 08:00:00", "y"),
        ],
        "conversion_id string, session_id string, event_ts string, channel_label string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    got = {r.channel_label: r for r in rpt.channel_assists(j).collect()}
    assert (got["x"].n_touched, got["x"].n_closed, got["x"].n_assists) == (1, 0, 1)
    assert (got["y"].n_touched, got["y"].n_closed, got["y"].n_assists) == (2, 2, 0)
    assert got["x"].assist_ratio_q20 == 1 << 20
    assert got["y"].assist_ratio_q20 == 0


def test_window_funnel_anchor_bound(spark):
    """u1 completes view->click within 72h of signup; u2's click lands
    outside the 72h anchor window (though within 72h of the view), so
    u2 stops at stage 2 — the constraint the unbounded funnel misses."""
    from marketing_attribution_etl_framework__maef_spark.operators import funnel as fnl

    rows = [
        (1, "u1", "signup", "2024-01-01 00:00:00"),
        (2, "u1", "view", "2024-01-02 00:00:00"),
        (3, "u1", "click", "2024-01-03 00:00:00"),
        (4, "u2", "signup", "2024-01-01 00:00:00"),
        (5, "u2", "view", "2024-01-03 12:00:00"),
        (6, "u2", "click", "2024-01-04 12:00:00"),  # 84h after signup
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.funnel_stage: r for r in
           fnl.window_funnel(ev, ["signup", "view", "click"], window_hours=72).collect()}
    # u1 reached 3, u2 reached 2; n_reached is cumulative from the top
    assert got[3].n_users == 1 and got[2].n_users == 1
    assert got[2].n_reached == 2 and got[3].n_reached == 1


def test_orc_single_file_roundtrip(spark, tmp_path):
    """The ORC sink writes ONE file and round-trips schema + values."""
    from marketing_attribution_etl_framework__maef_spark.sources.io import write_orc_single

    df = spark.createDataFrame(
        [("a", 1.25), ("b", -3.5), ("c", 0.0)], "k string, v double"
    )
    path = str(tmp_path / "t.orc")
    write_orc_single(df, path)
    import os

    assert os.path.isfile(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_hybrid_rrf_handmade(spark):
    """Two 2-d vectors + a query equal to one of them: the matching
    vector must rank 1 under fusion, and its score must be exactly
    1/61 + 1/61 (rank 1 in both lists)."""
    from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    q = corpus.filter("vec_id = 0")
    got = sorted(
        sim.hybrid_rrf_topk(corpus, q, k_list=3, k_out=3).collect(),
        key=lambda r: r.rank,
    )
    assert got[0].vec_id == 0 and got[0].rank == 1
    import math

    assert got[0].rrf_q20 == math.floor((2.0 / 61.0) * 1048576 + 0.5)


def test_user_gaps_single_event(spark):
    """A single-event user emits gap 0 and is not 'reactivated'."""
    from marketing_attribution_etl_framework__maef_spark import domain  # noqa: F401
    import __spark_entry__ as entrymod

    ev = spark.createDataFrame(
        [(1, "solo", "click", "2024-01-01 08:00:00", 1.0),
         (2, "buzzy", "click", "2024-01-01 08:00:00", 1.0),
         (3, "buzzy", "view", "2024-02-01 08:00:00", 1.0)],
        "event_id long, user_id string, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import functions as _F

    gaps = ev.select(
        "user_id",
        _F.coalesce(
            _F.expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)"),
            _F.lit(0),
        ).cast("long").alias("_gap"),
    ).groupBy("user_id").agg(
        _F.max("_gap").alias("max_gap"),
        (_F.max("_gap") > _F.lit(7 * 86400 * 1_000_000)).cast("long").alias("reactivated"),
    )
    got = {r.user_id: r for r in gaps.collect()}
    assert got["solo"].max_gap == 0 and got["solo"].reactivated == 0
    assert got["buzzy"].reactivated == 1


def test_fuzzy_band_join_is_hash_join(spark):
    """ADVICE r03: the length band must be an equi hash join, not a
    BroadcastNestedLoopJoin over all |dirty| x |canonical| pairs."""
    dirty = spark.createDataFrame(
        [("payperclick",), ("p p c ads",), ("emali",), ("zzzzzzzzzzzzzz",)],
        "channel string",
    )
    canon = spark.createDataFrame(
        [("ppc",), ("email",), ("payperclick",)], "name string"
    )
    out = fuzzy.fuzzy_best_match(dirty, canon, "channel", "name", max_distance=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got = {r.dirty: (r.canonical, r.distance) for r in out.collect()}
    assert got["payperclick"] == ("payperclick", 0)
    assert got["emali"] == ("email", 2)
    assert "zzzzzzzzzzzzzz" not in got
