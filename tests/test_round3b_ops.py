"""Unit tests for the round-3b operators (L70-L79): HLL register
sketch, z-score day outliers, systematic weighted sampling,
containment near-dup pairs, dormant users, and invariant checks on the
relational kernels — each on a handmade fixture with hand-computed
expectations."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from marketing_attribution_etl_framework__maef_spark.llm.curation import systematic_weighted_sample
from marketing_attribution_etl_framework__maef_spark.llm.dedup import containment_pairs
from marketing_attribution_etl_framework__maef_spark.operators.anomaly import zscore_day_outliers
from marketing_attribution_etl_framework__maef_spark.operators.reporting import dormant_users
from marketing_attribution_etl_framework__maef_spark.operators.sketches import hll_register_summary


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# HLL registers
# ---------------------------------------------------------------------------


def _hll_expected(values):
    regs: dict[int, int] = {}
    for v in set(values):
        h = _h60(str(v))
        reg, w = h % 256, h // 256
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    hit = len(regs)
    s53 = sum(1 << (53 - r) for r in regs.values()) + (256 - hit) * (1 << 53)
    return hit, sum(regs.values()), s53


def test_hll_registers_match_reference_bits(spark):
    vals = [f"u{i}" for i in range(40)] * 3  # duplicates must not matter
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    row = hll_register_summary(df, ["grp"], "v").collect()[0]
    hit, srho, s53 = _hll_expected(vals)
    assert row["n_registers_hit"] == hit
    assert row["sum_rho"] == srho
    assert row["harmonic_s53"] == s53


def test_hll_estimate_accuracy_band(spark):
    n = 3000
    df = spark.createDataFrame([("g", f"user-{i}") for i in range(n)], "grp string, v string")
    row = hll_register_summary(df, ["grp"], "v").collect()[0]
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * (1 << 53) / row["harmonic_s53"]
    # standard error 1.04/sqrt(256) = 6.5%; 3 sigma band
    assert abs(est - n) / n < 0.20


def test_hll_mergeability_by_cellwise_max(spark):
    # sketch(A ∪ B) == cellwise-max merge of sketch(A) and sketch(B):
    # verified via the summary of the union equalling the summary
    # computed from the python-side merged register tables
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(500)] + a[:100]
    df = spark.createDataFrame(
        [("u", v) for v in a + b], "grp string, v string"
    )
    row = hll_register_summary(df, ["grp"], "v").collect()[0]
    hit, srho, s53 = _hll_expected(a + b)
    assert (row["n_registers_hit"], row["sum_rho"], row["harmonic_s53"]) == (hit, srho, s53)


# ---------------------------------------------------------------------------
# z-score day outliers
# ---------------------------------------------------------------------------


def _events_with_daily_counts(spark, counts, channel="click"):
    rows = []
    eid = 0
    for day, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0), eid % 7, channel, 1.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_zscore_flags_the_spike_day(spark):
    counts = [10] * 10 + [100]
    ev = _events_with_daily_counts(spark, counts)
    out = {r["event_day"]: r for r in zscore_day_outliers(ev).collect()}
    assert len(out) == 11
    spike = out["2024-01-11"]
    # hand-computed: d=11, S=200, Q=10*10^2+100^2=11000; dev=900
    assert spike["n_events"] == 100
    assert spike["z2_num"] == 900 * 900 * 10
    assert spike["z2_den"] == 4 * 11 * (11 * 11000 - 200 * 200)
    assert spike["is_anomaly"] == 1
    assert all(r["is_anomaly"] == 0 for d, r in out.items() if d != "2024-01-11")


def test_zscore_uniform_series_has_no_anomaly(spark):
    ev = _events_with_daily_counts(spark, [5] * 8)
    rows = zscore_day_outliers(ev).collect()
    assert len(rows) == 8
    assert all(r["is_anomaly"] == 0 and r["z2_num"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# systematic weighted sample
# ---------------------------------------------------------------------------


def _wsamp_reference(docs, k):
    """Single-pass python reference of the same grid sampling."""
    keyed = [
        (_h60(f"{d}|wsamp") % 256, _h60(f"{d}|wsamp"), d, s, w) for d, s, w in docs
    ]
    keyed.sort()
    total = sum(w for *_rest, w in keyed)
    out = {}
    c = 0
    for _b, _h, d, s, w in keyed:
        lo, c = c, c + w
        mult = (c * k) // total - (lo * k) // total
        if mult > 0:
            out[d] = (s, w, mult)
    return out


def test_weighted_sample_matches_reference_and_sums_to_k(spark):
    docs = [(i, f"s{i % 3}", 50 + 13 * (i % 7)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, source string, n_chars long")
    k = 10
    got = {
        r["doc_id"]: (r["source"], r["weight"], r["mult"])
        for r in systematic_weighted_sample(df, k=k).collect()
    }
    assert got == _wsamp_reference(docs, k)
    assert sum(m for *_x, m in got.values()) == k


def test_weighted_sample_heavy_doc_gets_proportional_multiplicity(spark):
    docs = [(0, "big", 9000)] + [(i, "small", 100) for i in range(1, 11)]
    df = spark.createDataFrame(docs, "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: r["mult"] for r in systematic_weighted_sample(df, k=10).collect()}
    assert got[0] >= 8  # 90% of the weight -> >= 8 of 10 grid points
    assert sum(got.values()) == 10


def test_weighted_sample_is_deterministic(spark):
    docs = [(i, "s", 10 + i) for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, source string, n_chars long")
    a = sorted(map(tuple, systematic_weighted_sample(df, k=5).collect()))
    b = sorted(map(tuple, systematic_weighted_sample(df, k=5).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_subset_copy_jaccard_misses(spark):
    # doc 1 is fully contained in doc 2 (which is 3x larger):
    # containment(1 in 2) = 1.0 but Jaccard ~ 1/3 — below the usual
    # 0.3 Jaccard gate at which ngram_jaccard_pairs starts firing.
    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = small + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, small, "en"), (2, big, "en"), (3, "totally different text here now", "en")],
        "doc_id long, text string, lang string",
    )
    rows = containment_pairs(docs, cont_num=4, cont_den=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["contained_a"] == 1 and r["contained_b"] == 0
    assert r["inter_size"] == r["size_a"]  # full containment


def test_containment_blocks_by_lang(spark):
    t = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, t, "en"), (2, t, "de")], "doc_id long, text string, lang string"
    )
    assert containment_pairs(docs).count() == 0


# ---------------------------------------------------------------------------
# dormant users
# ---------------------------------------------------------------------------


def test_dormant_users_window_and_last_touch(spark):
    mk = lambda eid, day, uid, typ: (eid, dt.datetime(2024, 1, day, 10, 0, eid), uid, typ, 1.0)
    ev = spark.createDataFrame(
        [
            mk(1, 20, 1, "click"),      # u1: active + purchased in window
            mk(2, 21, 1, "purchase"),
            mk(3, 20, 2, "view"),       # u2: dormant, last touch = signup
            mk(4, 22, 2, "signup"),
            mk(5, 2, 3, "click"),       # u3: only active before cutoff
            mk(6, 21, 4, "purchase"),   # u4: purchase only -> not a session user
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = dormant_users(ev, "2024-01-15").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["last_channel"] == "signup"
    assert r["n_users"] == 1 and r["n_sessions"] == 2


def test_dormant_users_tie_breaks_on_event_id(spark):
    t = dt.datetime(2024, 1, 20, 10, 0, 0)
    ev = spark.createDataFrame(
        [(1, t, 1, "click", 1.0), (2, t, 1, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = dormant_users(ev, "2024-01-15").collect()
    assert rows[0]["last_channel"] == "view"  # higher event_id wins the tie


# ---------------------------------------------------------------------------
# relational kernels — structural invariants at the smoke SF
# (value-level correctness is the DuckDB oracle's job)
# ---------------------------------------------------------------------------


def test_rel_market_share_shares_sum_below_one(spark, sf_dir):
    rows = entrymod.q_rel_market_share(spark, sf_dir).collect()
    assert rows, "ASIA region must have revenue"
    total_q20 = sum(r["share_q20"] for r in rows)
    # floor division: sum in (2^20 - n_rows, 2^20]
    assert (1 << 20) - len(rows) < total_q20 <= (1 << 20)


def test_rel_customer_distribution_accounts_for_every_customer(spark, sf_dir):
    from marketing_attribution_etl_framework__maef_spark import domain

    rows = entrymod.q_rel_customer_distribution(spark, sf_dir).collect()
    n_cust = domain.load_table(spark, sf_dir, "customer").count()
    n_orders = domain.load_table(spark, sf_dir, "orders").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders


def test_rel_top_supplier_is_the_argmax(spark, sf_dir):
    rows = entrymod.q_rel_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r["revenue_e4"] for r in rows}) == 1


def test_rel_order_priority_bounded_by_window_orders(spark, sf_dir):
    from marketing_attribution_etl_framework__maef_spark import domain

    rows = entrymod.q_rel_order_priority(spark, sf_dir).collect()
    in_window = (
        domain.load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01").cast("date"))
        )
        .count()
    )
    assert 0 < sum(r["n_orders"] for r in rows) <= in_window


def test_rel_nation_margin_broadcasts_the_dimensions(spark, sf_dir):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entrymod.q_rel_nation_margin(spark, sf_dir).explain(mode="simple")
    assert buf.getvalue().count("BroadcastHashJoin") >= 2  # part + supplier×nation


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import bloom_build, bloom_might_contain

    vals = spark.createDataFrame([(f"v{i}",) for i in range(500)], "v string")
    bloom = bloom_build(vals, "v")
    flags = bloom_might_contain(bloom, vals, "v").collect()
    assert len(flags) == 500
    assert all(r["might_contain"] == 1 for r in flags)


def test_bloom_false_positive_rate_in_band(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import bloom_build, bloom_might_contain

    ins = spark.createDataFrame([(f"in{i}",) for i in range(500)], "v string")
    out = spark.createDataFrame([(f"out{i}",) for i in range(1000)], "v string")
    bloom = bloom_build(ins, "v")
    fp = sum(r["might_contain"] for r in bloom_might_contain(bloom, out, "v").collect())
    # theoretical FPR for n=500, m=8192, k=4 is ~0.2%; allow 2%
    assert fp <= 20


def test_bloom_merge_equals_union_build(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import bloom_build, bloom_merge

    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "v string")
    merged = {
        (r["word_idx"], r["bits"]) for r in bloom_merge(bloom_build(a, "v"), bloom_build(b, "v")).collect()
    }
    direct = {(r["word_idx"], r["bits"]) for r in bloom_build(a.union(b), "v").collect()}
    assert merged == direct


def test_bloom_rejects_bad_width(spark):
    import pytest as _pytest

    from marketing_attribution_etl_framework__maef_spark.operators.sketches import bloom_build

    df = spark.createDataFrame([("x",)], "v string")
    with _pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=0)


# ---------------------------------------------------------------------------
# time-spine gap filling
# ---------------------------------------------------------------------------


def test_fill_daily_gaps_zero_and_ffill(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.timeseries import fill_daily_gaps

    facts = spark.createDataFrame(
        [
            ("a", "2024-01-01", 5, 100),
            ("a", "2024-01-03", 7, 130),
            ("b", "2024-01-02", 1, 10),
        ],
        "channel string, day string, n long, level long",
    )
    out = {
        (r["channel"], r["day"]): (r["n"], r["level"])
        for r in fill_daily_gaps(
            facts, ["channel"], "day", "2024-01-01", "2024-01-04",
            zero_cols=["n"], ffill_cols=["level"],
        ).collect()
    }
    assert len(out) == 8  # 2 channels x 4 days, dense
    assert out[("a", "2024-01-02")] == (0, 100)   # zero-fill + carry
    assert out[("a", "2024-01-03")] == (7, 130)
    assert out[("a", "2024-01-04")] == (0, 130)   # carried forward
    assert out[("b", "2024-01-01")] == (0, None)  # before first obs
    assert out[("b", "2024-01-04")] == (0, 10)


def test_day_spine_is_inclusive_and_dense(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.timeseries import day_spine

    keys = spark.createDataFrame([("x",), ("y",)], "k string")
    rows = day_spine(keys, "2024-02-27", "2024-03-02").collect()
    assert len(rows) == 2 * 5  # leap-year Feb 29 included
    days = sorted({r["day"] for r in rows})
    assert days == ["2024-02-27", "2024-02-28", "2024-02-29", "2024-03-01", "2024-03-02"]


# ---------------------------------------------------------------------------
# fuzzy best match
# ---------------------------------------------------------------------------


def test_fuzzy_best_match_picks_min_distance(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.fuzzy import fuzzy_best_match

    dirty = spark.createDataFrame(
        [("payperclick",), ("e-mail",), ("zzzzz",)], "name string"
    )
    canon = spark.createDataFrame(
        [("pay-per-click",), ("email",), ("affiliate",)], "channel string"
    )
    got = {
        r["dirty"]: (r["canonical"], r["distance"])
        for r in fuzzy_best_match(dirty, canon, "name", "channel", max_distance=3).collect()
    }
    assert got["payperclick"] == ("pay-per-click", 2)
    assert got["e-mail"] == ("email", 1)
    assert "zzzzz" not in got  # nothing within budget


def test_fuzzy_best_match_tie_breaks_alphabetically(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.fuzzy import fuzzy_best_match

    dirty = spark.createDataFrame([("ac",)], "name string")
    canon = spark.createDataFrame([("ab",), ("aa",)], "channel string")  # both distance 1
    rows = fuzzy_best_match(dirty, canon, "name", "channel").collect()
    assert rows[0]["canonical"] == "aa"


def test_fuzzy_length_band_excludes_impossible_pairs(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.fuzzy import fuzzy_best_match

    dirty = spark.createDataFrame([("ab",)], "name string")
    canon = spark.createDataFrame([("abcdefgh",)], "channel string")
    # length gap 6 > max_distance 3: blocked before any comparison
    assert fuzzy_best_match(dirty, canon, "name", "channel", max_distance=3).count() == 0


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------


def _ivm_mod():
    from marketing_attribution_etl_framework__maef_spark.operators import ivm

    return ivm


def test_ivm_matches_recompute_with_inserts_deletes_updates(spark):
    ivm = _ivm_mod()
    old = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "g string, x long"
    )
    sum_cols = {"sx": F.col("x")}
    base = ivm.aggregate_snapshot(old, ["g"], sum_cols)
    # delete one 'a' row; update the 'b' row 5 -> 9 (retract + insert);
    # delete ALL of 'c' (group must drop); insert a brand-new group 'd'
    delta = spark.createDataFrame(
        [
            ("a", 10, -1),
            ("b", 5, -1),
            ("b", 9, 1),
            ("c", 7, -1),
            ("d", 3, 1),
        ],
        "g string, x long, op int",
    )
    got = {
        r["g"]: (r["n"], r["sx"])
        for r in ivm.apply_aggregate_delta(base, delta, ["g"], sum_cols).collect()
    }
    assert got == {"a": (1, 20), "b": (1, 9), "d": (1, 3)}  # c dropped


def test_ivm_empty_delta_is_identity(spark):
    ivm = _ivm_mod()
    old = spark.createDataFrame([("a", 1), ("b", 2)], "g string, x long")
    sum_cols = {"sx": F.col("x")}
    base = ivm.aggregate_snapshot(old, ["g"], sum_cols)
    empty = spark.createDataFrame([], "g string, x long, op int")
    got = sorted(
        map(tuple, ivm.apply_aggregate_delta(base, empty, ["g"], sum_cols).collect())
    )
    assert got == sorted(map(tuple, base.collect()))


# ---------------------------------------------------------------------------
# columnar source formats beyond parquet
# ---------------------------------------------------------------------------


def test_orc_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    # the engine's storage layer is parquet-first, but Spark's ORC
    # source works unchanged on the same DataFrames — pin the roundtrip
    # so a format swap (or a mixed lake) stays a config choice, not a
    # code change
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 0.0)],
        "id long, s string, v double",
    )
    path = str(tmp_path / "t.orc")
    df.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# pagerank over the channel handoff graph
# ---------------------------------------------------------------------------


def _mk_journeys(spark, chains):
    """chains: list of channel sequences; one conversion each."""
    rows = []
    for ci, chain in enumerate(chains):
        for si, ch in enumerate(chain):
            rows.append((f"c{ci}", f"s{ci}_{si}", dt.datetime(2024, 1, 1, 0, 0, si), ch))
    return spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts timestamp, channel_label string"
    )


def test_pagerank_hub_outranks_leaves_and_mass_is_conserved(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.markov import pagerank_channels

    # every journey hands off INTO 'hub': hub must collect the most rank
    chains = [["a", "hub"], ["b", "hub"], ["c", "hub"], ["hub", "a"]]
    pr = {r["channel"]: r["pagerank_q20"] for r in pagerank_channels(_mk_journeys(spark, chains)).collect()}
    assert set(pr) == {"a", "b", "c", "hub"}
    assert pr["hub"] == max(pr.values())
    assert pr["hub"] > pr["b"] and pr["hub"] > pr["c"]
    # q20 mass conservation within per-term floor loss: sum <= Q20,
    # and not more than (#nodes + #edges) ulps short per iteration
    assert 0 < sum(pr.values()) <= (1 << 20)


def test_pagerank_matches_integer_reference(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.markov import pagerank_channels

    chains = [["x", "y"], ["y", "x"], ["x", "z"]]
    got = {r["channel"]: r["pagerank_q20"] for r in pagerank_channels(_mk_journeys(spark, chains), iterations=5).collect()}
    # independent integer replica of the documented recurrence
    edges = {("x", "y"): 1, ("y", "x"): 1, ("x", "z"): 1}
    nodes = ["x", "y", "z"]
    deg = {"x": 2, "y": 1, "z": 0}
    Q = 1 << 20
    pr = {v: Q // 3 for v in nodes}
    for _ in range(5):
        dang = sum(p for v, p in pr.items() if deg[v] == 0)
        nxt = {v: (3 * Q) // (20 * 3) + (17 * dang) // (20 * 3) for v in nodes}
        for (s, d), n in edges.items():
            nxt[d] += (17 * pr[s] * n) // (20 * deg[s])
        pr = nxt
    assert got == pr


def test_pagerank_empty_graph_is_empty(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.markov import pagerank_channels

    # single-touch journeys only: every edge is (start)->ch->(conversion),
    # so the channel->channel graph is empty
    chains = [["a"], ["b"]]
    assert pagerank_channels(_mk_journeys(spark, chains)).count() == 0


# ---------------------------------------------------------------------------
# native streaming dedup (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------


def test_streaming_dedup_within_watermark_matches_batch_distinct(spark, tmp_path):
    # the engine's incremental dedup (L52) is foreachBatch-based so it
    # can anti-join a persisted corpus store; Spark's NATIVE stateful
    # dedup operator covers the simpler stream-internal case — pin the
    # availableNow run against the batch distinct (the same
    # streaming/batch-parity oracle pattern as maef_stream_*).
    src = str(tmp_path / "src")
    rows = [(i % 7, dt.datetime(2024, 1, 1, 0, i), f"v{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    df.write.parquet(src)
    stream = (
        spark.readStream.schema("k long, ts timestamp, v string").parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    name = "dedup_wm_test"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["k"] for r in spark.table(name).collect())
    spark.catalog.dropTempView(name)
    assert got == sorted(r["k"] for r in df.select("k").distinct().collect())


# ---------------------------------------------------------------------------
# log-histogram quantile sketch
# ---------------------------------------------------------------------------


def test_log_bucket_bounds_and_quantile_error(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import (
        histogram_quantile_bounds,
        log_histogram,
    )

    vals = list(range(1, 2001))  # uniform 1..2000, true p50=1000, p90=1800
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    hist = log_histogram(df, ["grp"], "v", sub_bits=2)
    # bucket count is bounded: ~4 buckets per octave, 11 octaves here
    assert hist.count() <= 64
    row = histogram_quantile_bounds(
        hist, ["grp"], [("p50_lb", 1, 2), ("p90_lb", 9, 10)]
    ).collect()[0]
    assert row["n_values"] == 2000
    # lower bound within one bucket width (25% relative at sub_bits=2)
    assert 750 <= row["p50_lb"] <= 1000
    assert 1350 <= row["p90_lb"] <= 1800


def test_log_histogram_merge_is_count_sum(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import log_histogram

    a = spark.createDataFrame([("g", v) for v in range(1, 100)], "grp string, v long")
    b = spark.createDataFrame([("g", v) for v in range(50, 300)], "grp string, v long")
    merged = (
        log_histogram(a, ["grp"], "v")
        .unionByName(log_histogram(b, ["grp"], "v"))
        .groupBy("grp", "bucket_lb")
        .agg(F.sum("c").alias("c"))
    )
    direct = log_histogram(a.unionByName(b), ["grp"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_log_bucket_small_values_are_exact(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import log_histogram

    df = spark.createDataFrame([("g", v) for v in (0, 1, 2, 3, 4, 5, 6, 7)], "grp string, v long")
    lbs = sorted(r["bucket_lb"] for r in log_histogram(df, ["grp"], "v").collect())
    assert lbs == [0, 1, 2, 3, 4, 5, 6, 7]  # below 2^3: every value its own bucket


# ---------------------------------------------------------------------------
# CUBE grouping sets + functional-dependency profiling
# ---------------------------------------------------------------------------


def test_channel_cube_margins_are_consistent(spark, sf_dir):
    rows = entrymod.q_channel_cube(spark, sf_dir).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}  # all four grouping sets present
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    detail_n = sum(r["n_sessions"] for r in rows if r["gid"] == 0)
    chan_n = sum(r["n_sessions"] for r in rows if r["gid"] == 1)
    month_n = sum(r["n_sessions"] for r in rows if r["gid"] == 2)
    assert detail_n == chan_n == month_n == grand[0]["n_sessions"]
    assert sum(r["cents"] for r in rows if r["gid"] == 0) == grand[0]["cents"]


def test_fd_profile_detects_violations(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quality import functional_dependency_profile

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    r = functional_dependency_profile(df, ["k"], "v").collect()[0]
    assert r["n_groups"] == 3
    assert r["n_violating_groups"] == 1  # k=2 maps to two values
    assert r["max_rhs_per_group"] == 2


def test_fd_profile_clean_dependency(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quality import functional_dependency_profile

    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k long, v string")
    r = functional_dependency_profile(df, ["k"], "v").collect()[0]
    assert (r["n_groups"], r["n_violating_groups"], r["max_rhs_per_group"]) == (10, 0, 1)


# ---------------------------------------------------------------------------
# tf-idf cosine pairs
# ---------------------------------------------------------------------------


def test_tfidf_identical_docs_reach_cosine_one(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.text import tfidf_cosine_pairs

    t = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, t, "en"), (2, t, "en"), (3, "omega psi chi phi upsilon tau", "en")],
        "doc_id long, text string, lang string",
    )
    rows = tfidf_cosine_pairs(docs, cos_num=3, cos_den=5, max_df_num=1, max_df_den=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # identical weight vectors: dot^2 == norm2_a * norm2_b exactly
    assert r["dot"] * r["dot"] == r["norm2_a"] * r["norm2_b"]


def test_tfidf_stopword_pruning_drops_ubiquitous_terms(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.text import tfidf_cosine_pairs

    # at max_df 1/2: 'common' (df = 12 of 12) is pruned while
    # 'shared' (df = 2) survives — the only overlap between docs 1, 2
    docs = spark.createDataFrame(
        [(1, "common shared aaa1 bbb1", "en"), (2, "common shared aaa2 bbb2", "en")]
        + [(i, f"common xx{i} yy{i} zz{i}", "en") for i in range(3, 13)],
        "doc_id long, text string, lang string",
    )
    pairs = tfidf_cosine_pairs(docs, cos_num=1, cos_den=5, max_df_num=1, max_df_den=2).collect()
    hit = {(r["doc_a"], r["doc_b"]): r for r in pairs}
    assert (1, 2) in hit
    r = hit[(1, 2)]
    # one shared surviving term of tf=1: dot = ibits('shared')^2
    n, df_shared = 12, 2
    ibits = (n // df_shared).bit_length()
    assert r["dot"] == ibits * ibits


# ---------------------------------------------------------------------------
# composition-query invariants (model comparison, overlap, confusion)
# ---------------------------------------------------------------------------


def test_model_comparison_credit_conserves_per_model(spark, sf_dir):
    rows = entrymod.q_model_comparison(spark, sf_dir).collect()
    models = {r["model"] for r in rows}
    assert models == {"linear", "first_touch", "last_touch", "u_shaped"}
    n_conv = (
        entrymod.q_journey_entries(spark, sf_dir)
        .select("conversion_id")
        .distinct()
        .count()
    )
    q = 1 << 20
    for m in models:
        sub = [r for r in rows if r["model"] == m]
        credit = sum(r["credit_q20"] for r in sub)
        touches = sum(r["n_touches"] for r in sub)
        # each conversion's weights sum to 1; per-row q20 floors lose
        # at most 1 ulp per touch and round-half-up can add the same
        assert n_conv * q - touches <= credit <= n_conv * q + touches


def test_channel_overlap_bounded_by_audience_sizes(spark, sf_dir):
    rows = entrymod.q_channel_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_common"] <= min(r["size_a"], r["size_b"])
        assert r["chan_a"] < r["chan_b"]


def test_lang_confusion_accounts_for_every_document(spark, sf_dir):
    from marketing_attribution_etl_framework__maef_spark import domain

    rows = entrymod.q_lang_confusion(spark, sf_dir).collect()
    n_docs = domain.load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
