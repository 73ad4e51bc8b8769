"""Round-7 operator pins: streaming CDC chunk-store maintenance
(merge-law parity with the batch chunk table, multi-batch forced) and
the ANN recall-drift split — each on a handmade fixture with the
expected answer derived by hand or by the batch twin."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import schemas
from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim
from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

Q20 = 1 << 20


def test_incremental_chunk_store_matches_batch(spark, tmp_path):
    """The streamed store must equal the batch chunk table aggregated
    under the same merge law, regardless of micro-batch slicing —
    forced here by writing each source to its OWN parquet file and
    streaming with maxFilesPerTrigger=1 (one batch per file)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 10),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 10),
        (3, "totally different words compose this other document body here", "en", "book", 10),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "book", 10),
    ]
    docs = spark.createDataFrame(rows, schemas.DOCUMENTS)
    src_dir = os.path.join(str(tmp_path), "docs")
    # one file per source -> at least 2 micro-batches
    docs.filter(F.col("source") == "web").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "part_web")
    )
    docs.filter(F.col("source") == "book").coalesce(1).write.mode("append").parquet(
        os.path.join(src_dir, "part_book")
    )
    root = os.path.join(str(tmp_path), "store")
    shutil.rmtree(root, ignore_errors=True)
    drv = inc.IncrementalChunkStore(spark, root)
    stream = inc.stream_documents(spark, os.path.join(src_dir, "*", "*.parquet"))
    drv.start(stream).awaitTermination()
    got = sorted(map(tuple, drv.store().collect()))

    # batch twin: same merge law over the full chunk table
    want = sorted(
        map(
            tuple,
            dd.cdc_doc_chunks(docs)
            .groupBy("chunk_md5")
            .agg(
                F.min(F.struct("doc_id", "source")).alias("_o"),
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            )
            .select(
                "chunk_md5",
                F.col("_o.doc_id").alias("owner_doc"),
                F.col("_o.source").alias("owner_source"),
                "n_occurrences",
            )
            .collect(),
        )
    )
    assert got == want and got
    # ownership sanity: every chunk of doc 2/4 (copies of doc 1) is
    # owned by doc 1 / source web
    owners = {r[0]: (r[1], r[2], r[3]) for r in got}
    copy_chunks = {
        r["chunk_md5"]
        for r in dd.cdc_doc_chunks(docs).filter(F.col("doc_id") == 2).collect()
    }
    for c in copy_chunks:
        assert owners[c][0] == 1 and owners[c][1] == "web" and owners[c][2] >= 3


def test_ann_recall_drift_split(spark):
    """Even half contains the exact neighbors of the query, odd half
    only weaker ones: recall@k must be perfect on half 0 and the
    audit must still emit a row for half 1."""
    rows = [
        (0, [1.0, 0.0]),  # centroid seed (vec_id < 2 used as cents here)
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),   # even: close to query
        (4, [0.8, 0.2]),   # even: close
        (3, [0.1, 0.9]),   # odd: far
        (5, [0.2, 0.8]),   # odd: far
        (7, [1.0, 0.05]),  # the query itself (odd)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = e.filter(F.col("vec_id") == 7)
    cents = e.filter(F.col("vec_id") < 2)
    halves = {}
    for h in (0, 1):
        aud = sim.ann_recall_audit(
            e.filter(F.col("vec_id") % 2 == h), qs, cents, k=2, probe=2
        ).collect()
        halves[h] = {r["query_id"]: r["n_hits"] for r in aud}
    # probe=2 covers both clusters -> approx == truth on both halves
    assert halves[0] == {7: 2} and halves[1] == {7: 2}


def test_principal_direction_integer_power_iteration(spark):
    """Vectors concentrated on the x-axis: the dominant direction must
    be ~(1, 0) with the leading component exactly Q20 (L-infinity
    normalization) and a positive sign even when every input points
    the NEGATIVE way (sign pinned by the first nonzero component)."""
    from marketing_attribution_etl_framework__maef_spark.llm import embquality as emq

    rows = [(i, [-1.0, 0.01 * (i % 3 - 1)]) for i in range(10)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["pos"]: r["comp_q20"] for r in emq.principal_direction(e, rounds=6).collect()}
    assert set(out) == {1, 2}
    assert out[1] == Q20  # dominant axis, sign flipped positive
    assert abs(out[2]) < Q20 // 50

    # replica check on a tiny asymmetric cloud: mirror the integer
    # recurrence in-test and demand bit-equality
    rows2 = [(0, [3.0, 1.0]), (1, [1.0, 2.0]), (2, [2.0, 2.0])]
    e2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    got = {r["pos"]: r["comp_q20"] for r in emq.principal_direction(e2, rounds=6).collect()}
    import math

    Qc = 1 << 20
    qv = []
    for _, v in rows2:
        n = math.sqrt(sum(x * x for x in v))
        qv.append([math.floor(x / n * Qc + 0.5) for x in v])
    A = [[sum(q[i] * q[j] for q in qv) for j in range(2)] for i in range(2)]

    def tdiv(a, b):
        s = -1 if (a < 0) != (b < 0) else 1
        return s * (abs(a) // abs(b))

    v = [Qc, Qc]
    for _ in range(6):
        u = [A[i][0] * v[0] + A[i][1] * v[1] for i in range(2)]
        m = max(abs(x) for x in u)
        v = [tdiv(x * Qc, m) for x in u]
    if next((x for x in v if x != 0), 0) < 0:
        v = [-x for x in v]
    assert got == {1: v[0], 2: v[1]}


def test_share_of_voice_weekly_shares(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import planning as pln

    # week of 2024-01-01 (Mon) and week of 2024-01-08
    rows = [
        (0, dt.datetime(2024, 1, 1, 9), 1, "a", 3.0),
        (1, dt.datetime(2024, 1, 2, 9), 2, "b", 1.0),
        (2, dt.datetime(2024, 1, 8, 9), 3, "a", 1.0),
        (3, dt.datetime(2024, 1, 9, 9), 4, "b", 3.0),
        (4, dt.datetime(2024, 1, 8, 9), 5, "purchase", 9.0),  # excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r["week"], r["channel"]): r for r in pln.share_of_voice(ev).collect()}
    w1 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 5)).days // 7
    assert set(out) == {(w1, "a"), (w1, "b"), (w1 + 1, "a"), (w1 + 1, "b")}
    q = lambda c, t: (2 * c * Q20 + t) // (2 * t)
    assert out[(w1, "a")]["share_q20"] == q(300, 400)
    assert out[(w1, "a")]["delta_q20"] is None  # first observed week
    assert out[(w1 + 1, "a")]["share_q20"] == q(100, 400)
    assert out[(w1 + 1, "a")]["delta_q20"] == q(100, 400) - q(300, 400)


def test_length_drift_chi2_buckets(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    # even ids (baseline): 4 docs of norm length 5; odd ids (current):
    # 2 of length 5, 2 of length 33 (different log bucket)
    rows = (
        [(2 * i, "abcde") for i in range(4)]
        + [(2 * i + 1, "abcde") for i in range(2)]
        + [(2 * i + 1, "x" * 33) for i in range(2, 4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket_lb"]: r for r in txt.length_drift(docs).collect()}
    b5 = 5  # values below 2^(sub_bits+1)=8 are their own bucket
    b33 = 32  # 33 -> keep top 3 bits -> 32
    assert set(out) == {b5, b33}
    assert out[b5]["n_base"] == 4 and out[b5]["n_cur"] == 2
    # new bucket: NULL contribution, its existence is the alarm
    assert out[b33]["n_base"] == 0 and out[b33]["chi2_contrib_q20"] is None
    # chi2 for the baseline-present bucket: o=2, m_i=4, n=2, m=4 ->
    # (2*4 - 2*4)^2 / ... = 0
    assert out[b5]["chi2_contrib_q20"] == 0


def test_simhash_hamming_histogram_counts(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd2

    en = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, en), (2, en), (3, en + " tail"), (4, "entirely different other words")],
        "doc_id long, text string",
    )
    hist = {r["hamming"]: r["n_pairs"] for r in dd2.simhash_hamming_histogram(docs).collect()}
    # identical docs -> at least the (1,2) pair at distance 0
    assert hist.get(0, 0) >= 1
    # histogram mass equals the unthresholded candidate pair count
    pairs = dd2.simhash_candidates(dd2.simhash(docs))
    assert sum(hist.values()) == pairs.count()


def test_stream_funnel_first_occurrence_semantics(spark, tmp_path):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark import schemas
    from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

    t = lambda m: dt.datetime(2024, 1, 1, 9, m)
    rows = [
        # u1 completes signup -> view strictly in first-occurrence order
        (0, t(0), 1, "signup", 0.0, None),
        (1, t(1), 1, "view", 0.0, None),
        # u2: first view BEFORE first signup -> stage stops at 1
        (2, t(0), 2, "view", 0.0, None),
        (3, t(1), 2, "signup", 0.0, None),
        (4, t(2), 2, "view", 0.0, None),  # a later view exists, still stage 1
        # u3: click only -> has step events but never step 1 -> stage 0
        (5, t(0), 3, "click", 0.0, None),
    ]
    ev = spark.createDataFrame(rows, schemas.EVENTS)
    p = os.path.join(str(tmp_path), "ev")
    ev.coalesce(1).write.mode("overwrite").parquet(p)
    stream = inc.stream_events_nanos(spark, os.path.join(p, "*.parquet"))
    state = inc.funnel_first_touch_state(stream, ["signup", "view", "click", "purchase"])
    name = "t_stream_funnel"
    q = (
        state.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        r["funnel_stage"]: (r["n_users"], r["n_reached"])
        for r in inc.funnel_from_first_touch(spark.table(name), 4).collect()
    }
    spark.catalog.dropTempView(name)
    # u3 stage 0, u2 stage 1, u1 stage 2
    assert out == {0: (1, 3), 1: (1, 2), 2: (1, 1)}


def test_holt_winters_integer_recursion(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import timeseries as tsr

    # 10 days, one channel, weekly pattern 100/200 cents alternating
    ys = [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), i, "a", ys[i]) for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = tsr.holt_winters_forecast(ev).collect()[0]

    # in-test integer replica of the documented recursion
    q = 1 << 20
    cents = [int(round(v * 100)) for v in ys]

    def tdiv(a, b):
        s = -1 if (a < 0) != (b < 0) else 1
        return s * (abs(a) // abs(b))

    lev = tdiv(sum(q * y for y in cents[:7]), 7)
    s = [q * cents[j] - lev for j in range(7)]
    tr, sae = 0, 0
    for t in range(7, 10):
        slot = t % 7
        f = lev + tr + s[slot]
        sae += abs(q * cents[t] - f)
        lev2 = tdiv(q * cents[t] - s[slot] + 3 * (lev + tr), 4)
        tr = tdiv((lev2 - lev) + 3 * tr, 4)
        s[slot] = tdiv(q * cents[t] - lev2 + 3 * s[slot], 4)
        lev = lev2
    assert got["n_days"] == 10
    assert got["level_cents_q20"] == lev
    assert got["trend_cents_q20"] == tr
    assert got["snext_cents_q20"] == s[10 % 7]
    assert got["fc1_cents_q20"] == lev + tr + s[10 % 7]
    assert got["mae_hw_cents_q20"] == tdiv(sae, 3)

    # shorter than one season + 1 raises (documented contract)
    short = spark.createDataFrame(
        rows[:5], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    import pytest

    with pytest.raises(ValueError):
        tsr.holt_winters_forecast(short)


def test_markov_path_length_two_step_chain(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import markov as mkv

    # two conversions: c1 = a -> b -> conv, c2 = a -> conv
    rows = []
    for cid, chans in [("c1", ["a", "b"]), ("c2", ["a"])]:
        for i, ch in enumerate(chans):
            rows.append((cid, f"s{cid}{i}", ch, dt.datetime(2024, 1, 1, 9 + i)))
    j = spark.createDataFrame(
        rows, "conversion_id string, session_id string, channel_label string, event_ts timestamp"
    )
    out = {r["state"]: r["exp_steps_q20"] for r in mkv.expected_path_length(j, horizon=25).collect()}
    Q = 1 << 20
    # chain: start->a (2), a->b (1), a->conv (1), b->conv (1)
    # e(b) = 1; e(a) = 1 + (1*e(b) + 1*0)/2 = 1.5; e(start) = 1 + e(a) = 2.5
    assert out["b"] == Q
    assert out["a"] == Q + Q // 2
    assert out["(start)"] == Q + out["a"]


def test_oov_rate_against_small_vocab(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    docs = spark.createDataFrame(
        [
            (1, "aa aa bb", "web"),
            (2, "aa cc", "book"),
        ],
        "doc_id long, text string, source string",
    )
    # vocab_size=2 -> vocab = {aa (3), bb (1, ties to cc broken by term asc)}
    out = {r["source"]: r for r in txt.oov_rate(docs, vocab_size=2).collect()}
    assert out["web"]["n_tokens"] == 3 and out["web"]["n_oov"] == 0
    assert out["book"]["n_tokens"] == 2 and out["book"]["n_oov"] == 1  # cc OOV
    assert out["book"]["oov_q20"] == (2 * 1 * Q20 + 2) // 4


def test_seasonal_decomposition_removes_ramp(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import timeseries as tsr

    # a pure linear ramp (+100 cents/day, 21 days): after the centered
    # MA detrend the residuals are exactly zero, so every dow seasonal
    # is 0 — the property the trend-naive L234 index does NOT have
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), i, "a", float(i + 1))
        for i in range(21)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = tsr.seasonal_decomposition(ev).collect()
    assert len(out) == 7  # one per dow, edges dropped
    assert all(r["sum_detr_x7"] == 0 and r["seasonal_q20"] == 0 for r in out)
    # 21 days - 6 edge days = 15 full windows
    assert sum(r["n_days"] for r in out) == 15


def test_dup_degree_histogram_counts(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd2

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    out = {r["degree"]: r["n_docs"] for r in dd2.dup_degree_histogram(pairs).collect()}
    # 1,2,3 have degree 2 each; 4,5 degree 1
    assert out == {2: 3, 1: 2}


def test_waveform_stats_mapinpandas(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        # '@' is exactly center (64) -> zero sample, skipped for ZCR;
        # 'A'=65 (+1), '?'=63 (-1): alternation crosses zero
        [(1, "A?A?@A"), (2, "@@@")],
        "doc_id long, text string",
    )
    media = mm.attach_binary(docs)
    out = {r["doc_id"]: r for r in mm.waveform_stats(media).collect()}
    r1 = out[1]
    assert r1["n_samples"] == 6
    assert r1["sum_abs"] == 5  # five +-1 samples, one zero
    assert r1["peak_abs"] == 1
    # nonzero sequence +1,-1,+1,-1,+1 -> 4 crossings (zero skipped)
    assert r1["zero_crossings"] == 4
    r2 = out[2]
    assert r2["sum_abs"] == 0 and r2["peak_abs"] == 0 and r2["zero_crossings"] == 0


def test_dedup_threshold_sweep_ladder(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd2

    pairs = spark.createDataFrame(
        [(1, 2, 5, 10), (1, 3, 9, 10), (2, 3, 10, 10)],
        "doc_a long, doc_b long, inter_size long, union_size long",
    )
    out = {
        (r["threshold_num"], r["threshold_den"]): r["n_pairs"]
        for r in dd2.dedup_threshold_sweep(pairs).collect()
    }
    assert out[(1, 2)] == 3 and out[(4, 5)] == 2 and out[(9, 10)] == 2
    assert out[(3, 5)] == 2 and out[(7, 10)] == 2


def test_matched_lift_cells(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import experiments as xpr

    pre = dt.datetime(2024, 1, 1, 9)
    post = dt.datetime(2024, 1, 10, 9)
    rows = [
        # users 1,2: one pre session each (cell 1, non-buyer);
        # 1 clicks post and buys 3.00; 2 doesn't click, buys 1.00
        (0, pre, 1, "view", 0.0), (1, post, 1, "click", 0.0), (2, post, 1, "purchase", 3.0),
        (3, pre, 2, "view", 0.0), (4, post, 2, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = xpr.matched_lift(ev).collect()
    cell = {(r["cell_sessions_lb"], r["pre_buyer"]): r for r in out}[(1, 0)]
    assert cell["n_treated"] == 1 and cell["n_control"] == 1
    assert cell["treated_cents"] == 300 and cell["control_cents"] == 100
    # lift = (300*1 - 100*1)/1 = 200 cents
    assert cell["lift_cents_q20"] == 200 * Q20


def test_window_dedup_audit_distance(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd2

    docs = spark.createDataFrame(
        [(1, "x"), (3, "x"), (5000, "x"), (7, "y")],
        "doc_id long, text string",
    )
    # dups of doc 1: doc 3 (distance 2, in window) and doc 5000
    # (nearest prev = 3, distance 4997, outside window 1000)
    r = dd2.window_dedup_audit(docs, window=1000).collect()[0]
    assert r["n_docs"] == 4 and r["n_dups_full"] == 2 and r["n_dups_window"] == 1
    assert r["window_recall_q20"] == (2 * 1 * Q20 + 2) // 4


def test_lsh_bucket_stats_histogram(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd2

    bands = spark.createDataFrame(
        [(1, 0, "k1"), (2, 0, "k1"), (3, 0, "k2"), (1, 1, "k3")],
        "doc_id long, band long, key string",
    )
    out = {(r["band"], r["bucket_size"]): r["n_buckets"] for r in dd2.lsh_bucket_stats(bands).collect()}
    assert out == {(0, 2): 1, (0, 1): 1, (1, 1): 1}


def test_code_screen_flags(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    docs = spark.createDataFrame(
        [(1, "plain prose without any symbols at all"), (2, "if (x==1) { y[2]=3; }")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in txt.code_screen(docs).collect()}
    assert out[1]["n_symbol"] == 0 and out[1]["is_codey"] == 0
    r2 = out[2]
    # symbols: ( ) == ( appears... count: ( ) = = { [ ] = ; } -> verify
    assert r2["n_symbol"] == 10 and r2["n_digit"] == 3
    assert r2["is_codey"] == 1


def test_budget_reallocation_shares(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import markov as mkv

    # journeys: every conversion through channel a only -> removal
    # share all on a; spend: a=100, b=300 cents
    j = spark.createDataFrame(
        [("c1", "s1", "a", dt.datetime(2024, 1, 1, 9))],
        "conversion_id string, session_id string, channel_label string, event_ts timestamp",
    )
    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 8), 1, "a", 1.0),
            (1, dt.datetime(2024, 1, 1, 8), 2, "b", 3.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["channel"]: r for r in mkv.budget_reallocation(j, ev).collect()}
    Q = 1 << 20
    q = lambda c, t: (2 * c * Q + t) // (2 * t)
    assert out["a"]["spend_share_q20"] == q(100, 400)
    assert out["b"]["spend_share_q20"] == q(300, 400)
    assert out["b"]["removal_q20"] == 0 and out["b"]["removal_share_q20"] == 0
    assert out["a"]["removal_share_q20"] == Q  # all removal mass on a
    assert out["a"]["gap_q20"] == Q - q(100, 400)
    assert out["b"]["gap_q20"] == -q(300, 400)


def test_surprisal_drift_halves(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    # corpus: 'a' x4, 'b' x2, 'c' x2 -> N=8; bits: a=1 (8//4=2),
    # b=2 (8//2=4), c=2
    docs = spark.createDataFrame(
        [(0, "a a b"), (2, "a"), (1, "a b c"), (3, "c")],
        "doc_id long, text string",
    )
    out = {r["half"]: r for r in txt.surprisal_drift(docs).collect()}
    # even half: a,a,b,a -> bits 1+1+2+1 = 5 over 4 words
    assert out[0]["n_scored_words"] == 4 and out[0]["total_bits"] == 5
    # odd half: a,b,c,c -> 1+2+2+2 = 7 over 4 words
    assert out[1]["n_scored_words"] == 4 and out[1]["total_bits"] == 7
    assert out[0]["mean_bits_q20"] == (2 * 5 * Q20 + 4) // 8
    assert out[1]["mean_bits_q20"] == (2 * 7 * Q20 + 4) // 8


def test_rank_stability_spearman(spark):
    import datetime as dt

    from marketing_attribution_etl_framework__maef_spark.operators import planning as pln

    h1 = dt.datetime(2024, 1, 1, 9)
    h2 = dt.datetime(2024, 1, 10, 9)
    rows = [
        # half1 ranks: a(300)=1, b(200)=2, c(100)=3
        (0, h1, 1, "a", 3.0), (1, h1, 2, "b", 2.0), (2, h1, 3, "c", 1.0),
        # half2 ranks: c(300)=1, b(200)=2, a(100)=3  -> full reversal
        (3, h2, 4, "c", 3.0), (4, h2, 5, "b", 2.0), (5, h2, 6, "a", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["channel"]: r for r in pln.rank_stability(ev).collect()}
    assert out["a"]["rank_h1"] == 1 and out["a"]["rank_h2"] == 3
    assert out["c"]["d2"] == 4 and out["b"]["d2"] == 0
    # full reversal: rho = 1 - 6*8/(3*8) = -1 -> -Q20 exactly
    assert all(r["rho_q20"] == -Q20 for r in out.values())
