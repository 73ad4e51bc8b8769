"""Round-4c operators: RFM segmentation, survival/KM, basket pairs,
robust trimmed/winsorized stats — handmade fixtures with hand-computed
expectations (the SURVEY §5 golden-fixture pattern)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.operators import basket as bsk
from marketing_attribution_etl_framework__maef_spark.operators import robust as rbst
from marketing_attribution_etl_framework__maef_spark.operators import segmentation as seg
from marketing_attribution_etl_framework__maef_spark.operators import survival as surv


def _d(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- RFM


def test_global_row_number_matches_total_order(spark):
    rows = [(v, i) for i, v in enumerate([5, 3, 9, 3, 1, 7, 2, 8, 0, 6])]
    df = spark.createDataFrame(rows, "v long, id long")
    got = {
        (r["v"], r["id"]): r["rn"]
        for r in seg.global_row_number(df, ["v", "id"], num_partitions=4).collect()
    }
    expect = {
        (v, i): rank + 1
        for rank, (v, i) in enumerate(sorted((v, i) for v, i in rows))
    }
    assert got == expect


def test_rfm_scores_small_fixture(spark):
    # 5 customers: one order each except c1 (3 orders). Anchor = max date.
    orders = spark.createDataFrame(
        [
            (1, _d("2023-01-01"), 10.0),
            (1, _d("2023-03-01"), 20.0),
            (1, _d("2023-05-01"), 30.0),
            (2, _d("2023-05-01"), 100.0),
            (3, _d("2023-04-01"), 50.0),
            (4, _d("2023-02-01"), 5.0),
            (5, _d("2023-01-15"), 500.0),
        ],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    out = {r["custkey"]: r.asDict() for r in seg.rfm_scores(orders).collect()}
    assert out[1]["frequency"] == 3 and out[1]["monetary_cents"] == 6000
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 0
    assert out[5]["monetary_cents"] == 50000
    # n=5 -> each rank its own quintile; monetary order: 4(500),1(6000),
    # 3(5000)... cents: c4=500, c3=5000, c1=6000, c2=10000, c5=50000
    assert out[4]["m_score"] == 1 and out[5]["m_score"] == 5
    # frequency: c1 alone has 3 -> top rank -> score 5
    assert out[1]["f_score"] == 5
    # recency ties (c1,c2 at day 0) break by custkey: inverted rank
    # puts them at ranks 5,4 -> scores 5,4; stalest (c5... c5 is
    # 2023-01-15 -> oldest? c5 recency 106d, c4 recency 89d) -> c5=1
    assert out[5]["r_score"] == 1
    assert {out[1]["r_score"], out[2]["r_score"]} == {4, 5}


def test_rfm_segment_counts_bounded(spark):
    orders = spark.createDataFrame(
        [(i, _d("2023-01-01"), float(i)) for i in range(1, 21)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    seg_counts = seg.rfm_segment_counts(seg.rfm_scores(orders)).collect()
    assert sum(r["n_customers"] for r in seg_counts) == 20
    assert all(1 <= r["m_score"] <= 5 for r in seg_counts)


# ----------------------------------------------------------- survival


def test_user_durations_censoring(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, "view", _d("2023-01-01")),
            (2, 10, "purchase", _d("2023-01-04")),  # converts at day 3
            (3, 20, "view", _d("2023-01-01")),
            (4, 20, "click", _d("2023-01-06")),  # censored at day 5
            (5, 30, "purchase", _d("2023-01-01")),  # converts at day 0
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r["user_id"]: (r["offset_days"], r["event"]) for r in surv.user_durations(ev).collect()}
    assert out == {10: (3, 1), 20: (5, 0), 30: (0, 1)}


def test_hazard_and_km_hand_computed(spark):
    # durations: day0: 1 conv; day1: 1 censored; day2: 1 conv, N=4
    # (fourth subject censored day 3).
    durs = spark.createDataFrame(
        [(1, 0, 1), (2, 1, 0), (3, 2, 1), (4, 3, 0)],
        "user_id long, offset_days long, event int",
    )
    hz = {r["offset_days"]: r.asDict() for r in surv.hazard_table(durs).collect()}
    assert hz[0]["n_risk"] == 4 and hz[0]["n_conv"] == 1
    assert hz[1]["n_risk"] == 3 and hz[1]["n_censored"] == 1
    assert hz[2]["n_risk"] == 2 and hz[2]["n_conv"] == 1
    assert hz[3]["n_risk"] == 1
    assert hz[0]["hazard_q20"] == (1 * 1048576) // 4
    km = {
        r["offset_days"]: r["survival_e9"]
        for r in surv.kaplan_meier(surv.hazard_table(durs)).collect()
    }
    # S0 = 1e9 * 3 // 4 = 750000000; day1 no conv -> unchanged;
    # day2: * 1 // 2 -> 375000000; day3 unchanged.
    assert km == {0: 750_000_000, 1: 750_000_000, 2: 375_000_000, 3: 375_000_000}


# ------------------------------------------------------------- basket


def test_basket_pairs_support_and_lift(spark):
    # orders: O1{A,B}, O2{A,B}, O3{A,C}, O4{B} -> pair (A,B) cnt=2.
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"), (4, "B")]
    facts = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    out = bsk.basket_pairs(facts, min_support=2).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["item_a"], r["item_b"]) == ("A", "B")
    assert r["pair_cnt"] == 2 and r["cnt_a"] == 3 and r["cnt_b"] == 3 and r["n_orders"] == 4
    # lift = 2*4/(3*3) = 8/9 -> q20 = floor(8*2^20/9)
    assert r["lift_q20"] == (2 * 4 * 1048576) // (3 * 3)


def test_basket_cap_drops_whale_order_consistently(spark):
    whale = [(99, f"P{i}") for i in range(10)]  # 10 items > cap 8
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B")] + whale
    facts = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    out = bsk.basket_pairs(facts, max_basket=8, min_support=2).collect()
    assert len(out) == 1
    # n_orders counts only capped universe (2 orders)
    assert out[0]["n_orders"] == 2


def test_basket_dedups_repeated_lines(spark):
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
    facts = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    out = bsk.basket_pairs(facts, min_support=2).collect()
    assert out[0]["pair_cnt"] == 2 and out[0]["cnt_a"] == 2


# ------------------------------------------------------------- robust


def test_robust_stats_hand_computed(spark):
    # one group, values 1..20 cents, trim 5% -> k=1: drop 1 and 20.
    df = spark.createDataFrame(
        [("x", v, str(v)) for v in range(1, 21)], "g string, cents long, id string"
    )
    r = rbst.robust_group_stats(df, "g", "cents", "id", trim_pct=5).collect()[0].asDict()
    assert r["n"] == 20 and r["k_trimmed"] == 1
    assert r["raw_sum_cents"] == 210
    assert r["trimmed_sum_cents"] == 210 - 1 - 20
    assert r["lo_clip_cents"] == 2 and r["hi_clip_cents"] == 19
    assert r["winsorized_sum_cents"] == 189 + 2 + 19


def test_robust_stats_tiny_group_no_trim(spark):
    df = spark.createDataFrame(
        [("x", 5, "a"), ("x", 7, "b"), ("y", 100, "c")], "g string, cents long, id string"
    )
    out = {r["g"]: r.asDict() for r in rbst.robust_group_stats(df, "g", "cents", "id").collect()}
    assert out["x"]["k_trimmed"] == 0
    assert out["x"]["trimmed_sum_cents"] == 12 == out["x"]["winsorized_sum_cents"]
    assert out["y"]["n"] == 1 and out["y"]["raw_sum_cents"] == 100


def test_robust_stats_rejects_bad_trim(spark):
    df = spark.createDataFrame([("x", 1, "a")], "g string, cents long, id string")
    try:
        rbst.robust_group_stats(df, "g", "cents", "id", trim_pct=50)
        assert False, "expected ValueError"
    except ValueError:
        pass


# ------------------------------------------------------------ packing


def test_pack_sequences_layout_invariants(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import packing as pck

    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(1, 41)] + [(99, 0)], "doc_id long, n_chars long"
    )
    out = sorted(
        (r["offset"], r["n_chars"], r["doc_id"], r["seq_first"], r["seq_last"], r["n_seqs"])
        for r in pck.pack_sequences(docs, budget=500).collect()
    )
    # zero-weight doc dropped
    assert len(out) == 40
    # offsets tile the line exactly: each doc starts where the
    # previous one ended, first at 0
    assert out[0][0] == 0
    for (o1, w1, *_), (o2, *_rest) in zip(out, out[1:]):
        assert o2 == o1 + w1
    # sequence coordinates consistent with the offset arithmetic
    for o, w, _id, sf, sl, ns in out:
        assert sf == o // 500 and sl == (o + w - 1) // 500 and ns == sl - sf + 1


def test_pack_sequences_deterministic_across_partitionings(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import packing as pck

    docs = spark.createDataFrame([(i, 37 * (i % 11) + 1) for i in range(200)], "doc_id long, n_chars long")
    a = {r["doc_id"]: r["offset"] for r in pck.pack_sequences(docs, budget=256).collect()}
    b = {
        r["doc_id"]: r["offset"]
        for r in pck.pack_sequences(docs.repartition(7), budget=256).collect()
    }
    assert a == b


# ------------------------------------------------------------- bandit


def test_ucb1_scores_hand_computed(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import bandit as bdt

    sess = spark.createDataFrame(
        [("s1", "a"), ("s2", "a"), ("s3", "b"), ("s4", "b")],
        "session_id string, channel_name string",
    )
    jny = spark.createDataFrame([("c1", "s1"), ("c2", "s1"), ("c3", "s3")], "conversion_id string, session_id string")
    out = {r["channel_name"]: r.asDict() for r in bdt.ucb1_scores(sess, jny).collect()}
    import math

    assert out["a"]["plays"] == 2 and out["a"]["reward_sum"] == 1  # s1 only (distinct)
    assert out["b"]["reward_sum"] == 1 and out["a"]["n_total"] == 4
    expect_a = math.floor((0.5 + math.sqrt(2 * math.log(4) / 2)) * 1048576 + 0.5)
    assert out["a"]["ucb_q20"] == expect_a


# -------------------------------------------------------------- graph


def test_triangle_count_known_graphs(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import graph as grph

    # K4 has 4 triangles; add a pendant edge (no new triangle), a
    # self-loop and a duplicate edge (both must be ignored).
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(
        k4 + [(3, 9), (2, 2), (1, 0)], "src long, dst long"
    )
    r = grph.triangle_count(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 7, 4)


def test_triangle_count_triangle_free(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import graph as grph

    # C4 cycle: 4 edges, 0 triangles
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    r = grph.triangle_count(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 4, 0)


# ----------------------------------------------------------- sampling


def test_stratified_sample_exact_k_and_proportions(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import sampling as smp

    # strata: a=60, b=30, c=10 rows; k=10 -> quotas 6/3/1 exactly
    rows = (
        [(i, "a") for i in range(60)]
        + [(100 + i, "b") for i in range(30)]
        + [(200 + i, "c") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = smp.stratified_sample(docs, k=10).collect()
    assert len(out) == 10
    by_s = {}
    for r in out:
        by_s.setdefault(r["source"], 0)
        by_s[r["source"]] += 1
        assert r["rank"] <= r["quota"]
    assert by_s == {"a": 6, "b": 3, "c": 1}


def test_stratified_sample_remainder_and_determinism(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import sampling as smp

    # 3 strata x 10 rows, k=10: base 3 each, 1 leftover -> equal
    # remainders, alphabetical tie-break gives stratum "a" the +1
    rows = [(s * 100 + i, chr(97 + s)) for s in range(3) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = smp.stratified_sample(docs, k=10).collect()
    by_s = {}
    for r in out:
        by_s[r["source"]] = by_s.get(r["source"], 0) + 1
    assert by_s == {"a": 4, "b": 3, "c": 3}
    # deterministic across partitionings
    again = smp.stratified_sample(docs.repartition(5), k=10).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_grouped_hash_rank_is_dense_per_group(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import sampling as smp

    rows = [(i, "g%d" % (i % 3)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = smp.grouped_hash_rank(df, "source", "doc_id", n_buckets=8).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["rank"])
    for g, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ----------------------------------------------------------- quantize


def test_quantize_int8_known_grid(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import quantize as qtz

    # dim0 spans [0,2] -> codes 0/127.5->128? x=1 -> (1-0)/2*255+0.5
    # = 128.0 -> floor 128; dim1 constant -> code 0
    embs = spark.createDataFrame(
        [(1, [0.0, 7.0]), (2, [1.0, 7.0]), (3, [2.0, 7.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r.asDict() for r in qtz.quantize_int8(embs).collect()}
    assert out[1]["code_sum"] == 0 and out[3]["code_sum"] == 255
    assert out[2]["code_sum"] == 128  # floor(127.5 + 0.5)
    assert out[1]["n_dims"] == 2 and out[1]["code_min"] == 0
    # md5 pin: same codes -> same hash; different codes -> different
    assert out[1]["codes_md5"] != out[2]["codes_md5"]


def test_quantize_codes_md5_matches_manual(spark):
    import hashlib

    from marketing_attribution_etl_framework__maef_spark.llm import quantize as qtz

    embs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [4.0, 8.0])], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r["codes_md5"] for r in qtz.quantize_int8(embs).collect()}
    assert out[2] == hashlib.md5(b"255,255").hexdigest()
    assert out[1] == hashlib.md5(b"0,0").hexdigest()


# ------------------------------------------------------------- motifs


def test_path_motifs_hand_computed(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import motifs as mtf

    # journey j1: a,b,c,d -> triples (a,b,c),(b,c,d); j2: a,b,c ->
    # (a,b,c); j3: x,y (too short)
    rows = [
        ("j1", "s1", _d("2023-01-01 00:00"), "a"),
        ("j1", "s2", _d("2023-01-01 01:00"), "b"),
        ("j1", "s3", _d("2023-01-01 02:00"), "c"),
        ("j1", "s4", _d("2023-01-01 03:00"), "d"),
        ("j2", "s5", _d("2023-01-01 00:00"), "a"),
        ("j2", "s6", _d("2023-01-01 01:00"), "b"),
        ("j2", "s7", _d("2023-01-01 02:00"), "c"),
        ("j3", "s8", _d("2023-01-01 00:00"), "x"),
        ("j3", "s9", _d("2023-01-01 01:00"), "y"),
    ]
    jny = spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts timestamp, channel_label string"
    )
    out = {
        (r["c1"], r["c2"], r["c3"]): (r["n_motif"], r["n_journeys"])
        for r in mtf.path_motifs(jny, min_count=1).collect()
    }
    assert out == {("a", "b", "c"): (2, 2), ("b", "c", "d"): (1, 1)}


def test_path_motifs_tie_order_by_session_id(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import motifs as mtf

    # equal timestamps: order falls back to session_id
    t = _d("2023-01-01 00:00")
    rows = [("j", "s1", t, "a"), ("j", "s2", t, "b"), ("j", "s3", t, "c")]
    jny = spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts timestamp, channel_label string"
    )
    out = mtf.path_motifs(jny, min_count=1).collect()
    assert len(out) == 1 and (out[0]["c1"], out[0]["c2"], out[0]["c3"]) == ("a", "b", "c")


# ---------------------------------------------------------- recommend


def test_recommend_items_symmetric_and_cut(spark):
    pairs = spark.createDataFrame(
        [
            ("A", "B", 5, 10, 10, 100, 2000),
            ("A", "C", 3, 10, 10, 100, 3000),
            ("A", "D", 2, 10, 10, 100, 1000),
            ("A", "E", 1, 10, 10, 100, 500),
        ],
        "item_a string, item_b string, pair_cnt long, cnt_a long, cnt_b long,"
        " n_orders long, lift_q20 long",
    )
    out = bsk.recommend_items(pairs, top_k=3).collect()
    a_rows = sorted((r["rank"], r["rec"]) for r in out if r["item"] == "A")
    # by lift desc: C(3000), B(2000), D(1000); E cut
    assert a_rows == [(1, "C"), (2, "B"), (3, "D")]
    # symmetric direction: B recommends A at rank 1
    b_rows = [(r["rank"], r["rec"]) for r in out if r["item"] == "B"]
    assert b_rows == [(1, "A")]


# ----------------------------------------------------------- NB model


def test_nb_langid_separable_corpus(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import classify as clf

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog ate the bone", "en"),
        (3, "le chat est sur le tapis", "fr"),
        (4, "le chien mange le os", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    conf = {(r["lang"], r["pred_label"]): r["n_docs"] for r in clf.nb_confusion(docs).collect()}
    # self-scored separable corpus: perfect diagonal
    assert conf == {("en", "en"): 2, ("fr", "fr"): 2}


def test_nb_predict_scores_are_integer_and_tie_break(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import classify as clf

    rows = [(1, "x y", "a"), (2, "x y", "b")]  # identical docs, two labels
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = clf.nb_train(docs)
    pred = clf.nb_predict(docs, model).collect()
    # symmetric training data -> identical scores -> alphabetical
    # tie-break picks "a" for both docs
    assert {r["pred_label"] for r in pred} == {"a"}
    assert all(isinstance(r["score_q20"], int) for r in pred)


# ------------------------------------------------------------- benford


def test_benford_screen_counts_and_masses(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import quality as dq
    import math

    # leading digits: 1,1,2,9; zero and negative rows dropped
    df = spark.createDataFrame(
        [(100,), (19999,), (250,), (90,), (0,), (-5,)], "cents long"
    )
    out = {r["digit"]: r.asDict() for r in dq.benford_screen(df, "cents").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n_observed"] == 2 and out[1]["n_total"] == 4
    assert out[1]["observed_q20"] == (2 * 1048576) // 4
    assert out[9]["expected_q20"] == math.floor(math.log10(1 + 1 / 9) * 1048576 + 0.5)
    assert out[2]["deviation_q20"] == out[2]["observed_q20"] - out[2]["expected_q20"]


# ------------------------------------------------------------ coverage


def test_greedy_coverage_hand_computed(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import coverage as cov

    # doc 1: shingles {a b c, b c d} (4 words); doc 2 subset of doc 1;
    # doc 3 disjoint
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "x y z w v"),
        ],
        "doc_id long, text string",
    )
    out = [(r["round"], r["doc_id"], r["gain"], r["covered_total"]) for r in
           sorted(cov.greedy_coverage(docs, k=5).collect())]
    # doc3 has 3 shingles -> picked first; doc1 adds 2; doc2 adds 0 -> stop
    assert out == [(1, 3, 3, 3), (2, 1, 2, 5)]


def test_greedy_coverage_tie_breaks_by_doc_id(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import coverage as cov

    docs = spark.createDataFrame(
        [(7, "p q r"), (4, "s t u")], "doc_id long, text string"
    )
    out = sorted(cov.greedy_coverage(docs, k=1).collect())
    assert out[0]["doc_id"] == 4  # equal gain 1 -> smaller id


# ------------------------------------------------------- stream enrich


def test_enrich_stream_batch_semantics(spark):
    # enrich_stream is a plain DataFrame transform: validate its
    # semantics on a batch frame (the streaming face is exercised by
    # the registry parity query maef_stream_enrich)
    from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

    ev = spark.createDataFrame(
        [
            (1, _d("2023-01-01 05:00"), 10, "click", 2.5),
            (2, _d("2023-01-01 07:00"), 11, "view", 1.0),
            (3, _d("2023-01-02 05:00"), 10, "click", 4.0),
            (4, _d("2023-01-01 09:00"), 10, "purchase", 9.9),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    dim = spark.createDataFrame([(10, "AUTO"), (11, "HOME")], "c_custkey long, c_mktsegment string")
    out = {
        (str(r["window_start"])[:10], r["segment"]): (r["n_sessions"], r["total_value_cents"])
        for r in inc.enrich_stream(ev, dim, "user_id", "c_custkey").collect()
    }
    assert out == {
        ("2023-01-01", "AUTO"): (1, 250),
        ("2023-01-01", "HOME"): (1, 100),
        ("2023-01-02", "AUTO"): (1, 400),
    }


# ----------------------------------------------------------- isotonic


def test_isotonic_rates_pav_parity(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import calibration as cal

    # buckets with rates 0.5, 0.0, 1.0 (violator in the middle):
    # PAV pools buckets 0,1 -> (1+0)/4 = 0.25; bucket 2 stays 1.0
    rows = (
        [(0, 1), (0, 1), (0, 0), (0, 0)][:2]  # bucket 0: 1 hit of 2
        + [(0, 0)]
        + [(1, 0), (1, 0)]
        + [(2, 1), (2, 1)]
    )
    # bucket 0: hits [1,1,0] -> 2/3; bucket 1: 0/2; bucket 2: 2/2
    df = spark.createDataFrame(rows, "bucket long, hit int")
    out = {r["bucket"]: r.asDict() for r in cal.isotonic_rates(df).collect()}
    # pooled(0,1) = 2/5 for both buckets; bucket 2 = 1.0
    q = 1048576
    assert out[0]["iso_rate_q20"] == out[1]["iso_rate_q20"] == (2 * q) // 5
    assert out[2]["iso_rate_q20"] == q
    assert out[0]["raw_rate_q20"] == (2 * q) // 3


def test_isotonic_monotone_and_preserves_sorted_input(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import calibration as cal

    # already-isotonic rates must come back unchanged
    rows = [(0, 0), (0, 0), (1, 0), (1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, "bucket long, hit int")
    out = sorted(cal.isotonic_rates(df).collect(), key=lambda r: r["bucket"])
    rates = [r["iso_rate_q20"] for r in out]
    assert rates == [r["raw_rate_q20"] for r in out]
    assert rates == sorted(rates)


def test_isotonic_pav_equivalence_random(spark):
    # property: minimax form == sequential PAV on integer fixtures
    from marketing_attribution_etl_framework__maef_spark.operators import calibration as cal

    seqs = [
        [3, 1, 2, 0, 4],
        [1, 1, 1],
        [5, 4, 3, 2, 1],
        [0, 2, 1, 3, 1, 5],
    ]
    for hits_per_bucket in seqs:
        rows = []
        for b, h in enumerate(hits_per_bucket):
            rows += [(b, 1)] * h + [(b, 0)] * (5 - h)
        df = spark.createDataFrame(rows, "bucket long, hit int")
        got = [
            r["iso_rate_q20"]
            for r in sorted(cal.isotonic_rates(df).collect(), key=lambda r: r["bucket"])
        ]
        # sequential PAV reference on (sum, n) pools
        pools = []  # [s, n]
        for h in hits_per_bucket:
            pools.append([h, 5])
            while len(pools) > 1 and pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]:
                s, n = pools.pop()
                pools[-1][0] += s
                pools[-1][1] += n
        expect = []
        for s, n in pools:
            expect += [(s * 1048576) // n] * (n // 5)
        assert got == expect, hits_per_bucket


# -------------------------------------------------------------- cusum


def test_cusum_changepoint_level_shift(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import anomaly as anm

    # 4 days at $1, then 4 days at $5: peak |cusum| lands on the last
    # low day (day 4)
    rows = []
    eid = 0
    for d in range(1, 9):
        eid += 1
        v = 1.0 if d <= 4 else 5.0
        rows.append((eid, _d(f"2023-01-0{d} 10:00"), 1, "purchase", v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["day"]: r.asDict() for r in anm.cusum_changepoint(ev).collect()}
    assert len(out) == 8
    assert out["2023-01-04"]["is_peak"] == 1
    assert sum(r["is_peak"] for r in out.values()) == 1
    # exact statistic: N=8, S=2400 cents; prefix(4)=400 ->
    # 8*400 - 4*2400 = -6400
    assert out["2023-01-04"]["cusum_scaled"] == -6400
    # last point is always 0 by construction
    assert out["2023-01-08"]["cusum_scaled"] == 0


# ----------------------------------------------------- hashed features


def test_hashed_features_exact_and_stateless(spark):
    import hashlib

    from marketing_attribution_etl_framework__maef_spark.llm import text as t

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in t.hashed_features(docs).collect()}
    # identical docs -> identical vectors
    assert out[1]["vec_md5"] == out[2]["vec_md5"]
    assert out[1]["n_terms"] == 3
    # manual vector: bucket(term) = int(md5(term+'|feat')[:15], 16) % 64
    def b(term):
        return int(hashlib.md5((term + "|feat").encode()).hexdigest()[:15], 16) % 64

    cells = {}
    for term, cnt in [("alpha", 2), ("beta", 1)]:
        cells[b(term)] = cells.get(b(term), 0) + cnt
    manual = " ".join(f"{i}:{c}" for i, c in sorted(cells.items()))
    assert out[1]["vec_md5"] == hashlib.md5(manual.encode()).hexdigest()
    assert out[1]["nnz"] == len(cells)


# -------------------------------------------------------------- k-core


def test_k_core_peels_pendants_and_cascades(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import graph as grph

    # triangle 1-2-3 plus a chain 3-4-5: 2-core = the triangle only
    # (5 peels first, then 4 cascades)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["node"]: r["core_degree"] for r in grph.k_core(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_fixpoint_extra_round_noop(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import graph as grph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    a = sorted((r["node"], r["core_degree"]) for r in grph.k_core(edges, k=2, rounds=12).collect())
    b = sorted((r["node"], r["core_degree"]) for r in grph.k_core(edges, k=2, rounds=13).collect())
    assert a == b == [(1, 2), (2, 2), (3, 2)]


def test_k_core_empty_when_overpeeled(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import graph as grph

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert grph.k_core(edges, k=2).count() == 0


# ------------------------------------------------------ weighted median


def test_weighted_median_hand_computed(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import quantiles as qtl

    # group g: values 1(w=1), 2(w=1), 10(w=6): half of 8 is 4 ->
    # first value whose cum reaches 4 is 10
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 10, 6), ("h", 5, 3), ("h", 7, 3)],
        "grp string, v long, w long",
    )
    out = {r["grp"]: (r["wmedian"], r["total_weight"]) for r in
           qtl.weighted_median(df, ["grp"], "v", "w").collect()}
    assert out["g"] == (10, 8)
    # h: cum(5)=3, 2*3 >= 6 -> lower weighted median = 5
    assert out["h"] == (5, 6)


def test_weighted_median_tie_order_invariant(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import quantiles as qtl

    # duplicated values with weights split across rows
    df = spark.createDataFrame(
        [("g", 4, 1), ("g", 4, 1), ("g", 4, 1), ("g", 9, 2)], "grp string, v long, w long"
    )
    out = qtl.weighted_median(df, ["grp"], "v", "w").collect()[0]
    assert out["wmedian"] == 4 and out["total_weight"] == 5


# --------------------------------------------------- sequence patterns


def test_sequence_patterns_gapped_and_first_occurrence(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import motifs as mtf

    # j1: a x b y c  -> gapped (a,b,c) present; duplicate a later must
    # not create new patterns (first-occurrence collapse)
    rows = [
        ("j1", "s1", _d("2023-01-01 00:00"), "a"),
        ("j1", "s2", _d("2023-01-01 01:00"), "x"),
        ("j1", "s3", _d("2023-01-01 02:00"), "b"),
        ("j1", "s4", _d("2023-01-01 03:00"), "y"),
        ("j1", "s5", _d("2023-01-01 04:00"), "c"),
        ("j1", "s6", _d("2023-01-01 05:00"), "a"),
        ("j2", "s7", _d("2023-01-01 00:00"), "a"),
        ("j2", "s8", _d("2023-01-01 01:00"), "b"),
        ("j2", "s9", _d("2023-01-01 02:00"), "c"),
    ]
    jny = spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts timestamp, channel_label string"
    )
    out = {
        (r["c1"], r["c2"], r["c3"]): r["n_journeys"]
        for r in mtf.sequence_patterns(jny, min_count=2).collect()
    }
    assert out == {("a", "b", "c"): 2}
    # with min_count=1 j1 contributes C(5,3) ordered distinct triples
    all1 = mtf.sequence_patterns(jny, min_count=1).collect()
    from math import comb

    assert sum(r["n_journeys"] for r in all1) == comb(5, 3) + comb(3, 3)


# -------------------------------------------------------- pseudonymize


def test_pseudonymize_roundtrip_and_separation(spark):
    import hashlib

    from marketing_attribution_etl_framework__maef_spark.operators import compliance as cmp

    ev = spark.createDataFrame(
        [(1, 10, "click"), (2, 10, "view"), (3, 20, "click")],
        "event_id long, user_id long, event_type string",
    )
    pseudo, mapping = cmp.pseudonymize(ev)
    toks = {r["user_id"] for r in pseudo.collect()}
    assert toks == {
        hashlib.md5(b"maef-pseudo-v1|10").hexdigest(),
        hashlib.md5(b"maef-pseudo-v1|20").hexdigest(),
    }
    m = {r["token"]: r["user_id"] for r in mapping.collect()}
    assert len(m) == 2 and set(m.values()) == {10, 20}


def test_greedy_coverage_candidate_pool_fallback_is_bit_identical(spark):
    """With candidate_pool=2 the pool exhausts mid-run (docs 20/21
    share doc 10's shingles, so their marginal gains collapse) and the
    CELF fallback must rebuild the full uncovered table — selections
    must equal the unpruned run exactly, including tie-breaks."""
    from marketing_attribution_etl_framework__maef_spark.llm import coverage as cov

    big = "a b c d e f g h i j"        # 8 shingles
    docs = spark.createDataFrame(
        [
            (10, big),
            (20, big + " k"),           # 9 shingles, superset of doc 10
            (21, big),                  # duplicate of doc 10
            (30, "x y z"),              # 1 disjoint shingle
            (31, "p q r s"),            # 2 disjoint shingles
        ],
        "doc_id long, text string",
    )
    pruned = sorted(
        (r["round"], r["doc_id"], r["gain"], r["covered_total"])
        for r in cov.greedy_coverage(docs, k=4, candidate_pool=2).collect()
    )
    full = sorted(
        (r["round"], r["doc_id"], r["gain"], r["covered_total"])
        for r in cov.greedy_coverage(docs, k=4, candidate_pool=10_000).collect()
    )
    assert pruned == full
    # sanity: picks escape the 2-doc pool (doc 31 then 30 follow 20)
    assert [t[1] for t in full] == [20, 31, 30]
