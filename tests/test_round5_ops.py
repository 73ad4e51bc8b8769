"""Round-5 operator unit tests on handmade fixtures (the SURVEY §5
golden-fixture pattern): Gini, Wilson, DiD, forecast backtests,
skyline, label propagation, bigram surprisal, temperature mix, random
projection, and the stratified_sample k>N guard."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.curation import temperature_mix
from marketing_attribution_etl_framework__maef_spark.llm.similarity import random_projection
from marketing_attribution_etl_framework__maef_spark.llm.text import bigram_surprisal
from marketing_attribution_etl_framework__maef_spark.operators.concentration import gini_by_group
from marketing_attribution_etl_framework__maef_spark.operators.experiments import did_lift, wilson_rates
from marketing_attribution_etl_framework__maef_spark.operators.graph import label_propagation
from marketing_attribution_etl_framework__maef_spark.operators.sampling import stratified_sample
from marketing_attribution_etl_framework__maef_spark.operators.skyline import skyline_2d
from marketing_attribution_etl_framework__maef_spark.operators.timeseries import (
    ewma_forecast_backtest,
    seasonal_naive_backtest,
)

Q = 1 << 20


def test_gini_known_distributions(spark):
    # perfect equality -> 0; full concentration on one of n units ->
    # (n-1)/n (the finite-sample maximum)
    rows = [("eq", u, 100) for u in range(4)] + [
        ("conc", 0, 0),
        ("conc", 1, 0),
        ("conc", 2, 0),
        ("conc", 3, 400),
    ]
    df = spark.createDataFrame(rows, "g string, u long, cents long")
    out = {r["g"]: r for r in gini_by_group(df, "g", "u", "cents").collect()}
    assert out["eq"]["gini_q20"] == 0
    # gini = (2*(1+2+3+4*... ) ...) = 3/4 exactly for all-mass-on-one of 4
    assert out["conc"]["gini_q20"] == (3 * Q) // 4
    assert out["conc"]["n_units"] == 4 and out["conc"]["total_cents"] == 400


def test_gini_zero_total(spark):
    df = spark.createDataFrame([("z", 1, 0), ("z", 2, 0)], "g string, u long, cents long")
    assert gini_by_group(df, "g", "u", "cents").first()["gini_q20"] == 0


def test_wilson_interval_matches_python(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 5, "channel string, hit int"
    )
    out = {r["channel"]: r for r in wilson_rates(df, "channel").collect()}

    def wilson(s, n):
        p = s / n
        z2 = 3.8416
        center = (p + z2 / (2 * n)) / (1 + z2 / n)
        half = (1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
        return (
            math.floor((center - half) * Q + 0.5),
            math.floor((center + half) * Q + 0.5),
        )

    lo, hi = wilson(30, 100)
    assert (out["a"]["lo_q20"], out["a"]["hi_q20"]) == (lo, hi)
    # degenerate s == n: interval still inside [0, 1] and lo < hi
    lo_b, hi_b = wilson(5, 5)
    assert (out["b"]["lo_q20"], out["b"]["hi_q20"]) == (lo_b, hi_b)
    assert 0 <= out["b"]["lo_q20"] < out["b"]["hi_q20"] <= Q


def test_did_lift_hand_2x2(spark):
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 0)], "user_id long, treated int"
    )
    buys = spark.createDataFrame(
        [
            (1, "2024-01-01", 100),
            (2, "2024-01-02", 100),  # treated pre: 200 over 2 users
            (1, "2024-03-01", 600),  # treated post: 600
            (3, "2024-01-05", 100),  # control pre: 100
            (4, "2024-03-05", 200),  # control post: 200
        ],
        "user_id long, day string, cents long",
    )
    r = did_lift(asg, buys, cutover="2024-02-15").first()
    assert r["t_pre_q20"] == (200 * Q) // 2
    assert r["t_post_q20"] == (600 * Q) // 2
    assert r["c_pre_q20"] == (100 * Q) // 2
    assert r["c_post_q20"] == (200 * Q) // 2
    assert r["did_q20"] == (r["t_post_q20"] - r["t_pre_q20"]) - (
        r["c_post_q20"] - r["c_pre_q20"]
    )


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_seasonal_naive_exact(spark):
    import datetime as dt

    rows = []
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 75.0, 15.0]):
        rows.append((i, dt.datetime(2024, 1, 1 + i), 1, "click", v))
    out = {r["channel"]: r for r in seasonal_naive_backtest(_ev(spark, rows), 7).collect()}
    # day 8 vs day 1: |7500-1000|=6500; day 9 vs day 2: |1500-2000|=500
    assert out["click"]["n_scored"] == 2
    assert out["click"]["sum_abs_err_cents"] == 7000
    assert out["click"]["mae_cents_q20"] == (7000 * Q) // 2


def test_ewma_forecast_exact(spark):
    import datetime as dt

    # two consecutive days: forecast for day2 = day1's cents (the
    # truncated window holds only day1), error = |c2*255 - c1*255*...|
    rows = [(1, dt.datetime(2024, 1, 1), 1, "click", 10.0), (2, dt.datetime(2024, 1, 2), 1, "click", 16.0)]
    out = ewma_forecast_backtest(_ev(spark, rows), horizon_days=8).first()
    # num(day1) = 1000 * 2^7; scaled actual = 1600 * 255
    expect_ae = abs(1600 * 255 - 1000 * 128)
    assert out["n_scored"] == 1
    assert out["mae_cents_q20"] == (expect_ae * Q) // 255


def test_skyline_dominance_and_ties(spark):
    pts = spark.createDataFrame(
        [
            ("p1", 1, 10),
            ("p2", 2, 10),   # dominated by p1 (higher cost, same benefit)
            ("p3", 2, 20),
            ("p4", 3, 20),   # dominated by p3
            ("p5", 3, 20),   # dominated by p3 as well
            ("p6", 4, 30),
            ("p7", 4, 30),   # duplicate of p6 -> both survive
        ],
        "id string, cost long, ben long",
    )
    got = {r["id"] for r in skyline_2d(pts, "cost", "ben").collect()}
    assert got == {"p1", "p3", "p6", "p7"}


def test_label_propagation_two_cliques(spark):
    # two disjoint 4-cliques: round 1 sends every node to the min id
    # among its neighbors, round 2 the majority label (the min) wins
    # everywhere — both components converge to their minimum id
    def clique(base):
        ids = [base + i for i in range(4)]
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(clique(1) + clique(10), "src long, dst long")
    lab = {r["node"]: r["label"] for r in label_propagation(edges, rounds=2).collect()}
    assert all(lab[1 + i] == 1 for i in range(4))
    assert all(lab[10 + i] == 10 for i in range(4))


def test_bigram_surprisal_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    # pairs: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,b)
    # c1(a)=3, c1(b)=1; c12(a,b)=3, c12(b,a)=1; V=2
    # bits(a,b) = floor(log2((3+2) div (3+1))) = floor(log2(1)) = 0
    # bits(b,a) = floor(log2((1+2) div (1+1))) = floor(log2(1)) = 0
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    assert out[1]["surprisal_bits"] == 0 and out[2]["surprisal_bits"] == 0
    rare = spark.createDataFrame(
        [(1, "x x x x x x x x"), (2, "x y")], "doc_id long, text string"
    )
    r = {r["doc_id"]: r for r in bigram_surprisal(rare).collect()}
    # (x,y): c1(x)=8 (7 from doc1 + 1 from doc2), c12=1, V=2 ->
    # floor(log2(10 div 2)) = 2 bits
    assert r[2]["surprisal_bits"] > r[2]["n_bigrams"] - 1  # rare pair scores bits


def test_temperature_mix_budget_exact(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (10 * (1 + i % 3)), f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    out = temperature_mix(docs, budget=1000)
    rows = out.collect()
    assert sum(r["alloc"] for r in rows) == 1000
    # sqrt-temperature flattens: the smallest source gets MORE than its
    # proportional token share
    tot = sum(r["n_tokens"] for r in rows)
    small = min(rows, key=lambda r: r["n_tokens"])
    assert small["alloc"] / 1000 > small["n_tokens"] / tot


def test_random_projection_basis_vector(spark):
    import hashlib

    vec = [0.0] * 64
    vec[5] = 1.0
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    out = {r["j"]: r["comp_q20"] for r in random_projection(df).collect()}
    for j in range(16):
        sign = 1.0 if int(hashlib.md5(f"5_{j}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1.0
        assert out[j] == math.floor(sign * Q + 0.5)


def test_stratified_sample_over_ask_raises(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(6)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="exceeds corpus size"):
        stratified_sample(docs, k=7)
    ok = stratified_sample(docs, k=6)
    assert ok.count() == 6


def test_rake_weights_hits_margins(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.raking import rake_weights

    cells = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 30), ("b", 0, 20), ("b", 1, 40)],
        "r string, c int, m long",
    )
    rm = spark.createDataFrame([("a", 100), ("b", 100)], "r string, tr long")
    cm = spark.createDataFrame([(0, 80), (1, 120)], "c int, tc long")
    out = rake_weights(cells, rm, cm, rounds=8)  # extra rounds -> convergence
    rows = out.collect()
    w = {(r["r"], r["c"]): r["w_q20"] / (1 << 20) for r in rows}
    m = {(r["r"], r["c"]): r["m"] for r in rows}
    for rr, tr in (("a", 100), ("b", 100)):
        got = sum(w[k] * m[k] for k in w if k[0] == rr)
        assert abs(got - tr) < 0.5
    for cc, tc in ((0, 80), (1, 120)):
        got = sum(w[k] * m[k] for k in w if k[1] == cc)
        assert abs(got - tc) < 0.5


def test_peak_concurrency_sweep(spark):
    import datetime as dt

    d = dt.datetime
    iv = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10, 0), d(2024, 1, 1, 11, 0)),
            (2, d(2024, 1, 1, 10, 30), d(2024, 1, 1, 12, 0)),
            (3, d(2024, 1, 1, 10, 45), d(2024, 1, 1, 10, 50)),
            (4, d(2024, 1, 1, 23, 0), d(2024, 1, 2, 1, 0)),  # crosses midnight
            (5, d(2024, 1, 2, 0, 30), d(2024, 1, 2, 0, 40)),
        ],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    from marketing_attribution_etl_framework__maef_spark.operators.concurrency import peak_concurrency

    out = {r["day"]: r for r in peak_concurrency(iv).collect()}
    assert out["2024-01-01"]["peak"] == 3  # users 1,2,3 overlap at 10:45
    assert out["2024-01-01"]["n_starts"] == 4
    # day 2 carries user 4 over midnight: peak = carried 1 + user 5
    assert out["2024-01-02"]["peak"] == 2
    assert out["2024-01-02"]["n_starts"] == 1


def test_peak_concurrency_zero_length_session(spark):
    import datetime as dt

    iv = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 10, 0))],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    from marketing_attribution_etl_framework__maef_spark.operators.concurrency import peak_concurrency

    # closed-interval semantics: the instantaneous session still peaks at 1
    assert peak_concurrency(iv).first()["peak"] == 1


def test_channel_correlation_perfect(spark):
    # construct perfectly correlated and anti-correlated channel pairs
    import __spark_entry__ as e  # noqa: F401  (query uses domain; test the math inline)
    from pyspark.sql import functions as F

    rows = []
    for i, (x, y, z) in enumerate([(1, 2, 5), (2, 4, 4), (3, 6, 3), (4, 8, 2)]):
        rows += [("a", f"2024-01-0{i+1}", x), ("b", f"2024-01-0{i+1}", y), ("c", f"2024-01-0{i+1}", z)]
    daily = spark.createDataFrame(rows, "ch string, day string, cents long")
    a = daily.select(F.col("ch").alias("ch_a"), "day", F.col("cents").alias("xc"))
    b = daily.select(F.col("ch").alias("ch_b"), "day", F.col("cents").alias("yc"))
    j = a.join(b, "day").filter(F.col("ch_a") < F.col("ch_b"))
    agg = j.groupBy("ch_a", "ch_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.expr("cast(xc as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(yc as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(xc as decimal(38,0)) * yc")).alias("sxy"),
        F.sum(F.expr("cast(xc as decimal(38,0)) * xc")).alias("sxx"),
        F.sum(F.expr("cast(yc as decimal(38,0)) * yc")).alias("syy"),
    )
    out = (
        agg.withColumn("num", F.expr("cast(n_days as decimal(38,0)) * sxy - sx * sy"))
        .withColumn("d1", F.expr("cast(n_days as decimal(38,0)) * sxx - sx * sx"))
        .withColumn("d2", F.expr("cast(n_days as decimal(38,0)) * syy - sy * sy"))
        .select(
            "ch_a",
            "ch_b",
            F.expr(
                "cast(floor(cast(num as double) / sqrt(cast(d1 as double) * cast(d2 as double))"
                " * 1048576 + 0.5e0) as bigint)"
            ).alias("r_q20"),
        )
        .collect()
    )
    r = {(x["ch_a"], x["ch_b"]): x["r_q20"] for x in out}
    assert r[("a", "b")] == Q          # r = +1 exactly
    assert r[("a", "c")] == -Q         # r = -1 exactly


def test_tokenizer_fertility_exact(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.tokenizer import bpe_encode_counts
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "ab ab cd", "s0"), (2, "ab", "s1")], "doc_id long, text string, source string"
    )
    # merge ('a','b'): 'ab' -> 1 token, 'cd' stays 2 symbols
    enc = bpe_encode_counts(docs, [("a", "b")])
    out = (
        enc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t"))
        .collect()
    )
    m = {r["source"]: (r["w"], r["t"]) for r in out}
    assert m["s0"] == (3, 4)  # ab(1) + ab(1) + cd(2)
    assert m["s1"] == (1, 1)


def test_source_signature_terms_idf_zero_for_common(spark):
    import __spark_entry__ as e

    # shared term in every source scores 0; rare term outranks it
    docs = spark.createDataFrame(
        [(1, "common rare0", "s0"), (2, "common rare1", "s1")],
        "doc_id long, text string, source string",
    )
    # drive the inline kernel through the same code path with a temp
    # shim: reuse its scoring pieces directly
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt
    from pyspark.sql import functions as F, Window as W

    ex = docs.select("source", F.explode(txt.words(txt.normalize_text(F.col("text")))).alias("term"))
    tf = ex.groupBy("source", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    st = docs.select("source").distinct().agg(F.count(F.lit(1)).cast("long").alias("s"))
    scored = tf.join(dfx, "term").crossJoin(F.broadcast(st)).withColumn(
        "score", F.expr("tf * (length(bin(s div df)) - 1)").cast("long")
    )
    rows = {(r["source"], r["term"]): r["score"] for r in scored.collect()}
    assert rows[("s0", "common")] == 0
    assert rows[("s0", "rare0")] == 1  # tf=1 * floor(log2(2/1))=1


def test_ct_langid_separates_clear_profiles(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.classify import ct_char_profiles, ct_predict

    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb aaaa bbbb", "x"),
            (2, "aaaa bbbb aaaa", "x"),
            (3, "zzzz yyyy zzzz yyyy", "y"),
            (4, "zzzz yyyy zzzz", "y"),
            (5, "", "x"),  # empty text: no trigrams, no prediction row
        ],
        "doc_id long, text string, lang string",
    )
    prof = ct_char_profiles(docs)
    pred = {r["doc_id"]: r["pred_lang"] for r in ct_predict(docs, prof).collect()}
    assert pred[1] == "x" and pred[2] == "x"
    assert pred[3] == "y" and pred[4] == "y"
    assert 5 not in pred


def test_ann_int8_rerank_finds_duplicate_vector(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.quantize import ann_int8_rerank
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    rows.append((100, list(rows[3][1])))  # exact duplicate of vec 3
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann_int8_rerank(embs, embs.filter(F.col("vec_id") == 100), k_cand=5, k_out=3)
    top = out.filter(F.col("rnk") == 1).first()
    assert top["vec_id"] == 3  # the duplicate is the nearest neighbor
    assert top["cos_q20"] == 1 << 20  # cosine exactly 1


def test_frequency_capping_exact(spark):
    import datetime as dt

    rows = []
    # user 1: 5 clicks on one day -> 3 served, 2 suppressed
    for i in range(5):
        rows.append((i, dt.datetime(2024, 1, 1, 10, i), 1, "click", 1.0))
    # user 2: 2 clicks -> all served
    rows += [(10, dt.datetime(2024, 1, 1, 9, 0), 2, "click", 1.0),
             (11, dt.datetime(2024, 1, 1, 9, 5), 2, "click", 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from pyspark.sql import functions as F, Window as W

    w = W.partitionBy("user_id", "event_type", F.date_format("ts", "yyyy-MM-dd")).orderBy(
        "ts", "event_id"
    )
    ranked = df.withColumn("_rn", F.row_number().over(w))
    out = ranked.groupBy("event_type").agg(
        F.sum((F.col("_rn") <= 3).cast("long")).alias("served"),
        F.sum((F.col("_rn") > 3).cast("long")).alias("suppressed"),
        F.countDistinct(F.when(F.col("_rn") > 3, F.col("user_id"))).alias("affected"),
    ).first()
    assert (out["served"], out["suppressed"], out["affected"]) == (5, 2, 1)


def test_hill_share_half_max_at_mean(spark):
    # when x*n == S (x equals the mean), the Hill share is exactly 1/2
    df = spark.createDataFrame([(100, 4, 400)], "x long, n long, s long")
    from pyspark.sql import functions as F

    got = df.select(
        F.expr(
            "cast(floor(cast(cast(x as decimal(38,0)) * n * (cast(x as decimal(38,0)) * n) as double)"
            " / (cast(cast(x as decimal(38,0)) * n * (cast(x as decimal(38,0)) * n) as double)"
            "    + cast(cast(s as decimal(38,0)) * s as double))"
            " * 1048576 + 0.5e0) as bigint)"
        ).alias("q")
    ).first()["q"]
    assert got == (1 << 20) // 2
