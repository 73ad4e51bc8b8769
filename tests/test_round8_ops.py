"""Round-8 session additions: LSH hot-bucket cause analysis, template
screen, dedup ROI, Heaps vocab growth, n-gram novelty, label centroid
drift, effective frequency, channel affinity, session depth, quantile
treatment effects, and the streaming bounce/data-quality twins."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.llm import embquality as embq
from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim
from marketing_attribution_etl_framework__maef_spark.llm import text as txt
from marketing_attribution_etl_framework__maef_spark.operators import (
    experiments as xpr,
    planning as pln,
    sessions as sess,
)

import datetime as _dt


def _ts(h, m):
    return _dt.datetime(2024, 1, 1, h, m, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, r[0], r[1], r[2], r[3]) for i, r in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).withColumn("props", F.lit('{"k": 1}'))


# ------------------------------------------------------------ hot buckets


def test_lsh_hot_bucket_terms_flags_shared_shingle(spark):
    body = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, body), (4, "totally different words here now")],
        "doc_id long, text string",
    )
    out = dd.lsh_hot_bucket_terms(docs, min_size=3).collect()
    # docs 1-3 are identical -> every band bucket they share has size 3
    assert out, "expected at least one hot bucket"
    for r in out:
        assert r["bucket_size"] == 3
        assert r["member_df"] == 3
        assert r["corpus_df"] == 3
        assert r["top_shingle"].startswith("alpha")


# ------------------------------------------------------------ template docs


def test_template_docs_cross_multiplied_threshold(spark):
    shared = "one two three four five six"  # 4 shingles, all shared by 1+2
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "unique private content entirely fresh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dd.template_docs(docs).collect()}
    assert got[1]["n_shingles"] == 4 and got[1]["n_boilerplate"] == 4
    assert got[1]["is_template"] and got[2]["is_template"]
    assert got[3]["n_boilerplate"] == 0 and not got[3]["is_template"]


# ------------------------------------------------------------ dedup ROI


def test_dedup_roi_family_accounting(spark):
    # doc 2 = exact dup of doc 1; doc 3 near-dups doc 1 (hand cluster);
    # doc 4 unrelated
    t1 = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(1, t1), (2, t1.upper() + "  "), (3, t1 + " again"), (4, "short text")],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    got = {r["family"]: (r["n_units"], r["chars_removed"]) for r in
           dd.dedup_roi(docs, clusters).collect()}
    assert got["corpus"][0] == 4
    # exact: doc 2 (normalized == doc 1), chars = len(norm(t1))
    assert got["exact"] == (1, len(t1))
    # near_dup: docs 2,3 are non-survivors; doc 2 already counted by
    # exact -> marginal = doc 3 only
    assert got["near_dup"] == (1, len(t1 + " again"))
    assert got["cdc_chunks"][0] >= 1  # dup docs share chunks


# ------------------------------------------------------------ vocab growth


def test_vocab_growth_cumulative(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (4, "a c"), (9, "d d")], "doc_id long, text string"
    )
    out = {r["bucket"]: r for r in txt.vocab_growth(docs).collect()}
    # max id 9 -> bucket = id (deciles); terms a,b new at 0; c at 4; d at 9
    assert out[0]["n_tokens"] == 2 and out[0]["new_terms"] == 2
    assert out[4]["new_terms"] == 1
    assert out[9]["n_tokens"] == 2 and out[9]["new_terms"] == 1
    assert out[9]["cum_tokens"] == 6 and out[9]["cum_vocab"] == 4


# ------------------------------------------------------------ ngram novelty


def test_ngram_novelty_anti_join(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (0, base, "web"),         # even half
            (1, base, "web"),         # odd, same gram -> not novel
            (3, "n1 n2 n3 n4 n5 n6 n7 n8", "web"),  # odd, novel
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in txt.ngram_novelty(docs).collect()}
    assert out["web"]["n_grams"] == 2
    assert out["web"]["n_novel"] == 1
    assert out["web"]["novelty_q20"] == 1048576 // 2


# ------------------------------------------------------------ label drift


def test_label_centroid_drift_zero_and_positive(spark):
    rows = [
        # label 7: identical distribution in both halves -> drift 0
        (0, [1.0, 0.0], 7),
        (1, [1.0, 0.0], 7),
        # label 8: even half along x, odd half along y -> max drift
        (2, [1.0, 0.0], 8),
        (3, [0.0, 1.0], 8),
        # label 9: only one half -> dropped
        (4, [1.0, 0.0], 9),
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in embq.label_centroid_drift(embs).collect()}
    assert got[7]["drift_q20"] == 0
    # |1-0| + |0-1| = 2.0 -> 2 * 2^20 in q20
    assert got[8]["drift_q20"] == 2 * 1048576
    assert 9 not in got


# ------------------------------------------------------------ effective freq


def test_effective_frequency_bit_buckets(spark):
    rows = [
        (_ts(0, 0), 1, "click", 1.0),   # u1: 1 touch (bucket 1), no buy
        (_ts(0, 1), 2, "click", 1.0),   # u2: 2 touches (bucket 2) + buy
        (_ts(0, 2), 2, "view", 1.0),
        (_ts(0, 3), 2, "purchase", 10.0),
    ]
    got = {r["touch_bucket"]: r for r in
           pln.effective_frequency(_events(spark, rows)).collect()}
    assert got[1]["n_users"] == 1 and got[1]["n_buyers"] == 0
    assert got[2]["n_users"] == 1 and got[2]["n_buyers"] == 1
    assert got[2]["buy_rate_q20"] == 1048576


# ------------------------------------------------------------ affinity


def test_channel_affinity_lift(spark):
    rows = [
        (_ts(0, 0), 1, "click", 1.0),
        (_ts(0, 1), 1, "view", 1.0),
        (_ts(0, 2), 2, "click", 1.0),
        (_ts(0, 3), 2, "view", 1.0),
        (_ts(0, 4), 3, "click", 1.0),
        (_ts(0, 5), 4, "signup", 1.0),
    ]
    got = {(r["channel_a"], r["channel_b"]): r for r in
           pln.channel_affinity(_events(spark, rows)).collect()}
    r = got[("click", "view")]
    # n_click=3, n_view=2, co=2, users=4 -> lift = 2*4/(3*2) = 4/3
    assert (r["n_a"], r["n_b"], r["n_pair"]) == (3, 2, 2)
    assert r["lift_q20"] == (2 * 2 * 4 * 1048576 + 3 * 2) // (2 * 3 * 2)


# ------------------------------------------------------------ session depth


def test_session_depth_buckets(spark):
    rows = [
        (_ts(0, 0), 1, "click", 1.0),
        (_ts(0, 10), 1, "view", 1.0),
        (_ts(0, 20), 1, "view", 1.0),
        # 31-min gap -> new session of depth 1
        (_ts(0, 51), 1, "signup", 1.0),
    ]
    got = {(r["entry_channel"], r["depth_bucket"]): r["n_sessions"] for r in
           sess.session_depth(_events(spark, rows)).collect()}
    assert got[("click", 3)] == 1
    assert got[("signup", 1)] == 1


# ------------------------------------------------------------ ab quantiles


def _variant(user_id: int, salt: str = "ab") -> str:
    h = hashlib.md5(f"{user_id}|{salt}".encode()).hexdigest()
    return "A" if int(h[:15], 16) % 100 < 50 else "B"


def test_ab_quantile_effects_percentile_disc(spark):
    # build buyers with known cents; split computed with the same md5
    rows = []
    for u in range(1, 21):
        rows.append((_ts(1, u % 60), u, "purchase", float(u)))
    out = xpr.ab_quantile_effects(_events(spark, rows)).collect()
    by_p = {round(r["p"], 2): r for r in out}
    assert set(by_p) == {0.25, 0.5, 0.75}
    # recompute expected PERCENTILE_DISC per variant in python
    import math

    cents = {"A": [], "B": []}
    for u in range(1, 21):
        cents[_variant(u)].append(u * 100)
    for p in (0.25, 0.5, 0.75):
        r = by_p[round(p, 2)]
        for v, col in (("A", "cents_a"), ("B", "cents_b")):
            vals = sorted(cents[v])
            want = vals[math.ceil(p * len(vals)) - 1]
            assert r[col] == want, (p, v, r[col], want)
        assert r["diff_cents"] == r["cents_b"] - r["cents_a"]


# ------------------------------------------------------------ streaming twins


def test_stream_bounce_equals_batch(spark, sf_dir):
    import __spark_entry__ as entry
    from marketing_attribution_etl_framework__maef_spark import domain

    got = sorted(map(tuple, entry.q_stream_bounce(spark, sf_dir).collect()))
    want = sorted(map(tuple, sess.bounce_rate(domain.events(spark, sf_dir)).collect()))
    assert got == want and got


def test_stream_dq_counters_match_batch(spark, sf_dir):
    import __spark_entry__ as entry
    from marketing_attribution_etl_framework__maef_spark import domain

    got = sorted(map(tuple, entry.q_stream_dq(spark, sf_dir).collect()))
    ev = domain.events(spark, sf_dir)
    known = ["click", "view", "signup", "error", "purchase"]
    want = sorted(
        map(
            tuple,
            ev.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.col("value").isNull().cast("long")).cast("long").alias("n_null_value"),
                F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).cast("long").alias("n_neg_value"),
                F.sum((~F.col("event_type").isin(known)).cast("long")).cast("long").alias("n_unknown_type"),
                F.sum(F.get_json_object("props", "$.k").isNull().cast("long")).cast("long").alias("n_bad_props"),
            )
            .collect(),
        )
    )
    assert got == want and got


# ------------------------------------------------------------ wave 2


def test_sentence_stats_profile(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello world. Bye!", "web"),
            (2, "One two three?  Four.", "web"),
            (3, "...", "forum"),  # only separators -> no sentences
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in txt.sentence_stats(docs).collect()}
    w = got["web"]
    # sentences: "hello world"(11), "bye"(3), "one two three"(13), "four"(4)
    assert w["n_docs"] == 2 and w["n_sentences"] == 4
    assert w["total_chars"] == 11 + 3 + 13 + 4
    assert w["max_len"] == 13
    assert w["mean_len_q20"] == (2 * 31 * 1048576 + 4) // (2 * 4)
    assert "forum" not in got


def test_lsh_cost_audit_accounting(spark):
    body = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, body), (4, "other unrelated words entirely")],
        "doc_id long, text string",
    )
    rows = {r["scope"]: r for r in dd.lsh_cost_audit(docs).collect()}
    # per band: docs 1-3 share every bucket -> predicted 3 per band
    for b in ("0", "1", "2", "3"):
        assert rows[b]["predicted_pairs"] == 3
        assert rows[b]["actual_pairs"] == rows[b]["predicted_pairs"]
    # all: 12 predicted across bands, 3 distinct actual pairs
    assert rows["all"]["predicted_pairs"] == 12
    assert rows["all"]["actual_pairs"] == 3


def test_error_impact_split(spark):
    rows = [
        (_ts(1, 0), 1, "error", 1.0),
        (_ts(1, 1), 1, "purchase", 5.0),
        (_ts(1, 2), 2, "click", 1.0),
        (_ts(1, 3), 3, "error", 1.0),
    ]
    got = {r["has_error"]: r for r in pln.error_impact(_events(spark, rows)).collect()}
    assert got[True]["n_users"] == 2 and got[True]["n_buyers"] == 1
    assert got[False]["n_users"] == 1 and got[False]["n_buyers"] == 0


def test_stream_vocab_store_merge_law(spark, tmp_path):
    """The streaming vocab store equals the batch term table regardless
    of how the file source slices micro-batches."""
    from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c c d")], "doc_id long, text string"
    )
    # two parquet files -> at least two micro-batches under maxFilesPerTrigger
    docs.filter("doc_id <= 2").write.parquet(str(tmp_path / "in" / "p1"))
    docs.filter("doc_id = 3").write.parquet(str(tmp_path / "in" / "p2"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    drv = inc.IncrementalVocabStore(spark, str(tmp_path / "store"))
    drv.start(stream, checkpoint=str(tmp_path / "ckpt")).awaitTermination()
    got = {r["term"]: (r["first_doc"], r["n_occurrences"]) for r in drv.store().collect()}
    assert got == {"a": (1, 2), "b": (1, 2), "c": (2, 3), "d": (3, 1)}


def test_stream_depth_and_frequency_equal_batch(spark, sf_dir):
    import __spark_entry__ as entry
    from marketing_attribution_etl_framework__maef_spark import domain

    got_d = sorted(map(tuple, entry.q_stream_depth(spark, sf_dir).collect()))
    want_d = sorted(
        map(tuple, sess.session_depth(domain.events(spark, sf_dir)).collect())
    )
    assert got_d == want_d and got_d
    got_f = sorted(map(tuple, entry.q_stream_frequency(spark, sf_dir).collect()))
    want_f = sorted(
        map(tuple, pln.effective_frequency(domain.events(spark, sf_dir)).collect())
    )
    assert got_f == want_f and got_f


# ------------------------------------------------------------ wave 3


def test_forecast_model_selection_picks_lower_mae(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import timeseries as tsr

    # 15 days of perfectly weekly-seasonal spend -> seasonal-naive is
    # exact (MAE 0) while EWMA is not
    rows = []
    for d in range(15):
        rows.append(
            (_dt.datetime(2024, 1, 1 + d, 12, 0, 0), 1, "click", float(10 + (d % 7)))
        )
    out = {r["channel"]: r for r in
           tsr.forecast_model_selection(_events(spark, rows)).collect()}
    c = out["click"]
    assert c["snaive_mae_q20"] == 0
    assert c["ewma_mae_q20"] > 0
    assert c["best_model"] == "seasonal_naive"


def test_ltv_concentration_gini(spark):
    from marketing_attribution_etl_framework__maef_spark.operators import concentration as conc

    rows = [
        (_ts(1, 0), 1, "click", 1.0),
        (_ts(1, 1), 1, "purchase", 10.0),   # u1: 1000 cents
        (_ts(1, 2), 2, "click", 1.0),       # u2: 0 cents
        (_ts(1, 3), 3, "view", 1.0),
        (_ts(1, 4), 3, "purchase", 5.0),    # u3: 500 cents
    ]
    got = {r["channel"]: r for r in
           conc.ltv_concentration(_events(spark, rows)).collect()}
    # click audience: (0, 1000) -> gini = (2*(1*0+2*1000)-(3)*1000)/(2*1000)
    click = got["click"]
    assert click["n_units"] == 2 and click["total_cents"] == 1000
    assert click["gini_q20"] == ((2 * 2000 - 3 * 1000) * 1048576) // (2 * 1000)
    view = got["view"]
    assert view["n_units"] == 1 and view["gini_q20"] == 0


def test_filtered_topk_respects_label(spark):
    embs = spark.createDataFrame(
        [
            (7, [1.0, 0.0], 1),       # query (7 % 50 == 7), label 1
            (1, [1.0, 0.1], 1),       # same label, close
            (2, [1.0, 0.0], 2),       # perfect match but WRONG label
            (3, [0.0, 1.0], 1),       # same label, far
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = sim.filtered_topk(embs, embs.filter("vec_id = 7"), k=10)
    ids = [r["vec_id"] for r in out.orderBy("rnk").collect()]
    assert 2 not in ids            # filtered out despite cos=1
    assert ids[0] == 7             # self first
    assert set(ids) == {7, 1, 3}


def test_length_mix_shares_sum(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.q_length_mix(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        tot = sum(r["n_docs"] for r in rs)
        assert tot > 0
        # half-up q20 shares sum to ~1 within rounding slack
        s = sum(r["share_q20"] for r in rs)
        assert abs(s - 1048576) <= len(rs)


def test_waveform_stats_drops_empty_payloads(spark):
    """ADVICE r07: empty payloads must be filtered BEFORE the Python
    stage so the Spark row set matches the oracle's LENGTH(text) > 0
    population."""
    from marketing_attribution_etl_framework__maef_spark.llm import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "")], "doc_id long, text string"
    )
    media = mm.attach_binary(docs)
    got = {r["doc_id"]: r for r in mm.waveform_stats(media).collect()}
    assert 1 in got and 2 not in got
    assert got[1]["n_samples"] == 3


# ------------------------------------------------------------ wave 5


def test_touch_agreement_and_length_dist(spark, sf_dir):
    """first==last for every single-touch journey, so agreement >= the
    single-touch share; histogram mass equals the journey count."""
    import __spark_entry__ as entry

    agree = entry.q_touch_agreement(spark, sf_dir).collect()
    dist = {r["n_touchpoints"]: r["n_journeys"] for r in
            entry.q_journey_length_dist(spark, sf_dir).collect()}
    n_conv = sum(dist.values())
    assert sum(r["n_conversions"] for r in agree) == n_conv
    n_same = sum(r["n_same_channel"] for r in agree)
    assert n_same >= dist.get(1, 0)
    for r in agree:
        assert 0 <= r["agreement_q20"] <= 1048576


def test_attribution_gini_bounds(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.q_attribution_gini(spark, sf_dir).collect()
    assert {r["model"] for r in rows} == {
        "linear", "first_touch", "last_touch", "u_shaped"
    }
    for r in rows:
        assert 0 <= r["gini_q20"] < 1048576
    # all four models distribute the SAME total credit (sum ihc = 1
    # per conversion), modulo per-row q20 rounding
    totals = [r["total_credit_q20"] for r in rows]
    assert max(totals) - min(totals) <= sum(
        r["n_channels"] for r in rows
    ) * 4096


def test_stream_error_impact_and_length_mix_equal_batch(spark, sf_dir):
    import __spark_entry__ as entry
    from marketing_attribution_etl_framework__maef_spark import domain

    got = sorted(map(tuple, entry.q_stream_error_impact(spark, sf_dir).collect()))
    want = sorted(map(tuple, pln.error_impact(domain.events(spark, sf_dir)).collect()))
    assert got == want and got
    got_m = sorted(map(tuple, entry.q_stream_length_mix(spark, sf_dir).collect()))
    want_m = sorted(map(tuple, entry.q_length_mix(spark, sf_dir).collect()))
    assert got_m == want_m and got_m


def test_template_share_rollup_consistent(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.q_template_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_templates"] <= r["n_docs"]
        assert 0 <= r["template_q20"] <= 1048576
