"""Round-6 operator unit tests on handmade fixtures: media analytics
(reach, lag, position credit, volume OLS), KMV theta intersection,
product-quantization ANN, split/leakage audit, and the partitioned
sink's pruning pin."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.pq import ann_pq_rerank
from marketing_attribution_etl_framework__maef_spark.llm.splits import assign_split, split_summary
from marketing_attribution_etl_framework__maef_spark.operators.media import (
    conversion_lag_histogram,
    position_credit,
    reach_curve,
    volume_response_ols,
)
from marketing_attribution_etl_framework__maef_spark.operators.sketches import kmv_overlap

Q = 1 << 20


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_reach_curve_counts_first_touch_only(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0),
            (2, "2024-01-02 10:00:00", 1, "click", 1.0),  # repeat user: not new
            (3, "2024-01-02 11:00:00", 2, "click", 1.0),
            (4, "2024-01-01 09:00:00", 9, "purchase", 5.0),  # excluded
        ],
    )
    out = {r["event_day"]: r for r in reach_curve(ev).collect()}
    assert out["2024-01-01"]["new_users"] == 1 and out["2024-01-01"]["cum_reach"] == 1
    assert out["2024-01-02"]["new_users"] == 1 and out["2024-01-02"]["cum_reach"] == 2


def test_conversion_lag_buckets_are_exact_bits(spark):
    j = spark.createDataFrame(
        [
            # lag 0 us -> bucket bits(1)-1 = 0
            ("c0", "s1", "2024-01-01 00:00:00", "2024-01-01 00:00:00", 10.0),
            # lag 3 us -> bits(4)-1 = 2
            ("c1", "s2", "2024-01-01 00:00:00.000003", "2024-01-01 00:00:00", 20.0),
            # second touch later: first touch decides the lag
            ("c1", "s3", "2024-01-01 00:00:00.000003", "2024-01-01 00:00:00.000002", 20.0),
        ],
        "conversion_id string, session_id string, conv_ts string, event_ts string, revenue double",
    ).withColumn("conv_ts", F.col("conv_ts").cast("timestamp")).withColumn(
        "event_ts", F.col("event_ts").cast("timestamp")
    )
    out = {r["lag_bucket"]: r for r in conversion_lag_histogram(j).collect()}
    assert out[0]["n_conversions"] == 1 and out[0]["revenue_cents"] == 1000
    assert out[2]["n_conversions"] == 1 and out[2]["revenue_cents"] == 2000


def test_position_credit_exact_thirds_and_fold(spark):
    rows = [("c", f"s{i}", f"2024-01-01 00:00:{i:02d}", 0.0) for i in range(3)]
    rows += [("d", f"t{i}", f"2024-01-01 00:00:{i:02d}", 0.0) for i in range(10)]
    j = spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts string, revenue double"
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    out = {r["position"]: r for r in position_credit(j).collect()}
    third = (2 * Q + 3) // 6  # exact q20 of 1/3
    tenth = (2 * Q + 10) // 20
    assert out[1]["n_touches"] == 2  # last touch of both journeys
    assert out[3]["credit_q20"] == third + tenth
    # journey d has 10 touches: positions 9 and 10 fold into 9
    assert out[9]["n_touches"] == 2 and out[9]["credit_q20"] == 2 * tenth


def test_volume_response_ols_recovers_exact_slope(spark):
    # x = 1,2,3 sessions; y = 10,20,30 cents -> slope exactly 10 c/session
    rows = []
    eid = 0
    for day, n in [("01", 1), ("02", 2), ("03", 3)]:
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{day} 10:00:{i:02d}", i, "click", 1.0))
        eid += 1
        rows.append((eid, f"2024-01-{day} 23:00:00", 99, "purchase", n * 0.10))
    out = volume_response_ols(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["channel"] == "click" and r["n_days"] == 3 and r["slope_q20"] == 10 * Q


def test_volume_response_ols_drops_constant_volume(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-02 10:00:00", 2, "view", 1.0),
    ]
    assert volume_response_ols(_events(spark, rows)).count() == 0


def test_kmv_overlap_exact_when_sketches_exact(spark):
    rows = [(i, f"2024-01-01 10:00:{i % 60:02d}", u, ch, 1.0)
            for i, (ch, u) in enumerate(
                [("a", u) for u in range(10)] + [("b", u) for u in range(5, 15)]
            )]
    out = kmv_overlap(
        _events(spark, rows).select(F.col("event_type").alias("channel"), "user_id"),
        "channel",
        "user_id",
    ).collect()
    assert len(out) == 1
    r = out[0]
    # both sketches exact (10 < 64 hashes) -> estimate IS the true overlap
    assert r["n_seen_a"] == 10 and r["n_seen_b"] == 10
    assert r["common"] == 5 and r["est_overlap"] == 5


def test_ann_pq_finds_identical_group_members(spark):
    # 4 orthogonal groups of 5 identical vectors; query 7 sits in group 1
    def vec(g):
        v = [0.0] * 64
        for d in range(16):
            v[g * 16 + d] = 1.0
        return v

    rows = [(i, vec(i // 5)) for i in range(20)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann_pq_rerank(embs)
    got = {(r["query_id"], r["rnk"]): r for r in out.collect()}
    # exactly one query (vec_id 7); its 4 groupmates rank first with cos 1
    assert {q for q, _ in got} == {7}
    top4 = [got[(7, k)] for k in range(1, 5)]
    assert [r["vec_id"] for r in top4] == [5, 6, 8, 9]
    assert all(r["cos_q20"] == Q for r in top4)
    assert got[(7, 5)]["cos_q20"] == 0  # cross-group: orthogonal


def _py_split(doc_id: int) -> str:
    h = int(hashlib.md5(f"{doc_id}|split".encode()).hexdigest()[:15], 16) % 20
    return "test" if h >= 19 else ("val" if h >= 18 else "train")


def test_assign_split_matches_reference_hash(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "s") for i in range(200)], "doc_id long, text string, source string"
    )
    out = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    for i in range(200):
        assert out[i] == _py_split(i)


def test_split_summary_flags_cross_split_leakage(spark):
    # find two doc ids landing in different splits, give them identical text
    a = 0
    b = next(i for i in range(1, 10_000) if _py_split(i) != _py_split(a))
    rows = [(a, "dup dup dup", "s"), (b, "DUP   dup dup", "s")]  # same normalized content
    rows += [(1_000_000 + i, f"unique {i}", "s") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = split_summary(docs).collect()
    assert sum(r["leaked_docs"] for r in out) == 2
    assert sum(r["n_docs"] for r in out) == 12
    # tokens: "dup dup dup" = 3 each for the leaked pair, 2 per unique doc
    assert sum(r["n_tokens"] for r in out) == 3 + 3 + 20


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    root = "/tmp/maef_spark_scratch/.part_test"
    shutil.rmtree(root, ignore_errors=True)
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0),
            (2, "2024-01-01 10:00:01", 2, "view", 1.0),
            (3, "2024-01-02 10:00:00", 3, "click", 2.0),
        ],
    )
    ev.write.partitionBy("event_type").mode("overwrite").parquet(root)
    back = spark.read.parquet(root).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the plan-pinned pruning evidence: the scan carries the partition
    # filter (inputFiles() reflects the UNPRUNED FileIndex, so it is
    # not usable as evidence — the filter lives in the physical scan)
    assert "PartitionFilters" in plan and "event_type" in plan
    assert back.count() == 2
    shutil.rmtree(root, ignore_errors=True)


def test_ivt_screen_flags_bursty_user(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quality import ivt_screen

    rows = [(i, f"2024-01-01 10:{i:02d}:00", 1, "click", 1.0) for i in range(8)]  # bot: 8/24h
    rows += [(100 + d, f"2024-01-{d + 1:02d} 10:00:00", 2, "click", 1.0) for d in range(3)]
    rows += [(200, "2024-01-01 12:00:00", 3, "view", 1.0)]
    out = {r["channel"]: r for r in ivt_screen(_events(spark, rows)).collect()}
    assert out["click"]["total_events"] == 11
    assert out["click"]["bot_events"] == 8 and out["click"]["bot_users"] == 1
    assert out["view"]["bot_events"] == 0 and out["view"]["bot_users"] == 0


def test_channel_synergy_exact_lift(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.media import channel_synergy

    rows = []
    for cid, chans in [("c1", ["a"]), ("c2", ["b"]), ("c3", ["a", "b"]), ("c4", ["a", "b"])]:
        for i, ch in enumerate(chans):
            rows.append((cid, f"s{cid}{i}", f"2024-01-01 00:00:0{i}", ch))
    j = spark.createDataFrame(
        rows, "conversion_id string, session_id string, event_ts string, channel_label string"
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    out = channel_synergy(j).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["channel_a"], r["channel_b"]) == ("a", "b")
    assert r["n_both"] == 2 and r["n_a"] == 3 and r["n_b"] == 3 and r["n_total"] == 4
    assert r["lift_q20"] == (2 * 4 * Q) // 9  # 8/9, truncating div


def test_cross_source_dup_matrix_prefix_key(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.dedup import cross_source_dup_matrix

    rows = [
        (1, "the quick brown fox jumps OVER", "s1"),
        (2, "The  quick brown fox jumps elsewhere", "s2"),  # same 5-word opening
        (3, "completely different text here now", "s1"),
        (4, "another unrelated document body text", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = cross_source_dup_matrix(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["shared_contents"] == 1 and r["contents_a"] == 2 and r["contents_b"] == 2


def test_hapax_docs_counts_df1_terms(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.text import hapax_docs

    rows = [
        (1, "alpha beta gamma"),      # alpha: df2, beta: df2, gamma: hapax
        (2, "alpha beta delta zeta"), # delta, zeta: hapax
        (3, "alpha alpha"),           # repeated within doc: one distinct term, df3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in hapax_docs(docs).collect()}
    assert out[1]["n_hapax"] == 1 and out[1]["n_terms"] == 3
    assert out[2]["n_hapax"] == 2 and out[2]["n_terms"] == 4
    assert out[3]["n_hapax"] == 0 and out[3]["n_terms"] == 1
    assert out[2]["hapax_ratio_q20"] == (2 * Q * 2 + 4) // 8  # exact q20 of 2/4
