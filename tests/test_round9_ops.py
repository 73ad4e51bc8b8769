"""Round-9 session additions: IVF nprobe/recall frontier, the dedup
e2e chain gate, the L27 sessionizer oracle device (sentinel flush +
tie-break), and the tie-safe paginated greedy-coverage pool."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import coverage as cov
from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim


# ------------------------------------------------------- probe frontier


def _vec_corpus(spark):
    # 8 "centroid seed" vectors on distinct axes (vec_id 0-7), then
    # corpus vectors clustered tightly around axis 0 and axis 1
    rows = []
    for i in range(8):
        v = [0.0] * 8
        v[i] = 1.0
        rows.append((i, v))
    for i in range(8, 20):
        v = [0.0] * 8
        v[i % 2] = 1.0
        v[(i % 2) + 2] = 0.05 * (i - 7)  # tilt so cosines are distinct
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_probe_frontier_monotone_and_exact_at_full_probe(spark):
    corpus = _vec_corpus(spark)
    queries = corpus.filter(F.col("vec_id").isin(8, 9))
    cents = corpus.filter(F.col("vec_id") < 8)
    out = {
        r["probe"]: r
        for r in sim.ivf_probe_frontier(
            corpus, queries, cents, k=3, probes=(1, 2, 8)
        ).collect()
    }
    assert set(out) == {1, 2, 8}
    # monotone: recall and scanned volume never drop as probe grows
    assert out[1]["sum_hits"] <= out[2]["sum_hits"] <= out[8]["sum_hits"]
    assert out[1]["n_candidates"] <= out[2]["n_candidates"] <= out[8]["n_candidates"]
    # probing every centroid IS the brute scan: perfect recall, full volume
    n_q, n_c = 2, corpus.count()
    assert out[8]["sum_hits"] == 3 * n_q
    assert out[8]["recall_q20"] == 1048576
    assert out[8]["n_candidates"] == n_q * n_c
    assert out[8]["scan_share_q20"] == 1048576


def test_ivf_probe_frontier_matches_single_point_audit(spark):
    corpus = _vec_corpus(spark)
    queries = corpus.filter(F.col("vec_id").isin(8, 9, 10))
    cents = corpus.filter(F.col("vec_id") < 8)
    frontier = {
        r["probe"]: r["sum_hits"]
        for r in sim.ivf_probe_frontier(
            corpus, queries, cents, k=3, probes=(2,)
        ).collect()
    }
    audit = sim.ann_recall_audit(corpus, queries, cents, k=3, probe=2)
    assert frontier[2] == audit.agg(F.sum("n_hits")).collect()[0][0]


# ------------------------------------------------------- greedy refills


def test_greedy_coverage_tie_heavy_pool_is_bit_identical(spark):
    # every doc has the SAME initial gain (3 distinct shingles), so the
    # page-0 threshold ties with every winner gain — the regime that
    # forced the old Spark-tail fallback at sf0.1.  Tiny pages force
    # refills; selections must equal the unpruned formulation.
    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(1, 11)],
        "doc_id long, text string",
    )
    small = [
        tuple(r)
        for r in cov.greedy_coverage(docs, k=6, candidate_pool=2).collect()
    ]
    full = [
        tuple(r)
        for r in cov.greedy_coverage(docs, k=6, candidate_pool=10_000).collect()
    ]
    assert small == full
    # uniform gains + id tie-break => picks ids 1..6 in order
    assert [r[1] for r in small] == [1, 2, 3, 4, 5, 6]


def test_greedy_coverage_boundary_tie_goes_to_pooled_doc(spark):
    # pool of 1: page 0 holds only doc 1; doc 2 ties at the threshold
    # but has a larger id, so round 1 must pick doc 1 WITHOUT a refill
    # (g == t and d <= boundary_id), and round 2 must refill to find
    # doc 2.
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q r s t")],
        "doc_id long, text string",
    )
    out = [tuple(r) for r in cov.greedy_coverage(docs, k=2, candidate_pool=1).collect()]
    assert [r[1] for r in out] == [1, 2]
    assert [r[2] for r in out] == [3, 3]  # 3 word-3-shingles each


# ---------------------------------------------- sessionizer tie-break


def test_sessionizer_tiebreak_orders_equal_timestamps(spark, tmp_path):
    from marketing_attribution_etl_framework__maef_spark.streaming.sessionize import sessionize

    t0 = _dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: three events at the SAME timestamp — channel order
        # must follow event_id, then a far-future flush event closes it
        (3, t0, 1, "c_third"),
        (1, t0, 1, "a_first"),
        (2, t0, 1, "b_second"),
        (9, t0 + _dt.timedelta(hours=2), 1, "zz_flush"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
    ).parquet(src)
    out = sessionize(
        stream, gap_minutes=30, max_events=20, watermark="0 seconds", tiebreak="event_id"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("r9_sess_tb")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM r9_sess_tb").collect()
    real = [r for r in got if r["channels"] != "zz_flush"]
    assert len(real) == 1
    assert real[0]["channels"] == "a_first,b_second,c_third"
    assert real[0]["n_events"] == 3


# ------------------------------------------------------- surprisal mix


def test_surprisal_mix_bands_and_shares(spark):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    # corpus of 8 words total: "a" x4, "b" x2, "c" x1, "d" x1
    # bits(t) = len(bin(8 div n_t)) - 1: a->1, b->2, c->3, d->3
    docs = spark.createDataFrame(
        [
            (1, "s1", "a a a a"),       # mean bits = 4/4 = 1 -> band 1
            (2, "s1", "b b c d"),       # (2+2+3+3)/4 = 10/4 -> band 2
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["source"], r["band_bits"]): r for r in txt.surprisal_mix(docs).collect()}
    assert set(out) == {("s1", 1), ("s1", 2)}
    assert out[("s1", 1)]["n_docs"] == 1
    # share of each band within s1 = 1/2 -> q20 half = 524288
    assert out[("s1", 1)]["share_q20"] == 524288
    assert out[("s1", 2)]["share_q20"] == 524288


# --------------------------------------------------- pack fragmentation


def test_pack_fragmentation_conserves_docs_and_chars(spark, sf_dir):
    import __spark_entry__ as e

    m = e.q_pack_fragmentation(spark, sf_dir).collect()
    docs = e._docs(spark, sf_dir).filter("n_chars > 0")
    assert sum(r["n_docs"] for r in m) == docs.count()
    assert sum(r["total_chars"] for r in m) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    # shares sum to ~1 in q20 (half-up rounding keeps it within n rows)
    s = sum(r["doc_share_q20"] for r in m)
    assert abs(s - 1048576) <= len(m)


# --------------------------------------------------------- skew profile


def test_skew_profile_invariants(spark, sf_dir):
    import __spark_entry__ as e

    rows = {r["relation"]: r for r in e.q_rel_skew_profile(spark, sf_dir).collect()}
    assert set(rows) == {
        "events.user_id",
        "lineitem.l_orderkey",
        "orders.o_custkey",
    }
    for r in rows.values():
        assert 1 <= r["p50_rows"] <= r["p99_rows"] <= r["max_rows"]
        assert r["n_keys"] <= r["n_rows"]
        # top share consistent with max_rows / n_rows (half-up q20)
        expect = (2 * r["max_rows"] * 1048576 + r["n_rows"]) // (2 * r["n_rows"])
        assert r["top_share_q20"] == expect


# ----------------------------------------------- streaming quality gate


def test_stream_quality_gate_matches_batch_gate(spark, sf_dir):
    import __spark_entry__ as e

    got = {
        (r["reasons"], r["n_docs"])
        for r in e.q_stream_quality_gate(spark, sf_dir).collect()
    }
    want = {
        (r["reasons"], r["n"])
        for r in e.q_quality_gate(spark, sf_dir)
        .groupBy("reasons")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want


# --------------------------------------------------- fertility drift


def test_fertility_drift_halves_sum_to_corpus(spark, sf_dir):
    import __spark_entry__ as e

    halves = e.q_fertility_drift(spark, sf_dir).collect()
    assert {r["half"] for r in halves} == {0, 1}
    tot = e.q_tokenizer_fertility(spark, sf_dir).agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    assert sum(r["n_words"] for r in halves) == tot["w"]
    assert sum(r["n_bpe_tokens"] for r in halves) == tot["t"]


# ------------------------------------------------- template dup lift


def test_template_dup_partitions_corpus(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.q_template_dup(spark, sf_dir).collect()
    n_flagged = sum(r["n_docs"] for r in rows)
    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd

    assert n_flagged == dd.template_docs(e._aug_docs(spark, sf_dir)).count()
    for r in rows:
        assert 0 <= r["n_dup_docs"] <= r["n_docs"]


# -------------------------------------------------- dedup chain gate


def test_dedup_pipeline_conservation(spark, sf_dir):
    import __spark_entry__ as e

    rows = {r["stage"]: r for r in e.q_dedup_pipeline(spark, sf_dir).collect()}
    assert set(rows) == {"exact", "near_dup", "cdc_chunks", "semantic"}
    ex, nd, cdc, sem = (
        rows["exact"],
        rows["near_dup"],
        rows["cdc_chunks"],
        rows["semantic"],
    )
    # doc counts thread through the chain
    assert ex["n_in"] - ex["n_removed"] == ex["n_out"] == nd["n_in"]
    assert nd["n_in"] - nd["n_removed"] == nd["n_out"] == cdc["n_in"] == cdc["n_out"]
    # chain cdc mass never exceeds the full-corpus (standalone) ledger
    assert cdc["mass_removed"] <= cdc["mass_standalone"]
    # exact/near marginal == ledger by definition
    assert ex["mass_removed"] == ex["mass_standalone"]
    # semantic conservation on the embedding side
    assert sem["n_in"] - sem["n_removed"] == sem["n_out"]


# --------------------------------------------------- streaming skew


def test_stream_skew_matches_batch_events_row(spark, sf_dir):
    import __spark_entry__ as e

    got = e.q_stream_skew(spark, sf_dir).collect()
    assert len(got) == 1
    batch = {
        r["relation"]: r for r in e.q_rel_skew_profile(spark, sf_dir).collect()
    }["events.user_id"]
    s = got[0]
    for c in (
        "n_rows",
        "n_keys",
        "max_rows",
        "top_share_q20",
        "p50_rows",
        "p99_rows",
    ):
        assert s[c] == batch[c], c


# ------------------------------------------------ attribution tau


def test_attribution_tau_partitions_pairs(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.q_attribution_tau(spark, sf_dir).collect()
    assert len(rows) == 6  # C(4 models, 2)
    n_channels = (
        e.q_model_comparison(spark, sf_dir)
        .select("channel_label")
        .distinct()
        .count()
    )
    expect_pairs = n_channels * (n_channels - 1) // 2
    for r in rows:
        assert r["n_pairs"] == expect_pairs
        # concordant / discordant / tied partition the pair set
        assert r["concordant"] + r["discordant"] + r["tied"] == r["n_pairs"]
        assert r["model_a"] < r["model_b"]


# ------------------------------------------------ transition dwell


def test_transition_dwell_counts_journey_steps(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.q_transition_dwell(spark, sf_dir).collect()
    total = sum(r["n_transitions"] for r in rows)
    # every journey of length n contributes exactly n-1 transitions
    per_conv = (
        e._journeys(spark, sf_dir)
        .groupBy("conversion_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1))
        .collect()[0][0]
    )
    assert total == per_conv
    for r in rows:
        assert r["gap_bucket"] >= 0
        assert r["n_transitions"] >= 1


# ------------------------------------------------ shard balance


def test_shard_balance_invariants(spark, sf_dir):
    import __spark_entry__ as e

    r = e.q_shard_balance(spark, sf_dir).collect()[0]
    assert 1 <= r["n_shards"] <= 256
    assert r["min_chars"] <= r["p50_chars"] <= r["max_chars"]
    # imbalance = max * n / total >= 1 always (q20 >= 2^20)
    assert r["imbalance_q20"] >= 1048576
    docs = e._docs(spark, sf_dir).filter("n_chars > 0")
    assert r["total_chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
