"""Streaming ingestion + incremental attribution (SURVEY §2.9(a)) and
multimodal binary-column plumbing."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import domain
from marketing_attribution_etl_framework__maef_spark.llm import multimodal as mm
from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr
from marketing_attribution_etl_framework__maef_spark.operators import journeys as jny
from marketing_attribution_etl_framework__maef_spark.streaming import (
    IncrementalAttribution,
    stream_events,
    windowed_channel_volume,
)


def _stage_stream_files(spark, sf_dir, out_dir, n_files=2):
    """Split the events table into n time-ordered parquet files so
    availableNow + maxFilesPerTrigger produces multiple micro-batches."""
    ev = domain.load_table(spark, sf_dir, "events")
    bounds = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    mid = bounds.lo + (bounds.hi - bounds.lo) / n_files
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "f0")
    )
    ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "f1")
    )
    # flatten the part files into one source dir
    src = os.path.join(out_dir, "stream")
    os.makedirs(src, exist_ok=True)
    for i in range(n_files):
        d = os.path.join(out_dir, f"f{i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(d, f), os.path.join(src, f"batch{i}.parquet"))
    return src


def test_incremental_attribution_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_stream_files(spark, sf_dir, str(tmp_path))
    inc = IncrementalAttribution(spark, str(tmp_path / "wh"), model="linear")
    events = stream_events(spark, src, max_files_per_trigger=1)
    q = inc.start(events)
    q.awaitTermination(120)
    assert not q.isActive

    got = {
        (r.conv_id, r.session_id): round(r.ihc, 9)
        for r in inc.attribution().collect()
    }
    # batch reference: same journeys, same model
    journeys = jny.build_journeys(
        domain.conversions(spark, sf_dir),
        domain.session_sources(spark, sf_dir),
        strict_before=False,
        lookback_days=30,
    )
    want = {
        (r.conv_id, r.session_id): round(r.ihc, 9)
        for r in attr.attribute_linear(journeys).collect()
    }
    # streaming sees sessions only up to the conversion's batch; with
    # time-ordered files every session precedes its conversion's batch,
    # so the tables must match exactly
    assert got == want


def test_windowed_channel_volume(spark, sf_dir, tmp_path):
    src = _stage_stream_files(spark, sf_dir, str(tmp_path))
    events = stream_events(spark, src, watermark="1 hour")
    agg = windowed_channel_volume(events, window="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("chanvol")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.channel_name): r.n_sessions
        for r in spark.sql("SELECT * FROM chanvol").collect()
    }
    ev = domain.load_table(spark, sf_dir, "events")
    want = {
        (r.w, r.channel_name): r.n
        for r in ev.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.window("ts", "1 day").getField("start").alias("w"),
            F.col("event_type").alias("channel_name"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_dedup_stream(spark, sf_dir, tmp_path):
    """Streaming exact dedup drops replayed events within the
    watermark horizon."""
    from marketing_attribution_etl_framework__maef_spark.streaming import dedup_stream

    ev = domain.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "dupstream")
    os.makedirs(src, exist_ok=True)
    ev.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a"))
    for f in os.listdir(str(tmp_path / "a")):
        if f.endswith(".parquet"):
            shutil.copy(str(tmp_path / "a" / f), os.path.join(src, "once.parquet"))
            shutil.copy(str(tmp_path / "a" / f), os.path.join(src, "replay.parquet"))

    out = dedup_stream(stream_events(spark, src, watermark="365 days"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream_t").first()
    assert got.n == got.d == ev.count()


def test_multimodal_plumbing(spark, sf_dir):
    docs = domain.load_table(spark, sf_dir, "documents")
    media = mm.attach_binary(docs)
    rows = media.limit(5).collect()
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)
    assert all(r.n_bytes == len(r.payload) for r in rows)

    feats = mm.extract_features(media, fake=True)
    out = feats.limit(5).collect()
    assert all(len(r.features) == mm.FEATURE_DIM for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.features)
    # deterministic: same input -> same features
    a = sorted((r.doc_id, tuple(r.features)) for r in feats.collect())
    b = sorted((r.doc_id, tuple(r.features)) for r in mm.extract_features(media, fake=True).collect())
    assert a == b


def test_stripe_sums_exact(spark):
    """stripe_sums must reproduce hand-computed byte sums, including
    the short-payload tail (fewer stripes than n_stripes)."""
    docs = spark.createDataFrame([(0, "abcdefghij"), (3, "xy")], "doc_id long, text string")
    out = {
        (r.doc_id, r.stripe): (r.n_stripe_bytes, r.sum_bytes)
        for r in mm.stripe_sums(mm.attach_binary(docs), n_stripes=4).collect()
    }
    # doc 0: n=10, stripe_len=3 -> abc def ghi j
    assert out[(0, 0)] == (3, ord("a") + ord("b") + ord("c"))
    assert out[(0, 3)] == (1, ord("j"))
    # doc 3: n=2, stripe_len=1 -> x y (only 2 stripes emitted)
    assert out[(3, 0)] == (1, ord("x"))
    assert out[(3, 1)] == (1, ord("y"))
    assert (3, 2) not in out and len(out) == 6


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"abc", "image/png", fake=False)


def test_resize_images(spark, sf_dir):
    media = mm.attach_binary(domain.load_table(spark, sf_dir, "documents"))
    out = mm.resize_images(media, width=3, height=2, fake=True).collect()
    n_images = media.filter(F.col("media_type") == "image/png").count()
    assert len(out) == n_images > 0
    assert all(len(r.pixels) == 6 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.pixels)
    with pytest.raises(NotImplementedError):
        mm.resize_payload(b"abc", 2, 2, fake=False)


def test_frame_sampling(spark, sf_dir):
    media = mm.attach_binary(domain.load_table(spark, sf_dir, "documents"))
    frames = mm.sample_frames(media, n_frames=4, frame_bytes=16)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert got and all(r.n == 4 for r in got)
    one = frames.filter(F.col("frame_no") == 0).limit(1).first()
    assert len(one.frame) <= 16


def test_incremental_neardup_matches_batch(spark, tmp_path):
    """Streaming near-dup dedup (greedy first-wins) equals the batch
    cluster-survivor pipeline on star-shaped duplication: later exact
    and near copies are rejected, fresh documents are accepted, and
    within-batch duplicates resolve to the min-id canonical."""
    import time as _time

    from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
    from marketing_attribution_etl_framework__maef_spark.streaming import IncrementalNearDedup

    ta = "the quick brown fox jumps over the lazy dog and runs far away today"
    tb = "completely different words about rivers mountains valleys and forests under skies"
    tc = "a third unique document describing spark joins windows and shuffles in detail"
    td = "new content for batch two concerning matrices vectors and gradient descent methods"
    b1 = [(1, ta), (2, tb), (3, tc)]
    b2 = [
        (10, ta.upper() + "  "),          # exact dup of 1 -> rejected
        (11, tb + " tiny zz tail"),        # near dup of 2 -> rejected
        (12, td),                          # fresh -> accepted
        (13, td + "  "),                   # within-batch exact dup of 12 -> rejected
    ]
    src = str(tmp_path / "docs_stream")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate((b1, b2)):
        tmp = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"batch{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    nd = IncrementalNearDedup(spark, str(tmp_path / "state"))
    q = nd.start(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {r.doc_id for r in nd.survivors().collect()}
    assert got == {1, 2, 3, 12}

    # batch-pipeline equivalence on the full corpus (star-shaped dups)
    alldocs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    batch_surv = {
        r.doc_id
        for r in dd.survivors_from_pairs(
            alldocs, dd.minhash_dedup_pairs(alldocs)
        ).collect()
    }
    assert got == batch_surv


def test_incremental_neardup_replay_idempotent(spark, tmp_path):
    """foreachBatch replay safety: re-running a micro-batch (same
    batch_id, as Structured Streaming does after a failure before the
    checkpoint commit) must not duplicate survivors or index rows."""
    from marketing_attribution_etl_framework__maef_spark.streaming import IncrementalNearDedup

    docs = spark.createDataFrame(
        [(1, "some perfectly unique words about oceans tides and salt water")],
        "doc_id long, text string",
    )
    nd = IncrementalNearDedup(spark, str(tmp_path / "state"))
    nd.process_batch(docs, batch_id=0)
    nd.process_batch(docs, batch_id=0)  # replay
    assert nd.survivors().count() == 1
    assert spark.read.parquet(nd._path(nd.BANDS)).select("doc_id").distinct().count() == 1
    # and a genuinely new batch still dedups against batch 0
    dup = spark.createDataFrame(
        [(2, "SOME perfectly unique words about oceans tides and salt water ")],
        "doc_id long, text string",
    )
    nd.process_batch(dup, batch_id=1)
    assert {r.doc_id for r in nd.survivors().collect()} == {1}


def test_stream_journey_join_multibatch_parity(spark, sf_dir, tmp_path):
    """Stream-stream interval join across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over time-ordered files): state retention is
    governed by watermark + the 30-day lookback, so every session a
    later conversion needs is still buffered when it arrives — the
    emitted pair set must equal the batch journey join exactly."""
    from marketing_attribution_etl_framework__maef_spark.streaming.incremental import (
        stream_events_nanos,
        stream_journey_join,
    )

    from pyspark.sql import Window

    ev = domain.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream")
    # 4 time-ordered files -> 4 micro-batches per side
    ev.orderBy("ts").coalesce(1).withColumn(
        "part", F.ntile(4).over(Window.orderBy("ts"))
    ).write.partitionBy("part").mode("overwrite").parquet(src)

    conv_s = stream_events_nanos(spark, src + "/part=*", max_files_per_trigger=1)
    sess_s = stream_events_nanos(spark, src + "/part=*", max_files_per_trigger=1)
    out = stream_journey_join(conv_s, sess_s, lookback_days=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sjj_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.conversion_id, r.session_id)
        for r in spark.sql("SELECT * FROM sjj_multibatch").collect()
    }
    conv = domain.conversions_from_events(ev)
    sess = domain.sessions_from_events(ev)
    batch = jny.build_journeys(conv, sess, strict_before=False, lookback_days=30)
    want = {(r.conversion_id, r.session_id) for r in batch.collect()}
    assert got == want


def test_fake_features_batch_matches_scalar_decode():
    """The vectorized batch decoder (one reduceat per Arrow batch) must
    be bit-identical to the per-row reference decoder, including the
    short-payload (<FEATURE_DIM bytes) fallback and empty payloads."""
    import random

    random.seed(7)
    payloads = [
        bytes(random.getrandbits(8) for _ in range(n))
        for n in [0, 1, 3, 7, 8, 9, 15, 64, 333, 1024, 5000] * 10
    ]
    got = mm._fake_features_batch(payloads)
    for p, v in zip(payloads, got):
        assert list(v) == mm.decode_payload(p, "x", fake=True)


def test_stream_reach_exact_across_microbatch_splits(spark, sf_dir, tmp_path):
    """first_touch_state is min-aggregated, so the reach curve must be
    BIT-IDENTICAL no matter how micro-batches slice the stream — the
    property a streaming dropDuplicates does not have.  Run with
    maxFilesPerTrigger=1 over a 2-file time split and compare to the
    batch reach curve."""
    from marketing_attribution_etl_framework__maef_spark.operators.media import reach_curve
    from marketing_attribution_etl_framework__maef_spark.streaming.incremental import (
        first_touch_state,
        reach_from_first_touch,
    )

    src = _stage_stream_files(spark, sf_dir, str(tmp_path))
    events = stream_events(spark, src, max_files_per_trigger=1)
    q = (
        first_touch_state(events)
        .writeStream.format("memory")
        .queryName("ft_reach_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["channel"], r["event_day"]): (r["new_users"], r["cum_reach"])
        for r in reach_from_first_touch(spark.table("ft_reach_test")).collect()
    }
    spark.catalog.dropTempView("ft_reach_test")
    want = {
        (r["channel"], r["event_day"]): (r["new_users"], r["cum_reach"])
        for r in reach_curve(domain.load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(want) > 0


def test_stream_srm_state_is_microbatch_order_free(spark, sf_dir, tmp_path):
    """The streaming SRM's per-user state is a count aggregate —
    order-independent — so the user SET it yields must equal the batch
    distinct-user set under any micro-batch slicing."""
    src = _stage_stream_files(spark, sf_dir, str(tmp_path))
    events = stream_events(spark, src, max_files_per_trigger=1)
    q = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .writeStream.format("memory")
        .queryName("srm_state_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"] for r in spark.table("srm_state_test").collect()}
    spark.catalog.dropTempView("srm_state_test")
    want = {
        r["user_id"]
        for r in domain.load_table(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    assert got == want and len(want) > 0
