"""Storage-level co-located joins (bucketBy) and the custom stateful
sessionization operator (applyInPandasWithState)."""

from __future__ import annotations

import contextlib
import io as pyio

import pandas as pd
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import domain
from marketing_attribution_etl_framework__maef_spark.sources.io import save_bucketed_table
from marketing_attribution_etl_framework__maef_spark.streaming import sessionize, sessionize_tws, stream_events
from marketing_attribution_etl_framework__maef_spark.streaming.sessionize_tws import ROCKSDB_PROVIDER

GAP_MIN = 360      # 6h gap
MAX_EVENTS = 5


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on user_id with the same bucket count must
    join without any shuffle (no Exchange in the plan) — the J1 journey
    join's storage-level fast path at scale."""
    import shutil

    conv = domain.conversions(spark, sf_dir)
    sess = domain.session_sources(spark, sf_dir)
    wh_dir = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("conv_bucketed", "sess_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh_dir}/{name}", ignore_errors=True)
    save_bucketed_table(conv, "conv_bucketed", 8, ["user_id"])
    save_bucketed_table(sess, "sess_bucketed", 8, ["user_id"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("conv_bucketed").join(spark.table("sess_bucketed"), "user_id")
        buf = pyio.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _expected_sessions(events_pdf: pd.DataFrame):
    """Batch-side reference implementation of the gap+cap semantics.
    Returns (closed_sessions, open_last_sessions)."""
    closed, opened = set(), set()
    for uid, grp in events_pdf.sort_values("ts").groupby("user_id"):
        cur = None
        for ts, ch in zip(grp["ts"], grp["channel_name"]):
            if cur is not None and (
                (ts - cur[1]).total_seconds() > GAP_MIN * 60 or cur[2] >= MAX_EVENTS
            ):
                closed.add((uid, cur[0], cur[1], cur[2], cur[3]))
                cur = None
            if cur is None:
                cur = (ts, ts, 1, str(ch))
            else:
                cur = (cur[0], ts, cur[2] + 1, cur[3] + "," + str(ch))
        if cur is not None:
            opened.add((uid, cur[0], cur[1], cur[2], cur[3]))
    return closed, opened


def test_sessionize_gap_and_cap(spark, sf_dir, tmp_path):
    """Streaming sessionization equals the batch reference for every
    session closed by arrival; trailing sessions stay in state (the
    365-day watermark means no event-time timeout fires in-test)."""
    ev = domain.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream")
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)

    stream = stream_events(spark, src, watermark="365 days")
    out = sessionize(stream, gap_minutes=GAP_MIN, max_events=MAX_EVENTS)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.channels)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    pdf = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", F.col("event_type").alias("channel_name"))
        .toPandas()
    )
    closed, opened = _expected_sessions(pdf)
    assert got == closed, (len(got), len(closed))
    # the cap actually binds on this data
    assert any(n == MAX_EVENTS for (_, _, _, n, _) in closed)
    # no emitted session violates either invariant
    for _, s, e, n, ch in got:
        assert n <= MAX_EVENTS
        assert len(ch.split(",")) == n


def test_sessionize_tws_matches_batch_reference(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas sessionizer (Spark 4 processor
    API, RocksDB state store) produces exactly the same closed-session
    set as the batch reference — and therefore as the
    applyInPandasWithState implementation it tracks. Skips where the
    python protobuf package (Spark's state-server protocol for this
    API) is unavailable — as in the build container."""
    import pytest
    from marketing_attribution_etl_framework__maef_spark.streaming.sessionize_tws import HAS_PROTOBUF

    if not HAS_PROTOBUF:
        with pytest.raises(ImportError, match="protobuf"):
            sessionize_tws(stream_events(spark, str(tmp_path), watermark="1 day"))
        pytest.skip("python protobuf not installed: transformWithStateInPandas cannot run")
    ev = domain.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream")
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = stream_events(spark, src, watermark="365 days")
        out = sessionize_tws(stream, gap_minutes=GAP_MIN, max_events=MAX_EVENTS)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_tws")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.channels)
        for r in spark.sql("SELECT * FROM sessions_tws").collect()
    }
    pdf = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", F.col("event_type").alias("channel_name"))
        .toPandas()
    )
    closed, _ = _expected_sessions(pdf)
    assert got == closed, (len(got), len(closed))
