"""Round-6 session-B pins: append-mode watermark boundary for the
streaming top-k, and the IVF-bucketed int8 rerank composition."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def test_stream_topk_append_boundary(spark, tmp_path):
    """Pin Spark's append-mode eviction comparison: a window whose end
    lands EXACTLY on the final watermark (max ts - delay) IS emitted
    (closed comparison).  The maef_stream_topk_channels oracle mirrors
    this with `window_start + 6h <= max(ts) - 1h`."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 3, 0, 0), "a", 1.0),   # window [0,6)
        (2, dt.datetime(2024, 1, 1, 8, 0, 0), "a", 1.0),   # window [6,12)
        (3, dt.datetime(2024, 1, 1, 13, 0, 0), "a", 1.0),  # [12,18); wm = 12:00
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    d = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    st = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    vol = (
        st.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.end").alias("we"), "n")
    )
    q = (
        vol.writeStream.format("memory")
        .queryName("tk_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ends = sorted(r["we"] for r in spark.table("tk_boundary").collect())
    spark.catalog.dropTempView("tk_boundary")
    # [0,6) closed long ago; [6,12) end == watermark 12:00 -> EMITTED;
    # [12,18) end 18:00 > watermark -> retained in state, not emitted.
    assert ends == [dt.datetime(2024, 1, 1, 6, 0), dt.datetime(2024, 1, 1, 12, 0)]


def test_ann_int8_ivf_rerank_matches_baseline_on_probed_bucket(spark):
    """The IVF composition must return EXACTLY the baseline's answer
    whenever the true nearest neighbours live inside the probed
    buckets — here a duplicated vector guarantees that."""
    from marketing_attribution_etl_framework__maef_spark.llm.quantize import (
        ann_int8_ivf_rerank,
        ann_int8_rerank,
    )

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(24)]
    rows.append((100, list(rows[3][1])))  # exact duplicate of vec 3
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = embs.filter(F.col("vec_id") == 100)
    cents = embs.filter(F.col("vec_id") < 4)
    out = ann_int8_ivf_rerank(embs, qs, cents, k_cand=5, k_out=3, probe=4)
    top = out.filter(F.col("rnk") == 1).first()
    assert top["vec_id"] == 3
    assert top["cos_q20"] == 1 << 20
    # probe=ALL centroids -> candidate set == corpus -> identical to baseline
    base = ann_int8_rerank(embs, qs, k_cand=5, k_out=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_pipeline_stage_restartability(spark, sf_dir, tmp_path):
    """VERDICT r05 #5: the reference re-runs any Airflow task from its
    file/DB handoff (dags/ihc_api_dag.py:40-54,87).  Pin the rebuild's
    equivalent: run the staged pipeline end-to-end, then (a) resume
    from the attribution stage and (b) resume from the report stage
    over the checkpointed upstream tables — the final export must be
    byte-identical, and upstream stage tables must NOT be rewritten."""
    import os

    from marketing_attribution_etl_framework__maef_spark.plans.pipeline import (
        AttributionPipeline,
        PipelineConfig,
    )

    wh = str(tmp_path / "warehouse")
    pipe = AttributionPipeline(spark, sf_dir, PipelineConfig(model="linear"))

    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    full = _rows(pipe.run_staged(wh, resume_from="journeys"))
    assert len(full) > 0

    def _sig(stage):
        d = os.path.join(wh, stage)
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    j_sig, a_sig = _sig("journeys"), _sig("attribution")

    # (a) kill-and-retry at the attribution task: journeys table reused
    resumed_a = _rows(pipe.run_staged(wh, resume_from="attribution"))
    assert resumed_a == full
    assert _sig("journeys") == j_sig  # upstream untouched

    # (b) kill-and-retry at the report task: journeys + attribution reused
    a_sig = _sig("attribution")
    resumed_r = _rows(pipe.run_staged(wh, resume_from="report"))
    assert resumed_r == full
    assert _sig("journeys") == j_sig and _sig("attribution") == a_sig

    # a bogus stage name is an error, not a silent full re-run
    try:
        pipe.run_staged(wh, resume_from="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass
