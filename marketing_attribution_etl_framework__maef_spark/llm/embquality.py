"""Embedding-table quality screens.

Upstream encoder bugs show up as NORM anomalies before they show up
anywhere else: truncated inputs give near-zero norms, fp overflows
give huge ones, a silently-changed normalization gives a second mode.
The screen below is the embedding-side twin of the MAD day-level
anomaly screen (operators/anomaly.py): exact integer median/MAD over
the q20-quantized norms, k*MAD outlier band.

Cross-engine contract: the norm is sqrt(left-fold dot) — one
correctly-rounded IEEE sqrt over an order-fixed sum, identical in both
engines — quantized q20, after which everything is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.similarity import _norm_vec, q20


def _lower_median(df: DataFrame, col: str):
    """Exact lower median of an integer column as a 1-row DataFrame,
    computed on the DISTINCT-VALUE histogram: groupBy(value) + a
    cumulative count over the value order.  The window runs over the
    distinct-value grain (bounded by the q20 value range, not by
    rows), so no raw-row global sort exists — the two-phase trick the
    quantile operators use, specialized to weight = frequency."""
    hist = df.groupBy(F.col(col).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).crossJoin(
        F.broadcast(hist.agg(F.sum("_c").cast("long").alias("_n")))
    )
    return cum.filter(F.lit(2) * F.col("_cum") >= F.col("_n")).agg(
        F.min("_v").cast("long").alias("median"), F.max("_n").cast("long").alias("n")
    )


def norm_band_screen(embeddings: DataFrame, k_mad: int = 3) -> DataFrame:
    """One-row corpus screen: (n_vecs, n_zero, median_nq, mad_nq,
    n_low, n_high) where nq = q20(L2 norm), mad = lower median of
    |nq - median|, and low/high count vectors outside median -+
    k_mad * mad.  All-zero vectors are counted separately (they have
    no direction, and downstream quantization drops them).

    Scale: two histogram aggregates (map-side combinable on the q20
    value key) + two bounded-grain windows; the only per-vector work
    is the one fold dot product.  No global row sort, no collect of
    anything unbounded.
    """
    e = _norm_vec(embeddings, "vec_id", "embedding", "vec_id", "_v")
    nq = e.select("vec_id", q20(F.col("_vn")).alias("nq"))
    nonzero = nq.filter(F.col("nq") > 0).localCheckpoint()
    med = _lower_median(nonzero, "nq").select(
        F.col("median").alias("median_nq"), F.col("n").alias("_n_nonzero")
    )
    dev = nonzero.crossJoin(F.broadcast(med)).select(
        "nq",
        "median_nq",
        F.abs(F.col("nq") - F.col("median_nq")).cast("long").alias("_dev"),
    )
    mad = _lower_median(dev, "_dev").select(F.col("median").alias("mad_nq"))
    flags = dev.crossJoin(F.broadcast(mad)).select(
        "nq",
        ((F.col("nq") - F.col("median_nq")) < -F.lit(k_mad) * F.col("mad_nq")).alias(
            "_low"
        ),
        ((F.col("nq") - F.col("median_nq")) > F.lit(k_mad) * F.col("mad_nq")).alias(
            "_high"
        ),
    )
    zero = nq.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum((F.col("nq") <= 0).cast("long")).cast("long").alias("n_zero"),
    )
    agg = flags.agg(
        F.sum(F.col("_low").cast("long")).cast("long").alias("n_low"),
        F.sum(F.col("_high").cast("long")).cast("long").alias("n_high"),
    )
    return (
        zero.crossJoin(F.broadcast(med.select("median_nq")))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(agg))
        .select("n_vecs", "n_zero", "median_nq", "mad_nq", "n_low", "n_high")
    )
