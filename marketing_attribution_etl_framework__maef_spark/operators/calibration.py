"""Isotonic calibration (PAV) of an empirical conversion-rate curve.

A spend/score signal should predict conversion monotonically; raw
per-bucket rates are noisy and non-monotone.  Isotonic regression is
the standard calibration fix (the sklearn IsotonicRegression everyone
runs driver-side) — here computed DISTRIBUTEDLY and EXACTLY via the
minimax closed form instead of the sequential pool-adjacent-violators
sweep:

    fit(i) = max_{j<=i} min_{k>=i} weighted_mean(y_j .. y_k)

(equal to the PAV solution for the L2 isotonic problem; see
Robertson-Wright-Dykstra 1988, "Order Restricted Statistical
Inference", Thm 1.4.4).  PAV itself is an inherently sequential
pointer sweep; the minimax form is three bounded joins — the right
shape for an engine, and the j<=i<=k triple is cubic ONLY in the
bucket count, which is fixed by construction (score div width), not
by data volume.

Cross-engine exactness: bucket tallies and prefix sums are longs; the
interval mean is quantized ONCE as avg_q20 = floor(conv_span * 2^20 /
n_span) (exact integer division), and max/min then compare identical
longs on both engines — no rational-comparison ambiguity survives the
quantization, and ties pick the same value by definition.

Scale: the per-session tally is the only data-sized stage (hash
aggregate to the bucket grain); everything after runs on a
|buckets|-sized table.  No driver loop at all — the closed form keeps
even the bounded part inside the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def isotonic_rates(
    outcomes: DataFrame,
    bucket_col: str = "bucket",
    hit_col: str = "hit",
) -> DataFrame:
    """Isotonic (non-decreasing) calibrated rate per score bucket.

    outcomes: one row per trial with an integer ``bucket`` (ordered
    score bin) and 0/1 ``hit``.

    Output: (bucket, n, conversions, raw_rate_q20, iso_rate_q20),
    iso_rate_q20 non-decreasing in bucket.

    Overflow headroom: the span average's widest intermediate is
    (sk - sj0) * 2^20 in BIGINT — safe through exactly
    (2^63-1)//2^20 = 8.796e12 total conversions (bound probed tight
    in tests/test_overflow_headroom.py).
    """
    per = outcomes.groupBy(F.col(bucket_col).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(hit_col).cast("long")).cast("long").alias("conv"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # bounded table (|buckets| rows): the unpartitioned window is fine
    pref = per.select(
        "b",
        "n",
        "conv",
        F.sum("n").over(w).alias("cn"),
        F.sum("conv").over(w).alias("cs"),
    )
    j = pref.select(
        F.col("b").alias("j"),
        (F.col("cn") - F.col("n")).alias("nj0"),  # exclusive prefix before j
        (F.col("cs") - F.col("conv")).alias("sj0"),
    )
    k = pref.select(F.col("b").alias("k"), F.col("cn").alias("nk"), F.col("cs").alias("sk"))
    spans = (
        j.crossJoin(k)  # bounded^2 rows
        .filter(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.expr("((sk - sj0) * 1048576) div (nk - nj0)").cast("long").alias("avg_q20"),
        )
    )
    i = per.select(F.col("b").alias("i"))
    fit = (
        spans.crossJoin(i)  # bounded^3 rows
        .filter((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("j", "i")
        .agg(F.min("avg_q20").alias("_mn"))
        .groupBy("i")
        .agg(F.max("_mn").cast("long").alias("iso_rate_q20"))
    )
    return (
        per.join(fit, per["b"] == fit["i"])
        .select(
            F.col("b").alias(bucket_col),
            "n",
            F.col("conv").alias("conversions"),
            F.expr("(conv * 1048576) div n").cast("long").alias("raw_rate_q20"),
            "iso_rate_q20",
        )
    )


def spend_conversion_calibration(
    sessions: DataFrame,
    journeys: DataFrame,
    bucket_cents: int = 2500,
) -> DataFrame:
    """Does session spend predict conversion participation?  Buckets
    sessions by value (``bucket_cents``-wide bins), marks a session
    hit iff it appears in any conversion journey (the UCB1 reward
    definition, operators/bandit.py), and fits the isotonic curve.
    """
    converted = journeys.select("session_id").distinct()
    outcomes = (
        sessions.select(
            "session_id",
            F.expr(f"cast(round(value * 100, 0) as bigint) div {bucket_cents}").alias(
                "bucket"
            ),
        )
        .join(converted.withColumn("_c", F.lit(1)), "session_id", "left")
        .select("bucket", F.coalesce(F.col("_c"), F.lit(0)).alias("hit"))
    )
    return isotonic_rates(outcomes)
