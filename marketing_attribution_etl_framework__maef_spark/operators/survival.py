"""Time-to-conversion survival analysis (discrete hazard + exact
integer Kaplan-Meier) with right censoring.

The reference computes *whether* a journey converts
(/root/reference/src/etl/transform.py journey construction); the
natural next analytics question is *how long* users take to convert —
and naive "average days to convert" over converters only is biased
because users who have not converted YET are silently dropped.
Survival analysis handles them as right-censored observations.

Pipeline (all exact integer arithmetic, no floats anywhere):

1. Per user: first-touch day, plus either the first conversion offset
   (event = 1) or the last-observed-activity offset (censored,
   event = 0).  One hash aggregate over events keyed on user_id.
2. Per offset day d: d_k = conversions at d, c_k = censorings at d —
   a second aggregate whose output is bounded by the observation span
   in DAYS, not by user count.
3. Risk set n_k = N - cum(d+c before k) via a window over that tiny
   table, hazard_q20 = d_k * 2^20 div n_k (single exact integer
   division — deterministic on both engines, per the CLAUDE.md rule
   that one-step rational->fixed-point is safe only when the division
   itself is integer).
4. Kaplan-Meier survival in e9 fixed point with PER-STEP truncating
   integer division:  S_k = S_{k-1} * (n_k - d_k) div n_k,  S in
   units of 1e-9.  This recurrence is over the bounded per-day table,
   so it is legitimate driver-side state (CLAUDE.md bounded-loop
   rule: span-in-days rows regardless of input scale); the DuckDB
   oracle replays the identical recurrence with WITH RECURSIVE over
   the same materialized table — bit-for-bit equal because every step
   is integer.  Overflow: S <= 1e9 and n_k <= N, so S*(n_k-d_k) fits
   a signed 64-bit up to N ~ 9e9 users; beyond that promote the
   multiply to DECIMAL(38,0)/HUGEINT.

The per-run float coin-flip the CLAUDE.md policy bans (exp(sum(log))
KM, the textbook SQL trick) never appears: per-step integer division
makes the estimator a pure function of the integer risk table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KM_SCALE = 1_000_000_000  # survival fixed-point unit (1e-9)


def user_durations(
    events: DataFrame,
    conv_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user (offset_days, event) durations with right censoring.

    offset_days = days from the user's first event to their first
    ``conv_type`` event (event=1) or to their last observed event
    (event=0, censored).  Single groupBy(user_id) — conditional MINs
    and MAXes combine map-side, no per-user history buffer.
    """
    is_conv = F.col(type_col) == conv_type
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.min(F.col(ts_col)).alias("_first"),
        F.min(F.when(is_conv, F.col(ts_col))).alias("_conv"),
        F.max(F.col(ts_col)).alias("_last"),
    )
    return per_user.select(
        "user_id",
        F.when(
            F.col("_conv").isNotNull(),
            F.datediff(F.col("_conv").cast("date"), F.col("_first").cast("date")),
        )
        .otherwise(F.datediff(F.col("_last").cast("date"), F.col("_first").cast("date")))
        .cast("long")
        .alias("offset_days"),
        F.when(F.col("_conv").isNotNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("event"),
    )


def hazard_table(durations: DataFrame) -> DataFrame:
    """Discrete-time risk table: one row per observed offset day.

    Output: (offset_days, n_risk, n_conv, n_censored, hazard_q20).
    n_risk counts subjects with offset >= this day; hazard_q20 =
    n_conv * 2^20 div n_risk.  The cumulative window runs over the
    day-grain aggregate — bounded rows (observation span in days), so
    the unpartitioned window is a non-issue at any input scale.
    """
    day = durations.groupBy("offset_days").agg(
        F.sum(F.col("event").cast("long")).alias("n_conv"),
        F.sum((F.lit(1) - F.col("event")).cast("long")).alias("n_censored"),
    )
    w = Window.orderBy("offset_days").rowsBetween(Window.unboundedPreceding, -1)
    return (
        day.withColumn(
            "_gone", F.coalesce(F.sum(F.col("n_conv") + F.col("n_censored")).over(w), F.lit(0))
        )
        .join(F.broadcast(durations.agg(F.count(F.lit(1)).cast("long").alias("_n"))))
        .select(
            "offset_days",
            (F.col("_n") - F.col("_gone")).cast("long").alias("n_risk"),
            F.col("n_conv").cast("long"),
            F.col("n_censored").cast("long"),
            F.expr("(n_conv * 1048576) div (_n - _gone)").cast("long").alias("hazard_q20"),
        )
    )


def kaplan_meier(hazard: DataFrame) -> DataFrame:
    """Exact integer KM curve over the (bounded) hazard table.

    Adds survival_e9: S after this day, in 1e-9 units, via the
    per-step truncating recurrence S *= (n_risk - n_conv) div n_risk.
    Collects the day-grain table (bounded by span-in-days — the
    documented driver-loop exception) and replays the recurrence in
    arbitrary-precision Python ints; the oracle replays it in SQL
    WITH RECURSIVE.  Returns a DataFrame built from that bounded list.
    """
    rows = sorted(
        (
            (r["offset_days"], r["n_risk"], r["n_conv"], r["n_censored"], r["hazard_q20"])
            for r in hazard.collect()
        ),
        key=lambda t: t[0],
    )
    out, s = [], KM_SCALE
    for off, n_risk, n_conv, n_cens, hq in rows:
        s = s * (n_risk - n_conv) // n_risk
        out.append((off, n_risk, n_conv, n_cens, hq, s))
    spark = hazard.sparkSession
    return spark.createDataFrame(
        out,
        "offset_days long, n_risk long, n_conv long, n_censored long, "
        "hazard_q20 long, survival_e9 long",
    )


def interpurchase_cadence(events: DataFrame) -> DataFrame:
    """Inter-purchase cadence report: the distribution of consecutive
    purchase-to-purchase gaps, segmented by how committed the buyer is
    (2-3 / 4-5 / 6+ lifetime purchases).

    The retention companion to kaplan_meier: KM asks "how long to the
    FIRST conversion", this asks "once buying, on what rhythm" — the
    number a replenishment-reminder or churn-risk screen compares the
    current silence against ("this user's segment re-buys at a p50 of
    9 days; they have been quiet for 30").

    Gaps are exact integer microseconds (``timestampdiff`` — never a
    raw numeric cast on the NTZ-drifting ts column, CLAUDE.md).
    Quantiles come from the mergeable base-2 log-histogram sketch
    (operators/quantiles.py log_histogram + histogram_quantile_bounds,
    sub_bits=2), NOT percentile_disc: the segment key has cardinality
    3, so an exact rank window would drag every gap row through three
    partitions — the histogram is map-side combinable and bounded at
    ~256 rows per segment at ANY scale, which is the 100-TB shape.
    Answers are bucket lower bounds (relative error <= 2^-2),
    deterministic integers on both engines.

    Output: (cadence_bucket, n_users, n_gaps, p50_gap_lb, p90_gap_lb)
    — gap units microseconds.

    Reference scope: the reference stops at conversion rows
    (/root/reference/src/etl/transform.py); repeat-purchase cadence is
    part of the extended reporting layer.
    """
    from marketing_attribution_etl_framework__maef_spark.operators import quantiles as qtl

    p = events.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        p.select("user_id", "ts", "event_id")
        .withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_np", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
    )
    gaps = g.filter(F.col("_prev").isNotNull()).select(
        "user_id",
        F.when(F.col("_np") >= 6, F.lit("6+"))
        .when(F.col("_np") >= 4, F.lit("4-5"))
        .otherwise(F.lit("2-3"))
        .alias("cadence_bucket"),
        F.expr("timestampdiff(MICROSECOND, _prev, ts)").cast("long").alias("gap_us"),
    )
    hist = qtl.log_histogram(gaps, ["cadence_bucket"], "gap_us", sub_bits=2)
    q = qtl.histogram_quantile_bounds(
        hist,
        ["cadence_bucket"],
        [("p50_gap_lb", 1, 2), ("p90_gap_lb", 9, 10)],
    )
    users = gaps.groupBy("cadence_bucket").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return q.join(users, "cadence_bucket").select(
        "cadence_bucket",
        "n_users",
        F.col("n_values").alias("n_gaps"),
        "p50_gap_lb",
        "p90_gap_lb",
    )
