"""Integer-exact z-score outlier detection over daily channel volume.

The reference's reporting layer (``src/etl/reporting.py:57-98``, rebuilt
in ``operators/reporting.py``) rolls events up to channel x day but has
no notion of "this day is off-trend"; a production marketing pipeline
needs exactly that (tracking outages, bot storms, double-fired tags).
This operator flags days whose count deviates from the channel's mean
by more than 2 sample standard deviations.

Cross-engine exactness (CLAUDE.md float policy): the z-score itself is
irrational (sqrt), so we never compute it. For day count n over a
channel with d days, sum S and sum-of-squares Q:

    z^2 > 4  <=>  (n*d - S)^2 * (d - 1)  >  4 * d * (d*Q - S^2)

— both sides exact BIGINTs, so Spark and the DuckDB oracle agree bit
for bit. The emitted evidence columns are those two integers.

100-TB shape: the daily roll-up is one map-side-combining aggregate;
the per-channel moment table is |channels| rows — broadcast back onto
the daily table (explicitly marked). No window over raw events, no
second scan. Overflow: with n,S <= ~1e9 per channel-day the left side
is ~1e18*d — promote the moment columns to DECIMAL(38,0) at extreme
scale (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_day_outliers(ev: DataFrame, z_threshold: int = 2) -> DataFrame:
    """Per (event_type, day): the daily count plus the exact-integer
    z^2 cross-multiplication evidence and the anomaly flag
    (|n - mean| > z_threshold * sample stddev, strict)."""
    # day as 'yyyy-MM-dd' STRING: Spark DATE surfaces as datetime.date
    # while DuckDB DATE surfaces as datetime64 — the string rendering is
    # the one representation both engines (and the driver's value hash)
    # agree on, per the repo's existing day-grain oracles.
    daily = (
        ev.select(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .groupBy("channel", "event_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    moments = daily.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("_d"),
        F.sum("n_events").cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("_q"),
    )
    j = daily.join(F.broadcast(moments), "channel")
    dev = F.col("n_events") * F.col("_d") - F.col("_s")
    num = dev * dev * (F.col("_d") - F.lit(1).cast("long"))
    den = (
        F.lit(int(z_threshold) ** 2).cast("long")
        * F.col("_d")
        * (F.col("_d") * F.col("_q") - F.col("_s") * F.col("_s"))
    )
    return j.select(
        "channel",
        "event_day",
        "n_events",
        num.cast("long").alias("z2_num"),
        den.cast("long").alias("z2_den"),
        (num > den).cast("long").alias("is_anomaly"),
    )


def mad_day_outliers(ev: DataFrame, k: int = 3) -> DataFrame:
    """Median/MAD robust outlier flags over daily channel revenue:
    |cents - median| > k * MAD (strict, integer comparison).

    The robust counterpart of ``zscore_day_outliers``: one bot-storm
    day inflates the mean AND the stddev (masking itself from the
    z-gate), but moves neither the median nor the MAD. Everything is
    exact integers — the median is PERCENTILE_DISC(1/2) (an actual
    element of the data, via the rank-window formulation in
    operators/quantiles.py), the MAD is the discrete median of the
    absolute deviations, and the flag is an integer inequality — so
    the DuckDB oracle agrees bit for bit.

    100-TB shape: the raw scan collapses to the channel x day grain in
    one map-side-combining aggregate; both rank windows then run over
    that post-aggregation table (|channels| x |days| rows — bounded by
    the calendar, not the data volume), and the per-channel med/MAD
    rows broadcast back. No window ever touches raw events.
    """
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import percentile_disc

    daily = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
        )
        .groupBy("channel", "event_day")
        .agg(F.sum("_c").cast("long").alias("cents"))
    )
    med = percentile_disc(daily, ["channel"], "cents", [0.5]).select(
        "channel", F.col("cents").alias("_med")
    )
    dev = daily.join(F.broadcast(med), "channel").withColumn(
        "_dev", F.abs(F.col("cents") - F.col("_med")).cast("long")
    )
    mad = percentile_disc(
        dev.select("channel", "_dev"), ["channel"], "_dev", [0.5]
    ).select("channel", F.col("_dev").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), "channel")
        .select(
            "channel",
            "event_day",
            "cents",
            F.col("_med").alias("median_cents"),
            F.col("_mad").alias("mad_cents"),
            (F.col("_dev") > F.lit(int(k)).cast("long") * F.col("_mad"))
            .cast("long")
            .alias("is_anomaly"),
        )
    )


def cusum_changepoint(ev: DataFrame) -> DataFrame:
    """CUSUM changepoint curve over the daily purchase-revenue series
    — the sequential-monitoring companion to the point outliers above
    (Page 1954): the day where the cumulative deviation from the
    global mean peaks is the single most likely level-shift point.

    Exactness: the textbook statistic sums (x_i - mean) where mean is
    rational; multiplying through by N makes every term integral:

        cusum'_t = N * prefix_t - t * S      (N days, S = total cents)

    which preserves the argmax and every sign change.  All longs (at
    ~1e9 days x 1e18 cents promote to DECIMAL(38,0); the harness grain
    is days-in-dataset, so int64 has orders of magnitude of headroom).

    Output: one row per day — (day, day_cents, cusum_scaled,
    is_peak) with is_peak = 1 on the day maximizing |cusum'| (ties:
    earliest day).  The per-day grain is the only data-sized
    aggregate; the cumsum window runs on the bounded day-grain table.
    """
    from pyspark.sql import Window

    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("day_cents"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # bounded table (days): unpartitioned windows are fine here
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("_n"), F.sum("day_cents").cast("long").alias("_s")
    )
    curve = (
        daily.join(F.broadcast(tot))
        .withColumn("_t", F.row_number().over(Window.orderBy("day")).cast("long"))
        .withColumn("_pref", F.sum("day_cents").over(w).cast("long"))
        .withColumn("cusum_scaled", (F.col("_n") * F.col("_pref") - F.col("_t") * F.col("_s")).cast("long"))
    )
    peak = (
        curve.select(F.abs(F.col("cusum_scaled")).alias("_a"), "day")
        .orderBy(F.desc("_a"), F.asc("day"))
        .limit(1)
        .select(F.col("day").alias("_peak_day"))
    )
    return curve.join(F.broadcast(peak)).select(
        "day",
        "day_cents",
        "cusum_scaled",
        (F.col("day") == F.col("_peak_day")).cast("long").alias("is_peak"),
    )


def dow_mad_outliers(ev: DataFrame, k: int = 3) -> DataFrame:
    """Weekday-stratified median/MAD outlier flags: each (channel,
    day)'s revenue is compared against the median and MAD of the SAME
    WEEKDAY's history for that channel — |cents − med_dow| > k·MAD_dow.

    Why stratify: a channel with a strong weekly cycle (retail
    weekends, B2B weekdays) makes the unconditional screen
    (mad_day_outliers) fire every Saturday and mask true weekday
    anomalies — a Saturday is anomalous only relative to other
    Saturdays.  This is seasonal adjustment done exactly: no seasonal
    index division, just conditioning the robust statistics on the
    cycle position.

    Day-of-week is the engine-neutral days-since-Monday-1970-01-05
    mod 7 (dow_seasonal_index device).  Same exact-integer
    median/MAD/inequality stack as mad_day_outliers, with the rank
    windows over the (channel, dow) grain — still bounded by the
    calendar, never raw events.

    Output: (channel, event_day, dow, cents, median_cents, mad_cents,
    is_anomaly).
    """
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import percentile_disc

    daily = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
        )
        .groupBy("channel", "event_day")
        .agg(F.sum("_c").cast("long").alias("cents"))
        .withColumn(
            "dow",
            (
                F.datediff(
                    F.col("event_day").cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                % 7
            ).cast("long"),
        )
    )
    med = percentile_disc(daily, ["channel", "dow"], "cents", [0.5]).select(
        "channel", "dow", F.col("cents").alias("_med")
    )
    dev = daily.join(F.broadcast(med), ["channel", "dow"]).withColumn(
        "_dev", F.abs(F.col("cents") - F.col("_med")).cast("long")
    )
    mad = percentile_disc(
        dev.select("channel", "dow", "_dev"), ["channel", "dow"], "_dev", [0.5]
    ).select("channel", "dow", F.col("_dev").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), ["channel", "dow"])
        .select(
            "channel",
            "event_day",
            "dow",
            "cents",
            F.col("_med").alias("median_cents"),
            F.col("_mad").alias("mad_cents"),
            (F.col("_dev") > F.lit(int(k)).cast("long") * F.col("_mad"))
            .cast("long")
            .alias("is_anomaly"),
        )
    )
