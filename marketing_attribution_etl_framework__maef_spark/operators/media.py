"""Media-planning analytics over the MAEF event stream.

Four diagnostics a media planner runs on top of the attribution
warehouse the reference builds (`src/etl/reporting.py:57-98` stops at
the channel x date roll-up; these are the standard next questions):

- **Reach curve** — per channel, the cumulative count of distinct
  users ever touched, by day.  The saturation readout behind
  frequency capping (operators `maef_frequency_capping`) and budget
  pacing.
- **Conversion-lag histogram** — time from first touch to conversion
  in log2 second buckets; the "how long does the funnel take" view
  that sets the attribution lookback window
  (`src/etl/transform.py:129-141` hardcodes 30 days; this measures
  whether that is right).
- **Position-credit profile** — linear-model credit mass by
  touch position counted from the conversion (1 = last touch).  The
  diagnostic that shows whether a position-based model (U-shaped,
  time-decay) would differ materially from linear on this corpus.
- **Volume-response OLS** — per channel, the exact-integer
  least-squares slope of daily purchase revenue on the channel's
  daily session volume.  The first-order media-mix signal; all sums
  are integer (cents x counts), the slope is emitted q20 via
  DECIMAL(38,0) truncating division so both engines agree bit for bit.

100-TB shape: every operator here is one or two map-side-combinable
aggregates over (channel, day) or (conversion) grains — the reduce
side is bounded by channels x days or conversions, never by raw
events.  Reach dedups (channel, user) with a single shuffle; the lag
histogram and position profile ride the shared journeys lineage
(`__spark_entry__._journeys`); the OLS reduces each channel to five
moment sums (the distributive normal-equations build) so the final
division is driver-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reach_curve(events: DataFrame) -> DataFrame:
    """Per-channel cumulative reach by day.

    Output: (channel, event_day, new_users, cum_reach) — new_users is
    the count of users whose FIRST touch on the channel falls on that
    day, cum_reach the running total (== distinct users reached so
    far; exact, because first-touch days partition the reached set).

    Scale: one (channel, user) shuffle for the first-touch min, then a
    (channel, day) aggregate bounded by channels x days; the window
    cumsum runs over that bounded grain.  This is how reach is
    computed exactly at scale — a naive day-by-day COUNT(DISTINCT)
    rescans all history per day.
    """
    first = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(F.col("event_type").alias("channel"), "user_id")
        .agg(F.min(F.date_format("ts", "yyyy-MM-dd")).alias("event_day"))
    )
    daily = first.groupBy("channel", "event_day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = (
        Window.partitionBy("channel")
        .orderBy("event_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "channel",
        "event_day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_reach"),
    )


def conversion_lag_histogram(journeys: DataFrame) -> DataFrame:
    """log2-bucketed histogram of first-touch -> conversion lag.

    Output: (lag_bucket, n_conversions, revenue_cents) where
    lag_bucket = bit_length(lag_microseconds + 1) - 1 (the exact-bits
    log2 device — no floating log whose rounding at 2^k boundaries
    differs per libm).  Lag is integer MICROSECONDS via timestampdiff
    — the repo ts rule: legal on NTZ timestamps where a double cast is
    not, and exact where coarser units would make the two engines
    disagree on boundary truncation.

    Scale: one groupBy(conversion_id) for the first touch (bounded by
    conversions), then a ~52-row histogram aggregate.
    """
    per_conv = journeys.groupBy("conversion_id").agg(
        F.min("event_ts").alias("first_ts"),
        F.max("conv_ts").alias("conv_ts"),
        F.max("revenue").alias("revenue"),
    )
    lag = per_conv.select(
        F.expr("timestampdiff(MICROSECOND, first_ts, conv_ts)").cast("long").alias("lag_us"),
        "revenue",
    )
    return (
        lag.select(
            (F.length(F.bin(F.col("lag_us") + 1)) - 1).cast("long").alias("lag_bucket"),
            "revenue",
        )
        .groupBy("lag_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.round(F.col("revenue") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


def position_credit(journeys: DataFrame, max_pos: int = 8) -> DataFrame:
    """Linear-model credit mass by touch position from the conversion.

    Output: (position, n_touches, credit_q20) with position 1 = last
    touch before conversion and positions beyond ``max_pos`` folded
    into ``max_pos + 1``.  Per-touch credit is the exact q20 of the
    rational 1/len computed in INTEGER arithmetic —
    (2*2^20 + len) div (2*len) == floor(2^20/len + 1/2) — so the sum
    is exact and engine-portable (repo rule: never ROUND rational
    weights).

    Scale: one window over the journeys grain (partitioned by
    conversion — the same W2 partitioning every attribution model
    uses) and a bounded (max_pos+1)-row aggregate.
    """
    w = Window.partitionBy("conversion_id").orderBy(
        F.desc("event_ts"), F.desc("session_id")
    )
    n = Window.partitionBy("conversion_id")
    ranked = journeys.select(
        "conversion_id",
        F.row_number().over(w).cast("long").alias("_p"),
        F.count(F.lit(1)).over(n).cast("long").alias("_len"),
    )
    return (
        ranked.select(
            F.least(F.col("_p"), F.lit(max_pos + 1)).cast("long").alias("position"),
            F.expr("(2097152 + _len) div (2 * _len)").cast("long").alias("_cq"),
        )
        .groupBy("position")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("_cq").cast("long").alias("credit_q20"),
        )
    )


def volume_response_ols(events: DataFrame) -> DataFrame:
    """Per-channel exact OLS slope of daily purchase revenue (cents)
    on the channel's daily session count.

    Output: (channel, n_days, slope_q20) with
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) assembled entirely in
    DECIMAL(38,0) and emitted as q20 by scaling the numerator by 2^20
    BEFORE the truncating div (Spark DECIMAL div == DuckDB HUGEINT //,
    repo rule).  Channels whose volume never varies (den = 0) drop out.

    Widest intermediate: num*2^20 <= n * Sxy * 2^20 — at 10^5 days,
    10^9 daily sessions, 10^13 daily cents that is ~10^47... which is
    why the moments are summed per-channel FIRST (bounded by days) and
    the product is taken on the driver-sized grain; at the repo's SF
    bounds (<= 10^4 days, <= 10^9 cents/day, <= 10^7 sessions/day) the
    widest product is < 10^37, inside DECIMAL(38,0) — documented per
    the r04 overflow-headroom rule.

    Scale: one (channel, day) aggregate for x, one (day) aggregate for
    y (broadcast — days are bounded), then a per-channel 5-moment
    reduce.  The normal-equations build is distributive; nothing ever
    sorts or collects the daily grain.
    """
    ev = events
    x = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    y = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("y")
        )
    )
    pts = x.join(F.broadcast(y), "event_day", "left").select(
        "channel", "x", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
    )
    m = pts.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
    )
    return m.filter(
        F.expr("cast(n_days as decimal(38,0)) * sxx - sx * sx") != 0
    ).select(
        "channel",
        "n_days",
        F.expr(
            "cast((cast(n_days as decimal(38,0)) * sxy - sx * sy) * 1048576"
            " div (cast(n_days as decimal(38,0)) * sxx - sx * sx) as bigint)"
        ).alias("slope_q20"),
    )


def channel_synergy(journeys: DataFrame) -> DataFrame:
    """Journey-level channel-pair synergy: for every unordered channel
    pair, the count of conversions whose journey touched BOTH, and the
    lift over independence as an exact-integer q20:

        lift = P(A and B) / (P(A) * P(B))
             = n_both * n_total / (n_a * n_b)        (conversion counts)
        lift_q20 = n_both * n_total * 2^20 div (n_a * n_b)

    Distinct from the USER-level audience overlap (L93) and its sketch
    (L190): this is conditioned on converting journeys, the grain a
    media planner reads "do these two channels close together more
    than chance" from.

    Scale: the distinct (conversion, channel) projection is bounded by
    conversions x |channels|; the pair generation is the inverted-index
    self-join on conversion_id (per-journey fanout <= C^2, a bounded
    constant), never a channel-pair cross product over raw rows.
    Widest integer: n_both * n_total * 2^20 <= 10^9 * 10^9 * 2^20
    ~ 10^24 — inside DECIMAL(38,0) up to ~10^14 conversions.
    """
    cc = journeys.select(
        "conversion_id", F.col("channel_label").alias("channel")
    ).distinct()
    total = cc.agg(F.countDistinct("conversion_id").cast("long").alias("n_total"))
    per = cc.groupBy("channel").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = cc.select("conversion_id", F.col("channel").alias("channel_a"))
    b = cc.select("conversion_id", F.col("channel").alias("channel_b"))
    pairs = (
        a.join(b, "conversion_id")
        .filter(F.col("channel_a") < F.col("channel_b"))
        .groupBy("channel_a", "channel_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    pa = per.select(F.col("channel").alias("channel_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("channel").alias("channel_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(pa), "channel_a")
        .join(F.broadcast(pb), "channel_b")
        .crossJoin(F.broadcast(total))
        .select(
            "channel_a",
            "channel_b",
            "n_both",
            "n_a",
            "n_b",
            "n_total",
            F.expr(
                "cast(cast(n_both as decimal(38,0)) * n_total * 1048576"
                " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_q20"),
        )
    )


def lookback_sensitivity(
    journeys: DataFrame, lookbacks: tuple[int, ...] = (7, 14, 30)
) -> DataFrame:
    """Attribution-lookback sensitivity: linear-model credit mass per
    channel under several lookback windows at once — the reference
    hardcodes 30 days (`src/etl/transform.py:129-141`); this measures
    what that choice does to each channel's credit.

    Because a shorter lookback KEEPS A SUBSET of the 30-day journey
    rows (event_ts >= conv_ts - L), all windows derive from the ONE
    staged journeys table by an exact integer-microsecond filter —
    no re-join per window.  Per-touch credit is the exact q20 of the
    rational 1/len via (2*2^20 + len) div (2*len), with len counted
    WITHIN each lookback.

    Output: (lookback_days, channel, n_conversions, n_touches,
    credit_q20).

    Scale: one explode by |lookbacks| (a bounded constant) over the
    journeys grain, one window per (conversion, lookback), one bounded
    channel aggregate — the W2 attribution shape with one extra
    bounded dimension.
    """
    lbs = F.explode(
        F.array(*[F.lit(int(x)) for x in lookbacks])
    ).alias("lookback_days")
    x = journeys.select(
        "conversion_id", "channel_label", "event_ts", "conv_ts", lbs
    ).filter(
        F.expr("timestampdiff(MICROSECOND, event_ts, conv_ts)")
        <= F.col("lookback_days").cast("long") * F.lit(86400000000)
    )
    n = Window.partitionBy("conversion_id", "lookback_days")
    sized = x.select(
        F.col("lookback_days").cast("long").alias("lookback_days"),
        F.col("channel_label").alias("channel"),
        "conversion_id",
        F.count(F.lit(1)).over(n).cast("long").alias("_len"),
    )
    return (
        sized.groupBy("lookback_days", "channel")
        .agg(
            F.countDistinct("conversion_id").cast("long").alias("n_conversions"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum(F.expr("(2097152 + _len) div (2 * _len)"))
            .cast("long")
            .alias("credit_q20"),
        )
    )
