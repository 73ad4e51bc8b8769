"""Time-spine gap filling and forward fill.

The reference's channel report (``src/etl/reporting.py:57-98``) emits a
row only for (channel, day) pairs that have data; a day with zero
sessions for a channel simply vanishes, which breaks downstream
day-over-day arithmetic (the classic dashboard bug). The standard fix
is a dense day spine per key, left-joined onto the sparse facts, with
missing measures either zero-filled (additive measures) or
forward-filled (level measures).

Cross-engine exactness: spines are integer day sequences between two
date literals; days are rendered as 'yyyy-MM-dd' strings (the one
day representation Spark, DuckDB, and the driver's value hash agree
on — see operators/anomaly.py). Forward fill is LAST(ignoreNulls)
over a (key, day)-ordered window — a total order, so ties cannot
exist and the fill is deterministic.

100-TB shape: the spine is |keys| x |days| rows generated ON the
executors (sequence + explode from the distinct-keys aggregate — the
spine is never collected or broadcast from the driver). The join
shuffles on the key like any other fact join; the forward-fill window
partitions by key, so no global window appears at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def day_spine(keys: DataFrame, start: str, end: str, day_col: str = "day") -> DataFrame:
    """One row per (key row, day) for every day in [start, end]
    (inclusive). ``keys`` is usually ``facts.select(k).distinct()``."""
    days = F.transform(
        F.sequence(
            F.lit(start).cast("date"),
            F.lit(end).cast("date"),
            F.expr("interval 1 day"),
        ),
        lambda d: F.date_format(d, "yyyy-MM-dd"),
    )
    return keys.select("*", F.explode(days).alias(day_col))


def fill_daily_gaps(
    facts: DataFrame,
    key_cols: list[str],
    day_col: str,
    start: str,
    end: str,
    zero_cols: list[str] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Dense (keys x days) frame over [start, end]: additive measures
    in ``zero_cols`` null-fill to 0, level measures in ``ffill_cols``
    carry the last observed value forward (NULL before the first
    observation). ``facts.day_col`` must be 'yyyy-MM-dd' strings."""
    spine = day_spine(facts.select(*key_cols).distinct(), start, end, day_col)
    joined = spine.join(facts, [*key_cols, day_col], "left")
    out_cols: list = [*key_cols, day_col]
    for c in zero_cols or []:
        out_cols.append(F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in ffill_cols or []:
        out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
    return joined.select(*out_cols)


def decayed_daily_sum(ev: DataFrame, horizon_days: int = 21) -> DataFrame:
    """Recency-weighted daily channel spend: for each (channel, day t),

        decay_cents_q20 = SUM_{d=0..H-1} cents(t-d) * 2^(H-1-d)

    — an exponentially decayed sum with dyadic half-life 1 day,
    truncated at ``horizon_days`` and scaled by 2^(H-1) so every term
    is an exact integer (no float ever crosses the engine boundary;
    with H=21 the scale is the repo's q20 fixed point). The standard
    'recency-weighted momentum' feature for budget pacing models.

    Why not a window frame: the weight depends on BOTH the frame row
    and the current row (2^(i-t)), which SUM-over-frame cannot express
    without an overflow-prone absolute-epoch exponent. Instead the raw
    scan collapses to the channel x day grain first (map-side combine)
    and the decayed sum is a range self-join ON THAT GRAIN — |channels|
    x |days| x H joined rows, bounded by the calendar and the horizon,
    not the data volume. At extreme daily volumes promote the product
    to DECIMAL(38,0) (cents/day ~1e13 * 2^20 * H nears int64).
    """
    h = int(horizon_days)
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
    t = daily.select("channel", F.col("event_day"), "cents")
    i = daily.select(
        F.col("channel").alias("_ch"),
        F.col("event_day").alias("_iday"),
        F.col("cents").alias("_ic"),
    )
    dd = F.datediff(F.col("event_day").cast("date"), F.col("_iday").cast("date"))
    joined = t.join(
        i,
        (F.col("channel") == F.col("_ch"))
        & (F.col("_iday").cast("date") <= F.col("event_day").cast("date"))
        & (F.col("_iday").cast("date") >= F.date_sub(F.col("event_day").cast("date"), h - 1)),
    )
    weight = F.expr(f"shiftleft(cast(1 as bigint), {h - 1} - datediff(cast(event_day as date), cast(_iday as date)))")
    return (
        joined.groupBy("channel", "event_day")
        .agg(
            F.max(F.when(dd == 0, F.col("_ic"))).cast("long").alias("cents"),
            F.sum(F.col("_ic") * weight).cast("long").alias("decay_cents_q20"),
        )
    )
