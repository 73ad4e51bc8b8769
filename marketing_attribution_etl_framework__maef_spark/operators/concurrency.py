"""Sweep-line peak concurrency over session intervals.

"How many sessions were open at once, per day?" — capacity planning's
first question, and the canonical interval-overlap aggregate.  The
sweep line turns each interval into a +1 (start) and a -1 (end)
boundary; the running sum over the time-ordered boundary stream is
the instantaneous concurrency, and the per-day MAX is the answer.

Semantics: CLOSED intervals — at a shared instant the start counts
before the end (ORDER BY ts, delta DESC), so a zero-length
single-event session still peaks at >= 1 and concurrency never dips
negative.  (ts, delta, user) is a total order: a user's two
boundaries at one ts are always one start + one end.

Scale: the running sum is the global-window trap
(`SUM OVER (ORDER BY ts)` = one partition).  Fix is the repo's
two-phase scan with a TIME bucket: bucket boundaries by calendar day
— a pure, monotone function of ts, so buckets ARE contiguous rank
ranges (unlike a hash bucket) and cross-midnight sessions are carried
by the per-day delta-total offsets (bounded driver state: one row per
day).  Within-day cumsum is a day-partitioned window.  The DuckDB
oracle runs the single global window over the same total order and
must agree exactly — integer arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-day peak concurrent intervals.

    Output: (day, peak, n_starts) for every day with at least one
    boundary; ``peak`` includes sessions carried over midnight.
    """
    starts = intervals.select(
        F.col(start_col).cast("timestamp").alias("ts"),
        F.lit(1).alias("delta"),
        F.col(user_col).alias("u"),
    )
    ends = intervals.select(
        F.col(end_col).cast("timestamp").alias("ts"),
        F.lit(-1).alias("delta"),
        F.col(user_col).alias("u"),
    )
    # the boundary stream feeds TWO consumers (the per-day offsets
    # collect and the final windowed scan); its upstream is typically
    # an expensive sessionization — checkpoint once (the
    # expensive-multi-consumer rule; measured 7.7 -> ~4 s at sf0.1)
    b = (
        starts.unionByName(ends)
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .localCheckpoint()
    )
    # phase 1: per-day delta totals -> exclusive offsets (bounded:
    # one row per calendar day)
    rows = sorted(
        (r["day"], r["t"])
        for r in b.groupBy("day").agg(F.sum("delta").cast("long").alias("t")).collect()
    )
    offsets, acc = [], 0
    for d, t in rows:
        offsets.append((d, acc))
        acc += t
    spark = intervals.sparkSession
    off = spark.createDataFrame(offsets or [("", 0)], "day string, _off long")
    # phase 2: within-day running sum + carried offset
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("ts").asc(), F.col("delta").desc(), F.col("u").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(F.broadcast(off), "day").withColumn(
        "_cum", F.sum("delta").over(w) + F.col("_off")
    )
    # Closed-interval measurement at an END boundary happens BEFORE the
    # decrement: an instant whose only boundaries are ends (e.g. the
    # first boundary after midnight, with carried sessions) must still
    # count the ending sessions.  Each end row therefore contributes
    # the candidate (_cum + 1) — its pre-decrement value; for the first
    # of several ends at one instant that IS the true instantaneous
    # concurrency, later ones give smaller values (harmless).  Start
    # rows contribute _cum as before.  (Latent bug found by the
    # hypothesis brute-force law in r06: sweep said 2 where the closed
    # definition says 3 when a day's first boundary is an end.)
    cand = F.col("_cum") + F.when(F.col("delta") == -1, 1).otherwise(0)
    return cum.groupBy("day").agg(
        F.max(cand).cast("long").alias("peak"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).cast("long").alias("n_starts"),
    )
