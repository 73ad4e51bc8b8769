"""Batch gap+cap sessionization — the batch twin of the streaming
sessionizer (``streaming/sessionize.py``), same semantics, pure
window functions.

Semantics (mirroring ``streaming/sessionize.py:72-80`` exactly): per
user, events ordered by ``(ts, tiebreak)``; a session closes when the
next event is more than ``gap`` after the session's end (= previous
event), or when it already holds ``max_events`` events.

The cap makes the recurrence look sequential (each boundary depends on
the previous one), but it decomposes into two embarrassingly-parallel
window passes, the same trick as ``operators/chunking.py``:

1. gap sessions: ``g = sum(gap_break) over (user order by ts)`` — a
   prefix sum of an independent per-row predicate;
2. cap split: within a gap session the ONLY closures are cap closures,
   which fall at exact multiples of ``max_events`` — so
   ``sub = floor((row_number()-1) / max_events)``.

``(user_id, g, sub)`` is the session key. This is exact, not an
approximation: inside a gap session no gap break exists by
construction, so the sequential automaton's count resets happen
precisely at the multiples the row_number split reproduces.

100-TB argument: one shuffle on ``user_id``, two window passes over the
same partitioning (Spark reuses the sort), aggregation is partial
(map-side combine). No state beyond the window frame; skew is bounded
by events-per-user. The streaming twin holds O(1) state per user; this
batch form is the replay/backfill path over the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 20,
    tiebreak: str = "event_id",
) -> DataFrame:
    """events-shaped batch DataFrame -> one row per completed session:
    ``user_id, session_start, session_end, n_events, channels``
    (channels = comma-joined channel sequence in event order), matching
    the streaming sessionizer's OUTPUT_SCHEMA."""
    gap_us = gap_minutes * 60 * 1_000_000

    sess = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        F.col(tiebreak).alias("_tb"),
        F.col("event_type").alias("channel_name"),
    )

    w = Window.partitionBy("user_id").orderBy("ts", "_tb")
    with_prev = sess.withColumn("_prev", F.lag("ts").over(w))
    brk = F.when(F.col("_prev").isNull(), F.lit(0)).otherwise(
        (F.expr("timestampdiff(MICROSECOND, _prev, ts)") > F.lit(gap_us)).cast("int")
    )
    with_g = with_prev.withColumn("_g", F.sum(brk).over(w)).drop("_prev")

    w2 = Window.partitionBy("user_id", "_g").orderBy("ts", "_tb")
    sub = F.floor((F.row_number().over(w2) - F.lit(1)) / F.lit(max_events))
    keyed = with_g.withColumn("_sub", sub)

    return (
        keyed.groupBy("user_id", "_g", "_sub")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "_tb", "channel_name"))
                    ),
                    lambda x: x["channel_name"],
                ),
                ",",
            ).alias("channels"),
        )
        .drop("_g", "_sub")
    )


def sessionize_native(
    events: DataFrame,
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Spark-native gap sessionization via ``F.session_window`` — the
    built-in primitive for PURE gap sessions (no event cap), same
    output shape as ``sessionize_batch``.

    ``session_window`` is the one sessionization form Catalyst owns end
    to end: in batch it compiles to a merging session aggregate after a
    single shuffle on the grouping key, and the identical expression
    runs under ``readStream`` with watermark-driven state eviction — so
    a pipeline that doesn't need the ``max_events`` cap should prefer
    this over the hand-rolled prefix-sum twin and get both engines'
    native optimizations for free.  ``sessionize_batch(max_events=big)``
    is exactly equivalent (parity pytest
    ``tests/test_round4_ops.py::test_session_window_parity``); the cap
    is the one semantic ``session_window`` cannot express, which is why
    the prefix-sum form exists at all (SURVEY §7 note).
    """
    sess = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        F.col(tiebreak).alias("_tb"),
        F.col("event_type").alias("channel_name"),
    )
    return (
        sess.groupBy("user_id", F.session_window("ts", f"{int(gap_minutes)} minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "_tb", "channel_name"))
                    ),
                    lambda x: x["channel_name"],
                ),
                ",",
            ).alias("channels"),
        )
        .drop("session_window")
    )


def bounce_rate(
    events: DataFrame,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-entry-channel bounce rate over gap sessions: the share of
    sessions containing exactly ONE event, keyed by the channel of the
    session's first event — the engagement readout next to the
    sessionizers above.

    Gap semantics match sessionize_batch/session_window (closed
    interval: diff <= gap merges), and — ADVICE r05 — so does the
    event population: purchases are filtered out BEFORE sessionizing,
    exactly like the sessionizers this claims equivalence with, so a
    purchase row can neither extend a session, flip its bounce flag,
    nor appear as entry_channel.  Output: (entry_channel, n_sessions,
    n_bounces, bounce_q20) with the rate the exact q20 of the
    rational bounces/sessions via (2a+b) div (2b) — no float.

    Scale: one user-keyed window scan (the W2 sessionization shuffle),
    one (user, session) aggregate, one bounded channel aggregate.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        events.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull()
                | (F.expr("timestampdiff(MICROSECOND, _prev, ts)") <= F.lit(gap_us)),
                0,
            ).otherwise(1),
        )
        .withColumn("_g", F.sum("_brk").over(w))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("user_id", "_g").orderBy("ts", "event_id")
        ))
    )
    per_session = marked.groupBy("user_id", "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n_events"),
        F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias("entry_channel"),
    )
    return (
        per_session.groupBy("entry_channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum((F.col("_n_events") == 1).cast("long")).cast("long").alias("n_bounces"),
        )
        .select(
            "entry_channel",
            "n_sessions",
            "n_bounces",
            F.expr(
                "cast((2 * n_bounces * 1048576 + n_sessions)"
                " div (2 * n_sessions) as bigint)"
            ).alias("bounce_q20"),
        )
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Longest consecutive-active-day streak per user, rolled up to a
    corpus histogram — the engagement-loyalty readout (the thing a
    "7-day streak" product mechanic measures), and the one classic SQL
    device the repo had not yet exercised: islands-and-gaps via
    ``day_number - row_number()``.

    Per user, distinct active days sorted ascending; consecutive days
    share the constant ``datediff(day, epoch) - row_number()`` (each
    +1 day also advances the row number by 1), so one groupBy on that
    difference yields the islands, a max picks the longest, and the
    final rollup is bounded by the streak-length range.

    All integers (days since 1970-01-01 — the engine-neutral anchor,
    same device as dow_seasonal_index), total (day) order per user, so
    both engines compute identical islands.

    Scale: raw events collapse to distinct (user, day) map-side first
    (the rolling_distinct_users reduction); two shuffles on user_id,
    one on the bounded streak-length key.

    Output: (streak_days, n_users) — each user counted once at their
    LONGEST streak.
    """
    days = (
        events.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("_dn"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("_dn")
    islands = days.withColumn("_grp", F.col("_dn") - F.row_number().over(w))
    longest = (
        islands.groupBy("user_id", "_grp")
        .agg(F.count(F.lit(1)).cast("long").alias("_len"))
        .groupBy("user_id")
        .agg(F.max("_len").alias("streak_days"))
    )
    return longest.groupBy("streak_days").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )


def session_depth(
    events: DataFrame,
    gap_minutes: int = 30,
    max_bucket: int = 5,
) -> DataFrame:
    """Session-depth histogram per entry channel: how many events do
    sessions that START on each channel contain — the engagement
    distribution behind the single-number bounce rate (L209): two
    channels with equal bounce rates can still differ wildly in the
    depth tail this exposes.

    Session construction is IDENTICAL to bounce_rate (purchases
    filtered first, closed-interval gap <= 30 min, entry = first event
    by (ts, event_id)); depth is capped at ``max_bucket`` ("N+" top
    bucket).  Output: (entry_channel, depth_bucket, n_sessions).

    Scale: one user-keyed window scan (the W2 sessionization shuffle),
    one (user, session) aggregate, one bounded
    |channels| x max_bucket roll-up.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        events.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull()
                | (F.expr("timestampdiff(MICROSECOND, _prev, ts)") <= F.lit(gap_us)),
                0,
            ).otherwise(1),
        )
        .withColumn("_g", F.sum("_brk").over(w))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "_g").orderBy("ts", "event_id")
            ),
        )
    )
    per_session = marked.groupBy("user_id", "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n_events"),
        F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias("entry_channel"),
    )
    return (
        per_session.select(
            "entry_channel",
            F.least(F.col("_n_events"), F.lit(max_bucket)).cast("long").alias("depth_bucket"),
        )
        .groupBy("entry_channel", "depth_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
