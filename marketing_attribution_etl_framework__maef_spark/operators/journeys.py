"""Journey construction — the core J1 operator (SURVEY §2.3).

The reference builds customer journeys with a single-threaded
O(conversions x sessions) pandas loop (``src/etl/transform.py:229-241``):
for each conversion, all sessions of the same user strictly before the
conversion timestamp. Here it is one distributed equi-join on
``user_id`` with a timestamp theta-predicate — Catalyst plans a
hash/sort-merge join keyed on user_id and applies the time predicate as
a post-join filter; AQE's skew-join splitting handles heavy users at
scale (the reference data is Direct-Traffic-skewed).

Semantics decisions (SURVEY §2.8.1, §2.8.6), both switchable:

- ``strict_before=False`` (default): sessions with ``ts <= conv_ts``
  are included and the boundary session gets ``conversion = 1`` —
  matching the challenge-canonical ``data/output/required_format.json``
  (999/5070 rows with conversion=1). ``strict_before=True`` reproduces
  the shipped code's ``<`` + dead ``conversion=1`` branch
  (``src/etl/transform.py:237,245``).
- ``lookback_days``: optional lower bound ``ts >= conv_ts - N days``
  (the commented v1 30-day lookback, ``src/etl/transform.py:113-119``).
  Besides the semantic, the bound is what makes the join a *range*
  join at 100 TB — it caps the per-user fan-out so no single
  conversion drags an unbounded session history through the shuffle.

Scale notes: both sides shuffle-partition on user_id only; if
conversions is dimension-sized relative to sessions, pass
``broadcast_conversions=True`` to skip the shuffle of the big side
entirely. No Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_journeys(
    conversions: DataFrame,
    sessions: DataFrame,
    *,
    strict_before: bool = False,
    lookback_days: int | None = None,
    broadcast_conversions: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """conversions(conv_id, user_id, conv_ts, revenue) x
    sessions(session_id, user_id, event_ts, channel_name, flags...)
    -> one row per (conversion, prior session).

    Output columns: conversion_id, session_id, conv_ts, event_ts,
    channel_label, holder_engagement, closer_engagement,
    impression_interaction, conversion, revenue.

    ``salt_buckets``: manual skew salting for when one user dominates
    the key distribution beyond what AQE's skew-join splitting handles
    — sessions get ``salt = xxhash64(session_id) % N``, conversions are
    replicated across all N salts, and the join key becomes
    (user_id, salt): a hot user's sessions spread over N tasks at the
    cost of an N-fold replication of the (small) conversions side.
    Results are identical to the unsalted join.
    """
    conv = conversions.select(
        F.col("conv_id").alias("conversion_id"),
        F.col("user_id"),
        F.col("conv_ts"),
        F.col("revenue"),
    )

    sess = sessions.select(
        "session_id",
        "user_id",
        "event_ts",
        F.col("channel_name").alias("channel_label"),
        "holder_engagement",
        "closer_engagement",
        "impression_interaction",
    )

    join_keys = ["user_id"]
    if salt_buckets:
        n = int(salt_buckets)
        sess = sess.withColumn(
            "_salt", F.pmod(F.xxhash64("session_id"), F.lit(n)).cast("int")
        )
        conv = conv.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        join_keys = ["user_id", "_salt"]

    if broadcast_conversions:
        conv = F.broadcast(conv)

    time_pred = (
        (F.col("event_ts") < F.col("conv_ts"))
        if strict_before
        else (F.col("event_ts") <= F.col("conv_ts"))
    )
    if lookback_days is not None:
        time_pred = time_pred & (
            F.col("event_ts") >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )

    joined = conv.join(sess, on=join_keys, how="inner").filter(time_pred)

    # conversion flag: 1 iff session timestamp == conversion timestamp
    # (src/etl/transform.py:242-245; reachable only in <= mode).
    return joined.select(
        "conversion_id",
        "session_id",
        "conv_ts",
        "event_ts",
        "channel_label",
        "holder_engagement",
        "closer_engagement",
        "impression_interaction",
        (F.col("event_ts") == F.col("conv_ts")).cast("int").alias("conversion"),
        "revenue",
    )


def journey_entries(journeys: DataFrame) -> DataFrame:
    """Project the 8-field JSON journey contract (P1,
    ``src/etl/transform.py:247-256``): timestamps rendered back to
    'yyyy-MM-dd HH:mm:ss' strings for parity with
    ``data/output/required_format.json``."""
    return journeys.select(
        "conversion_id",
        "session_id",
        F.date_format("event_ts", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
        "channel_label",
        "holder_engagement",
        "closer_engagement",
        "conversion",
        "impression_interaction",
    )


def group_journeys(journeys: DataFrame) -> DataFrame:
    """A7 (``src/api/ihc_api.py:17-23``): Dict[conv -> ordered session
    list] as ``groupBy().agg(sort_array(collect_list(struct(...))))``.

    ``collect_list`` order is not deterministic under shuffle, so the
    struct leads with (event_ts, session_id) and is sort_array'd —
    SURVEY §7 calls this out as the easy-to-get-silently-wrong spot.
    """
    return journeys.groupBy("conversion_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("event_ts"),
                    F.col("session_id"),
                    F.col("channel_label"),
                    F.col("holder_engagement"),
                    F.col("closer_engagement"),
                    F.col("impression_interaction"),
                )
            )
        ).alias("sessions"),
        F.count(F.lit(1)).alias("n_sessions"),
    )
