"""Ordered k-step funnel analysis and cohort retention.

Two classic marketing-analytics rollups the reference's report layer
stops short of (its channel report is a flat channel x date grain,
/root/reference/src/etl/reporting.py) but that any attribution
warehouse is asked for next:

- ``funnel_stages``: for each user, the furthest step of an ordered
  event-type funnel (e.g. view -> click -> purchase) reached with
  strictly increasing timestamps — step i counts only if it happens
  AFTER the user's step-(i-1) time.
- ``cohort_retention``: users bucketed by first-activity week, with
  distinct active users per (cohort week, week offset).

Scale notes. The funnel is k conditional min-aggregates over events,
each keyed on the user id — never a per-user sort or a
collect_list of a user's full history (a power user with 10M events
would blow any per-group buffer; a MIN combines map-side in O(1)
state). The k passes re-shuffle on the SAME key, so Spark reuses the
exchange (ReusedExchange in the plan at equal partitioning), and at
warehouse scale user-bucketed tables make every pass shuffle-free.
Cohort retention is two hash aggregates and one equi join on user_id,
then a (cohort, offset) roll-up whose key count is bounded by
weeks^2 — tiny output whatever the input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Furthest funnel step per user with strict time ordering.

    Returns one row per user seen in ANY step event:
    ``(user_id, funnel_stage)`` where funnel_stage in [0, len(steps)]
    counts completed steps (0 = has step events but never step 1 —
    e.g. clicked without ever viewing).
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    cur = None  # (user_id, t{i}) of users who reached step i
    # one explicit user_id exchange up front: every step's groupBy and
    # join below is keyed on user_id, so they all reuse this single
    # shuffle (ReusedExchange) instead of shuffling once per pass —
    # measured 2.2s -> 1.5s at sf0.1. Over a user-bucketed warehouse
    # table the repartition (and with it every shuffle here) vanishes.
    base = (
        events.select(
            F.col(user_col).alias("user_id"), F.col(type_col).alias("_et"), F.col(ts_col).alias("_ts")
        )
        .filter(F.col("_et").isin(list(steps)))
        .repartition("user_id")
    )
    for i, step in enumerate(steps):
        ev_i = base.filter(F.col("_et") == step)
        if cur is None:
            cur = ev_i.groupBy("user_id").agg(F.min("_ts").alias(f"_t{i}"))
        else:
            cur = (
                ev_i.join(cur, "user_id")
                .filter(F.col("_ts") > F.col(f"_t{i - 1}"))
                .groupBy("user_id")
                .agg(F.min("_ts").alias(f"_t{i}"))
            )
        reached = cur.select("user_id", F.lit(i + 1).cast("long").alias("_stage"))
        if i == 0:
            stages = reached
        else:
            stages = stages.unionByName(reached)
    everyone = base.select("user_id").distinct().withColumn("_stage", F.lit(0).cast("long"))
    return (
        everyone.unionByName(stages)
        .groupBy("user_id")
        .agg(F.max("_stage").alias("funnel_stage"))
    )


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel counts: users at each furthest-stage value, plus the
    cumulative users-reaching-at-least-that-stage column a funnel
    chart plots. Output: (funnel_stage, n_users, n_reached)."""
    per_user = funnel_stages(events, steps, user_col, type_col, ts_col)
    at = per_user.groupBy("funnel_stage").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    # n_reached(stage) = sum of n_users at >= stage: the stage domain is
    # tiny (k+1 rows), so a range self-join stays trivially cheap.
    b = at.select(F.col("funnel_stage").alias("_s2"), F.col("n_users").alias("_n2"))
    return (
        at.join(b, F.col("_s2") >= F.col("funnel_stage"))
        .groupBy("funnel_stage", "n_users")
        .agg(F.sum("_n2").cast("long").alias("n_reached"))
    )


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_hours: int = 168,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-constrained funnel (the ClickHouse ``windowFunnel`` /
    Amplitude conversion-window semantics): the furthest step each user
    reaches where every step is strictly after the previous one AND
    within ``window_hours`` of the user's FIRST step-1 event (the
    deterministic anchor — min ts of step 1; later anchors are a
    different product question).

    Same k conditional-min-aggregate shape as ``funnel_stages`` (never
    a per-user sort or history buffer; MIN combines map-side in O(1)
    state), with the anchor bound carried through the chain. All the
    per-step joins key on user_id, so they reuse the single up-front
    exchange. Output: (funnel_stage, n_users, n_reached) like
    ``funnel_summary``.

    The per-stage ``cur`` aggregate is consumed TWICE per round (the
    next stage's join and the ``reached`` union branch), so it is
    localCheckpoint'd each round — un-pinned, the union's k branches
    re-derive 1+2+..+k stage lineages (O(k^2) plan growth, the raking/
    cluster_duplicates law; this was the 6x bench variance in r08). The
    checkpointed state is user-grain bounded (3 longs per user still in
    the funnel, shrinking per stage); at 100 TB checkpoint to a table
    instead of in-session blocks.
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    us = int(window_hours) * 3600 * 1_000_000
    base = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("_et"),
            F.col(ts_col).alias("_ts"),
        )
        .filter(F.col("_et").isin(list(steps)))
        .repartition("user_id")
    )
    stages = None
    cur = None
    for i, step in enumerate(steps):
        ev_i = base.filter(F.col("_et") == step)
        if cur is None:
            cur = ev_i.groupBy("user_id").agg(F.min("_ts").alias("_t0"))
            cur = cur.withColumn("_prev", F.col("_t0"))
        else:
            cur = (
                ev_i.join(cur, "user_id")
                .filter(
                    (F.col("_ts") > F.col("_prev"))
                    & (F.expr("timestampdiff(MICROSECOND, _t0, _ts)") <= F.lit(us))
                )
                .groupBy("user_id")
                .agg(F.min("_t0").alias("_t0"), F.min("_ts").alias("_prev"))
            )
        cur = cur.localCheckpoint(eager=False)
        reached = cur.select("user_id", F.lit(i + 1).cast("long").alias("_stage"))
        stages = reached if stages is None else stages.unionByName(reached)
    everyone = base.select("user_id").distinct().withColumn("_stage", F.lit(0).cast("long"))
    per_user = (
        everyone.unionByName(stages)
        .groupBy("user_id")
        .agg(F.max("_stage").alias("funnel_stage"))
    )
    at = per_user.groupBy("funnel_stage").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    b = at.select(F.col("funnel_stage").alias("_s2"), F.col("n_users").alias("_n2"))
    return (
        at.join(b, F.col("_s2") >= F.col("funnel_stage"))
        .groupBy("funnel_stage", "n_users")
        .agg(F.sum("_n2").cast("long").alias("n_reached"))
    )


_GRAIN_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix at ``grain`` ('week' default, or 'day').

    cohort_period = truncated period of the user's first event
    (ISO-Monday weeks in both engines); period_offset = whole periods
    between cohort and activity period; n_active = distinct users of
    that cohort active in that period.
    Output: (cohort_period date, period_offset long, n_active long).
    """
    if grain not in _GRAIN_DAYS:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_DAYS)}, got {grain!r}")
    days = _GRAIN_DAYS[grain]
    trunc = lambda c: F.date_trunc(grain, c).cast("date")  # noqa: E731
    firsts = events.groupBy(F.col(user_col).alias("user_id")).agg(
        trunc(F.min(ts_col)).alias("cohort_period")
    )
    active = (
        events.select(F.col(user_col).alias("user_id"), trunc(F.col(ts_col)).alias("active_period"))
        .distinct()
    )
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_period",
            F.expr(f"datediff(active_period, cohort_period) div {days}")
            .cast("long")
            .alias("period_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )
