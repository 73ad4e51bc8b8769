"""UCB1 channel-exploration scores (budget-shift decision support).

The reference's report ends at observed cpo/roas per channel
(/root/reference/src/etl/reporting.py:96-110) — a pure-exploitation
readout.  The standard fix for "which channel should get the NEXT
marginal session" is the UCB1 index (Auer et al. 2002): observed
conversion-participation rate plus an exploration bonus that shrinks
as a channel accumulates evidence,

    ucb = reward/plays + sqrt(2 ln(N) / plays).

Semantics here: an arm is a channel; a play is a session; a session's
reward is 1 iff it participates in at least one conversion journey
(the same lookback join the attribution models use,
operators/journeys.py) — i.e. the empirical P(session ends up on a
converting path).

Cross-engine exactness: plays/reward_sum/n_total are exact longs; the
index itself involves ln and sqrt, so it is emitted as ucb_q20 under
the repo float policy (irrational values are q20-safe — the same
class as the pow/cosine precedents; a boundary tie needs the true
value within 1 ulp of a 2^-20 grid point).

Scale: two hash aggregates keyed on channel (bounded arms) plus one
distinct over journey session ids; the journeys join itself is the
already-scale-audited J1.  No windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ucb1_scores(sessions: DataFrame, journeys: DataFrame) -> DataFrame:
    """Per-channel UCB1 indices.

    sessions: (session_id, channel_name, ...); journeys: the J1 output
    carrying session_id for every (conversion, session) pair.

    Output: (channel_name, plays, reward_sum, n_total, ucb_q20),
    one row per channel.
    """
    converted = journeys.select("session_id").distinct()
    per_arm = (
        sessions.select("session_id", "channel_name")
        .join(converted.withColumn("_conv", F.lit(1)), "session_id", "left")
        .groupBy("channel_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("plays"),
            F.sum(F.coalesce(F.col("_conv"), F.lit(0)).cast("long"))
            .cast("long")
            .alias("reward_sum"),
        )
    )
    total = per_arm.agg(F.sum("plays").cast("long").alias("n_total"))
    return per_arm.join(F.broadcast(total)).select(
        "channel_name",
        "plays",
        "reward_sum",
        "n_total",
        F.expr(
            "cast(floor((cast(reward_sum as double) / plays"
            " + sqrt(2.0 * ln(cast(n_total as double)) / plays)) * 1048576 + 0.5) as bigint)"
        ).alias("ucb_q20"),
    )
