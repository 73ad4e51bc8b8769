"""Native attribution models (SURVEY §2.6).

The reference outsources attribution to an external HTTP API
(``src/api/ihc_api.py:86-172``, Haensel AMS "IHC") and only pins the
observable contract: per-session weight ``ihc`` in [0,1], and the
empirically-verified invariant **sum(ihc) per conversion == 1.0**
(all 1,940 conversions in ``data/output/api_response.json``).

The rebuild computes attribution natively as window expressions over
``Window.partitionBy(conversion_id).orderBy(event_ts, session_id)`` —
one shuffle on conversion_id, everything else whole-stage-codegen
column math. No UDFs; every model is also ANSI-SQL-expressible so the
DuckDB oracle can verify it exactly.

Models (all satisfy: weights >= 0, sum per conversion == 1):

- ``last_touch`` / ``first_touch``: all credit to the last/first session.
- ``linear``: 1/n each.
- ``u_shaped``: 0.4 first + 0.4 last + 0.2 split over the middle
  (n=1 -> 1.0, n=2 -> 0.5/0.5).
- ``time_decay``: weight 2^(-age/halflife) normalized per conversion.
- ``ihc``: a 3-phase Initializer/Holder/Closer model mirroring the
  reference API's parameter surface (``src/api/ihc_api.py:54-72``):
  initializer credit to the first session, closer credit over sessions
  flagged ``closer_engagement`` (fallback: the last session), holder
  credit over flagged middle sessions (fallback: linear), with
  phase weights and redistribution knobs configurable.

Ordering ties are broken by session_id so results are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic journey ordering everywhere
def _w():
    return Window.partitionBy("conversion_id").orderBy("event_ts", "session_id")


def _wall():
    return Window.partitionBy("conversion_id")


def _finish(df: DataFrame, weight: F.Column) -> DataFrame:
    """Normalize ``weight`` to sum 1 per conversion and emit the
    ``attribution_customer_journey`` contract
    (``challenge_db_create.sql:34-39``)."""
    total = F.sum(weight).over(_wall())
    ihc = F.when(total > 0, weight / total).otherwise(
        F.lit(1.0) / F.count(F.lit(1)).over(_wall())
    )
    return df.select(
        F.col("conversion_id").alias("conv_id"),
        "session_id",
        ihc.alias("ihc"),
    )


def attribute_linear(journeys: DataFrame) -> DataFrame:
    n = F.count(F.lit(1)).over(_wall())
    return journeys.select(
        F.col("conversion_id").alias("conv_id"),
        "session_id",
        (F.lit(1.0) / n).alias("ihc"),
    )


def attribute_last_touch(journeys: DataFrame) -> DataFrame:
    # exact by construction (exactly one 1.0 per conversion) — no
    # normalize pass, one window instead of two
    rn = F.row_number().over(_w())
    n = F.count(F.lit(1)).over(_wall())
    return journeys.select(
        F.col("conversion_id").alias("conv_id"),
        "session_id",
        F.when(rn == n, F.lit(1.0)).otherwise(F.lit(0.0)).alias("ihc"),
    )


def attribute_first_touch(journeys: DataFrame) -> DataFrame:
    rn = F.row_number().over(_w())
    return journeys.select(
        F.col("conversion_id").alias("conv_id"),
        "session_id",
        F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0)).alias("ihc"),
    )


def attribute_u_shaped(journeys: DataFrame) -> DataFrame:
    rn = F.row_number().over(_w())
    n = F.count(F.lit(1)).over(_wall())
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(rn == 1, F.lit(0.4))
        .when(rn == n, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    # exact by construction — skip the normalize divide
    return journeys.select(
        F.col("conversion_id").alias("conv_id"), "session_id", weight.alias("ihc")
    )


def attribute_time_decay(journeys: DataFrame, halflife_days: float = 7.0) -> DataFrame:
    """weight = 2^(-age_days / halflife), normalized per conversion."""
    # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike (a
    # direct cast-to-double is illegal on NTZ under Spark 4 ANSI) and
    # matches the oracle's epoch_us difference exactly.
    age_days = F.expr(
        "timestampdiff(MICROSECOND, event_ts, conv_ts)"
    ).cast("double") / F.lit(86400.0e6)
    weight = F.pow(F.lit(2.0), -age_days / F.lit(float(halflife_days)))
    return _finish(journeys, weight)


@dataclass
class IHCParams:
    """Mirror of the reference's ``redistribution_parameter`` surface
    (``src/api/ihc_api.py:54-72``): per-phase weight plus redistribution
    of named channels' credit (e.g. Direct / Email_NewsLetter)."""

    initializer_weight: float = 0.3
    holder_weight: float = 0.3
    closer_weight: float = 0.4
    # channels whose final credit is redistributed to the remaining
    # sessions (ihc_api.py redistribution_channel_labels)
    redistribution_channel_labels: list[str] = field(default_factory=list)
    # minimum weight a session must reach to keep credit; below it the
    # credit is redistributed (ihc_api.py receive_threshold)
    receive_threshold: float = 0.0
    # which sessions may receive a losing session's credit, relative to
    # the loser's position in the journey (ihc_api.py `direction`):
    # 'any_session' (proportional over all kept sessions),
    # 'earlier_sessions_only', or 'later_sessions_only'. A loser with
    # no eligible receiver keeps its own credit.
    redistribution_direction: str = "any_session"


def attribute_ihc(journeys: DataFrame, params: IHCParams | None = None) -> DataFrame:
    """3-phase Initializer/Holder/Closer attribution.

    - initializer: the journey's first session gets ``initializer_weight``;
    - closer: ``closer_weight`` split over sessions with
      ``closer_engagement = 1`` (earlier-sessions-only direction is
      implicit: conversion-time is the journey end); if none, the last
      session takes it;
    - holder: ``holder_weight`` split over sessions with
      ``holder_engagement = 1``; if none, split linearly over all.

    Then optional redistribution: sessions on
    ``redistribution_channel_labels`` (or below ``receive_threshold``)
    lose their credit, which is re-spread proportionally over the
    remaining sessions; if every session would lose, weights are kept.
    Final weights are normalized to sum exactly 1 per conversion.
    """
    p = params or IHCParams()
    rn = F.row_number().over(_w())
    n = F.count(F.lit(1)).over(_wall())
    n_closer = F.sum("closer_engagement").over(_wall())
    n_holder = F.sum("holder_engagement").over(_wall())

    init_w = F.when(rn == 1, F.lit(p.initializer_weight)).otherwise(F.lit(0.0))
    closer_w = (
        F.when(
            n_closer > 0,
            F.when(
                F.col("closer_engagement") == 1, F.lit(p.closer_weight) / n_closer
            ).otherwise(F.lit(0.0)),
        )
        .otherwise(F.when(rn == n, F.lit(p.closer_weight)).otherwise(F.lit(0.0)))
    )
    holder_w = (
        F.when(
            n_holder > 0,
            F.when(
                F.col("holder_engagement") == 1, F.lit(p.holder_weight) / n_holder
            ).otherwise(F.lit(0.0)),
        )
        .otherwise(F.lit(p.holder_weight) / n)
    )
    raw = init_w + closer_w + holder_w

    df = journeys.withColumn("_raw", raw)
    if p.redistribution_channel_labels or p.receive_threshold > 0:
        keep = ~F.col("channel_label").isin(p.redistribution_channel_labels)
        if p.receive_threshold > 0:
            keep = keep & (F.col("_raw") >= F.lit(p.receive_threshold))
        if p.redistribution_direction == "any_session":
            kept_total = F.sum(F.when(keep, F.col("_raw")).otherwise(F.lit(0.0))).over(_wall())
            df = df.withColumn(
                "_raw",
                F.when(kept_total > 0, F.when(keep, F.col("_raw")).otherwise(F.lit(0.0)))
                .otherwise(F.col("_raw")),
            )
        elif p.redistribution_direction in ("earlier_sessions_only", "later_sessions_only"):
            df = _redistribute_directional(
                df, keep, earlier=(p.redistribution_direction == "earlier_sessions_only")
            )
        else:
            raise ValueError(
                f"unknown redistribution_direction {p.redistribution_direction!r}"
            )
    return _finish(df, F.col("_raw"))


def _redistribute_directional(df: DataFrame, keep: F.Column, earlier: bool) -> DataFrame:
    """Directional redistribution (ihc_api.py ``direction``): each
    losing session's credit is re-spread proportionally over the KEPT
    sessions strictly earlier (or later) than it in the journey; a
    loser with no eligible receiver keeps its own credit.

    Pure window math, no self-join: with sessions ordered by
    (event_ts, session_id),

        eligible_i = cumulative kept weight strictly before/after i
        ratio_i    = lost_i / eligible_i          (losers with receivers)
        gain_j     = kept_j * sum(ratio_i) over losers i on the far side

    Each loser's ratio times its receivers' weights sums back to
    exactly lost_i, so total credit is conserved (then _finish
    normalizes exactly to 1)."""
    w = _w()
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    after = w.rowsBetween(1, Window.unboundedFollowing)
    eligible_frame = before if earlier else after
    ratio_frame = after if earlier else before

    kept_w = F.when(keep, F.col("_raw")).otherwise(F.lit(0.0))
    lost_w = F.when(~keep, F.col("_raw")).otherwise(F.lit(0.0))
    eligible = F.coalesce(F.sum(kept_w).over(eligible_frame), F.lit(0.0))
    d = (
        df.withColumn("_kept", kept_w)
        .withColumn("_lost", lost_w)
        .withColumn("_elig", eligible)
    )
    ratio = F.when(
        (F.col("_lost") > 0) & (F.col("_elig") > 0), F.col("_lost") / F.col("_elig")
    ).otherwise(F.lit(0.0))
    d = d.withColumn("_ratio", ratio)
    gain_factor = F.coalesce(F.sum("_ratio").over(ratio_frame), F.lit(0.0))
    final = (
        F.col("_kept") * (F.lit(1.0) + gain_factor)
        # loser with no receiver keeps its credit
        + F.when((F.col("_lost") > 0) & (F.col("_elig") <= 0), F.col("_lost")).otherwise(
            F.lit(0.0)
        )
    )
    return d.withColumn("_raw", final).drop("_kept", "_lost", "_elig", "_ratio")


MODELS = {
    "linear": attribute_linear,
    "first_touch": attribute_first_touch,
    "last_touch": attribute_last_touch,
    "u_shaped": attribute_u_shaped,
    "time_decay": attribute_time_decay,
    "ihc": attribute_ihc,
}


def attribute(journeys: DataFrame, model: str = "ihc", **kwargs) -> DataFrame:
    try:
        fn = MODELS[model]
    except KeyError:
        raise ValueError(f"unknown attribution model {model!r}; one of {sorted(MODELS)}")
    return fn(journeys, **kwargs)
