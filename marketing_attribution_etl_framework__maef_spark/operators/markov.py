"""Markov-chain attribution building block: the channel transition
matrix.

Markov (removal-effect) attribution models the customer journey as a
first-order chain over channels with absorbing (start)/(conversion)
states; its input is the transition count matrix this operator
produces. The reference delegates all attribution modelling to its
external IHC API (/root/reference/src/api/ihc_api.py) — this extends
the model family the engine supports natively, alongside the six
positional models in operators/attribution.py.

Shape: one LAG/LEAD window partitioned by conversion_id (the same
partitioning every attribution model here uses, so at warehouse scale
the journey shuffle is shared), then a count aggregate over (src, dst)
— a matrix bounded by (channels + 2)^2 rows whatever the input scale.
Ordering ties break on session_id, so the chain is total and the
counts deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START = "(start)"
CONVERSION = "(conversion)"


def channel_transitions(
    journeys: DataFrame,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Transition counts over per-conversion journeys:
    ``(start) -> first channel``, ``channel -> next channel``, and
    ``last channel -> (conversion)``. Output: (src, dst, n)."""
    w = Window.partitionBy(part_col).orderBy(*[F.asc(c) for c in order_cols])
    ordered = journeys.select(
        F.col(part_col),
        F.col(channel_col).alias("_ch"),
        F.lag(channel_col).over(w).alias("_prev"),
        F.lead(channel_col).over(w).alias("_next"),
    )
    steps = ordered.select(
        F.coalesce(F.col("_prev"), F.lit(START)).alias("src"), F.col("_ch").alias("dst")
    )
    finals = ordered.filter(F.col("_next").isNull()).select(
        F.col("_ch").alias("src"), F.lit(CONVERSION).alias("dst")
    )
    return (
        steps.unionByName(finals)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
