"""Robust per-group statistics: exact trimmed and winsorized sums.

The reference's report layer averages raw revenue
(/root/reference/src/etl/reporting.py:60-110); one whale order skews
every channel mean.  The two classic robust fixes, computed EXACTLY
(rank-based, integer cents — never a float percentile estimate):

- trimmed: drop the k smallest and k largest values per group,
  k = (trim_pct * n_g) div 100;
- winsorized: clip them to the (k+1)-th / (n_g-k)-th order statistic
  instead of dropping.

Both need per-group order statistics.  Implementation is a single
window pass partitioned by the group key — ``row_number`` and
``count`` over (group) — then conditional aggregation.  The clip
values are picked out of the SAME pass with MAX(CASE WHEN rank = k+1)
— no second scan, no join back.

Scale note: a partitionBy(group) window sorts each group in one task.
For high-cardinality group keys (user_id, part) that shards
perfectly.  For BOUNDED keys (channel: ~6 groups) each group is one
sorted task — the honest cost statement is n_g log n_g per channel on
one core; the scale path for that shape is the two-phase range rank
(operators/segmentation.py:global_row_number) applied per group,
which this module's callers can swap in without changing semantics
because both produce the identical total (value, tiebreak) order.

Sums are integer cents end to end (exact-money rule); the means are
emitted as (sum, count) pairs, never a rounded float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_group_stats(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    tiebreak_col: str,
    trim_pct: int = 5,
) -> DataFrame:
    """Per-group exact trimmed/winsorized integer-cents statistics.

    Output: (group, n, k_trimmed, raw_sum_cents, trimmed_sum_cents,
    winsorized_sum_cents, lo_clip_cents, hi_clip_cents).
    k_trimmed = (trim_pct * n) div 100 values cut from EACH tail.
    """
    if not 0 <= trim_pct < 50:
        raise ValueError("trim_pct must be in [0, 50)")
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(cents_col).cast("long").alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn("_rn", F.row_number().over(Window.partitionBy("grp").orderBy("_v", "_tb")))
    sized = ranked.join(
        ranked.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("_n")), "grp"
    ).withColumn("_k", F.expr(f"({trim_pct} * _n) div 100"))
    kept = (F.col("_rn") > F.col("_k")) & (F.col("_rn") <= F.col("_n") - F.col("_k"))
    return sized.groupBy("grp").agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("k_trimmed"),
        F.sum("_v").cast("long").alias("raw_sum_cents"),
        F.sum(F.when(kept, F.col("_v"))).cast("long").alias("trimmed_sum_cents"),
        F.max(F.when(F.col("_rn") == F.col("_k") + 1, F.col("_v"))).alias("lo_clip_cents"),
        F.max(F.when(F.col("_rn") == F.col("_n") - F.col("_k"), F.col("_v"))).alias(
            "hi_clip_cents"
        ),
    ).select(
        F.col("grp").alias(group_col),
        "n",
        "k_trimmed",
        "raw_sum_cents",
        "trimmed_sum_cents",
        # winsorized sum = trimmed sum + k * (lo clip + hi clip): the k
        # dropped values on each tail come back AT the clip value.
        (
            F.col("trimmed_sum_cents")
            + F.col("k_trimmed") * (F.col("lo_clip_cents") + F.col("hi_clip_cents"))
        )
        .cast("long")
        .alias("winsorized_sum_cents"),
        "lo_clip_cents",
        "hi_clip_cents",
    )
