"""2-D skyline (Pareto-front / dominance) operator.

"Which (cost, benefit) points are not beaten on both axes?" — the
skyline of Borzsony/Kossmann/Stocker (ICDE 2001), the multi-criteria
complement to top-k (operators/topk.py): top-k needs a scoring
formula, the skyline needs none.

Semantics: point p survives iff NO q has cost_q <= cost_p AND
benefit_q >= benefit_p with at least one strict.  Duplicated (cost,
benefit) pairs all survive together (neither dominates).

Plan — sort-based, never the quadratic NOT-EXISTS the oracle runs:

1. collapse to the COST grain: max benefit per distinct cost;
2. one ordered scan over distinct costs: the running max of benefit
   over STRICTLY cheaper costs (an unbounded-preceding window with a
   1-row lag);
3. p survives iff benefit == its cost-group max AND benefit > every
   cheaper group's max.

The ordered scan runs on the distinct-cost grain.  Callers feed
bounded grains (channel x day, calendar-bounded) where the
unpartitioned window is the repo's bounded-grain pattern; for an
unbounded grain the same scan two-phases exactly like
segmentation.global_row_number (range-bucket by cost, per-bucket
running max + bucket-prefix max broadcast) — documented, not needed
for the registry callers.

Exact integers throughout; the oracle's literal quadratic NOT EXISTS
proves the sort-based rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    points: DataFrame,
    cost_col: str,
    benefit_col: str,
) -> DataFrame:
    """Rows of ``points`` on the (min cost, max benefit) skyline;
    all input columns pass through."""
    grp = points.groupBy(F.col(cost_col).alias("_cost")).agg(
        F.max(F.col(benefit_col)).alias("_gmax")
    )
    w = Window.orderBy("_cost").rowsBetween(Window.unboundedPreceding, -1)
    gm = grp.withColumn("_prevmax", F.max("_gmax").over(w))
    return (
        points.join(
            gm,
            points[cost_col] == gm["_cost"],
        )
        .filter(
            (F.col(benefit_col) == F.col("_gmax"))
            & (F.col("_prevmax").isNull() | (F.col(benefit_col) > F.col("_prevmax")))
        )
        .drop("_cost", "_gmax", "_prevmax")
    )
