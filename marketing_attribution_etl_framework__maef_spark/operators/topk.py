"""Exact per-group top-k.

The scale-safe "top N per key": a rank window PARTITIONED by the group
columns — state per partition is one row counter, the sort is local to
each group's partition, and no global single-partition window ever
appears (the shape this repo's plan pins ban). For the global-top-k
variant see llm/text.py vocabulary (TakeOrdered), which is the right
tool when there is no grouping key.

Ordering must be total (include a unique tiebreaker column) or ranks
are nondeterministic under shuffle — the caller owns that contract,
same as SQL ROW_NUMBER.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_topk(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top ``k`` rows per group with their 1-based rank."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
