"""Exact distributed discrete percentiles.

Spark's built-in exact ``percentile`` aggregate buffers each group's
values; ``percentile_approx`` sketches. Neither is what a correctness
gate wants at scale: the first is memory-unbounded per group, the
second engine-private. The discrete percentile (the smallest value
whose rank reaches ``ceil(p * n)`` — SQL's PERCENTILE_DISC) needs only
a rank window: one shuffle on the group key, O(1) state per row, and
it returns an actual element of the data — no interpolation, so the
result is exact in both engines whatever the value type.

Percentiles must be exact binary fractions (0.25, 0.5, 0.875, ...):
``p * n`` is then an exact float product and ``ceil`` is deterministic
cross-engine. Ties: equal values are interchangeable at a given rank,
so tie order cannot change the returned value.

Typical training-data use: per-source document-length percentiles to
size packing budgets (llm/curation.py pack_sequences) and truncation
cutoffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per group and per ``p``: the PERCENTILE_DISC(p) of ``value_col``.
    Output: group cols + ``p`` (double) + ``value_col`` (input type)."""
    for p in ps:
        if not (0 < p <= 1):
            raise ValueError(f"percentile {p} outside (0, 1]")
    w = Window.partitionBy(*group_cols).orderBy(F.asc(value_col))
    ranked = df.select(*group_cols, value_col).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols)))
    spark = df.sparkSession
    pdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    return (
        ranked.crossJoin(F.broadcast(pdf))
        .filter(F.col("_rn") == F.ceil(F.col("p") * F.col("_n")))
        .select(*group_cols, "p", value_col)
    )
