"""Iterative proportional fitting (raking) of survey-style weights.

The classic warehouse calibration verb (Deming & Stephan 1940): a
sample's (channel x value-band) cell counts are re-weighted so the
weighted margins match the full-population margins on BOTH axes —
the tool for "last-30-days sample, full-quarter margins" bias
correction.

Fixed round count (2 full row+column passes), so a DuckDB oracle can
unroll the identical rounds (the k_core/markov fixed-round contract).
Weights are ratios of exact integer counts composed by multiplication
and division only — both engines evaluate the identical double
expression tree on identical operands, and the q20 emission is stable
per the repo float rule (rationals never sit within ulp noise of a
q20 boundary).

100-TB shape: the raw scans collapse to margin/cell counts with
map-side combine; every IPF step then runs on the BOUNDED
|channels| x |bands| cell table (joins against one-row-per-margin
aggregates, broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rake_weights(
    sample_cells: DataFrame,
    row_margins: DataFrame,
    col_margins: DataFrame,
    rounds: int = 2,
) -> DataFrame:
    """IPF weights on a bounded cell table.

    sample_cells: (r, c, m) exact counts; row_margins: (r, tr);
    col_margins: (c, tc).  Output: (r, c, m, w_q20) after ``rounds``
    row-then-column passes starting from w = 1.
    """
    cells = sample_cells.select("r", "c", F.col("m").cast("double").alias("m")).withColumn(
        "w", F.lit(1.0)
    )
    rm = row_margins.select("r", F.col("tr").cast("double").alias("tr"))
    cm = col_margins.select("c", F.col("tc").cast("double").alias("tc"))
    for _ in range(int(rounds)):
        rsum = cells.groupBy("r").agg(F.sum(F.col("w") * F.col("m")).alias("rs"))
        cells = (
            cells.join(F.broadcast(rsum), "r")
            .join(F.broadcast(rm), "r")
            .withColumn("w", F.col("w") * F.col("tr") / F.col("rs"))
            .drop("rs", "tr")
        )
        csum = cells.groupBy("c").agg(F.sum(F.col("w") * F.col("m")).alias("cs"))
        cells = (
            cells.join(F.broadcast(csum), "c")
            .join(F.broadcast(cm), "c")
            .withColumn("w", F.col("w") * F.col("tc") / F.col("cs"))
            .drop("cs", "tc")
            # loop state MUST be pinned: each round references the
            # previous cells THREE times (row sum, col sum, carry), so
            # an un-checkpointed lineage grows ~3^rounds and stalls the
            # analyzer (observed at rounds=8; the cluster_duplicates
            # rule).  Production: a staging table per round.
            .localCheckpoint()
        )
    return cells.select(
        "r",
        "c",
        F.col("m").cast("long").alias("m"),
        F.floor(F.col("w") * F.lit(1048576.0) + F.lit(0.5)).cast("long").alias("w_q20"),
    )
