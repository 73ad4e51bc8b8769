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


# ---------------------------------------------------------------------------
# mergeable log-histogram quantile sketch
# ---------------------------------------------------------------------------
#
# percentile_disc above is EXACT but pays a full shuffle of every value
# through its rank window. At 100 TB the standard trade is a bounded
# mergeable histogram: bucket every value into base-2 sub-divided bins
# (HdrHistogram / DDSketch's idea), aggregate map-side to at most
# ~64 * 2^sub_bits buckets per group, and answer any quantile from the
# bucket CDF with bounded RELATIVE error (= 2^-sub_bits at the bucket
# lower bound). Like the KMV/CMS/HLL/Bloom family in
# operators/sketches.py, the bucket layout is portable integers (bit
# length + shifts — no floating log), so a DuckDB oracle reproduces
# the sketch and its answers bit for bit, and histograms from
# different days/partitions merge by summing counts.


def log_bucket_lower(c, sub_bits: int = 2):
    """The bucket lower bound for a nonnegative long: values below
    2^(sub_bits+1) are their own bucket; larger values keep the top
    sub_bits+1 bits (relative bucket width 2^-sub_bits). SQL form:
    F.shiftleft/shiftright take only literal shift counts, the SQL
    functions take expressions (same JVM implementation)."""
    g = f"greatest(length(bin({c})) - {1 + sub_bits}, 0)"
    return F.expr(
        f"CASE WHEN {c} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(shiftleft(shiftright({c}, {g}), {g}) AS BIGINT) END"
    )


def log_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sub_bits: int = 2,
) -> DataFrame:
    """Per (group, bucket lower bound): the value count. Map-side
    combining aggregate; <= ~64 * 2^sub_bits rows per group at any
    input scale; merge = sum counts on (group, bucket_lb)."""
    return (
        df.select(*group_cols, log_bucket_lower(value_col, sub_bits).alias("bucket_lb"))
        .groupBy(*group_cols, "bucket_lb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def histogram_quantile_bounds(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[str, int, int]],
) -> DataFrame:
    """Per group: for each (name, num, den) quantile fraction, the
    lower bound of the bucket holding rank ceil(n * num / den) — an
    under-estimate of the true quantile by at most one bucket width
    (relative error 2^-sub_bits). Integer rank arithmetic:
    cum >= ceil(n*num/den)  <=>  cum * den >= n * num."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket_lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = hist.select(
        *group_cols,
        "bucket_lb",
        F.sum("c").over(w).alias("_cum"),
        F.sum("c").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n_values")]
    for name, num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * F.lit(int(den)) >= F.col("_n") * F.lit(int(num)),
                    F.col("bucket_lb"),
                )
            ).alias(name)
        )
    return cdf.groupBy(*group_cols).agg(*aggs)


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group exact WEIGHTED median: the smallest value whose
    cumulative weight reaches half the group total (lower weighted
    median; integer weights).

    percentile_disc above weights every row equally; revenue-weighted
    questions ("the order value at which half the MONEY is below")
    need the weight-CDF cut instead.  The threshold compare is
    2*cum >= total — integer cross-multiplication, no halving, no
    floats.

    One rank window per group (same sharding note as percentile_disc)
    plus one min-aggregate.  Output: group cols + ``wmedian`` (the
    value) + ``total_weight``.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    ).withColumn("_cum", F.sum("_w").over(w)).withColumn(
        "_tot", F.sum("_w").over(Window.partitionBy(*group_cols))
    )
    return (
        cum.filter(F.lit(2) * F.col("_cum") >= F.col("_tot"))
        .groupBy(*group_cols)
        .agg(
            F.min("_v").alias("wmedian"),
            F.max("_tot").cast("long").alias("total_weight"),
        )
    )
