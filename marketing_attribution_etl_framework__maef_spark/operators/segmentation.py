"""RFM customer segmentation over exact distributed quantile ranks.

The reference's reporting layer stops at channel x date rollups
(/root/reference/src/etl/reporting.py:60-110); the next report every
marketing warehouse is asked for is the classic RFM segmentation:
score each customer 1..5 on Recency / Frequency / Monetary quintiles
and count the segments.

Quantile scoring needs a GLOBAL rank, and a bare
``Window.orderBy(...)`` ranking function is a single-partition global
sort — the one shape that cannot survive 100 TB.  ``global_row_number``
is the standard two-phase fix (same pattern as the weighted-sampling
prefix sum, llm/curation.py:595):

1. ``repartitionByRange`` on the order key — partition ids are then
   monotone in the sort order;
2. per-partition row counts -> exclusive offsets (bounded driver
   state: one row per partition, the CLAUDE.md bounded-loop rule);
3. within-partition ``row_number`` (a partitioned window — shards
   fine) + broadcast offset = the exact global rank.

The result is bit-identical to the DuckDB oracle's single
``ROW_NUMBER() OVER (ORDER BY ...)`` because the rank depends only on
the total order, not on where Spark drew the range boundaries.

Scores use only integer arithmetic: ``score = 1 + (5*(rank-1)) div n``
(truncating div on nonnegative longs, identical in Spark ``div`` and
DuckDB ``//``) — never NTILE (whose remainder-spreading is easy to
mis-mirror) and never a float percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global ROW_NUMBER over ``order_cols`` without a global
    single-partition sort (two-phase range rank, see module docstring).

    ``order_cols`` must be a TOTAL order (include a unique tiebreak
    column) or ranks of tied rows are partition-placement dependent.

    The ranged layout is pinned with ``localCheckpoint`` BEFORE the
    bucket column is read: the per-partition counts job and the window
    job would otherwise re-execute the range partitioner
    independently, and AQE may pick a different upstream partitioning
    for each, moving the sampled range boundaries — the offsets then
    mismatch the window's partitions (observed as off-by-one quintiles
    at sf0.1).  Unlike the hash-bucketed scans (llm/curation.py,
    operators/sampling.py), whose bucket is a pure function of the
    data, a range bucket depends on the partitioner instance, so it
    must be materialized once and shared.  At warehouse scale this
    checkpoint becomes a write to a staging table (the documented
    production pattern for shared iterative state).
    """
    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    # bounded driver state: one (pid, count) row per partition
    counts = sorted(
        (r["_pid"], r["_n"])
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        with_pid.join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def _quintile(rank_col: str, n: int) -> F.Column:
    # 1 + (5*(rank-1)) div n: exact integer quintile, first ceil(n/5)
    # ranks -> 1, last -> 5.  Truncating div == floor for nonneg longs.
    return (F.lit(1) + F.expr(f"(5 * ({rank_col} - 1)) div {n}")).cast("int")


def rfm_scores(
    orders: DataFrame,
    custkey: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Per-customer RFM metrics and 1..5 quintile scores.

    Output: (custkey, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score) — one row per customer with >= 1 order.

    - recency_days: days from the customer's last order to the global
      max order date (integer; the anchor is derived from the data so
      both engines agree without a wall-clock read).
    - frequency: order count (long).
    - monetary_cents: SUM of per-order integer cents (exact-money
      rule: round each price to cents FIRST, sum longs).
    - scores: quintiles of (metric, custkey)-ordered global rank;
      recency is ranked DESCENDING (most-recent last -> score 5), so
      a higher score is always "better" on all three axes.

    Cost: one scan + groupBy(custkey) to the customer grain, then
    three two-phase ranks over the (much smaller) per-customer table.
    At warehouse scale the customer grain is ~1e9 rows — each rank is
    a range shuffle + partitioned window, no global sort anywhere.
    """
    per_cust = (
        orders.select(
            F.col(custkey).alias("custkey"),
            F.col(date_col).cast("date").alias("_d"),
            F.expr(f"cast(round({amount_col} * 100, 0) as bigint)").alias("_cents"),
        )
        .groupBy("custkey")
        .agg(
            F.max("_d").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("_cents").cast("long").alias("monetary_cents"),
        )
    )
    anchor = per_cust.agg(F.max("_last").alias("_a"))
    base = per_cust.join(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff(F.col("_a"), F.col("_last")).cast("long")
    )
    # ONE two-phase rank instead of three (r11 optimization, guide
    # §2.4): stack the three axes into (custkey, _axis, _val, metrics)
    # and range-rank by (_axis, _val, custkey).  Axes sort disjointly
    # and each holds exactly n rows, so the within-axis rank is the
    # global rank minus _axis * n — bit-identical to ranking each axis
    # separately (the rank depends only on the per-axis total order),
    # for a third of the range shuffles / checkpoints / offset
    # collects.  base is localCheckpoint'd first: it feeds the count,
    # the stack, and would otherwise be recomputed by each.
    base = base.select(
        "custkey", "recency_days", "frequency", "monetary_cents"
    ).localCheckpoint()
    n = base.count()  # scalar, reused by all three quintile exprs
    stacked = base.selectExpr(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "stack(3, 0, recency_days, 1, frequency, 2, monetary_cents) as (_axis, _val)",
    )
    ranked = global_row_number(stacked, ["_axis", "_val", "custkey"], "_grn")
    ranked = ranked.withColumn(
        "_rk", F.col("_grn") - F.col("_axis").cast("long") * F.lit(n)
    )
    # recency rank ascending = most recent first; score must reward
    # recent customers, so invert: score = quintile of (n + 1 - rank)
    ranked = ranked.withColumn(
        "_score",
        F.when(
            F.col("_axis") == 0,
            _quintile(f"({n} + 1 - _rk)", n),
        ).otherwise(_quintile("_rk", n)),
    )
    return ranked.groupBy("custkey").agg(
        F.max("recency_days").alias("recency_days"),
        F.max("frequency").alias("frequency"),
        F.max("monetary_cents").alias("monetary_cents"),
        F.max(F.when(F.col("_axis") == 0, F.col("_score"))).alias("r_score"),
        F.max(F.when(F.col("_axis") == 1, F.col("_score"))).alias("f_score"),
        F.max(F.when(F.col("_axis") == 2, F.col("_score"))).alias("m_score"),
    )


def rfm_segment_counts(scored: DataFrame) -> DataFrame:
    """Roll the per-customer scores up to the 125-cell segment grid
    (bounded output whatever the input scale)."""
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_monetary_cents"),
    )
