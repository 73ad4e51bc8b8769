"""Market-basket pair mining (co-occurrence support + integer lift).

The reference joins lineitem-style facts only along the star schema's
foreign keys; the classic *within-basket* question — which item PAIRS
co-occur more than chance — needs the self-join shape none of its
queries exercise.  This is A-Priori's k=2 stage (Agrawal & Srikant,
VLDB'94), the workhorse of recommendation bootstrapping.

Scale design. The naive all-pairs-within-order self-join costs
sum_orders(k^2) where k is basket size — fine on average (TPC-H
baskets are ~4 items) but unbounded in the tail: ONE million-item
basket contributes 10^12 pairs.  So baskets are capped: orders with
more than ``max_basket`` distinct items are dropped (and the drop is
what the support universe N counts, keeping lift's denominator
consistent).  After the cap the join cost is <= N * max_basket^2 with
max_basket a compile-time constant — linear in N.  The join itself is
an equi hash join on the order key (both sides pre-deduped to
distinct (order, item)); item supports come from the same capped
table, so a single scan feeds both sides.

Lift is emitted as exact fixed point, never a float ratio:
  lift = P(ab) / (P(a) P(b)) = n_orders * pair_cnt / (cnt_a * cnt_b)
  lift_q20 = (pair_cnt * n_orders * 2^20) div (cnt_a * cnt_b)
with the numerator promoted to DECIMAL(38,0) before the multiply —
pair_cnt * n * 2^20 overflows int64 around n ~ 3e6 — matching DuckDB
HUGEINT ``//`` (both truncate toward zero on nonnegative operands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    facts: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    max_basket: int = 8,
    min_support: int = 2,
) -> DataFrame:
    """Frequent co-occurring item pairs with support and lift_q20.

    Output: (item_a, item_b, pair_cnt, cnt_a, cnt_b, n_orders,
    lift_q20) for item_a < item_b and pair_cnt >= min_support.

    Overflow headroom: lift_q20's widest intermediate is
    pair_cnt * n_orders * 2^20 in DECIMAL(38,0) — safe through
    N <= 9.8e15 orders (tests/test_overflow_headroom.py), ~10^4x a
    100 TB orders table.
    """
    items = facts.select(
        F.col(order_col).alias("okey"), F.col(item_col).alias("item")
    ).distinct()
    sized = items.groupBy("okey").agg(F.count(F.lit(1)).alias("_k"))
    # capped feeds FOUR consumers (order count, item supports, both
    # self-join sides): an expensive multi-consumer lineage (scan +
    # distinct + cap semi join) — checkpoint per the measured repo
    # rule (cheap lineages recompute, expensive checkpoint; 9.3s ->
    # measured after at sf0.1).  At production scale: a staging table.
    capped = items.join(
        sized.filter(F.col("_k") <= max_basket).select("okey"), "okey"
    ).localCheckpoint()
    n_orders_df = capped.select("okey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    support = capped.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = capped.select("okey", F.col("item").alias("item_a"))
    b = capped.select("okey", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_support)
    )
    sup_a = support.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
    sup_b = support.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(sup_a, "item_a")
        .join(sup_b, "item_b")
        .join(F.broadcast(n_orders_df))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            "n_orders",
            F.expr(
                "cast(cast(pair_cnt as decimal(38,0)) * n_orders * 1048576"
                " div (cast(cnt_a as decimal(38,0)) * cnt_b) as bigint)"
            ).alias("lift_q20"),
        )
    )


def recommend_items(pairs: DataFrame, top_k: int = 3) -> DataFrame:
    """Item-item top-k recommendations from the mined pair table.

    Symmetrize ``basket_pairs`` output (each pair recommends in both
    directions) and keep each item's ``top_k`` neighbors by
    (lift_q20 DESC, pair_cnt DESC, neighbor ASC) — a fully
    deterministic order, so the cut is oracle-checkable.

    The per-item window partitions on the item id — high-cardinality
    key, shards across executors; output is <= top_k rows per item.
    """
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec"),
        "pair_cnt",
        "lift_q20",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec"),
            "pair_cnt",
            "lift_q20",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(
        F.desc("lift_q20"), F.desc("pair_cnt"), F.asc("rec")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("item", "rec", "rank", "pair_cnt", "lift_q20")
    )
