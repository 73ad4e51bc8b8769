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
    """
    items = facts.select(
        F.col(order_col).alias("okey"), F.col(item_col).alias("item")
    ).distinct()
    sized = items.groupBy("okey").agg(F.count(F.lit(1)).alias("_k"))
    capped = items.join(
        sized.filter(F.col("_k") <= max_basket).select("okey"), "okey"
    )
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
