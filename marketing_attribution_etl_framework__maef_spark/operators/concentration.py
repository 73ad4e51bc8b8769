"""Revenue-concentration measures: exact per-group Gini coefficient.

"How concentrated is our revenue across users, per channel?" is the
standard follow-on to the RFM segmentation (operators/segmentation.py)
— the Gini coefficient over the per-user spend distribution, the
80/20 readout every marketing warehouse publishes.

No reference parity (the reference stops at channel x date rollups,
``/root/reference/src/etl/reporting.py:57-98``); this extends §2.10's
analytics family with an inequality measure.

Exactness: with x_(1) <= ... <= x_(n) the per-user cent totals sorted
within a group,

    gini_num = SUM_i (2*i - n - 1) * x_(i)        (exact BIGINT)
    gini     = gini_num / (n * SUM x)             (emitted as q20)

The rank-weighted sum is invariant under permutations of EQUAL values
(equal x contribute the same regardless of which rank each takes), so
the statistic is deterministic even before the id tiebreak — the
tiebreak just pins the intermediate ranks for the oracle hash.

100-TB shape: the within-group rank uses the grouped two-phase scan
(the operators/sampling.py `grouped_hash_rank` device, here ordered
by VALUE): rows bucket by the log2 magnitude of the value — a pure
function of the data, so it is stable across jobs without a
checkpoint (the segmentation.py `repartitionByRange` pitfall does not
apply) — per-(group, bucket) counts collapse to a bounded
|groups| x ~64-bucket driver table, and the rank window partitions by
(group, bucket).  No group is ever sorted in a single task.

Overflow headroom: gini_num <= n * S; the q20 numerator
gini_num * 2^20 is computed in DECIMAL(38,0) — safe through
n * S_cents ~ 1e31 (1e9 users x 1e15 total cents per group and
beyond), matching the basket-lift bound regime
(tests/test_overflow_headroom.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_value_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "rank",
) -> DataFrame:
    """Per-group 1-based rank in (value, id) order via the grouped
    two-phase scan (module docstring).  ``value_col`` must be a
    nonnegative integer column."""
    bucket = F.expr(f"int(floor(log2({value_col} + 2)))")
    base = df.withColumn("_b", bucket)
    counts = sorted(
        (r["g"], r["b"], r["n"])
        for r in base.groupBy(F.col(group_col).alias("g"), F.col("_b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )  # bounded driver state: |groups| x ~64 rows
    offsets, acc, cur = [], 0, None
    for g, b, n in counts:
        if g != cur:
            cur, acc = g, 0
        offsets.append((g, b, acc))
        acc += n
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    off = (
        spark.createDataFrame(offsets or [(None, 0, 0)], f"g {gtype}, b int, _off long")
        .withColumnRenamed("g", group_col)
        .withColumnRenamed("b", "_b")
    )
    w = Window.partitionBy(group_col, "_b").orderBy(value_col, id_col)
    return (
        base.join(F.broadcast(off), [group_col, "_b"])
        .withColumn(out_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_b", "_off")
    )


def gini_by_group(
    facts: DataFrame,
    group_col: str,
    unit_col: str,
    cents_col: str,
) -> DataFrame:
    """Exact Gini per group over per-unit integer cent totals.

    Output: (group, n_units, total_cents, gini_q20) with
    gini_q20 = floor((2*SUM(r*x) - (n+1)*SUM(x)) * 2^20 / (n*SUM(x)))
    — the Σ(2i-n-1)x_(i) form factored so the per-group pass needs
    only SUM(r*x), SUM(x) and COUNT.  SUM(r*x) accumulates in
    DECIMAL(38,0) (a per-term r*x can pass int64 at 1e9 units x
    1e12-cent whales; the sum certainly does).  Groups with zero
    total emit gini 0.
    """
    per_unit = facts.groupBy(
        F.col(group_col).alias("g"), F.col(unit_col).alias("u")
    ).agg(F.sum(F.col(cents_col)).cast("long").alias("cents"))
    ranked = grouped_value_rank(per_unit, "g", "cents", "u", "r")
    return (
        ranked.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum(F.expr("cast(r as decimal(38,0)) * cents")).alias("_s1"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_units",
            "total_cents",
            F.when(F.col("total_cents") <= 0, F.lit(0))
            .otherwise(
                F.expr(
                    "cast((2 * _s1 - (cast(n_units as decimal(38,0)) + 1) * total_cents)"
                    " * 1048576 div (cast(n_units as decimal(38,0)) * total_cents) as bigint)"
                )
            )
            .cast("long")
            .alias("gini_q20"),
        )
    )


def top_decile_share(
    facts: DataFrame,
    group_col: str,
    unit_col: str,
    cents_col: str,
) -> DataFrame:
    """Pareto ("80/20") readout per group: what share of the cents do
    the TOP-DECILE units hold?  Gini (gini_by_group) summarizes the
    whole Lorenz curve in one number; buyers and CRM teams act on the
    curve's right tail — "our top 10% of customers are X% of revenue"
    — which this emits as exact integers.

    A unit is top-decile iff its ascending (value, id) rank satisfies
    rank * 10 > 9 * n — pure integer cross-multiplication, no
    percentile float; the (value, id) order pins boundary ties
    deterministically on both engines.  Ranks come from the grouped
    two-phase scan (grouped_value_rank), so no group is ever sorted in
    one task (the same 100-TB argument as Gini).

    Output: (group, n_units, total_cents, top_users, top_cents,
    share_q20) with share = top_cents / total_cents in q20 half-up;
    zero-total groups emit share 0.
    """
    per_unit = facts.groupBy(
        F.col(group_col), F.col(unit_col).alias("_u")
    ).agg(F.sum(cents_col).cast("long").alias("_x"))
    ranked = grouped_value_rank(per_unit, group_col, "_x", "_u", out_col="_r")
    n = Window.partitionBy(group_col)
    top = F.col("_r") * 10 > 9 * F.count(F.lit(1)).over(n)
    agg = (
        ranked.withColumn("_top", top)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("_x").cast("long").alias("total_cents"),
            F.sum(F.when(F.col("_top"), 1).otherwise(0)).cast("long").alias("top_users"),
            F.sum(F.when(F.col("_top"), F.col("_x")).otherwise(0))
            .cast("long")
            .alias("top_cents"),
        )
    )
    dec = "decimal(38,0)"
    return agg.select(
        group_col,
        "n_units",
        "total_cents",
        "top_users",
        "top_cents",
        F.expr(
            f"case when total_cents = 0 then 0 else"
            f" cast((2 * cast(top_cents as {dec}) * 1048576 + total_cents)"
            f" div (2 * cast(total_cents as {dec})) as bigint) end"
        ).alias("share_q20"),
    )


def ltv_concentration(events: DataFrame) -> DataFrame:
    """Lifetime-value concentration per FIRST-TOUCH channel: the exact
    Gini of per-user purchase-cents totals across each acquisition
    channel's audience — "does this channel acquire a broad base or a
    whale lottery", the LTV-side complement of the spend Gini (L155).

    Users are attributed to the channel of their first non-purchase
    event (min (ts, event_id) — deterministic); their outcome is the
    lifetime purchase total in exact cents (0 for never-buyers, which
    correctly count in the denominator: concentration is over the
    acquired AUDIENCE).  Gini via gini_by_group's factored
    SUM(r*x)/SUM(x)/COUNT pass.

    Output: (channel, n_units, total_cents, gini_q20).  Scale: one
    user-grain min + one user-grain sum (both map-side combining,
    same key), then the rank window per bounded channel.
    """
    first = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id", "event_type")).alias("_f"))
        .select("user_id", F.col("_f.event_type").alias("channel"))
    )
    spend = events.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents")
    )
    facts = first.join(spend, "user_id", "left").select(
        "channel",
        "user_id",
        F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents"),
    )
    return gini_by_group(facts, "channel", "user_id", "cents")
