"""Incremental (materialized-view) aggregate maintenance.

The reference recomputes ``channel_reporting`` from scratch every run
(``src/etl/reporting.py:57-98``); its only concession to increments is
re-running over a date window. The standard warehouse upgrade is
delta maintenance: keep the materialized aggregate, and on each batch
apply only the CHANGE — never rescan history.

For the distributive aggregates this engine reports (COUNT, SUM of
integer units), maintenance is exact algebra over signed deltas:

    count' = count + Σ op        (op = +1 insert, -1 delete/retract)
    sum'   = sum   + Σ op * x    (an update = retract old + insert new)

and a group whose count' reaches 0 is dropped (it no longer exists,
which a recompute would also show). MIN/MAX are NOT maintainable this
way under deletes (they need a recompute of the affected group) —
callers wanting them list the group keys with count' changes and
recompute just those groups.

100-TB shape: the delta batch aggregates map-side to at most
|changed groups| rows, then one outer-merge join against the
materialized table on the group key — cost proportional to the CHANGE,
not to history. This is exactly the foreachBatch shape of
``streaming/incremental.py`` (the attribution upsert), generalized to
any distributive aggregate; parity with full recompute is the oracle
(``maef_ivm_report``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_snapshot(
    facts: DataFrame, group_cols: list[str], sum_cols: dict[str, object]
) -> DataFrame:
    """The materialized aggregate: per group, ``n`` (long) plus one
    summed column per ``sum_cols`` entry (name -> Column expression)."""
    return facts.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(expr).cast("long").alias(name) for name, expr in sum_cols.items()],
    )


def apply_aggregate_delta(
    agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, object],
    op_col: str = "op",
    on_negative: str = "error",
) -> DataFrame:
    """Maintain ``agg`` (as produced by ``aggregate_snapshot``) under a
    signed delta batch: ``delta`` holds fact-shaped rows plus ``op_col``
    in {+1, -1}. Groups whose maintained count reaches exactly 0 are
    dropped (a clean full retraction).

    A maintained count that goes NEGATIVE is an inconsistent delta
    (retracting rows absent from the snapshot) — masking it as a drop
    would hide corruption, so by default (``on_negative="error"``) the
    job fails at evaluation time naming the offending group.
    ``on_negative="drop"`` restores the silent-drop behavior for
    callers that intentionally replay overlapping retractions."""
    if on_negative not in ("error", "drop"):
        raise ValueError("on_negative must be 'error' or 'drop'")
    op = F.col(op_col).cast("long")
    d = delta.groupBy(*group_cols).agg(
        F.sum(op).alias("_dn"),
        *[F.sum(op * expr).alias(f"_d_{name}") for name, expr in sum_cols.items()],
    )
    merged = agg.join(d, on=group_cols, how="full_outer")
    zero = F.lit(0).cast("long")
    n_raw = F.coalesce(F.col("n"), zero) + F.coalesce(F.col("_dn"), zero)
    if on_negative == "error":
        # raise_error embedded in the n column itself (not a droppable
        # side column), so Catalyst cannot prune the check away.
        n_val = F.when(
            n_raw < 0,
            F.raise_error(
                F.concat(
                    F.lit("ivm: negative maintained count for group ("),
                    F.concat_ws(", ", *[F.col(c).cast("string") for c in group_cols]),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(n_raw)
    else:
        n_val = n_raw
    out = merged.select(
        *group_cols,
        n_val.alias("n"),
        *[
            (
                F.coalesce(F.col(name), zero) + F.coalesce(F.col(f"_d_{name}"), zero)
            ).alias(name)
            for name in sum_cols
        ],
    )
    return out.filter(F.col("n") != 0) if on_negative == "error" else out.filter(
        F.col("n") > 0
    )


def join_view_delta(
    l_old: DataFrame,
    r_old: DataFrame,
    dl: DataFrame | None,
    dr: DataFrame | None,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Signed delta of the JOIN view V = L ⋈ R under signed input
    deltas (the textbook incremental-view-maintenance join rule):

        ΔV = ΔL ⋈ R_old  +  L_old ⋈ ΔR  +  ΔL ⋈ ΔR

    with the view-row sign op_l, op_r, and op_l*op_r respectively
    (the cross term corrects the double count the first two terms
    introduce for rows matching on BOTH sides' changes; signs make
    retract/insert/update one algebra).  Output: the view's columns
    plus ``op_col`` (long) — feed it with the old view (op=+1) into
    any distributive aggregate, or MERGE it into a materialized join
    table.

    100-TB shape: each term's cost is |change| ⋈ snapshot on the join
    key — proportional to the delta, never a history rescan; the
    snapshot sides prune to the delta's key set under DPP/broadcast
    when the delta is small.  MIN/MAX-style non-distributive reads
    still need per-group recompute, exactly as apply_aggregate_delta
    documents."""
    parts = []
    if dl is not None:
        parts.append(
            dl.withColumnRenamed(op_col, "_opl")
            .join(r_old, key)
            .withColumn(op_col, F.col("_opl").cast("long"))
            .drop("_opl")
        )
    if dr is not None:
        parts.append(
            l_old.join(dr.withColumnRenamed(op_col, "_opr"), key)
            .withColumn(op_col, F.col("_opr").cast("long"))
            .drop("_opr")
        )
    if dl is not None and dr is not None:
        parts.append(
            dl.withColumnRenamed(op_col, "_opl")
            .join(dr.withColumnRenamed(op_col, "_opr"), key)
            .withColumn(op_col, (F.col("_opl") * F.col("_opr")).cast("long"))
            .drop("_opl", "_opr")
        )
    if not parts:
        raise ValueError("at least one of dl/dr must be provided")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distinct_view_snapshot(
    facts: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Support multiset for a COUNT(DISTINCT ``value_col``) view.
    COUNT DISTINCT is not distributive, so it is NOT maintainable on
    the view grain — but it becomes exactly maintainable one grain
    down: keep the SUPPORT table (group, value, m = fact multiplicity)
    and the distinct count is the number of surviving support rows per
    group.  The support table is maintained with the ordinary signed
    algebra (``apply_aggregate_delta`` over [group_cols, value_col],
    no sum columns): inserts bump m, retractions decrement, rows drop
    at m == 0, and negative m fails loudly — the standard multiset
    device every IVM system uses for DISTINCT/semijoin views.

    100-TB: the support table is |distinct (group, value)| rows — the
    same cardinality a COUNT(DISTINCT) recompute shuffles anyway —
    and maintenance touches only changed (group, value) pairs ⋈ the
    support snapshot, never the fact history."""
    return aggregate_snapshot(facts, [*group_cols, value_col], {})


def distinct_view(support: DataFrame, group_cols: list[str]) -> DataFrame:
    """Serve the COUNT(DISTINCT) view off the maintained support
    table: one count per group of surviving support rows."""
    return support.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )


def topk_view(
    support: DataFrame, group_cols: list[str], order_col: str, k: int
) -> DataFrame:
    """Serve a TOP-K view off a maintained support aggregate.  Like
    COUNT(DISTINCT) (``distinct_view_snapshot``), top-k is NOT
    maintainable on the view grain — a retraction can promote a row
    that the k-row view no longer holds — but it is exactly
    maintainable ONE GRAIN DOWN: keep the full (group, key) aggregate
    as the support table (maintained with the ordinary signed
    ``apply_aggregate_delta`` algebra) and rank at read.  Ties break
    deterministically on the remaining group-key columns ascending.

    100-TB: the support table is the same cardinality the top-k
    recompute would aggregate to anyway; serving is one window over
    the support grain, partitioned by the group key — no fact-history
    rescan ever."""
    key_cols = [c for c in support.columns if c not in group_cols]
    from pyspark.sql import Window

    order = [F.desc(order_col)] + [
        F.asc(c) for c in key_cols if c != order_col and c != "n"
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        support.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
