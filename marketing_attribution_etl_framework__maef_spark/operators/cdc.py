"""Snapshot change-data-capture diff.

Given two snapshots of the same keyed table, classify every key as
``inserted`` / ``deleted`` / ``updated`` / ``unchanged`` and emit the
old and new values side by side — the standard building block for
incremental pipeline refreshes (recompute only the changed partitions)
and for audit diffs between warehouse loads.

Shape: one full-outer hash join on the key columns — a single shuffle,
keyed on the snapshot key, which at 100 TB is exactly the partitioning
both snapshots should already be written in (so with bucketed tables
the shuffle disappears entirely). Presence is detected with marker
literals attached *before* the join, so a legitimately-NULL compare
column can never masquerade as a missing row; value comparison is
null-safe (``<=>``).

Reference scope: the MAEF reference refreshes the attribution warehouse
by delete+rewrite per date window (/root/reference/src/etl/load.py);
this operator generalizes that to a keyed diff so only changed rows
need rewriting.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``key_cols``.

    Output: key columns, ``change_type`` (string), then
    ``old_<c>`` / ``new_<c>`` for every compare column (NULL on the
    absent side of an insert/delete — callers needing NULL-free output
    coalesce to a sentinel).
    """
    o = old.select(
        *key_cols,
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")

    def differs(c: str) -> Column:
        return ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    any_diff = reduce(Column.__or__, [differs(c) for c in compare_cols])
    change = (
        F.when(F.col("_old_present").isNull(), F.lit("inserted"))
        .when(F.col("_new_present").isNull(), F.lit("deleted"))
        .when(any_diff, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        change.alias("change_type"),
        *[c for p in compare_cols for c in (f"old_{p}", f"new_{p}")],
    )
