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

from pyspark.sql import Column, DataFrame, Window
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


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension **type 2** history build: collapse a
    keyed event stream into attribute validity intervals.

    A new *version* opens whenever ``attr_col`` differs from the
    previous event's value for the same key (change-point via
    null-safe LAG compare); versions are numbered 1..n per key in
    event-time order; each version's interval is
    ``[valid_from_us, valid_to_us)`` in epoch microseconds, closed by
    the NEXT version's open (LEAD over the one-row-per-version
    aggregate). The open (current) version carries
    ``valid_to_us = -1`` and ``is_current = 1``.

    Reference scope: the MAEF reference rebuilds its warehouse by
    delete+rewrite per date window (/root/reference/src/etl/load.py)
    and keeps no attribute history; SCD2 is the standard warehouse
    verb that replaces that pattern when history must be queryable.

    100-TB shape: ONE shuffle on the dimension key (the LAG window and
    the per-(key, version) aggregate and the LEAD window all share the
    ``key_cols`` partitioning, so Catalyst plans a single Exchange and
    keeps the three window/agg stages co-partitioned). State per key
    is the run-length-encoded version list — orders of magnitude
    smaller than the event input, safe to write as the dimension
    table. Ordering is made total with ``tiebreak_col`` so the
    change-point scan is deterministic under timestamp ties.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(attr_col)).over(w)
    changed = (~F.col(attr_col).eqNullSafe(prev)).cast("long")
    ver = (
        F.sum(changed)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version")
    )
    runs = (
        df.select(*key_cols, attr_col, ts_col, ver)
        .groupBy(*key_cols, "version", attr_col)
        .agg(
            F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            .cast("long")
            .alias("valid_from_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    w2 = Window.partitionBy(*key_cols).orderBy("version")
    nxt = F.lead(F.col("valid_from_us")).over(w2)
    return runs.select(
        *key_cols,
        F.col("version").cast("long").alias("version"),
        F.col(attr_col),
        "valid_from_us",
        F.coalesce(nxt, F.lit(-1).cast("long")).alias("valid_to_us"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_current"),
        "n_events",
    )


def scd2_lookup(
    dim: DataFrame,
    facts: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension built by
    :func:`scd2_intervals`: for every fact row, the dimension version
    whose ``[valid_from_us, valid_to_us)`` interval covers the fact's
    timestamp (the open version covers everything from its open).

    Facts earlier than the key's first version match nothing and are
    dropped (inner join) — point-in-time semantics, not nearest-match;
    callers wanting them keep a left join downstream.

    100-TB shape: an EQUI hash join on ``key_cols`` with the interval
    containment as a post-join filter — per key the version list is
    run-length-bounded (versions, not events), so the join fan-out per
    fact row is the key's version count, pruned immediately by the
    interval predicate. Never a range/nested-loop join: the equi key
    carries all the distribution, which is exactly the bucketing both
    sides should be written in.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    covered = (F.col("valid_from_us") <= ts_us) & (
        (F.col("valid_to_us") == -1) | (ts_us < F.col("valid_to_us"))
    )
    return facts.join(dim, on=key_cols, how="inner").filter(covered)
