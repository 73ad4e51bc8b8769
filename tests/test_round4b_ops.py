"""Round-4b operator tests: SCD Type 2 interval build plus plan pins
for the new relational kernels (broadcast hash join on the disjunctive
predicate, scan-level pushdown on the pure filter-aggregate)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from marketing_attribution_etl_framework__maef_spark.operators import cdc


def _scd2(spark, rows):
    from datetime import datetime

    rows = [(u, c, datetime.fromisoformat(t), tb) for u, c, t, tb in rows]
    df = spark.createDataFrame(rows, "uid string, ch string, ts timestamp, tb string")
    return cdc.scd2_intervals(
        df, key_cols=["uid"], attr_col="ch", ts_col="ts", tiebreak_col="tb"
    )


def test_scd2_handmade_versions(spark):
    """A A B A collapses to three versions with chained intervals."""
    rows = [
        ("u", "A", "2024-01-01 00:00:00", "1"),
        ("u", "A", "2024-01-01 01:00:00", "2"),
        ("u", "B", "2024-01-01 02:00:00", "3"),
        ("u", "A", "2024-01-01 03:00:00", "4"),
    ]
    got = {r.version: r for r in _scd2(spark, rows).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].ch, got[2].ch, got[3].ch) == ("A", "B", "A")
    assert (got[1].n_events, got[2].n_events, got[3].n_events) == (2, 1, 1)
    # intervals chain: each version closes exactly where the next opens
    assert got[1].valid_to_us == got[2].valid_from_us
    assert got[2].valid_to_us == got[3].valid_from_us
    assert got[3].valid_to_us == -1
    assert (got[1].is_current, got[2].is_current, got[3].is_current) == (0, 0, 1)


def test_scd2_single_run_is_one_open_row(spark):
    rows = [
        ("u", "A", "2024-01-01 00:00:00", "1"),
        ("u", "A", "2024-01-02 00:00:00", "2"),
    ]
    out = _scd2(spark, rows).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.version, r.valid_to_us, r.is_current, r.n_events) == (1, -1, 1, 2)


def test_scd2_null_attr_null_safe(spark):
    """NULL -> NULL is not a change; A -> NULL and NULL -> A are."""
    rows = [
        ("u", "A", "2024-01-01 00:00:00", "1"),
        ("u", None, "2024-01-01 01:00:00", "2"),
        ("u", None, "2024-01-01 02:00:00", "3"),
        ("u", "A", "2024-01-01 03:00:00", "4"),
    ]
    got = sorted(_scd2(spark, rows).collect(), key=lambda r: r.version)
    assert [r.ch for r in got] == ["A", None, "A"]
    assert [r.n_events for r in got] == [1, 2, 1]


def test_scd2_timestamp_tie_broken_by_tiebreak(spark):
    """Equal timestamps order by the tiebreak column, so the version
    sequence is deterministic: (A tb=1), (B tb=2) at the same instant
    is A then B."""
    rows = [
        ("u", "B", "2024-01-01 00:00:00", "2"),
        ("u", "A", "2024-01-01 00:00:00", "1"),
    ]
    got = sorted(_scd2(spark, rows).collect(), key=lambda r: r.version)
    assert [r.ch for r in got] == ["A", "B"]


def test_scd2_lookup_point_in_time(spark):
    """Facts resolve to the version open at their instant: before the
    first version -> dropped; inside a closed interval -> that version;
    at/after the last open -> the open version. A fact exactly at a
    boundary belongs to the NEW version ([from, to) intervals)."""
    from datetime import datetime

    dim = _scd2(
        spark,
        [
            ("u", "A", "2024-01-01 00:00:00", "1"),
            ("u", "B", "2024-01-03 00:00:00", "2"),
        ],
    )
    facts = spark.createDataFrame(
        [
            ("f0", "u", datetime.fromisoformat("2023-12-31 00:00:00")),  # pre-history
            ("f1", "u", datetime.fromisoformat("2024-01-02 00:00:00")),  # inside A
            ("f2", "u", datetime.fromisoformat("2024-01-03 00:00:00")),  # boundary -> B
            ("f3", "u", datetime.fromisoformat("2024-09-09 00:00:00")),  # open B
        ],
        "fid string, uid string, fts timestamp",
    )
    got = {r.fid: r.ch for r in cdc.scd2_lookup(dim, facts, ["uid"], "fts").collect()}
    assert got == {"f1": "A", "f2": "B", "f3": "B"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_rel_disjunctive_is_broadcast_hash_join(spark, sf_dir):
    """The OR-of-ANDs must ride on an equi hash join on partkey, never
    a BroadcastNestedLoopJoin (the fuzzy.py ADVICE class of bug)."""
    plan = _plan(entrymod.q_rel_disjunctive(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_rel_forecast_revenue_pushes_scan_filters(spark, sf_dir):
    """Q6 shape: the shipdate bounds reach the parquet scan as pushed
    filters (the date-literal cast rule rewrites them to timestamp
    bounds)."""
    plan = _plan(entrymod.q_rel_forecast_revenue(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "l_shipdate" in pushed, pushed


def test_rel_local_volume_no_nested_loop(spark, sf_dir):
    """Q5's cross-column nation equality must fold into the hash join
    condition, not degrade to a nested loop."""
    plan = _plan(entrymod.q_rel_local_volume(spark, sf_dir))
    assert "NestedLoop" not in plan


def test_rel_min_cost_ties_emit_all_minimal_suppliers(spark, sf_dir):
    """Per part, every returned supplier carries that part's exact
    minimum cost (join-back-on-min semantics, ties included)."""
    rows = entrymod.q_rel_min_cost_supplier(spark, sf_dir).collect()
    assert rows
    best = {}
    for r in rows:
        best.setdefault(r.p_partkey, set()).add(r.cost_cents)
    assert all(len(v) == 1 for v in best.values())
