"""Declarative data-quality constraint checking.

The reference validates records imperatively inside the loader
(/root/reference/src/etl/load.py: required keys, non-empty ids, ihc
range) and the DAG guards dates; this operator generalizes that into
the dbt-test / Deequ shape: a rule set declared as column predicates,
evaluated in ONE pass, returning a violations ledger — the artifact a
pipeline gate consumes ("fail the load if any rule > 0").

Shape: every row-level rule is a conditional sum inside a single
aggregate (one scan, map-side combinable, no matter how many rules);
uniqueness rules add a count-distinct each (Spark plans them as one
expand + aggregate). The output is rules x 1 rows — constant size at
any input scale. The one-pass property is the point at 100 TB: a
naive checker that runs one COUNT per rule re-scans the table per
rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate a rule set in one pass.

    ``row_rules``: {rule_name: violation predicate} — the predicate is
    True for a VIOLATING row (NULL predicate results count as
    violations: an unevaluable rule must not pass silently).
    ``unique_keys``: {rule_name: key columns} — violations = number of
    surplus rows (count - distinct count over the key tuple). NULL
    keys are not counted by COUNT(DISTINCT) in either engine, so every
    NULL-key row registers as surplus — a NULL key cannot be proven
    unique; pair with a not-null rule to separate the failure modes.

    Output: (rule string, n_violations long), one row per rule.
    """
    if not row_rules and not unique_keys:
        raise ValueError("no rules given")
    aggs = [
        F.sum(
            F.when(F.coalesce(cond.cast("boolean"), F.lit(True)), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(name)
        for name, cond in row_rules.items()
    ]
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
            .cast("long")
            .alias(name)
        )
    wide = df.agg(*aggs)
    names = list(row_rules) + list(unique_keys or {})
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack}) as (rule, n_violations)")
    )


def functional_dependency_profile(
    df: DataFrame, lhs_cols: list[str], rhs_col: str
) -> DataFrame:
    """Profile whether ``lhs_cols -> rhs_col`` holds functionally
    (every LHS group maps to exactly one RHS value) — the dependency
    discovery step a schema-inference/constraint-mining pass runs
    before declaring keys. The reference simply TRUSTS session_id ->
    user_id (``src/etl/transform.py:211-227`` joins on it); this
    measures that trust.

    Output (one row): ``n_groups``, ``n_violating_groups`` (LHS values
    with >= 2 distinct RHS), ``max_rhs_per_group``. All exact longs.

    Shape: one map-side-combining aggregate on (lhs, rhs) — the same
    cost class as a distinct — then a bounded per-lhs roll-up; no
    window, no self-join. Scales like any grouped count.
    """
    per_pair = df.groupBy(*lhs_cols, rhs_col).agg(F.count(F.lit(1)).alias("_m"))
    per_lhs = per_pair.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_nrhs")
    )
    return per_lhs.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("_nrhs") > 1).cast("long")).cast("long").alias("n_violating_groups"),
        F.max("_nrhs").cast("long").alias("max_rhs_per_group"),
    )
