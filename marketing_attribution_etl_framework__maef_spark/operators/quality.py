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


def benford_screen(df: DataFrame, cents_col: str) -> DataFrame:
    """Benford first-digit screen over an integer-cents amount column
    — the classic fraud/entry-error detector for financial facts
    (Nigrini 2012); the reference's loader validates types and nulls
    (src/etl/load.py) but never distributions.

    Output, one row per leading digit 1..9 (bounded):
    (digit, n_observed, n_total, observed_q20, expected_q20,
    deviation_q20) where observed_q20 = n_observed * 2^20 div n_total
    (exact integer division), expected_q20 = floor(log10(1 + 1/d) *
    2^20 + 0.5) (irrational -> q20-safe), and deviation = observed -
    expected (negative = under-represented).

    The leading digit is taken from the DECIMAL STRING of the positive
    cents value — exact on both engines, no float log10 on the data
    path.  One map-side-combining aggregate to a 9-row grain; nothing
    else.  100 TB: the aggregate is the whole cost, output constant.
    """
    pos = df.select(F.col(cents_col).cast("long").alias("_c")).filter(F.col("_c") > 0)
    digits = pos.select(
        F.expr("cast(substring(cast(_c as string), 1, 1) as int)").alias("digit")
    )
    per = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_observed"))
    total = per.agg(F.sum("n_observed").cast("long").alias("n_total"))
    return per.join(F.broadcast(total)).select(
        "digit",
        "n_observed",
        "n_total",
        F.expr("(n_observed * 1048576) div n_total").cast("long").alias("observed_q20"),
        F.expr(
            "cast(floor(log10(1.0 + 1.0 / digit) * 1048576 + 0.5) as bigint)"
        ).alias("expected_q20"),
        F.expr(
            "(n_observed * 1048576) div n_total"
            " - cast(floor(log10(1.0 + 1.0 / digit) * 1048576 + 0.5) as bigint)"
        )
        .cast("long")
        .alias("deviation_q20"),
    )


def ivt_screen(
    events: DataFrame,
    window_us: int = 86_400_000_000 - 1,
    max_burst: int = 6,
) -> DataFrame:
    """Invalid-traffic (bot) screen: flag users whose event burst in
    ANY trailing 24h window exceeds ``max_burst``, and report the
    flagged share per channel.

    Output: (channel, total_events, bot_events, bot_users) — the
    pre-attribution hygiene readout every paid-media report needs
    (IAB IVT filtering); bot_events is the volume attribution would
    mis-credit if the screen were skipped.

    The burst is a RANGE frame over the integer microsecond index
    (timestampdiff from a fixed origin — NTZ-legal per the repo ts
    rule; RANGE offsets are shift-invariant so the origin choice is
    free).  Count over a range frame is order-independent within equal
    timestamps, so the flag is deterministic.

    100-TB shape: one (user) partitioned window pass + a per-user MAX
    (both map-side combinable after the user shuffle), then one
    broadcast-joinable bot-user set only if small — here it is joined
    as a plain hash join because the flagged population is unbounded.
    """
    ev = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.expr("timestampdiff(MICROSECOND, timestamp'2024-01-01 00:00:00', ts)")
        .cast("long")
        .alias("_u"),
    )
    from pyspark.sql import Window as _W

    wb = _W.partitionBy("user_id").orderBy("_u").rangeBetween(-window_us, 0)
    bots = (
        ev.withColumn("_c", F.count(F.lit(1)).over(wb))
        .groupBy("user_id")
        .agg(F.max("_c").alias("_mb"))
        .filter(F.col("_mb") > max_burst)
        .select("user_id", F.lit(1).alias("_bot"))
    )
    j = ev.join(bots, "user_id", "left")
    return j.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("total_events"),
        F.sum(F.coalesce(F.col("_bot"), F.lit(0))).cast("long").alias("bot_events"),
        F.countDistinct(F.when(F.col("_bot") == 1, F.col("user_id")))
        .cast("long")
        .alias("bot_users"),
    )
