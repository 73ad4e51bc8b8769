"""Scalable as-of join (nearest-event-at-or-before / -after match).

The reference's closest analogue is the journey join's "sessions at or
before the conversion" predicate (``src/etl/transform.py:211-227``,
rebuilt in ``operators/journeys.py``) — an as-of join is the 1-row
specialization: for each left row, the single nearest right row by
time within the same key.

Spark has no native as-of join; the naive spellings both fail at
scale: a range join explodes every left row into its whole lookback
window before picking one, and a per-key ``collect_list`` + UDF drops
out of the JVM. This implementation uses the union-and-carry
formulation, the same one Flink's temporal join and pandas'
``merge_asof`` (sort-merge) use, expressed in pure DataFrame ops:

1. tag right rows 0 and left rows 1, union them on the key + a common
   time axis;
2. one window per key ordered by ``(t, side, tiebreak)`` computes
   ``last(right_payload, ignorenulls)`` over the preceding frame — at
   equal timestamps right sorts before left, so the match is
   inclusive;
3. keep left rows; null out matches beyond ``tolerance``.

100-TB argument: exactly ONE shuffle on the join key (the union is
shuffle-free), window state is O(1) per row (a single carried struct),
and no row is ever duplicated — cost is sort + linear scan per key
partition, the same as a sort-merge join. Skewed keys are bounded by
events-per-key, and AQE's skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH = "_asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the nearest right row with
    ``right_time <= left_time`` (backward) or ``>=`` (forward) on the
    same ``on`` key; all right non-key columns are emitted prefixed
    with ``right_prefix`` (NULL when no match / beyond tolerance).

    ``tolerance_us``: maximum |left_time - right_time| in microseconds.
    ``tiebreak``: right column ordering ties at equal ``right_time``
    (the greatest value wins); required for determinism if right has
    duplicate timestamps per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_t", "_side", "_tb", _MATCH}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"column names {sorted(clash)} are reserved by asof_join")

    r_payload = [c for c in right.columns if c not in on]
    if right_time not in r_payload:
        raise ValueError(f"right_time {right_time!r} must be a non-key right column")
    l_cols = left.columns

    # keep the tiebreak's native type: casting e.g. a numeric priority
    # to string would order it lexicographically (10 < 9)
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        F.struct(*[F.col(c) for c in r_payload]).alias(_MATCH),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in on],
    )
    l_tb = F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        l_tb.alias("_tb"),
        F.lit(None).cast(r.schema[_MATCH].dataType).alias(_MATCH),
        *[F.col(c) for c in l_cols if c not in on],
    )
    # column order must line up for unionByName-free union
    u = r.unionByName(l.select(*r.columns))

    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_ord, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )

    if tolerance_us is not None:
        gap = F.abs(
            F.expr(f"timestampdiff(MICROSECOND, {_MATCH}.{right_time}, _t)")
        )
        matched = matched.withColumn(
            _MATCH, F.when(gap <= F.lit(tolerance_us), F.col(_MATCH))
        )

    out_cols = (
        [F.col(k) for k in on]
        + [F.col(c) for c in l_cols if c not in on]
        + [
            F.col(f"{_MATCH}.{c}").alias(f"{right_prefix}{c}")
            for c in r_payload
        ]
    )
    return matched.select(*out_cols)
