"""Edit-distance fuzzy matching with length-band blocking.

The reference trusts ``channel_name`` to be clean (it is a join key in
``src/etl/reporting.py:57-98``); real marketing feeds arrive with
variant spellings ('pay-per-click', 'payperclick', 'PPC ads'), and the
standard repair is to reconcile each dirty label against a canonical
dimension by minimum Levenshtein distance.

Cross-engine exactness: Levenshtein is an integer dynamic program with
one defined answer — Spark ``F.levenshtein`` and DuckDB
``levenshtein()`` agree exactly, so the operator is oracle-checkable
(unlike similarity scores built on floating normalization). The
argmin is made total by (distance, canonical) ordering, so equal-
distance ties break alphabetically, never by partition order.

100-TB shape: never all-pairs. Candidates are blocked on a LENGTH
BAND: lev(a, b) >= abs(len(a) - len(b)), so a match within
``max_distance`` can only pair strings whose lengths differ by at
most that much. Each dirty string joins (broadcast) only the
canonical rows inside its band — |dirty| x band_width comparisons,
where band_width is bounded by the canonical dimension's length
histogram, not its size. The canonical side is a dimension (schema-
sized), so the join is a broadcast; the expensive side streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_best_match(
    dirty: DataFrame,
    canonical: DataFrame,
    dirty_col: str,
    canon_col: str,
    max_distance: int = 3,
) -> DataFrame:
    """Per distinct ``dirty_col`` value: the closest ``canon_col``
    value within ``max_distance`` edits (ties -> alphabetically first
    canonical), or no row if nothing is within the budget.

    Output: (dirty value, matched canonical, distance long).
    """
    d = dirty.select(F.col(dirty_col).alias("dirty")).distinct().withColumn(
        "_dlen", F.length("dirty")
    )
    c = canonical.select(F.col(canon_col).alias("canonical")).distinct().withColumn(
        "_clen", F.length("canonical")
    )
    # length-band block: |len(a) - len(b)| <= max_distance is a
    # NECESSARY condition for lev <= max_distance — anything outside
    # the band cannot match and is never compared.  The band is joined
    # as an EQUI key (each dirty length exploded into its 2d+1
    # candidate lengths, hash-joined on _clen): a raw band predicate
    # would be a BroadcastNestedLoopJoin evaluating the inequality over
    # every |dirty| x |canonical| pair (ADVICE r03) — the hash join
    # keeps the join itself, not just the Levenshtein evaluations, at
    # |dirty| x band_width.
    banded = d.withColumn(
        "_clen",
        F.explode(
            F.sequence(
                F.col("_dlen") - F.lit(int(max_distance)),
                F.col("_dlen") + F.lit(int(max_distance)),
            )
        ),
    ).join(F.broadcast(c), "_clen")
    scored = banded.select(
        "dirty",
        "canonical",
        F.levenshtein("dirty", "canonical").cast("long").alias("distance"),
    ).filter(F.col("distance") <= int(max_distance))
    w = Window.partitionBy("dirty").orderBy(F.asc("distance"), F.asc("canonical"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("dirty", "canonical", "distance")
    )
