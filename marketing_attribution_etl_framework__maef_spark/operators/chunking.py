"""Chunk assignment (A9, ``src/api/ihc_api.py:25-52``).

The reference greedily bin-packs journeys into API request chunks with
two caps: <= 85 journeys AND <= 2750 sessions per chunk. Greedy packing
is inherently sequential; the distributed formulation assigns

    chunk_id = max(floor(journey_rank / J_CAP),
                   floor(cum_sessions_before / S_CAP))

over journeys ordered by conversion_id — deterministic, one window
pass, and respects both caps in the same only-slightly-less-dense way
(a chunk never exceeds 85 journeys; session overflow is bounded by one
journey, exactly like the greedy variant when a single journey exceeds
the cap). Only needed if the external-API mode is kept; the native
attribution path never chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

JOURNEY_CAP = 85   # ihc_api.py:14
SESSION_CAP = 2750  # ihc_api.py:15


def assign_chunks(
    journeys_grouped: DataFrame,
    journey_cap: int = JOURNEY_CAP,
    session_cap: int = SESSION_CAP,
) -> DataFrame:
    """Input: one row per conversion with ``n_sessions`` (from
    ``journeys.group_journeys``). Output adds ``chunk_id``.

    The single unbounded window is a global sort by conversion_id — at
    100 TB one would chunk per user-partition instead (chunk ids only
    need to be distinct, not globally dense); the global variant
    mirrors the reference's sequential semantics for parity tests.
    """
    w = Window.orderBy("conversion_id")
    rank0 = F.row_number().over(w) - 1
    cum_before = F.coalesce(
        F.sum("n_sessions").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return journeys_grouped.withColumn(
        "chunk_id",
        F.greatest(
            F.floor(rank0 / F.lit(journey_cap)),
            F.floor(cum_before / F.lit(session_cap)),
        ).cast("int"),
    )
