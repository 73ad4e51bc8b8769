"""Chunk assignment (A9, ``src/api/ihc_api.py:25-52``).

The reference greedily bin-packs journeys into API request chunks with
two caps: <= 85 journeys AND <= 2750 sessions per chunk. Greedy packing
is inherently sequential; the distributed formulation is a two-level
split over journeys ordered by conversion_id:

    s_id = floor(cum_sessions_before / S_CAP)     -- session-cap groups
    sub  = floor(journey_rank_within_s_id / J_CAP) -- journey-cap split
    chunk_id = s_id * (S_CAP + 1) + sub

Guarantees: a chunk never exceeds J_CAP journeys (the ``sub`` split is
a hard row_number bound), and its session total exceeds S_CAP by at
most one journey's sessions — the same overflow the greedy reference
allows when a single journey exceeds the cap. Chunk ids are distinct
but not dense (the API contract only needs distinctness; the reference
uses chunk ids purely as request indices, ``ihc_api.py:95-100``).

``sub`` cannot overflow the ``S_CAP + 1`` stride: every journey
contributes >= 1 session to the cumulative sum (enforced with
``greatest(n_sessions, 1)``), so an s_id group holds <= S_CAP journeys
and ``sub <= S_CAP / J_CAP``.

Scale note: with ``bucket_col`` (e.g. ``pmod(xxhash64(user_id), B)``)
the window is partitioned per bucket and ids are made distinct across
buckets by the bucket stride — no single-task global sort. The
unbucketed default mirrors the reference's sequential semantics for
parity tests only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

JOURNEY_CAP = 85   # ihc_api.py:14
SESSION_CAP = 2750  # ihc_api.py:15

# one bucket's chunk-id space; buckets are offset by this stride.
# 2^40 session-rows per bucket is far beyond any single window task.
_BUCKET_STRIDE = 1 << 40


def assign_chunks(
    journeys_grouped: DataFrame,
    journey_cap: int = JOURNEY_CAP,
    session_cap: int = SESSION_CAP,
    bucket_col: str | None = None,
) -> DataFrame:
    """Input: one row per conversion with ``n_sessions`` (from
    ``journeys.group_journeys``). Output adds ``chunk_id``.

    ``bucket_col``: optional coarse partition key; when set, the sort
    runs per bucket (distributed) and chunk ids are
    ``bucket * 2^40 + local_chunk`` — distinct across buckets.
    """
    part = [bucket_col] if bucket_col else []
    w = Window.partitionBy(*part).orderBy("conversion_id")
    cum_before = F.coalesce(
        F.sum(F.greatest(F.col("n_sessions"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    df = journeys_grouped.withColumn(
        "_s_id", F.floor(cum_before / F.lit(session_cap)).cast("long")
    )
    w2 = Window.partitionBy(*part, "_s_id").orderBy("conversion_id")
    sub = F.floor((F.row_number().over(w2) - 1) / F.lit(journey_cap))
    chunk = F.col("_s_id") * F.lit(session_cap + 1) + sub
    if bucket_col:
        chunk = F.col(bucket_col).cast("long") * F.lit(_BUCKET_STRIDE) + chunk
    return df.withColumn("chunk_id", chunk.cast("long")).drop("_s_id")
