"""Journey path-motif mining: frequent channel k-grams.

The Markov layer (operators/markov.py) models single transitions; the
Shapley layer scores sets.  Between them sits the practitioner
question "which exact 3-step sequences keep showing up before a
conversion?" — path motifs, the journey-level analogue of text
n-grams.

Implementation: order each conversion's touchpoints by (event_ts,
session_id) with a per-conversion ``row_number`` (high-cardinality
partition key — shards across executors), then two self-equi-joins on
(conversion_id, rn+1) and (conversion_id, rn+2) stitch consecutive
triples, and one hash aggregate counts each (c1, c2, c3) motif.  A
journey with k touches emits k-2 triples, so cost is linear in total
journey length; the joins are co-partitioned on conversion_id (one
exchange, reused across both joins at equal partitioning).

No collect_list: a whale journey (bot traffic, 10^6 touches) would
blow a per-group buffer, but contributes only 10^6-2 join rows here.

Exact integers only; deterministic order by the (ts, session_id)
tiebreak."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def path_motifs(
    journeys: DataFrame,
    length: int = 3,
    min_count: int = 2,
    conv_col: str = "conversion_id",
    channel_col: str = "channel_label",
    ts_col: str = "event_ts",
    tiebreak_col: str = "session_id",
) -> DataFrame:
    """Count frequent channel ``length``-grams across journeys.

    Output: (c1 .. c<length>, n_motif) for motifs occurring at least
    ``min_count`` times, plus per-motif distinct-journey count
    n_journeys.
    """
    if length < 2:
        raise ValueError("motif length must be >= 2")
    w = Window.partitionBy(conv_col).orderBy(ts_col, tiebreak_col)
    base = journeys.select(
        F.col(conv_col).alias("cid"),
        F.col(channel_col).alias("ch"),
        F.row_number().over(w).alias("rn"),
    )
    cur = base.select("cid", "rn", F.col("ch").alias("c1"))
    for i in range(2, length + 1):
        nxt = base.select(
            "cid", (F.col("rn") - (i - 1)).alias("rn"), F.col("ch").alias(f"c{i}")
        )
        cur = cur.join(nxt, ["cid", "rn"])
    cols = [f"c{i}" for i in range(1, length + 1)]
    return (
        cur.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_motif"),
            F.countDistinct("cid").cast("long").alias("n_journeys"),
        )
        .filter(F.col("n_motif") >= min_count)
    )
