"""Training-sequence packing: concat-and-chunk document layout.

An LLM training pipeline's last batch step lays documents end to end
in a deterministic order and cuts the stream into fixed-budget
training sequences (GPT-style packing: documents MAY span a cut).
The pipeline needs, per document, WHERE it landed: its byte/token
offset, the first and last sequence it touches, and how many cuts
cross it — the manifest a downstream loader uses to materialize
shards without re-reading the corpus.

Layout order is hash-of-id (corpus shuffling and packing in one
step — training wants decorrelated neighbors, and a data-independent
order makes the layout reproducible across runs and engines).

The offset is an exclusive prefix sum of the weights over that
order — the same distributed two-phase scan as the weighted sampler
(llm/curation.py:595): hash-bucket the rows, cumsum WITHIN buckets
(partitioned window), add per-bucket offsets from a bounded
(n_buckets-row) driver-side table.  The DuckDB oracle runs the single
global-window formulation over the identical (bucket, hash, id) total
order and must agree exactly — all integer arithmetic.

At 100 TB: the per-bucket cumsum shards across executors; the only
driver state is n_buckets rows.  Weights sum to the corpus size, so
offsets need int64 up to 9.2e18 chars (~9 EB) — comfortably beyond
any corpus; the div/mod sequence math is plain long arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 4096,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Concat-and-chunk packing manifest.

    Output, one row per doc with weight > 0: (doc_id, n_chars,
    offset, seq_first, seq_last, n_seqs) where

    - offset: exclusive prefix sum of weights in (bucket, hash, id)
      order;
    - seq_first = offset div budget, seq_last =
      (offset + w - 1) div budget;
    - n_seqs = seq_last - seq_first + 1 (how many training sequences
      contain a piece of this document).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|pack"))), 1, 15),
        16,
        10,
    ).cast("long")
    base = (
        docs.select(
            F.col(id_col), F.col(weight_col).cast("long").alias("_w"), h.alias("_h")
        )
        .filter(F.col("_w") > 0)
        .withColumn("_b", F.col("_h") % n_buckets)
    )
    totals = base.groupBy("_b").agg(F.sum("_w").cast("long").alias("_t"))
    rows = sorted((r["_b"], r["_t"]) for r in totals.collect())  # bounded: n_buckets
    offsets, acc = [], 0
    for b, t in rows:
        offsets.append((b, acc))
        acc += t
    spark = docs.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "_b long, _off long")
    w = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(off), "_b")
        .withColumn("offset", (F.coalesce(F.sum("_w").over(w), F.lit(0)) + F.col("_off")))
        .select(
            F.col(id_col),
            F.col("_w").alias("n_chars"),
            F.col("offset").cast("long"),
            F.expr(f"offset div {budget}").cast("long").alias("seq_first"),
            F.expr(f"(offset + _w - 1) div {budget}").cast("long").alias("seq_last"),
            F.expr(f"((offset + _w - 1) div {budget}) - (offset div {budget}) + 1")
            .cast("long")
            .alias("n_seqs"),
        )
    )
