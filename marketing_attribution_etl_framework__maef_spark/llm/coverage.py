"""Greedy coverage-maximizing data selection (submodular facility
location over shingle sets).

Dedup removes redundant documents; the dual curation question is
"which k documents COVER the corpus best?" — pick, one at a time, the
document adding the most not-yet-covered word shingles.  Greedy on a
monotone submodular objective carries the classic (1 - 1/e)
guarantee (Nemhauser-Wolsey-Fisher 1978); the distributed form here
is the standard k-round scan.

Per round (k is small and fixed — BOUNDED driver loop per the repo
rule; the per-round driver state is ONE row):

1. gains: a hash aggregate per doc over the LIVE (doc, shingle)
   table — the table holds only not-yet-covered pairs, so cost is
   O(|uncovered pairs|), which SHRINKS monotonically round over
   round (r05, VERDICT r04 #5: previously each round re-anti-joined
   the full table against a growing covered set, k full scans);
2. argmax with (gain DESC, doc_id ASC) tie-break — a distributed
   top-1 (TakeOrderedAndProject, never a full sort);
3. prune: anti-join the live table against the winner's shingles and
   localCheckpoint the survivor set — the winner's own rows vanish
   (all its shingles are now covered), so fully-covered docs are
   left-semi-pruned for free and the plan does not grow with rounds
   (same device as cluster_duplicates' loop state; at production
   scale: a staging table per round).

Everything is exact set arithmetic on strings — no floats anywhere —
so the k selections and their gains are oracle-checkable; the DuckDB
oracle unrolls the same k rounds with MATERIALIZED CTEs (the
markov/BPE unrolled-loop precedent).

Reference parity: none (the reference has no text layer); this
completes the SURVEY §2.10 curation family next to dedup (L13-L17),
mixing (L44) and sketch-gated curation (L96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, word_shingles, words


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_id, shingle) pairs — word 3-shingles of the
    normalized text (the same shingle definition the dedup family
    keys on, llm/text.py:47)."""
    norm = normalize_text(F.col(text_col))
    return (
        docs.select(F.col(id_col), F.explode(word_shingles(words(norm))).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
    )


def greedy_coverage(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Select k documents greedily maximizing new-shingle coverage.

    Output: (round, doc_id, gain, covered_total) — one row per
    selection in pick order; stops early if no document adds
    anything.  round is 1-based; covered_total is the running
    distinct-shingle count after the pick.
    """
    spark = docs.sparkSession
    # `pairs` is the LIVE uncovered (doc, shingle) set; it only shrinks.
    # Sized to its actual row count before the loop (CLAUDE.md
    # iterative-loop rule): the per-round jobs are LATENCY-bound (16
    # tiny sequential jobs), so fewer partitions = fewer tasks per
    # round.  Two alternatives measured SLOWER at sf0.1: a driver-held
    # covered set pruned via per-round broadcast anti-join (6.3-6.9 s —
    # per-round createDataFrame/broadcast round-trips) and a literal
    # isin() In-set predicate (8.2-9.5 s — hundreds of string literals
    # serialized into every task's plan per round); the shrink-chain
    # with per-round localCheckpoint stays the fastest shape.
    pairs = (
        doc_shingles(docs, text_col, id_col).repartition(4).localCheckpoint()
    )
    out, covered_total = [], 0
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for rnd in range(1, k + 1):
            top = (
                pairs.groupBy(id_col)
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
                .orderBy(F.desc("gain"), F.asc(id_col))
                .limit(1)
                .collect()
            )
            if not top or top[0]["gain"] == 0:
                break
            doc, gain = top[0][id_col], top[0]["gain"]
            covered_total += gain
            out.append((rnd, doc, gain, covered_total))
            # Gain of doc d next round = |shingles(d) - covered|; pruning
            # the winner's shingles out of the live table preserves exactly
            # that quantity, so the k selections are bit-identical to the
            # full-anti-join formulation (oracle unchanged).
            winner_sh = pairs.filter(F.col(id_col) == doc).select("sh")
            pairs = pairs.join(winner_sh, "sh", "left_anti").localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.createDataFrame(
        out, "round long, doc_id long, gain long, covered_total long"
    )


def saturation_curve(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Corpus saturation curve: novel-shingle contribution by doc-id
    decile — "how fast does new data stop adding new content", the
    dedup-ROI readout that tells a data buyer when a source is mined
    out.

    A shingle is NOVEL in the decile of the smallest doc_id containing
    it (deterministic: ids, not arrival order).  Output per decile:
    (bucket, n_docs, novel_shingles, distinct_mentions) — mentions =
    distinct (doc, shingle) pairs whose doc falls in the bucket.

    Scale: the shingle first-occurrence is one min-aggregate over the
    inverted (shingle -> doc) grain (the same shuffle every dedup op
    pays); bucketing is a pure integer function of doc_id against a
    broadcast 1-row max.
    """
    pairs = doc_shingles(docs)
    mx = docs.agg(F.max("doc_id").cast("long").alias("_mx"))
    first = pairs.groupBy("sh").agg(F.min("doc_id").alias("_fd"))
    novel = (
        first.crossJoin(F.broadcast(mx))
        .select(F.expr(f"least({n_buckets - 1}, _fd * {n_buckets} div (_mx + 1))").cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("novel_shingles"))
    )
    mentions = (
        pairs.crossJoin(F.broadcast(mx))
        .select(F.expr(f"least({n_buckets - 1}, doc_id * {n_buckets} div (_mx + 1))").cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("distinct_mentions"))
    )
    ndocs = (
        docs.crossJoin(F.broadcast(mx))
        .select(F.expr(f"least({n_buckets - 1}, doc_id * {n_buckets} div (_mx + 1))").cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        ndocs.join(novel, "bucket", "left")
        .join(mentions, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce(F.col("novel_shingles"), F.lit(0)).cast("long").alias("novel_shingles"),
            F.coalesce(F.col("distinct_mentions"), F.lit(0)).cast("long").alias("distinct_mentions"),
        )
    )
