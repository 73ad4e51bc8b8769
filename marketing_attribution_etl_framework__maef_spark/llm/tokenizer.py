"""Distributed BPE tokenizer training (merge learning).

Classic byte-pair-encoding training (Sennrich et al. 2016, the
algorithm behind GPT/Llama tokenizers) learns a sequence of symbol
merges by repeatedly taking the most frequent adjacent symbol pair.
The production-scale insight (what HF tokenizers and SentencePiece do)
is that merges are learned over the DISTINCT-WORD HISTOGRAM, not the
corpus: the corpus-scale work is exactly one word-count aggregation
(map-side combinable, one shuffle on the word), after which the merge
loop runs over a table whose size is the vocabulary — orders of
magnitude smaller than the corpus and INDEPENDENT of corpus growth.
That histogram is ``localCheckpoint``-ed here (at warehouse scale it
is a materialized table) so the corpus is scanned exactly once no
matter how many merges are learned.

Per merge round, over the histogram only:
1. adjacent-pair counts weighted by word count — shifted-slice
   ``zip_with`` (no per-index lookups), one small aggregate;
2. argmax pair with total ordering (count DESC, pair ASC) — a
   bounded 1-row collect, same pattern as the k-means centroid pull;
3. greedy left-to-right merge application via a string-fold
   (``F.aggregate``) — written as the exact same accumulator program
   as the DuckDB oracle's ``list_reduce``, so application order and
   overlap handling (e.g. ``a a a`` + merge (a,a) -> ``aa a``) are
   bit-identical across engines by construction.

All counts are exact longs; ties are broken lexicographically, so the
learned merge table is deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, words


def _apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right application of one merge rule to a symbol
    array, as a string fold. Mirrors the oracle's list_reduce lambda
    token for token."""
    merged = lhs + rhs

    def step(acc: Column, x: Column) -> Column:
        last = F.regexp_extract(acc, "([^ ]+)$", 1)
        repl = F.when(acc == F.lit(lhs), F.lit(merged)).otherwise(
            F.concat(
                F.substr(acc, F.lit(1), F.length(acc) - F.lit(len(lhs))), F.lit(merged)
            )
        )
        return F.when((x == F.lit(rhs)) & (last == F.lit(lhs)), repl).otherwise(
            F.concat(acc, F.lit(" "), x)
        )

    folded = F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.get(syms, 0),
        step,
    )
    return F.split(folded, " ")


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus word histogram.

    Returns the merge table a tokenizer ships with:
    ``(merge_rank, lhs, rhs, merged, pair_count)`` — rank 1 is the
    first (most frequent) merge; pair_count is the exact weighted
    count at the time the merge was chosen.
    """
    if n_merges < 1:
        raise ValueError(f"need at least one merge, got {n_merges}")
    spark = docs.sparkSession
    norm = normalize_text(F.col(text_col))
    hist = (
        docs.select(F.explode(words(norm)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # char-split via explicit substr (split(w, "") drifts across
    # engines); the ONLY corpus-scale job — checkpointed so the merge
    # loop never re-scans the corpus. The loop table is re-sized from
    # its actual row count (the cluster_duplicates move): a vocabulary
    # is usually orders smaller than the corpus, and leaving it on the
    # corpus aggregation's partitioning pays empty-task launches in
    # every one of the n_merges rounds.
    raw = hist.select(
        "cnt",
        F.transform(
            F.sequence(F.lit(1), F.length("w")), lambda i: F.substr(F.col("w"), i, F.lit(1))
        ).alias("_syms"),
    ).localCheckpoint()
    n_vocab = raw.count()  # free: reads the checkpointed partitions
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_vocab // 500_000 + 1))
    syms = raw.repartition(n_parts).localCheckpoint()
    del raw

    merges = []
    for r in range(n_merges):
        n_pairs = F.greatest(F.size("_syms") - 1, F.lit(0))
        pair_structs = F.zip_with(
            F.slice("_syms", 1, n_pairs),
            F.slice("_syms", 2, n_pairs),
            lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
        )
        pc = (
            syms.select("cnt", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").cast("long").alias("pair_count"))
        )
        best = pc.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")).limit(1).collect()
        if not best:
            break  # vocabulary fully merged
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        merges.append((r + 1, lhs, rhs, lhs + rhs, cnt))
        syms = syms.select("cnt", _apply_merge(F.col("_syms"), lhs, rhs).alias("_syms"))
        # checkpoint every 8 rounds, not every round: the fold chain is
        # single-lineage (linear plan growth, unlike the 3-way
        # cluster_duplicates joins), so a short chain re-executes
        # cheaply over the vocab table (measured: per-round checkpoints
        # cost +25% wall at 8 merges), while a real tokenizer run
        # (thousands of merges) still gets O(1) planning per round.
        if (r + 1) % 8 == 0:
            syms = syms.localCheckpoint()

    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list and count BPE tokens per document —
    the corpus-scale HALF of tokenization, shaped the way production
    tokenizers run it: merges are folded over the DISTINCT-WORD table
    (vocabulary-sized, one fold chain per rule), and the corpus pays
    only its word explode plus one equi join against the resulting
    ``word -> token_length`` map. A naive per-document fold would run
    the whole merge chain once per word OCCURRENCE; this runs it once
    per distinct word, a multiple-orders reduction on natural-language
    corpora (Zipf). The join's right side is the vocabulary — AQE
    broadcasts it while it fits and falls back to a hash join keyed on
    the word beyond that.

    Output: ``(doc_id, n_words, n_bpe_tokens)`` as exact longs.
    """
    norm = normalize_text(F.col(text_col))
    ex = docs.select(F.col(id_col).alias("doc_id"), F.explode(words(norm)).alias("w"))
    syms = ex.select("w").distinct().select(
        "w",
        F.transform(
            F.sequence(F.lit(1), F.length("w")), lambda i: F.substr(F.col("w"), i, F.lit(1))
        ).alias("_syms"),
    )
    for lhs, rhs in merges:
        syms = syms.select("w", _apply_merge(F.col("_syms"), lhs, rhs).alias("_syms"))
    tok_len = syms.select("w", F.size("_syms").cast("long").alias("_tl"))
    return ex.join(tok_len, "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_tl").cast("long").alias("n_bpe_tokens"),
    )
