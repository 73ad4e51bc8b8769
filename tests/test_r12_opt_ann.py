"""Round-12 equivalence tests for the shared ANN brute-truth store and
the staged-store minhash_accuracy rewire.

Pins each rank projection of the _ann_truth-style table to the inline
truth relation the consumer previously computed, on a handmade corpus
with deliberate ties, self rows, and identical vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim


@pytest.fixture(scope="module")
def embs(spark):
    # 40 vectors of dim 4; vec 12 duplicates vec 2 (exact tie on cosine),
    # vec 25 is a scaled copy of vec 5 (cosine 1 with it)
    rows = []
    for i in range(40):
        v = [float((i * 7 + j * 3) % 11 - 5) or 1.0 for j in range(4)]
        if i == 12:
            v = [float((2 * 7 + j * 3) % 11 - 5) or 1.0 for j in range(4)]
        if i == 25:
            v = [2.0 * (float((5 * 7 + j * 3) % 11 - 5) or 1.0) for j in range(4)]
        rows.append((i, v, "l%d" % (i % 3)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")


def _truth_store(embs, queries, k=5):
    """The _ann_truth construction, parameterized for the fixture."""
    c = sim._norm_vec(embs, "vec_id", "embedding", "vec_id", "_v").withColumn(
        "half", (F.col("vec_id") % 2).cast("long")
    )
    q = sim._norm_vec(queries, "vec_id", "embedding", "query_id", "_q")
    scored = c.crossJoin(F.broadcast(q)).select(
        "half", "query_id", "vec_id", sim._pair_cos("_q", "_v").alias("_cos")
    )
    w_all = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    w_half = Window.partitionBy("half", "query_id").orderBy(
        F.desc("_cos"), F.asc("vec_id")
    )
    w_q = Window.partitionBy("query_id")
    ranked = scored.select(
        "query_id",
        "vec_id",
        "half",
        F.row_number().over(w_all).alias("rank_all"),
        F.row_number().over(w_half).alias("rank_half"),
    ).withColumn(
        "_self_rank",
        F.max(F.when(F.col("vec_id") == F.col("query_id"), F.col("rank_all"))).over(
            w_q
        ),
    )
    return ranked.withColumn(
        "rank_excl",
        F.when(F.col("vec_id") == F.col("query_id"), F.lit(None)).otherwise(
            F.col("rank_all")
            - F.when(
                F.col("rank_all") > F.coalesce("_self_rank", F.lit(1 << 31)), 1
            ).otherwise(0)
        ),
    ).filter(
        (F.col("rank_all") <= k) | (F.col("rank_half") <= k) | (F.col("rank_excl") <= k)
    )


def test_rank_all_matches_brute_topk(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    store = _truth_store(embs, queries)
    got = sorted(
        store.filter(F.col("rank_all") <= 5)
        .select("query_id", "vec_id", "rank_all")
        .collect()
    )
    want = sorted(
        sim.brute_topk(embs, queries, 5)
        .select("query_id", "vec_id", F.col("rank").alias("rank_all"))
        .collect()
    )
    assert got == want


def test_rank_half_matches_per_half_windows(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    store = _truth_store(embs, queries)
    got = sorted(
        store.filter(F.col("rank_half") <= 5)
        .select("half", "query_id", "vec_id")
        .collect()
    )
    # the inline drift truth: rank per (half, query) over the tagged corpus
    c = sim._norm_vec(embs, "vec_id", "embedding", "vec_id", "_v").withColumn(
        "half", (F.col("vec_id") % 2).cast("long")
    )
    q = sim._norm_vec(queries, "vec_id", "embedding", "query_id", "_q")
    scored = c.crossJoin(F.broadcast(q)).select(
        "half", "query_id", "vec_id", sim._pair_cos("_q", "_v").alias("_cos")
    )
    wt = Window.partitionBy("half", "query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    want = sorted(
        scored.withColumn("_rk", F.row_number().over(wt))
        .filter(F.col("_rk") <= 5)
        .select("half", "query_id", "vec_id")
        .collect()
    )
    assert got == want


def test_rank_excl_matches_self_excluded_window(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    store = _truth_store(embs, queries)
    got = sorted(
        store.filter(F.col("rank_excl") <= 5).select("query_id", "vec_id").collect()
    )
    # the inline self-excluded truth (pq/lsh/ensemble form)
    c = sim._norm_vec(embs, "vec_id", "embedding", "vec_id", "_v")
    q = sim._norm_vec(queries, "vec_id", "embedding", "query_id", "_q")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim._pair_cos("_q", "_v").alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    want = sorted(
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "vec_id")
        .collect()
    )
    assert got == want


def test_recall_audit_with_precomputed_truth_identical(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    cents = embs.filter(F.col("vec_id") < 4)
    store = _truth_store(embs, queries)
    base = sorted(sim.ann_recall_audit(embs, queries, cents, k=5, probe=2).collect())
    staged = sorted(
        sim.ann_recall_audit(
            embs,
            queries,
            cents,
            k=5,
            probe=2,
            truth=store.filter(F.col("rank_all") <= 5).select("query_id", "vec_id"),
        ).collect()
    )
    assert staged == base


def test_probe_frontier_with_precomputed_truth_identical(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    cents = embs.filter(F.col("vec_id") < 4)
    store = _truth_store(embs, queries)
    base = sorted(
        sim.ivf_probe_frontier(embs, queries, cents, k=5, probes=(1, 2)).collect()
    )
    staged = sorted(
        sim.ivf_probe_frontier(
            embs,
            queries,
            cents,
            k=5,
            probes=(1, 2),
            truth=store.filter(F.col("rank_all") <= 5).select("query_id", "vec_id"),
        ).collect()
    )
    assert staged == base


def test_recall_drift_with_precomputed_truth_identical(spark, embs):
    queries = embs.filter(F.col("vec_id") % 10 == 2)
    cents = embs.filter(F.col("vec_id") < 4)
    store = _truth_store(embs, queries)
    base = sorted(sim.ann_recall_drift(embs, queries, cents, k=5, probe=2).collect())
    staged = sorted(
        sim.ann_recall_drift(
            embs,
            queries,
            cents,
            k=5,
            probe=2,
            truth=store.filter(F.col("rank_half") <= 5).select(
                "half", "query_id", "vec_id"
            ),
        ).collect()
    )
    assert staged == base


# --------------------------------------------------------------------------
# minhash_accuracy: staged bands + sets == self-built lineages
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
        "the quick brown fox jumps over the very lazy dog again and again",  # near dup
        "completely different words live in this document about spark shuffles",
        "completely different words live in this document about spark shuffles ok",
        "a third topic entirely numbers one two three four five six seven",
    ]
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)], "doc_id long, text string, lang string"
    )


def test_ann_pq_rerank_with_staged_index_identical(spark, embs):
    from marketing_attribution_etl_framework__maef_spark.llm import pq

    base = sorted(pq.ann_pq_rerank(embs, query_mod=10, query_rem=2).collect())
    idx = pq.pq_index(embs)
    staged = sorted(
        pq.ann_pq_rerank(embs, query_mod=10, query_rem=2, index=idx).collect()
    )
    assert staged == base


def test_minhash_accuracy_with_staged_stores_identical(spark, dup_docs):
    from marketing_attribution_etl_framework__maef_spark.llm import text as txt

    base = sorted(dd.minhash_accuracy(dup_docs).collect())
    norm = txt.normalize_text(F.col("text"))
    exploded = dup_docs.select(
        F.col("doc_id"), F.explode(txt.word_shingles(txt.words(norm), 3)).alias("shingle")
    )
    bands_df = dd.lsh_bands(dd.minhash_signatures(exploded, "doc_id", "shingle"))
    sets = dd.blocked_shingle_sets(dup_docs)
    staged = sorted(
        dd.minhash_accuracy(dup_docs, bands_df=bands_df, sets=sets).collect()
    )
    assert staged == base
