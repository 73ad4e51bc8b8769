"""Maximal Marginal Relevance (MMR) diverse top-k selection over the
embedding corpus — the de-duplicating retrieval stage between ANN
candidate generation (llm/similarity.py) and context assembly: pick k
vectors that are RELEVANT to a query but not redundant with each
other (Carbonell & Goldstein 1998).

Arithmetic contract: all similarities are INTEGER dot products over
the q20-quantized unit vectors (similarity.quantized_unit_vectors), so
every comparison is exact and bit-identical across engines by
construction — the same device the k-means / int8 / PQ ANN paths use.
With lambda = 1/2 the MMR objective's argmax is the argmax of
(rel - max_selected_sim), which stays in integers.

Scale: the greedy loop is k rounds of driver-side state BOUNDED by k
(the selected ids + their k quantized vectors — the sanctioned
bounded-loop pattern, like k-means centroids).  Per round the cluster
does one scan of the candidate table computing at most |selected| + 1
integer dot products per row and a TakeOrdered(1); the relevance dot
product is computed ONCE and the candidate table localCheckpoint'd so
rounds do not replay the quantization lineage (the raking/loop-state
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim


def _lit_vec(v: list[int]):
    return F.array(*[F.lit(int(x)) for x in v])


def mmr_select(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Greedy MMR selection of ``k`` vectors.

    Query = the quantized unit vector with the smallest vec_id (a
    deterministic stand-in for a user query embedding); candidates =
    every other non-zero vector.  Round j picks

        argmax_i  rel(i) - max_{s in selected} idot(i, s)

    (round 1: pure relevance), ties broken by vec_id ASC.  Output one
    row per round: (round, vec_id, rel_idot, mmr_score) — rel and
    score in the exact integer q40-ish unit-dot scale.
    """
    spark = embeddings.sparkSession
    qv = sim.quantized_unit_vectors(embeddings)
    qrow = qv.orderBy("vec_id").limit(1).collect()[0]
    qid, qvec = qrow["vec_id"], list(qrow["qv"])
    cand = (
        qv.filter(F.col("vec_id") != qid)
        .select("vec_id", "qv", sim.idot(_lit_vec(qvec), F.col("qv")).alias("rel"))
        .localCheckpoint()
    )
    selected: list[tuple[int, list[int]]] = []
    rows: list[tuple[int, int, int, int]] = []
    for j in range(1, k + 1):
        if selected:
            pen = F.greatest(
                *[sim.idot(_lit_vec(sv), F.col("qv")) for _, sv in selected]
            ) if len(selected) > 1 else sim.idot(_lit_vec(selected[0][1]), F.col("qv"))
            score = (F.col("rel") - pen).alias("mmr_score")
        else:
            score = F.col("rel").alias("mmr_score")
        rows_top = (
            cand.filter(~F.col("vec_id").isin([vid for vid, _ in selected]))
            .select("vec_id", "qv", "rel", score)
            .orderBy(F.desc("mmr_score"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not rows_top:  # k exceeded the candidate pool: stop early
            break
        top = rows_top[0]
        selected.append((top["vec_id"], list(top["qv"])))
        rows.append((j, int(top["vec_id"]), int(top["rel"]), int(top["mmr_score"])))
    return spark.createDataFrame(
        rows, "round long, vec_id long, rel_idot long, mmr_score long"
    )
