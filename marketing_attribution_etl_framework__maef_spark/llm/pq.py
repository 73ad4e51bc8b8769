"""Product-quantization (PQ) ANN: trained sub-codebooks + ADC scan.

PQ (Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) is the standard way vector search compresses at
scale: split each d-dim vector into m subspaces, train a small
k-means codebook PER subspace, and store each vector as m one-byte
codes.  Search runs Asymmetric Distance Computation (ADC): the query
precomputes its exact distance to every codeword (an m x k table,
bounded), and a candidate's approximate distance is the SUM of m
table lookups — no float vector is ever touched until the final
exact rerank.

This implementation keeps the repo's cross-engine arithmetic rules:
vectors are the q20-quantized unit vectors the spherical k-means
already uses (llm/similarity.py:215), so every distance — training
assignment, codebook update, ADC entry — is exact integer math that
the DuckDB oracle replays bit for bit.  Codebook training for ALL m
subspaces runs in ONE corpus pass per Lloyd iteration (subspace is
just another grouping key), and the codebooks are bounded driver
state (m * k * (d/m) longs).

100-TB shape: codes are 4 bytes/vector here (m=4, k=8 — demo sizes;
production m=16..64, k=256) vs 256 float bytes — the ADC scan reads
1.5% of the raw bytes, stays whole-stage-codegen'd (a join against
the broadcast m*k distance table + one hash agg), and the codebook
(trained once, on a sample) is broadcast, never shuffled.  The exact
rerank touches only top-c candidates per query via an equi-join back
to the raw vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.similarity import (
    idot,
    quantized_unit_vectors,
)

M_SUB = 4          # subspaces
SUB_DIM = 16       # dims per subspace (m * sub = 64, the corpus dim)
K_CODES = 8        # codewords per subspace
TOP_C = 12         # ADC candidates kept per query
TOP_K = 5          # exact-reranked neighbors returned


def _subvectors(qv: DataFrame) -> DataFrame:
    """(vec_id, s, sv): the m subspace slices of each q20 unit vector.
    One projection, no shuffle — subspace becomes a grouping key so
    all m codebooks train in the same aggregates."""
    return qv.select(
        "vec_id",
        "qv",
        F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("s"),
    ).select(
        "vec_id",
        F.col("s").cast("long").alias("s"),
        F.expr(f"slice(qv, s * {SUB_DIM} + 1, {SUB_DIM})").alias("sv"),
    )


def _d2(a, b):
    """Exact integer squared L2 between two long arrays."""
    return idot(a, a) - F.lit(2) * idot(a, b) + idot(b, b)


def pq_codebooks(sub: DataFrame, n_iter: int = 1) -> DataFrame:
    """(s, cluster, cq): per-subspace codebooks from ``n_iter`` Lloyd
    rounds over the q20 sub-vectors.  Seeds are the k sub-vectors with
    the smallest salted md5(vec_id) per subspace (decorrelated across
    subspaces by the salt); updates are floor(SUM/COUNT) on exact
    integer sums — the identical recipe the full-width k-means pins
    (llm/similarity.py kmeans_centroids), restated per subspace.
    Empty clusters drop out, as there."""
    ws = Window.partitionBy("s").orderBy("_m", "vec_id")
    cents = (
        sub.select(
            "s",
            "sv",
            "vec_id",
            F.md5(
                F.concat(
                    F.col("vec_id").cast("string"), F.lit("|pq"), F.col("s").cast("string")
                )
            ).alias("_m"),
        )
        .withColumn("cluster", (F.row_number().over(ws) - 1).cast("long"))
        .filter(F.col("cluster") < K_CODES)
        .select("s", "cluster", F.col("sv").alias("cq"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        wa = Window.partitionBy("vec_id", "s").orderBy(F.asc("_d"), F.asc("cluster"))
        assign = (
            sub.join(F.broadcast(cents), "s")
            .select("vec_id", "s", "sv", "cluster", _d2(F.col("sv"), F.col("cq")).alias("_d"))
            .withColumn("_rn", F.row_number().over(wa))
            .filter(F.col("_rn") == 1)
        )
        sums = (
            assign.select("s", "cluster", F.posexplode("sv").alias("pos", "comp"))
            .groupBy("s", "cluster", F.col("pos").cast("long").alias("pos"))
            .agg(F.sum("comp").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        cents = (
            sums.select(
                "s",
                "cluster",
                "pos",
                F.floor(F.col("_s").cast("double") / F.col("_n")).cast("long").alias("comp"),
            )
            .groupBy("s", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "comp"))), lambda r: r["comp"]
                ).alias("cq")
            )
            .localCheckpoint()
        )
    return cents


def pq_encode(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, s, code): nearest codeword per (vector, subspace) —
    exact integer argmin, codeword-id tie-break."""
    wa = Window.partitionBy("vec_id", "s").orderBy(F.asc("_d"), F.asc("cluster"))
    return (
        sub.join(F.broadcast(cents), "s")
        .select("vec_id", "s", "cluster", _d2(F.col("sv"), F.col("cq")).alias("_d"))
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "s", F.col("cluster").alias("code"))
    )


def pq_index(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The PQ INDEX artifacts (sub, cents, codes) — the tables a
    production deployment trains and writes once at ingest (codes ARE
    the 4-byte/vector index; codebooks are the trained model).
    Factored out (r12) so the two registry consumers (the PQ search
    and its recall audit) can share one staged build instead of each
    re-running the Lloyd round + encode; passing these back into
    ``ann_pq_rerank`` is result-identical by construction (the same
    three tables it built inline)."""
    qv = quantized_unit_vectors(embs, id_col, vec_col)
    sub = _subvectors(qv).localCheckpoint()  # feeds train + encode + dtab
    cents = pq_codebooks(sub)
    codes = pq_encode(sub, cents).localCheckpoint()
    return sub, cents, codes


def ann_pq_rerank(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 50,
    query_rem: int = 7,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Two-stage PQ search: integer ADC candidate scan over the codes,
    exact q20-cosine rerank of the top ``TOP_C``.

    Output: (query_id, rnk, vec_id, cos_q20) — the same contract as
    the int8 two-stage search (llm/quantize.py ann_int8_rerank) so the
    two compression families are directly comparable.

    ``index``: optionally a precomputed ``pq_index`` triple — skips
    the train+encode build; the ADC scan and exact rerank (the serving
    work) still run here.
    """
    if index is None:
        index = pq_index(embs, id_col, vec_col)
    sub, cents, codes = index
    qsub = sub.filter(F.col("vec_id") % query_mod == query_rem).select(
        F.col("vec_id").alias("query_id"), "s", "sv"
    )
    dtab = qsub.join(F.broadcast(cents), "s").select(
        "query_id", "s", F.col("cluster").alias("code"), _d2(F.col("sv"), F.col("cq")).alias("_d")
    )
    adc = (
        codes.join(F.broadcast(dtab), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("_d").cast("long").alias("adc_d2"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    cand = adc.withColumn("_rk", F.row_number().over(wc)).filter(F.col("_rk") <= TOP_C)
    from marketing_attribution_etl_framework__maef_spark.llm.similarity import as_double, cosine, q20

    qe = embs.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv0"))
    cv = embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    rer = (
        cand.join(qe, "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            q20(cosine(as_double(F.col("qv0")), as_double(F.col("cv")))).alias("cos_q20"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_q20"), F.asc("vec_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "vec_id", "cos_q20")
    )
