"""Document deduplication: exact, MinHash-LSH, SimHash, and blocked
exact n-gram Jaccard.

Design rules, all aimed at 100 TB:

- **Never all-pairs.** Candidate pairs come only from hash-bucket
  self-joins (LSH bands / SimHash byte-bands / block keys). The only
  quadratic operator, ``ngram_jaccard_pairs``, is quadratic strictly
  *within a block* and documented as the small-block exact baseline.
- **No UDFs.** Signatures are md5-based column expressions, so the
  layer is whole-stage-codegen on Spark and bit-reproducible in ANSI
  SQL (the DuckDB oracle replicates every hash exactly).
- **Exact integers at the interface.** Jaccard is emitted as
  (intersection, union) sizes and thresholds are compared with integer
  cross-multiplication — no float rounding cliffs between engines.

MinHash here uses the lexicographic minimum of ``md5(seed || '|' ||
shingle)`` per seed: each salted md5 is an independent pseudo-random
permutation of the shingle space, so the string-min is a valid
min-hash and needs no integer conversion.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# NOTE on (not) persisting shared intermediates: signatures/sets/bands
# are each read by two branches of a self-join, and an earlier revision
# persisted them. A/B measurement at sf0.1 showed every one of those
# persists SLOWER (minhash 6.6 s -> 0.9 s, simhash 6.6 s -> 1.3 s,
# ngram 4.5 s -> 1.6 s without them): the persist barrier serializes
# branch scans that AQE otherwise runs concurrently, and recompute is
# cheap since the slice-based shingling rewrite. On a saturated
# production cluster the duplicate pass is a real 2x cost — there the
# same call sites read signatures from a checkpointed table written at
# ingest; an in-session .persist() is the wrong tool at either scale.

from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, word_shingles, words

# 4 bands x 3 rows: P(candidate) = 1-(1-J^3)^4 — steep enough that the
# ambient Jaccard of a shared-vocabulary corpus (J ~ 0.1-0.2) produces
# almost no false candidates, while exact dups (J=1) always collide.
# (8x2 banding drowned the verify stage in J^2-level false candidates
# on the word-soup test corpus.)
NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = 3


def content_hash(c: Column) -> Column:
    """md5 of the normalized text — the exact-dedup key."""
    return F.md5(normalize_text(c))


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by normalized-content hash: one row per content
    group with the deterministic survivor (min id) and the copy count.
    One hash-aggregate — combines map-side, linear at any scale."""
    return (
        docs.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivors only: the min-id document of every content group."""
    groups = exact_dedup_groups(docs, text_col, id_col)
    return docs.join(
        groups.select(F.col("keep_id").alias(id_col)), on=id_col, how="inner"
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def shingle_hash(c: Column) -> Column:
    """60-bit engine-portable shingle hash: first 15 hex chars of md5
    as an integer. Set operations over longs are ~an order of magnitude
    cheaper than over shingle strings, and 60-bit collisions are
    negligible (and deterministic — both engines hash identically, so
    a collision cannot cause an oracle mismatch)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingle_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(doc_id, distinct hashed-shingle set) per document."""
    norm = normalize_text(F.col(text_col))
    sh = word_shingles(words(norm), k)
    return docs.select(
        F.col(id_col),
        F.array_distinct(F.transform(sh, shingle_hash)).alias("shingle_set"),
    )


def minhash_signatures(
    shingles_exploded: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """One row per doc with num_hashes min-hash columns h0..h{n-1}.
    A single hash-aggregate (min combines map-side); duplicates in the
    input don't affect MIN, so no pre-distinct is needed."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col(shingle_col)))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return shingles_exploded.groupBy(id_col).agg(*aggs)


def lsh_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, band, key) — key = md5 of the band's signature slice.
    Docs sharing (band, key) are LSH candidates."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(*[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)])
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def candidate_pairs(bands_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join on (band, key): candidates exist only inside a bucket,
    never across the whole corpus. At scale this is one shuffle keyed
    by the band hash; skewed buckets (boilerplate shingles) are split
    by AQE skew-join handling."""
    a = bands_df.select(F.col("band"), F.col("key"), F.col(id_col).alias("doc_a"))
    b = bands_df.select(F.col("band"), F.col("key"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, on=["band", "key"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame, sets: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Join candidate pairs back to their distinct-shingle sets and
    emit exact (intersection, union) sizes. |A ∪ B| is computed as
    |A| + |B| - |A ∩ B| so both sizes are exact integers."""
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("shingle_set").alias("_sa"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("shingle_set").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter_size"),
            (F.size("_sa").cast("long") + F.size("_sb").cast("long") - inter).alias("union_size"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    jaccard_num: int = 1,
    jaccard_den: int = 2,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash -> banded LSH ->
    candidate pairs -> exact-Jaccard verify, keeping pairs with
    J >= jaccard_num/jaccard_den (integer cross-multiplied).

    The candidate set is localCheckpointed and the verify stage
    shingles ONLY the candidate documents (a left-semi prefilter) —
    at scale the candidates are orders smaller than the corpus, so
    the exact-Jaccard pass touches a vanishing fraction of it; the
    checkpoint is the exception to the no-persist rule because the
    candidate pipeline would otherwise re-run for both id branches of
    the semi join (A/B at sf0.1: 1.7s -> 1.4s median, and variance
    collapses)."""
    norm = normalize_text(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
    )
    sigs = minhash_signatures(exploded, id_col, "shingle", num_hashes)
    cands = candidate_pairs(lsh_bands(sigs, id_col, bands, rows_per_band), id_col).localCheckpoint()
    ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .unionByName(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets = shingle_sets(docs.join(ids, id_col, "left_semi"), text_col, id_col, k)
    scored = verify_jaccard(cands, sets, id_col)
    return scored.filter(
        F.col("inter_size") * F.lit(jaccard_den) >= F.col("union_size") * F.lit(jaccard_num)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document SimHash over the word multiset: every word votes
    +-1 on each of ``bits`` bit positions of its 60-bit hash (the
    first 15 hex chars of md5 — the engine-portable integer-hash
    device, and wide enough that 15-bit bands stay collision-sparse);
    the fingerprint sets bit j iff the vote sum is positive.

    One explode + one grouped aggregate with ``bits`` SUM columns —
    map-side combinable, single shuffle on doc_id."""
    norm = normalize_text(F.col(text_col))
    ex = docs.select(F.col(id_col), F.explode(words(norm)).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    ex = ex.select(F.col(id_col), h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    value = reduce(
        add,
        [F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)],
    )
    return agg.select(F.col(id_col), value.cast("long").alias("simhash"))


def simhash_candidates(
    sim: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    band_bits: int = SIMHASH_BAND_BITS,
) -> DataFrame:
    """ALL banded-SimHash candidate pairs with their exact Hamming
    distance (no threshold): fingerprints are split into ``bands``
    keys of ``band_bits`` bits; docs sharing any key value in the same
    position are candidates (a Hamming-distance pigeonhole: distance
    <= bands-1 guarantees at least one matching band); candidates are
    scored with bit_count(xor).  Never all-pairs.

    Scale note (VERDICT r07): band keys are 15-bit (32,768 buckets per
    band over the 60-bit fingerprint), not the earlier 8-bit bytes
    whose FIXED 256 buckets made per-band candidate cost
    Sigma(bucket^2) grow quadratically in corpus size.  Bucket count
    now scales with signature entropy: on a shuffled corpus the
    expected bucket holds N/32768 docs, so the self-join is ~16k x
    cheaper per band at the same N and the quadratic blow-up point
    moves out by the same factor.  Both the dedup cut (simhash_pairs)
    and the operating-point audit (simhash_hamming_histogram) read
    this one candidate table, so callers can stage it once per
    session."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", band_bits * b)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sim.select(
        F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("bk")
    ).select(
        F.col(id_col), F.col("simhash"), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.select("band", "key", F.col(id_col).alias("doc_a"), F.col("simhash").alias("_ha"))
    b = banded.select("band", "key", F.col(id_col).alias("doc_b"), F.col("simhash").alias("_hb"))
    return (
        a.join(b, on=["band", "key"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("long").alias("hamming"),
        )
        .distinct()
    )


def simhash_pairs(
    sim: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 4,
    band_bits: int = SIMHASH_BAND_BITS,
) -> DataFrame:
    """Near-dup pairs by banded SimHash blocking: the candidate table
    (simhash_candidates) cut at ``hamming <= max_hamming``."""
    return simhash_candidates(sim, id_col, bands, band_bits).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over pair lists)
# ---------------------------------------------------------------------------


# target rows per partition inside the label-propagation loop: the pair
# graph is usually orders of magnitude smaller than the corpus, and a
# tiny graph spread over spark.sql.shuffle.partitions tasks pays ~32
# empty-task launches per stage per round.  One aggregate up front sizes
# the loop instead (the same runtime-statistics move AQE makes).
_CLUSTER_ROWS_PER_PARTITION = 500_000


def cluster_duplicates(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components by min-label propagation with pointer doubling, so a
    chain a~b, b~c lands a, b, c in one cluster with the min doc id as
    the canonical survivor. Returns (doc_id, cluster_id) for every doc
    that appears in a pair.

    Iterative-but-distributed, O(log diameter) rounds: each round takes
    the min over (own label, neighbours' labels, label-of-own-label) —
    the last term is pointer jumping, which halves chain depth per
    round, so even a pathological 1M-link chain converges in ~20
    rounds. Every round is joins + one aggregate over the PAIR graph
    (small after LSH — never the corpus); the loop partition count is
    sized from the edge count (single-task for kilobyte graphs,
    distributed for billion-edge ones), and the loop stops at the
    fixpoint — ``max_iterations`` is only a backstop."""
    # localCheckpoint (eager) truncates lineage: without it every round's
    # logical plan embeds THREE copies of the previous round's plan (the
    # neighbour join, the self join, and the pointer-jump join), so
    # driver-side analysis grows 3^rounds — measured 2 s -> 8 s between
    # consecutive rounds on a 278-edge graph. With checkpoints each
    # round plans against a flat LogicalRDD and driver time is O(1).
    raw = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    n_edges = raw.count()  # free: reads the checkpointed partitions
    spark = pairs.sparkSession
    max_parts = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(max_parts, n_edges // _CLUSTER_ROWS_PER_PARTITION + 1))
    # narrow the checkpointed edges with coalesce — NOT a keyed
    # repartition + second checkpoint: the loop's joins are
    # broadcast/tiny for post-LSH graphs (and AQE re-plans big ones),
    # so pre-partitioning by key bought nothing while the extra
    # materialization cost ~1s/query (A/B at sf0.1: 3.0s -> 2.1s).
    # coalesce only ever narrows; when the graph is big enough that
    # n_parts equals the cluster parallelism it is a no-op.
    edges = raw.coalesce(n_parts)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .coalesce(n_parts)
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(F.col("doc_id").alias("dst"), F.col("cluster_id").alias("_nl")),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("_nl").alias("_nmin"))
        )
        step = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("cluster_id").alias("_old"),
            F.least(F.col("cluster_id"), F.coalesce("_nmin", F.col("cluster_id"))).alias("_mid"),
        )
        # pointer doubling: chase one extra hop through the current
        # label table (label-of-label); labels are always vertex ids,
        # so the lookup is total — left join only for planner freedom.
        parent = labels.select(
            F.col("doc_id").alias("_mid"), F.col("cluster_id").alias("_pl")
        )
        updated = (
            step.join(parent, "_mid", "left")
            .select(
                "doc_id",
                "_old",
                F.least(F.col("_mid"), F.coalesce("_pl", F.col("_mid"))).alias("cluster_id"),
            )
            .coalesce(n_parts)
            .localCheckpoint()
        )
        changed = updated.filter(F.col("cluster_id") != F.col("_old")).limit(1).count()
        labels = updated.select("doc_id", "cluster_id")
        if changed == 0:
            break
    return labels


def survivors_from_pairs(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one document per duplicate cluster (the min id) plus every
    document that appears in no pair."""
    clusters = cluster_duplicates(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# blocked exact n-gram Jaccard (small-block baseline)
# ---------------------------------------------------------------------------


def blocked_shingle_sets(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-doc distinct k-shingle hash sets with the block key —
    the shared input of ``ngram_jaccard_pairs`` / ``containment_pairs``.

    Factored out so callers can build it ONCE and localCheckpoint it
    (the production shape: a shingle-set table written at ingest).
    Without that, each pair query computes the regex+md5 shingling
    twice (both self-join branches), and — worse — Catalyst's filter
    pushdown clones the whole shingle expression into per-scan
    IsNotNull/size predicates, and the un-sized exploded build side can
    be picked for a BroadcastHashJoin (measured r11: 6-16 s swings at
    sf0.1 from exactly that)."""
    norm = normalize_text(F.col(text_col))
    return docs.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        F.array_distinct(F.transform(word_shingles(words(norm), k), shingle_hash)).alias("_set"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    jaccard_num: int = 3,
    jaccard_den: int = 10,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard *within a block* (default: language).
    Quadratic in block size by construction — this is the correctness
    baseline for MinHash-LSH, usable when blocks are bounded (e.g.
    per-source batches); at open-corpus scale use minhash_dedup_pairs.

    ``sets``: optionally a precomputed (ideally checkpointed)
    ``shingle_sets`` table — result-identical, shingles once."""
    if jaccard_num <= 0:
        raise ValueError("threshold must be positive: zero-overlap pairs are never emitted")
    if sets is None:
        sets = blocked_shingle_sets(docs, block_col, text_col, id_col, k)
    # inverted-index formulation: explode distinct shingle hashes and
    # count co-occurrences per pair — cost is sum over shingles of
    # df(shingle)^2 within a block, not |block|^2 array intersections,
    # and pairs sharing no shingle are never materialized at all.
    ex = sets.select(
        "_blk",
        F.col(id_col).alias("_id"),
        F.size("_set").cast("long").alias("_sz"),
        F.explode("_set").alias("_h"),
    )
    a = ex.select("_blk", "_h", F.col("_id").alias("doc_a"), F.col("_sz").alias("_sza"))
    b = ex.select("_blk", "_h", F.col("_id").alias("doc_b"), F.col("_sz").alias("_szb"))
    inter = (
        a.join(b, on=["_blk", "_h"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "_sza", "_szb")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    return inter.select(
        "doc_a",
        "doc_b",
        "inter_size",
        (F.col("_sza") + F.col("_szb") - F.col("inter_size")).alias("union_size"),
    ).filter(F.col("inter_size") * F.lit(jaccard_den) >= F.col("union_size") * F.lit(jaccard_num))


def containment_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    cont_num: int = 4,
    cont_den: int = 5,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs (within a block).

    Jaccard (``ngram_jaccard_pairs``) misses the subset-copy case: a
    short document quoted wholesale inside a much longer one has tiny
    Jaccard but containment ~1. Containment C(A in B) = |A ∩ B| / |A|
    is the standard fix (Broder 1997 "On the resemblance and
    containment of documents"; the CCNet/The-Stack pipelines dedup on
    it). Emits every unordered pair where EITHER side's containment
    meets cont_num/cont_den, with exact integer evidence and per-side
    flags — thresholded by integer cross-multiplication (CLAUDE.md
    float policy), never a ratio.

    Same inverted-index shape (and therefore the same Σ df(shingle)^2
    cost bound and skew story) as ``ngram_jaccard_pairs``; only the
    final filter differs. At open-corpus scale the block column is the
    LSH band bucket rather than the language.
    """
    if cont_num <= 0:
        raise ValueError("threshold must be positive: zero-overlap pairs are never emitted")
    if sets is None:
        sets = blocked_shingle_sets(docs, block_col, text_col, id_col, k)
    ex = sets.select(
        "_blk",
        F.col(id_col).alias("_id"),
        F.size("_set").cast("long").alias("_sz"),
        F.explode("_set").alias("_h"),
    )
    a = ex.select("_blk", "_h", F.col("_id").alias("doc_a"), F.col("_sz").alias("_sza"))
    b = ex.select("_blk", "_h", F.col("_id").alias("doc_b"), F.col("_sz").alias("_szb"))
    inter = (
        a.join(b, on=["_blk", "_h"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "_sza", "_szb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_size"))
    )
    cont_a = F.col("inter_size") * F.lit(cont_den) >= F.col("_sza") * F.lit(cont_num)
    cont_b = F.col("inter_size") * F.lit(cont_den) >= F.col("_szb") * F.lit(cont_num)
    return inter.select(
        "doc_a",
        "doc_b",
        "inter_size",
        F.col("_sza").alias("size_a"),
        F.col("_szb").alias("size_b"),
        cont_a.cast("long").alias("contained_a"),
        cont_b.cast("long").alias("contained_b"),
    ).filter((F.col("contained_a") + F.col("contained_b")) > 0)


def boilerplate_scrub(
    docs: DataFrame,
    seg_words: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate-segment removal (the CCNet /
    RefinedWeb "duplicated line" scrub, with fixed ``seg_words``-word
    segments standing in for lines — the corpus has no newline
    structure): a segment whose exact text occurs in >= ``min_docs``
    distinct documents is boilerplate (headers, footers, injected
    templates) and is removed; the document is reassembled from the
    surviving segments in order.

    Output per document: ``(doc_id, n_segments, n_removed,
    clean_n_chars, clean_fp)`` — counts as exact longs, the cleaned
    text carried as its length + md5 fingerprint so the interface stays
    scale- and engine-stable.

    Shape: segment explode -> distinct(doc, seg) -> one hash aggregate
    for document frequency -> join back -> one grouped aggregate that
    rebuilds the document with an ordered ``collect_list`` (bounded by
    the document's own segment count — never cross-document state).
    Two shuffles total: the df aggregate/join keys on the segment text
    (boilerplate keys are hot by definition — AQE skew-join splits
    them; at extreme scale hash the segment first so only a long
    crosses the wire), the rebuild keys on doc_id.
    """
    if seg_words < 1 or min_docs < 1:
        raise ValueError(f"seg_words and min_docs must be >= 1, got {seg_words}/{min_docs}")
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), words(norm).alias("_ws"))
    n_segs = F.greatest(F.lit(1), F.expr(f"(size(_ws) + {seg_words - 1}) div {seg_words}"))
    segs = d.select(
        "doc_id",
        F.col("_ws"),
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice("_ws", (F.col("seg_idx") * seg_words + 1).cast("int"), seg_words), " "
        ).alias("seg_text"),
    )
    dfx = (
        segs.select("doc_id", "seg_text")
        .distinct()
        .groupBy("seg_text")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    keep = F.col("_df") < F.lit(int(min_docs))
    rebuilt = (
        segs.join(dfx, on="seg_text", how="inner")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(keep, F.lit(0)).otherwise(F.lit(1))).cast("long").alias("n_removed"),
            F.array_sort(
                F.collect_list(F.when(keep, F.struct("seg_idx", "seg_text")))
            ).alias("_kept"),
        )
    )
    clean = F.array_join(F.transform("_kept", lambda s: s["seg_text"]), " ")
    return rebuilt.select(
        "doc_id",
        "n_segments",
        "n_removed",
        F.length(clean).cast("long").alias("clean_n_chars"),
        F.md5(clean).alias("clean_fp"),
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingest exact dedup: which documents of a NEW batch
    survive against an EXISTING corpus. Two stages: (a) within-batch
    first-wins by normalized-content hash (min id per hash group), then
    (b) a left-anti join against the corpus's distinct content hashes.
    Returns ``(doc_id, content_hash)`` of the survivors.

    This is the steady-state shape of a production dedup service — the
    full corpus is never re-deduped per ingest; only batch hashes
    shuffle (keyed by md5, perfectly uniform), and the corpus side is
    a pre-distinct hash table that at scale lives as a bucketed table
    so the anti join is shuffle-free on the corpus side. Cost per
    ingest: O(|batch| + matched corpus partitions), independent of
    corpus size.
    """
    bh = batch.select(
        F.col(id_col).alias("doc_id"), content_hash(F.col(text_col)).alias("content_hash")
    )
    first_wins = bh.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    corpus_hashes = corpus.select(content_hash(F.col(text_col)).alias("content_hash")).distinct()
    return first_wins.join(corpus_hashes, on="content_hash", how="left_anti").select(
        "doc_id", "content_hash"
    )


def document_bands(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(id, band, key) LSH band rows for a document set — the staged
    ingest-side artifact of ``incremental_neardup_pairs``: in
    production this is written ONCE as a table bucketed on (band, key)
    and every later batch joins against it without re-shingling the
    corpus."""
    norm = normalize_text(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
    )
    sigs = minhash_signatures(exploded, id_col, "shingle", num_hashes)
    return lsh_bands(sigs, id_col, bands, rows_per_band)


def incremental_neardup_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    jaccard_num: int = 1,
    jaccard_den: int = 2,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate SEARCH of a new batch against an existing corpus
    — the ingest-time twin of ``minhash_dedup_pairs``: LSH bands are
    joined batch x corpus ONLY (never batch x batch or corpus x
    corpus), candidates are verified with exact Jaccard, and pairs with
    J >= jaccard_num/jaccard_den are returned as
    ``(doc_a = corpus id, doc_b = batch id, inter_size, union_size)``.

    This is the steady-state production shape: the corpus side's
    signatures/bands/shingle-sets are computed once at ingest and live
    as bucketed tables keyed on (band, key), so each new batch pays
    O(|batch| x signature cost) plus a join that touches only the
    band buckets the batch actually hits — per-ingest cost independent
    of corpus size. Pass the staged corpus bands via ``corpus_bands``
    (a bucketed table in production, a per-session localCheckpoint in
    the bench — VERDICT r05 perf #1); when omitted they are derived
    inline from ``corpus``, identical math either way.
    """
    b = document_bands(batch, text_col, id_col, k, num_hashes, bands, rows_per_band).select(
        "band", "key", F.col(id_col).alias("doc_b")
    )
    c = (
        corpus_bands
        if corpus_bands is not None
        else document_bands(corpus, text_col, id_col, k, num_hashes, bands, rows_per_band)
    ).select("band", "key", F.col(id_col).alias("doc_a"))
    cands = (
        c.join(b, on=["band", "key"], how="inner").select("doc_a", "doc_b").distinct().localCheckpoint()
    )
    # verify only the touched documents on each side (same candidate
    # semi-filter as minhash_dedup_pairs — the corpus side especially
    # must never be re-shingled wholesale at ingest time)
    ids_a = cands.select(F.col("doc_a").alias(id_col)).distinct()
    ids_b = cands.select(F.col("doc_b").alias(id_col)).distinct()
    sa = shingle_sets(corpus.join(ids_a, id_col, "left_semi"), text_col, id_col, k).select(
        F.col(id_col).alias("doc_a"), F.col("shingle_set").alias("_sa")
    )
    sb = shingle_sets(batch.join(ids_b, id_col, "left_semi"), text_col, id_col, k).select(
        F.col(id_col).alias("doc_b"), F.col("shingle_set").alias("_sb")
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    scored = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter_size"),
            (F.size("_sa").cast("long") + F.size("_sb").cast("long") - inter).alias("union_size"),
        )
    )
    return scored.filter(
        F.col("inter_size") * F.lit(jaccard_den) >= F.col("union_size") * F.lit(jaccard_num)
    )


def duplicate_ngram_coverage(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate n-gram coverage (the RefinedWeb /
    Dolma "duplicate n-gram fraction" quality signal): per document,
    how many of its word-``k``-gram instances use an n-gram that
    occurs in >= ``min_docs`` distinct documents. Output
    ``(doc_id, n_shingles, n_dup)`` as exact longs — callers threshold
    the ratio by integer cross-multiplication (float policy).

    Shape: explode shingles -> per-(doc, shingle) multiplicity (one
    hash aggregate, map-side combinable) -> document frequency as
    ``count() over (partition by sh)`` -> re-aggregate per doc. The
    window (instead of a dfx self-join) keeps ONE lineage: a join
    would recompute the whole explode pipeline for both branches
    (measured: 12 scans / 10 exchanges vs 4 exchanges this way), and a
    frameless count-over needs no sort. This is the inverted-index
    pattern (cost sum(df), never pairs²).

    100-TB: the three shuffles key on (doc, shingle), shingle, doc —
    all high-cardinality and unskewed (stopword-only shingles are
    k-words long, so no single key dominates the way unigrams would);
    longs, not strings, cross the wire (shingle_hash).
    """
    norm = normalize_text(F.col(text_col))
    sh = word_shingles(words(norm), k)
    inst = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.transform(sh, shingle_hash)).alias("sh"),
        )
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("sh"))
    return (
        inst.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") >= F.lit(int(min_docs)), F.col("m")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup"),
        )
    )


def cross_source_dup_matrix(docs: DataFrame, prefix_words: int = 5) -> DataFrame:
    """Source-pair duplication matrix over the OPENING-PREFIX
    fingerprint: md5 of the first ``prefix_words`` normalized words.
    Documents sharing an opening are template/syndication suspects —
    the corpus-governance view (which source is re-publishing which)
    that decides dedup ORDER and licensing priority before the global
    collapse runs.  The prefix key (not the full content md5) is
    deliberate: it catches re-publications whose tails diverge, the
    common syndication shape exact dedup misses.

    Output: (source_a, source_b, shared_contents, contents_a,
    contents_b).  Scale: distinct (source, prefix-md5) first (the
    same shuffle exact dedup pays), then a fingerprint-keyed
    self-join — per-fingerprint fanout bounded by |sources|^2, never
    a source cross product over rows.
    """
    sc_ = docs.select(
        "source",
        F.md5(
            F.concat_ws(
                " ", F.slice(words(normalize_text(F.col("text"))), 1, prefix_words)
            )
        ).alias("_ch"),
    ).distinct()
    sizes = sc_.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    a = sc_.select(F.col("source").alias("source_a"), "_ch")
    b = sc_.select(F.col("source").alias("source_b"), "_ch")
    pairs = (
        a.join(b, "_ch")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_contents"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("_n").alias("contents_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("_n").alias("contents_b"))
    return pairs.join(F.broadcast(sa), "source_a").join(F.broadcast(sb), "source_b").select(
        "source_a", "source_b", "shared_contents", "contents_a", "contents_b"
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Survivorship policy over near-dup clusters: for every clustered
    document, WHICH copy survives — the curation step after
    cluster_duplicates answers "what is duplicated".  Survivor = the
    longest raw text, ties to the smallest doc_id (prefer the fullest
    copy; the min-id cluster label is a graph artifact, not a policy).

    Output: (doc_id, cluster_id, survivor_id, is_survivor, n_chars)
    for every doc that appears in a near-dup pair.

    Scale: rides the LSH pair graph (never the corpus); the ranking is
    one window over the cluster grain, bounded by cluster sizes.
    ``pairs``/``clusters`` may be precomputed (the production shape:
    the pair store and its connected-components table are maintained
    once at ingest and every downstream policy reads them, never
    re-shingling the corpus).
    """
    if clusters is None:
        clusters = cluster_duplicates(
            minhash_dedup_pairs(docs) if pairs is None else pairs
        )
    lens = docs.select("doc_id", F.length("text").cast("long").alias("n_chars"))
    j = clusters.join(lens, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    surv = (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("cluster_id", F.col("doc_id").alias("survivor_id"))
    )
    return j.join(surv, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "survivor_id",
        (F.col("doc_id") == F.col("survivor_id")).cast("long").alias("is_survivor"),
        "n_chars",
    )


def minhash_accuracy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    bands_df: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """MinHash estimator calibration audit: for every LSH candidate
    pair, how many of the ``num_hashes`` signature positions agree
    (the MinHash Jaccard estimate, numerator of est/12) vs the EXACT
    intersection/union — bucketed by the estimate so the readout is
    "at estimate level e, what is the true Jaccard mass".  The audit
    that says whether the banded-LSH dedup can be trusted at the
    chosen (bands, rows) operating point, with zero floats.

    Output: (est_matches, n_pairs, sum_inter, sum_union).

    Scale: identical candidate pipeline to minhash_dedup_pairs
    (banded LSH, checkpointed candidates, left-semi-pruned exact
    verify); the signature re-join is two hash joins on doc id; the
    output is bounded by num_hashes + 1 rows.

    ``bands_df``: optionally the precomputed (ideally checkpointed)
    ``lsh_bands`` table — bit-identical candidates (md5 banding is a
    deterministic per-doc function), skips the corpus-wide
    shingle+signature+band build.  ``sets``: optionally a precomputed
    ``blocked_shingle_sets``-shaped table with (id, _set) — identical
    distinct-shingle arrays, skips the candidate-doc re-shingle.
    r12: the signature re-derivation for est_matches is left-semi
    PRUNED to candidate docs first (the same prune the verify stage
    has always used) — the full-corpus signature aggregate only ever
    fed rows the candidate join kept.
    """
    norm = normalize_text(F.col(text_col))
    if bands_df is None:
        exploded = docs.select(
            F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
        )
        bands_df = lsh_bands(
            minhash_signatures(exploded, id_col, "shingle", num_hashes),
            id_col,
            bands,
            rows_per_band,
        )
    cands = candidate_pairs(bands_df, id_col).localCheckpoint()
    ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .unionByName(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    cand_docs = docs.join(ids, id_col, "left_semi")
    if sets is None:
        sets = shingle_sets(cand_docs, text_col, id_col, k)
    else:
        sets = sets.join(ids, id_col, "left_semi").select(
            F.col(id_col), F.col("_set").alias("shingle_set")
        )
    scored = verify_jaccard(cands, sets, id_col)
    sigs = minhash_signatures(
        cand_docs.select(
            F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
        ),
        id_col,
        "shingle",
        num_hashes,
    )
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"h{i}").alias(f"_ha{i}") for i in range(num_hashes)]
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"h{i}").alias(f"_hb{i}") for i in range(num_hashes)]
    )
    est = reduce(
        add,
        [
            (F.col(f"_ha{i}") == F.col(f"_hb{i}")).cast("long")
            for i in range(num_hashes)
        ],
    )
    joined = (
        scored.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(est.alias("est_matches"), "inter_size", "union_size")
    )
    return joined.groupBy("est_matches").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("inter_size").cast("long").alias("sum_inter"),
        F.sum("union_size").cast("long").alias("sum_union"),
    )


def dup_cluster_sizes(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-cluster size histogram — the one-look dedup report
    ("how much of the corpus is pairwise noise vs mass duplication"):
    cluster the near-dup pairs, then count clusters per size.

    Output: (cluster_size, n_clusters, n_docs) with n_docs =
    cluster_size * n_clusters (the doc mass in that size class).

    Scale: rides the pair graph (never the corpus); two bounded
    aggregates after clustering.  ``pairs``/``clusters`` may be
    precomputed (pair-store reuse, see dedup_survivors).
    """
    if clusters is None:
        clusters = cluster_duplicates(
            minhash_dedup_pairs(docs) if pairs is None else pairs
        )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )


def doc_novelty(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Arrival-order novelty per document: the fraction of a doc's
    distinct 5-word shingles that appear for the FIRST time in this
    doc, ownership decided by min(doc_id) over the whole corpus.

    This is the ingestion-time curation signal ("how much of this
    batch is genuinely new text") that complements
    duplicate_ngram_coverage: coverage asks "is this shingle shared by
    anyone", novelty asks "who said it first" — the difference matters
    when deciding which copy of near-identical docs to keep in an
    append-only corpus ordered by crawl time (doc_id here).

    Shape (the duplicate_ngram_coverage pattern, measured fastest):
    explode RAW hashed shingles (no interpreted array_distinct in the
    HOF), dedupe to (doc, shingle) pairs with one map-side-combinable
    hash aggregate, then min(doc_id) as a FRAMELESS WINDOW over the
    shingle partitioning — one exchange on the 60-bit shingle key,
    never doc x doc, ONE lineage (a groupBy+join-back form measured
    6.1 s at sf0.1; this form ~2 s).  novelty_q20 is the half-up
    integer device on nonnegative counts.  Short docs still emit
    their one whole-text shingle (word_shingles contract), so every
    doc gets a row.

    Output: (doc_id, n_shingles, n_novel, novelty_q20).
    """
    from pyspark.sql import Window

    from marketing_attribution_etl_framework__maef_spark.llm.text import (
        normalize_text,
        word_shingles,
        words,
    )

    sh = word_shingles(words(normalize_text(F.col(text_col))), 5)
    ex = (
        docs.select(
            F.col(id_col), F.explode(F.transform(sh, shingle_hash)).alias("s")
        )
        .groupBy(id_col, "s")
        .agg(F.count(F.lit(1)).alias("_m"))  # dedupe to distinct pairs
        .drop("_m")
    )
    return (
        ex.withColumn("_fd", F.min(id_col).over(Window.partitionBy("s")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_fd") == F.col(id_col), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            F.expr(
                "(2 * n_novel * 1048576 + n_shingles) div (2 * n_shingles)"
            )
            .cast("long")
            .alias("novelty_q20"),
        )
    )


def cdc_doc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 3,
    modulus: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-document CDC chunk table: (doc_id, source, chunk_md5)
    rows, one per chunk of every document — the shared kernel under
    cdc_chunk_stats (per-source dedup ratio), cdc_cross_source
    (contamination matrix) and the streaming chunk-store maintenance
    twin (streaming/incremental.py IncrementalChunkStore).  Boundary
    device documented on cdc_chunk_stats; all per-doc work is
    HOF-local, the only explode is the final chunk unnest.
    """
    from marketing_attribution_etl_framework__maef_spark.llm.text import (
        normalize_text,
        word_shingles,
        words,
    )

    ws = words(normalize_text(F.col(text_col)))
    d = docs.select(F.col(id_col), "source", ws.alias("_ws")).withColumn(
        "_n", F.size("_ws")
    )
    # w-grams STARTING at i (1-based i in 1.._n-w+1) end at i+w-1; keep
    # ends strictly before _n.  Short docs (<w words) yield the single
    # whole-text shingle whose end index w-1+1-1 clamps out -> no cuts.
    sh = word_shingles(F.col("_ws"), w)
    d = d.withColumn(
        "_cuts",
        F.filter(
            F.transform(
                sh,
                lambda s, i: F.when(
                    (shingle_hash(s) % modulus == 0) & (i + w < F.col("_n")),
                    i + w,  # 0-based start i covers 1-based words i+1..i+w
                ).otherwise(F.lit(None)),
            ),
            lambda x: x.isNotNull(),
        ),
    ).withColumn(
        "_bounds",
        F.concat(F.array(F.lit(0)), F.col("_cuts"), F.array(F.col("_n"))),
    )
    return d.select(
        F.col(id_col),
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_bounds") - 1),
                lambda j: F.struct(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.slice(
                                F.col("_ws"),
                                F.get("_bounds", j - 1) + 1,
                                F.get("_bounds", j) - F.get("_bounds", j - 1),
                            ),
                        )
                    ).alias("chunk_md5"),
                    F.length(
                        F.concat_ws(
                            " ",
                            F.slice(
                                F.col("_ws"),
                                F.get("_bounds", j - 1) + 1,
                                F.get("_bounds", j) - F.get("_bounds", j - 1),
                            ),
                        )
                    )
                    .cast("long")
                    .alias("chunk_len"),
                ),
            )
        ).alias("_c"),
    ).select(
        F.col(id_col),
        "source",
        F.col("_c.chunk_md5").alias("chunk_md5"),
        F.col("_c.chunk_len").alias("chunk_len"),
    )


def cdc_chunk_table(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 3,
    modulus: int = 8,
) -> DataFrame:
    """(source, chunk_md5) projection of cdc_doc_chunks — the original
    shared kernel shape; Catalyst prunes the doc id."""
    return cdc_doc_chunks(docs, text_col=text_col, w=w, modulus=modulus).select(
        "source", "chunk_md5"
    )


def cdc_cross_source(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 3,
    modulus: int = 8,
) -> DataFrame:
    """Chunk-level cross-source contamination matrix: for every
    unordered source pair (a < b), how many DISTINCT CDC chunks they
    share — the shift-proof upgrade of the prefix-based
    cross_source_dup_matrix (a doc syndicated with a new byline still
    collides chunk-for-chunk past the first boundary).

    Shape: the chunk store collapses to distinct (source, chunk) pairs
    (map-side combinable), then an inverted-index self-join on
    chunk_md5 with a < b — cost sum over chunks of df², where df is a
    chunk's source count (bounded by |sources|), never corpus².

    Output: (source_a, source_b, shared_chunks).
    """
    pairs = cdc_chunk_table(docs, text_col=text_col, w=w, modulus=modulus).distinct()
    a = pairs.select(F.col("source").alias("source_a"), "chunk_md5")
    b = pairs.select(F.col("source").alias("source_b"), "chunk_md5")
    return (
        a.join(b, "chunk_md5")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_chunks"))
    )


def cdc_chunk_stats(
    docs: DataFrame,
    text_col: str = "text",
    w: int = 3,
    modulus: int = 8,
) -> DataFrame:
    """Content-defined chunking (CDC) dedup report per source: split
    every document at positions where the rolling w-word window's
    60-bit hash is ~ 0 (mod modulus), hash each chunk, and report the
    chunk-level duplication per source.

    CDC is THE dedup primitive fixed-width blocking misses: because
    boundaries are functions of local CONTENT, an insertion near a
    doc's head shifts no downstream boundary, so shared tails still
    dedup — the trick rsync/LBFS-style storage dedup and training-data
    near-dup both lean on.  Word grain keeps the whole device in exact
    engine-portable integers (the md5 shingle_hash), no byte-level
    Rabin state.

    Boundary rule: cut AFTER word j (1-based) iff the w-gram ENDING at
    j hashes to 0 mod `modulus` and j < n_words — the last word never
    opens an empty chunk; expected chunk length = `modulus` words.
    Chunks are rebuilt with shifted-slice bounds arithmetic (array
    subscripts stay Spark-side; the oracle mirrors with 1-based list
    ops), hashed with md5, and deduped corpus-wide WITHIN source.

    All per-doc work is HOF-local (no explode until the final chunk
    unnest); the corpus-wide distinct is one hash aggregate on the
    chunk hash — the 100-TB shape (chunk store keyed by content hash).

    Output: (source, n_chunks, n_distinct_chunks, dup_chunk_ratio_q20)
    where dup ratio = 1 - distinct/total in q20.
    """
    chunks = cdc_chunk_table(docs, text_col=text_col, w=w, modulus=modulus)
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("chunk_md5").cast("long").alias("n_distinct_chunks"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct_chunks",
            F.expr(
                "(2 * (n_chunks - n_distinct_chunks) * 1048576 + n_chunks)"
                " div (2 * n_chunks)"
            )
            .cast("long")
            .alias("dup_chunk_ratio_q20"),
        )
    )


def simhash_hamming_histogram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    bands: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """SimHash operating-point audit — the L220 calibration twin for
    L11: the Hamming-distance histogram of ALL banded candidate
    pairs (no threshold), answering "at the chosen banding, what
    distance mass does the verify stage actually see" — the curve
    that says whether max_hamming=6 cuts signal or noise.

    Candidates still come only from band-bucket collisions (never
    all-pairs; pairs beyond the pigeonhole reach of the banding are
    invisible by design and the histogram is explicitly the CANDIDATE
    distance distribution).  Pass ``candidates`` to ride a staged
    simhash_candidates table shared with the L11 cut (the
    _minhash_pairs session-store pattern).  Output: (hamming,
    n_pairs), bounded at bits+1 rows; one bounded aggregate over the
    pair table.
    """
    if candidates is None:
        candidates = simhash_candidates(
            simhash(docs, text_col, id_col, bits), id_col, bands
        )
    return candidates.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def dup_degree_histogram(pairs: DataFrame) -> DataFrame:
    """Near-dup pair-graph degree histogram: how many documents have
    exactly d verified near-dup neighbors — the graph-shape complement
    of the cluster-SIZE histogram (L223): a heavy tail here means hub
    documents (boilerplate cores) that survivorship policies must
    handle before clustering, which cluster sizes alone cannot show.

    Rides the (staged) pair table only — degree = count per endpoint
    over the symmetrized pairs, then one bounded aggregate.  Output:
    (degree, n_docs).
    """
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


THRESHOLD_SWEEP = ((1, 2), (3, 5), (7, 10), (4, 5), (9, 10))


def dedup_threshold_sweep(pairs: DataFrame) -> DataFrame:
    """Verified-pair counts at a ladder of Jaccard thresholds — the
    operating-point sweep that says where the near-dup knee sits
    before anyone commits to a threshold: every pair in the (staged)
    verified table carries exact (inter, union) integers, so each
    ladder step is one integer cross-multiplication and the whole
    sweep is a single bounded aggregate over the pair store (never
    re-shingles, never re-verifies).

    The ladder starts at the store's own build threshold (1/2) —
    counts below it are unknowable from the store by construction.
    Output: (threshold_num, threshold_den, n_pairs).
    """
    aggs = [
        F.sum(
            (F.col("inter_size") * F.lit(den) >= F.col("union_size") * F.lit(num)).cast(
                "long"
            )
        ).alias(f"_t{num}_{den}")
        for num, den in THRESHOLD_SWEEP
    ]
    one = pairs.agg(*aggs)
    parts = [
        one.select(
            F.lit(num).cast("long").alias("threshold_num"),
            F.lit(den).cast("long").alias("threshold_den"),
            F.coalesce(F.col(f"_t{num}_{den}"), F.lit(0)).cast("long").alias("n_pairs"),
        )
        for num, den in THRESHOLD_SWEEP
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def window_dedup_audit(
    docs: DataFrame,
    window: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bounded-memory dedup audit: what fraction of the full-store
    exact duplicates would a TRAILING-WINDOW dedup (state = the last
    ``window`` arrivals, the bounded-state shape a streaming engine
    holds when the full corpus store is too big) still catch?

    Because the NEAREST previous occurrence decides both policies —
    any earlier occurrence implies a nearest one — one LAG over the
    (content_hash, arrival-id) order answers both: dup under the full
    store iff a previous occurrence exists; dup under the window iff
    additionally id - prev_id <= window (arrival distance).  Exact
    integers; the recall is the half-up q20 of caught/total with a
    zero-dup guard.

    Output: 1 row (n_docs, n_dups_full, n_dups_window,
    window_recall_q20).  Scale: one exchange on the content hash.
    """
    h = docs.select(
        F.col(id_col).alias("_id"), content_hash(F.col(text_col)).alias("_h")
    )
    w = Window.partitionBy("_h").orderBy("_id")
    lagged = h.withColumn("_prev", F.lag("_id").over(w))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("_prev").isNotNull().cast("long")).cast("long").alias("n_dups_full"),
        F.sum(
            (F.col("_prev").isNotNull() & (F.col("_id") - F.col("_prev") <= window)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_dups_window"),
    ).select(
        "n_docs",
        "n_dups_full",
        "n_dups_window",
        F.expr(
            "cast(case when n_dups_full = 0 then 0 else"
            " (2 * n_dups_window * 1048576 + n_dups_full)"
            " div (2 * n_dups_full) end as bigint)"
        ).alias("window_recall_q20"),
    )


def lsh_bucket_stats(bands_df: DataFrame) -> DataFrame:
    """LSH band-bucket size histogram — the skew audit behind the
    Σdf² candidate-cost argument: candidate pairs per bucket grow as
    size², so one boilerplate-heavy bucket dominates the self-join;
    this is the readout that says whether the banding needs more rows
    per band (or the corpus a boilerplate scrub) BEFORE the join blows
    up.  One aggregate to (band, key) sizes, one to the histogram.

    Output: (band, bucket_size, n_buckets).
    """
    sizes = bands_df.groupBy("band", "key").agg(
        F.count(F.lit(1)).cast("long").alias("bucket_size")
    )
    return sizes.groupBy("band", "bucket_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets")
    )


def lsh_hot_bucket_terms(
    docs: DataFrame,
    min_size: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """LSH hot-bucket CAUSE analysis — the follow-up the L260 bucket
    size histogram motivates: for every band bucket holding at least
    ``min_size`` documents, WHICH shingle do its members share most
    (and how common is that shingle corpus-wide)?  A hot bucket whose
    top shingle has a huge corpus df is boilerplate-driven — the
    actionable signal that a boilerplate scrub (L48) belongs BEFORE
    the band self-join; a hot bucket whose top shingle is rare is a
    genuine duplicate cluster.

    Shape: bucket sizes are one aggregate over the band table; only
    buckets >= min_size survive (the skew tail, vanishingly few at
    scale), so the member join + per-bucket shingle df touch a bounded
    sliver of the corpus.  The per-bucket argmax is a window
    PARTITIONED by bucket key (never corpus-wide).  Pass ``bands_df``
    to ride a staged band table shared with the cost audit (the
    _minhash_pairs session-store pattern).  Output:
    (band, key, bucket_size, top_shingle, member_df, corpus_df).
    """
    norm = normalize_text(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
    )
    if bands_df is not None:
        bandsdf = bands_df
    else:
        sigs = minhash_signatures(exploded, id_col, "shingle", num_hashes)
        bandsdf = lsh_bands(sigs, id_col, bands, rows_per_band)
    sizes = (
        bandsdf.groupBy("band", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_size"))
        .filter(F.col("bucket_size") >= min_size)
    )
    members = bandsdf.join(sizes, ["band", "key"])
    # prune BEFORE any corpus-wide distinct: only hot-bucket member
    # docs feed the per-bucket shingle grain, so the corpus explode is
    # scanned but never shuffled at the (doc, shingle) grain (the
    # doc-novelty one-lineage rule; unpruned this was 2 corpus-wide
    # distinct shuffles)
    mem_pairs = exploded.join(
        members.select(id_col).distinct(), id_col, "left_semi"
    ).distinct()
    bucket_sh = (
        members.join(mem_pairs, id_col)
        .groupBy("band", "key", "bucket_size", "shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("member_df"))
    )
    w = Window.partitionBy("band", "key").orderBy(
        F.desc("member_df"), F.asc("shingle")
    )
    top = (
        bucket_sh.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .localCheckpoint()  # <= |hot buckets| rows; read twice below
    )
    # corpus df only for the few winning shingles: broadcast-semi the
    # explode down to them before the countDistinct aggregate
    dfx = (
        exploded.join(
            F.broadcast(top.select("shingle").distinct()), "shingle", "left_semi"
        )
        .groupBy("shingle")
        .agg(F.countDistinct(id_col).cast("long").alias("corpus_df"))
    )
    return top.join(dfx, "shingle").select(
        "band",
        "key",
        "bucket_size",
        F.col("shingle").alias("top_shingle"),
        "member_df",
        "corpus_df",
    )


def template_docs(
    docs: DataFrame,
    min_df: int = 2,
    pct_num: int = 4,
    pct_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Templated-document screen — the boilerplate PRE-FILTER the
    hot-bucket audit (lsh_hot_bucket_terms) motivates: a document
    whose shingles are at least pct_num/pct_den shared (corpus df >=
    ``min_df``) is template/boilerplate-shaped, and removing or
    scrubbing it BEFORE LSH banding is what deflates the hot buckets.

    Exact integers end to end: per-doc distinct-shingle count, count
    of those with df >= min_df, flag by integer cross-multiplication
    (n_boilerplate * pct_den >= pct_num * n_shingles).  Shape: one
    distinct (doc, shingle) table, one df aggregate, one join back —
    the same inverted-index grain every dedup op pays, never
    quadratic.  Output: (doc_id, n_shingles, n_boilerplate,
    is_template).
    """
    norm = normalize_text(F.col(text_col))
    pairs = docs.select(
        F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
    ).distinct()
    dfx = pairs.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    return (
        pairs.join(dfx, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_df") >= min_df, 1).otherwise(0))
            .cast("long")
            .alias("n_boilerplate"),
        )
        .withColumn(
            "is_template",
            F.col("n_boilerplate") * pct_den >= F.lit(pct_num) * F.col("n_shingles"),
        )
    )


def dedup_roi(
    docs: DataFrame,
    clusters: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    modulus: int = 8,
) -> DataFrame:
    """Dedup ROI composition — the curation-story closer (VERDICT r07
    #6): how much of the corpus does each dedup family actually
    remove, in comparable units, so a data buyer can see where the
    bytes go.  Families are SEQUENTIAL where they overlap:

    - ``corpus``:     baseline (n_docs, total normalized chars);
    - ``exact``:      non-canonical docs of content-hash groups
                      (window-min canonical, the curate device);
    - ``near_dup``:   near-dup cluster non-survivors NOT already
                      removed by exact — the marginal bytes LSH buys
                      on top of hashing;
    - ``cdc_chunks``: duplicate CDC chunk occurrences beyond each
                      chunk's first (sub-document savings the
                      doc-level families cannot see).

    chars_removed counts NORMALIZED text characters (codepoints — the
    one length both engines agree on), n_units is docs for the doc
    families and chunk occurrences for cdc.  Each family is one
    bounded aggregate; the near-dup family rides the staged cluster
    table (pass `_dup_clusters`), so nothing here re-runs LSH.
    Output: (family, n_units, chars_removed), 4 rows.
    """
    if "source" not in docs.columns:
        # cdc_doc_chunks carries a source column; ROI does not use it
        docs = docs.withColumn("source", F.lit(""))
    norm = normalize_text(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.length(norm).cast("long").alias("n_chars"),
        content_hash(F.col(text_col)).alias("_h"),
    )
    corpus = base.agg(
        F.lit("corpus").alias("family"),
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("n_chars").cast("long").alias("chars_removed"),
    )
    wh = Window.partitionBy("_h")
    exact_removed = base.withColumn("_keep", F.min(id_col).over(wh)).filter(
        F.col(id_col) != F.col("_keep")
    )
    exact = exact_removed.agg(
        F.lit("exact").alias("family"),
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars_removed"),
    )
    near = (
        clusters.filter(F.col(id_col) != F.col("cluster_id"))
        .join(exact_removed.select(id_col), id_col, "left_anti")
        .join(base.select(id_col, "n_chars"), id_col)
        .agg(
            F.lit("near_dup").alias("family"),
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars_removed"),
        )
    )
    chunks = cdc_doc_chunks(docs, text_col=text_col, w=w, modulus=modulus)
    cdc = (
        chunks.groupBy("chunk_md5")
        .agg(
            (F.count(F.lit(1)) - 1).cast("long").alias("_extra"),
            F.min("chunk_len").alias("_len"),
        )
        .agg(
            F.lit("cdc_chunks").alias("family"),
            F.coalesce(F.sum("_extra"), F.lit(0)).cast("long").alias("n_units"),
            F.coalesce(F.sum(F.col("_extra") * F.col("_len")), F.lit(0))
            .cast("long")
            .alias("chars_removed"),
        )
    )
    return corpus.unionByName(exact).unionByName(near).unionByName(cdc)


def lsh_cost_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate-cost audit — the planner's cost model for the L9
    self-join, checked against reality: per band, the candidate pair
    count PREDICTED from bucket sizes (sum over buckets of
    size*(size-1)/2 — computable from the cheap band aggregate alone,
    BEFORE any join), plus an 'all' row whose actual_pairs is the
    distinct cross-band candidate count the join really produces.
    predicted('all') / actual('all') is the band-overlap redundancy —
    how much work multiprobe-style band fusion would save; a predicted
    figure far above budget says re-band or boilerplate-scrub (L266)
    BEFORE running the join at all.

    Exact integers throughout.  Shape: bucket sizes are one aggregate;
    only the single 'all' row pays the self-join (and a production
    planner would SKIP it when predicted already exceeds budget).
    Output: (scope, n_buckets, predicted_pairs, actual_pairs) — per
    band, actual == predicted by construction (within one band every
    bucket pair is distinct); across bands dedup shrinks it.

    Pass ``bands_df`` to ride a staged band table (shared with the
    hot-bucket audit); otherwise the band table is localCheckpoint'd
    here, because THREE consumers read it (per-band sizes twice via
    per_band's two outputs, plus the candidate join) and recomputing
    the signature aggregate per consumer tripled the query (15.5 s ->
    ~5 s at sf0.1).  per_band itself is a bounded table (|bands|
    rows), checkpointed so its two readers don't re-aggregate.
    """
    if bands_df is None:
        norm = normalize_text(F.col(text_col))
        exploded = docs.select(
            F.col(id_col), F.explode(word_shingles(words(norm), k)).alias("shingle")
        )
        bands_df = lsh_bands(
            minhash_signatures(exploded, id_col, "shingle", num_hashes),
            id_col,
            bands,
            rows_per_band,
        ).localCheckpoint()
    bandsdf = bands_df
    sizes = bandsdf.groupBy("band", "key").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_band = sizes.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("predicted_pairs"),
    ).localCheckpoint()
    band_rows = per_band.select(
        F.col("band").cast("string").alias("scope"),
        "n_buckets",
        "predicted_pairs",
        F.col("predicted_pairs").alias("actual_pairs"),
    )
    actual = candidate_pairs(bandsdf, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("actual_pairs")
    )
    all_row = per_band.agg(
        F.lit("all").alias("scope"),
        F.sum("n_buckets").cast("long").alias("n_buckets"),
        F.sum("predicted_pairs").cast("long").alias("predicted_pairs"),
    ).crossJoin(actual)
    return band_rows.unionByName(all_row)


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring SPAN dedup (VERDICT r10 #2 — the last missing
    dedup family): find, per document, every MAXIMAL token span whose
    word ``k``-grams ALL occur in >= ``min_docs`` distinct documents —
    the remove-any-repeated-k-token-span device (the deduplicate-
    text-datasets / ExactSubstr family) that catches long boilerplate
    spans embedded in otherwise-unique documents, the failure mode
    document-grain MinHash/SimHash and line-grain boilerplate_scrub
    both miss.  Output one row per maximal span:
    ``(doc_id, span_start, span_end, span_tokens)`` with 1-based
    inclusive token positions.

    No suffix array is needed: a positional shingle inverted index is
    equivalent for fixed k.  Shape (ONE lineage, no join-back):

    1. posexplode the positional k-shingle hashes -> (doc, pos, sh).
    2. the cross-doc test as ONE frameless window over (partition by
       sh): for the standard ``min_docs=2`` operating point, "occurs
       in >= 2 distinct docs" is exactly ``MIN(doc_id) != MAX(doc_id)``
       — no distinct-count, no per-(sh, doc) sort, no groupBy+join
       back (a dfx self-join would shuffle the exploded lineage
       twice); for ``min_docs > 2`` fall back to first-occurrence
       markers (row_number over (sh, doc)) summed over (sh) — the
       doc_novelty owner-assignment pattern.
    3. keep positions whose shingle clears ``min_docs``, then merge
       consecutive positions into maximal spans with the islands trick
       (pos - row_number() over (doc order by pos) is constant within
       a run); a run [p1..p2] covers tokens [p1, p2+k-1].

    100-TB: the heavy instance grain is shuffled ONCE on sh (high
    cardinality, unskewed — k-word shingles do not concentrate the
    way unigrams would); only 60-bit longs cross the wire; the island
    window sees only duplicated positions (foreground-sized), and
    per-doc state is bounded by the doc's own span count.  This is
    the same Sigma(df) inverted-index cost envelope as
    duplicate_ngram_coverage (L32), minus L32's pre-aggregate.
    """
    norm = normalize_text(F.col(text_col))
    sh = word_shingles(words(norm), k)
    inst = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.transform(sh, shingle_hash)).alias("_p0", "sh"),
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "sh")
    w_sh = Window.partitionBy("sh")
    if int(min_docs) == 2:
        dup = (
            inst.withColumn("_lo", F.min("doc_id").over(w_sh))
            .withColumn("_hi", F.max("doc_id").over(w_sh))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("doc_id", "pos")
        )
    else:
        w_first = Window.partitionBy("sh", "doc_id").orderBy("pos")
        dup = (
            inst.withColumn(
                "_first", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
            )
            .withColumn("_n_docs", F.sum("_first").over(w_sh))
            .filter(F.col("_n_docs") >= F.lit(int(min_docs)))
            .select("doc_id", "pos")
        )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("_g", F.col("pos") - F.row_number().over(w_doc))
    return (
        isl.groupBy("doc_id", "_g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias("span_tokens"),
        )
        .drop("_g")
    )


def span_coverage(
    spans: DataFrame,
) -> DataFrame:
    """Per-document roll-up of ``duplicated_spans`` output — the
    remove-or-flag decision grain: ``(doc_id, n_spans, dup_tokens,
    max_span)``.  Maximal spans within a doc are disjoint by
    construction (islands are separated by at least one non-duplicated
    position), so ``dup_tokens`` is an exact count of tokens covered
    by duplicated spans, never double-counted."""
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
        F.max("span_tokens").cast("long").alias("max_span"),
    )


def scrub_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute the span-dedup REMOVAL policy over a ``duplicated_spans``
    table: excise every duplicated span occurrence from every affected
    document (the ExactSubstr remove-all policy — the span table is
    cross-doc by construction, so removing all occurrences leaves no
    repeated >= k-token span in the corpus) and emit the per-doc
    conservation ledger: ``(doc_id, n_tokens_in, covered_tokens,
    n_tokens_out, scrub_md5)`` where ``covered_tokens`` counts token
    positions actually covered (span_end is clipped to the doc for the
    short-doc whole-text edge, so n_tokens_out == n_tokens_in -
    covered_tokens holds exactly) and ``scrub_md5`` pins the rebuilt
    scrubbed text bit for bit — the cross-engine content gate.

    Shape: only affected docs (left-semi against the span store) are
    tokenized; the token grain LEFT-joins the broadcast span table on
    (doc = doc, pos BETWEEN start AND end) — maximal spans are
    disjoint per doc, so the join multiplicity is exactly 1 and no
    pre-dedup is needed; one hash aggregate rebuilds the kept text in
    position order.  100-TB: the span store is foreground-sized
    (duplicated docs only) and broadcasts; the token explode touches
    only affected docs; the single shuffle keys on doc_id."""
    span_docs = spans.select(id_col).distinct()
    norm = normalize_text(F.col(text_col))
    toks = (
        docs.join(F.broadcast(span_docs), id_col, "left_semi")
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(words(norm)).alias("_p0", "w"),
        )
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "w")
    )
    sp = spans.select(
        F.col(id_col).alias("_sd"), "span_start", "span_end"
    )
    cov = toks.join(
        F.broadcast(sp),
        (F.col("doc_id") == F.col("_sd"))
        & (F.col("pos") >= F.col("span_start"))
        & (F.col("pos") <= F.col("span_end")),
        "left",
    ).select("doc_id", "pos", "w", F.col("_sd").isNotNull().alias("_cov"))
    kept_sorted = F.array_sort(
        F.collect_list(F.when(~F.col("_cov"), F.struct("pos", "w")))
    )
    return cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens_in"),
        F.sum(F.when(F.col("_cov"), 1).otherwise(0)).cast("long").alias("covered_tokens"),
        F.sum(F.when(~F.col("_cov"), 1).otherwise(0)).cast("long").alias("n_tokens_out"),
        F.md5(
            F.concat_ws(" ", F.transform(kept_sorted, lambda s: s["w"]))
        ).alias("scrub_md5"),
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_repeats: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WITHIN-document repeated-span screen — the self-repetition
    complement of ``duplicated_spans``: maximal token spans whose every
    word ``k``-gram occurs >= ``min_repeats`` times in the SAME
    document (the long-internal-loop shape degenerate generation and
    scraped pagination both produce; bigram repetition_stats catches
    dense local stutter, this catches long-period repeats).  Same
    positional-shingle + islands machinery; the repeat test is one
    frameless COUNT over (partition by doc, sh) — doc-local, so at
    scale the shuffle keys on (doc, sh) and no cross-doc state exists
    at all.  Output: (doc_id, span_start, span_end, span_tokens)."""
    norm = normalize_text(F.col(text_col))
    sh = word_shingles(words(norm), k)
    inst = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.transform(sh, shingle_hash)).alias("_p0", "sh"),
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "sh")
    w_ds = Window.partitionBy("doc_id", "sh")
    dup = (
        inst.withColumn("_m", F.count(F.lit(1)).over(w_ds))
        .filter(F.col("_m") >= F.lit(int(min_repeats)))
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("_g", F.col("pos") - F.row_number().over(w_doc))
    return (
        isl.groupBy("doc_id", "_g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias("span_tokens"),
        )
        .drop("_g")
    )
