"""Corpus curation: the end-to-end training-set selection pipeline
that the individual LLM-layer operators exist to serve.

``curate_corpus`` chains quality gating (text_stats), language
filtering (language_id), exact dedup (normalized-hash survivors),
near-dup dedup (MinHash-LSH pairs -> cluster survivors), and a
deterministic md5-bucket train/val/test split — the standard
pre-training data shape (quality -> lang -> dedup -> split).

Everything below composes operators that are already individually
oracle-checked, and every stage is a pure column-algebra DataFrame
transform, so the composition itself is oracle-checked too
(``llm_curate`` in ``__spark_entry__``).

Scale: the stages before dedup are per-document (no shuffle beyond
the map-side-combining aggregates inside text_stats/language_id);
dedup shuffles only signatures and candidate pairs (never all-pairs);
the split is a stateless hash. A 100 TB curation run is therefore
bounded by the MinHash pass — one shingle+signature scan plus a
banded bucket join — which is the designed-for shape of llm/dedup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.dedup import (
    exact_dedup_groups,
    minhash_dedup_pairs,
    survivors_from_pairs,
)
from marketing_attribution_etl_framework__maef_spark.llm.dedup import shingle_hash
from marketing_attribution_etl_framework__maef_spark.llm.text import (
    TOKEN_REGEX,
    lang_cols,
    normalize_text,
    word_shingles,
    words,
)


def _md5_bucket(id_c: Column, salt: str) -> Column:
    """Salted md5 bucket in [0, 100) — the one shared hash expression
    behind split assignment and stratified sampling (drift here would
    silently break both stability guarantees and their oracles)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(id_c.cast("string"), F.lit("|" + salt))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )


def split_assign(
    id_c: Column, train_pct: int = 90, val_pct: int = 5, salt: str = "split"
) -> Column:
    """Deterministic train/val/test assignment: md5-derived bucket in
    [0, 100) -> 'train' below train_pct, 'val' below train+val, else
    'test'. Salting the hash keeps the split independent of any other
    md5-keyed derivation of the same id, and the assignment is stable
    under corpus growth (a document's split never changes when other
    documents arrive) — the property random splits lack."""
    bucket = _md5_bucket(id_c, salt)
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


_PACK_BUCKET_STRIDE = 1 << 40


def pack_sequences(
    docs_with_tokens: DataFrame,
    budget_tokens: int = 512,
    max_docs: int = 8,
    bucket_col: str | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Pack documents into training context windows: each pack holds at
    most ``max_docs`` documents and its token total exceeds
    ``budget_tokens`` by at most one document (the standard greedy
    overflow — a document longer than the budget gets its own pack).

    Same two-level distributed formulation as the API chunker
    (operators/chunking.py, which documents the cap proofs):
    s_id groups by cumulative token budget, a row_number sub-split
    enforces the doc cap, and ``bucket_col`` shards the ordering window
    so no single task sorts the corpus — pack ids are offset by a 2^40
    per-bucket stride, distinct but not dense (samplers only need
    distinctness). Distinctness holds while each bucket's cumulative
    clamped token count stays below 2^40 (~1 T tokens) and bucket ids
    below 2^23; shard wider (more buckets) before either bound, or
    emit (bucket, pack) as a composite key."""
    part = [bucket_col] if bucket_col else []
    w = Window.partitionBy(*part).orderBy(id_col)
    cum_before = F.coalesce(
        F.sum(F.greatest(F.col(tokens_col), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    df = docs_with_tokens.withColumn(
        "_s_id", F.floor(cum_before / F.lit(budget_tokens)).cast("long")
    )
    w2 = Window.partitionBy(*part, "_s_id").orderBy(id_col)
    sub = F.floor((F.row_number().over(w2) - 1) / F.lit(max_docs))
    pack = F.col("_s_id") * F.lit(budget_tokens + 1) + sub
    if bucket_col:
        pack = F.col(bucket_col).cast("long") * F.lit(_PACK_BUCKET_STRIDE) + pack
    return df.withColumn("pack_id", pack.cast("long")).drop("_s_id")


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    any word k-shingle with the evaluation set. Returns
    (doc_id, n_shared_shingles) for every contaminated training doc;
    anti-join the result to drop them.

    The standard n-gram-collision test (eval-set leakage check) as an
    inverted-index join: both sides explode to distinct shingle
    hashes, the equi-join touches only colliding hashes, and the
    aggregate counts distinct shared shingles per training doc. The
    eval side is benchmark-sized — at corpus scale it broadcasts, so
    the pass over 100 TB of training text is shuffle-free."""
    def hashes(df: DataFrame, out: str) -> DataFrame:
        norm = normalize_text(F.col(text_col))
        sh = F.array_distinct(F.transform(word_shingles(words(norm), k), shingle_hash))
        return df.select(F.col(id_col).alias(out), F.explode(sh).alias("_h"))

    tr = hashes(train_docs, "doc_id")
    ev = hashes(eval_docs, "_eval_id").select("_h").distinct()
    return (
        tr.join(F.broadcast(ev), on="_h", how="inner")
        .groupBy("doc_id")
        # both sides are pre-distinct, so plain COUNT counts distinct
        # shared shingles without a second distinct aggregate
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_shingles"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    pcts: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its salted
    md5 bucket (0-99) is below the stratum's percentage. Unlike
    ``DataFrame.sample`` this is reproducible across runs, engines and
    partitionings (no RNG, no partition-order dependence), rows keep
    membership when the corpus grows, and raising a stratum's pct only
    ADDS rows (nested samples) — the properties corpus-rebalancing
    pipelines (e.g. up-weighting low-resource languages) need.
    Stateless per-row predicate: no shuffle, fully pushed into the
    scan's filter at any scale."""
    bucket = _md5_bucket(F.col(id_col), salt)
    pct = F.lit(default_pct)
    for value, p in sorted(pcts.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def curate_corpus(
    docs: DataFrame,
    langs: Sequence[str] | None = ("en",),
    train_pct: int = 90,
    val_pct: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_pairs: DataFrame | None = None,
) -> DataFrame:
    """Quality -> language -> exact dedup -> near-dup dedup -> split.
    Returns (doc_id, lang_guess, n_tokens, split) for every surviving
    document. Survivor choice is the canonical min-id rule at both
    dedup stages, so the output set is deterministic.

    ``corpus_pairs`` (optional): a precomputed ``minhash_dedup_pairs``
    table over the WHOLE corpus at the default (k, hashes, bands,
    threshold) operating point.  MinHash signatures, LSH band keys and
    the exact-Jaccard verify are all per-doc / per-pair functions —
    independent of which other docs are in the input — so the pair set
    over any subset S equals the corpus pair set restricted to S x S.
    Curation therefore restricts the staged pairs to the gated
    survivors with two left-semi joins instead of re-shingling them;
    this is the production shape (the near-dup pair store is written
    once at ingest, every downstream policy reads it) and is
    result-identical to the inline computation by the argument above.
    """
    # stats + lang are per-row column algebra over the same scan — one
    # fused projection (doc_profile columns), never self-joins.
    norm = normalize_text(F.col(text_col))
    prof = docs.select(
        F.col(id_col), F.col(text_col), norm.alias("_norm")
    ).select(
        F.col(id_col), F.col(text_col), words(F.col("_norm")).alias("_ws"),
        F.size(F.regexp_extract_all("_norm", F.lit(TOKEN_REGEX), 0)).cast("long").alias("n_tokens"),
    )
    n_words = F.size("_ws").cast("long")
    n_distinct = F.size(F.array_distinct("_ws")).cast("long")
    base = prof.select(
        F.col(id_col),
        F.col(text_col),
        "n_tokens",
        ((n_words >= 5) & (n_distinct * 10 >= n_words * 3)).alias("is_quality"),
        *lang_cols(F.array_distinct(F.col("_ws"))),
    ).filter(F.col("is_quality"))
    if langs:
        base = base.filter(F.col("lang_guess").isin(list(langs)))
    base = base.select(F.col(id_col), F.col(text_col), "n_tokens", "lang_guess")
    # exact-dedup survivor filter as a frameless window MIN over the
    # content hash — ONE lineage, one exchange (CLAUDE.md inverted-
    # index owner pattern; the previous exact_dedup_groups + join-back
    # scanned and shuffled the heavy quality+lang lineage twice:
    # 6.5 s -> measured below with the single-exchange form).  Survivor
    # choice is unchanged: min id per content group.
    from marketing_attribution_etl_framework__maef_spark.llm.dedup import content_hash

    hwin = Window.partitionBy(content_hash(F.col(text_col)))
    # surv feeds three branches (minhash signatures, shingle sets, the
    # final survivor join) and its lineage is the whole
    # stats+lang+dedup pipeline — worth materializing ONCE. Measured at
    # sf0.1: localCheckpoint 6.6 s vs lazy 8.9 s vs .persist() 17.9 s
    # (the persist barrier + AQE cache replanning serializes branch
    # scans; see llm/dedup.py's note). At production scale this is the
    # call site that writes the curated-survivor table.
    surv = (
        base.withColumn("_keep", F.min(id_col).over(hwin))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
        .localCheckpoint()
    )
    if corpus_pairs is None:
        pairs = minhash_dedup_pairs(surv, text_col, id_col)
    else:
        ids = surv.select(id_col)
        pairs = corpus_pairs.join(
            ids.withColumnRenamed(id_col, "doc_a"), "doc_a", "left_semi"
        ).join(ids.withColumnRenamed(id_col, "doc_b"), "doc_b", "left_semi")
    final = survivors_from_pairs(surv, pairs, id_col)
    return final.select(
        F.col(id_col),
        "lang_guess",
        "n_tokens",
        split_assign(F.col(id_col), train_pct, val_pct).alias("split"),
    )


def sketch_length_gate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: tuple[int, int] = (1, 10),
    hi: tuple[int, int] = (9, 10),
    sub_bits: int = 2,
) -> DataFrame:
    """Keep rows whose ``value_col`` log-histogram bucket lies between
    the group's lo- and hi-quantile bucket lower bounds (fractions as
    exact (num, den) integer pairs).

    This is the 100-TB form of a percentile length gate: the exact
    rank-window percentile (operators/quantiles.py percentile_disc)
    shuffles every value; the log-histogram sketch aggregates map-side
    to <= ~64 * 2^sub_bits buckets per group, the bounds table is
    |groups| rows (broadcast), and the gate itself is a per-row bucket
    computation + broadcast join — the corpus is scanned, never
    shuffled on the value. Bucket-space comparison (not raw-value)
    keeps the decision identical to what a merged multi-day sketch
    would decide, and it is exact integer arithmetic on both engines.
    """
    from marketing_attribution_etl_framework__maef_spark.operators import quantiles as qtl

    hist = qtl.log_histogram(df, group_cols, value_col, sub_bits)
    bounds = qtl.histogram_quantile_bounds(
        hist, group_cols, [("_lo_lb", *lo), ("_hi_lb", *hi)]
    ).select(*group_cols, "_lo_lb", "_hi_lb")
    gated = (
        df.withColumn("_blb", qtl.log_bucket_lower(value_col, sub_bits))
        .join(F.broadcast(bounds), on=group_cols)
        .filter((F.col("_blb") >= F.col("_lo_lb")) & (F.col("_blb") <= F.col("_hi_lb")))
    )
    return gated.drop("_blb", "_lo_lb", "_hi_lb")


def curate_corpus_sketch(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    sub_bits: int = 2,
) -> DataFrame:
    """``curate_corpus`` variant whose length gate is the mergeable
    log-histogram sketch instead of exact percentiles: quality ->
    language-ID -> per-language p10..p90 sketch length gate on
    n_tokens -> exact dedup -> split.

    Kept per-language (no lang filter) so the gate demonstrates
    grouped bounds; the near-dup stage is orthogonal to the gate and
    exercised by ``curate_corpus`` — composing both is a filter swap.
    Returns (doc_id, lang_guess, n_tokens, split) for survivors.

    Reference parity: the gate replaces the reference's implicit
    trust in upstream length trimming (src/etl/transform.py has no
    outlier handling); the sketch path is the one a 100-TB curation
    run takes — bounds from yesterday's persisted histograms merge
    with today's by summing counts (log_histogram docstring).
    """
    norm = normalize_text(F.col(text_col))
    prof = docs.select(F.col(id_col), norm.alias("_norm")).select(
        F.col(id_col),
        "_norm",
        words(F.col("_norm")).alias("_ws"),
        F.size(F.regexp_extract_all("_norm", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_tokens"),
    )
    n_words = F.size("_ws").cast("long")
    n_distinct = F.size(F.array_distinct("_ws")).cast("long")
    base = (
        prof.filter((n_words >= 5) & (n_distinct * 10 >= n_words * 3))
        .select(
            F.col(id_col),
            "_norm",
            "n_tokens",
            *lang_cols(F.array_distinct(F.col("_ws"))),
        )
        .select(F.col(id_col), "_norm", "n_tokens", "lang_guess")
    )
    gated = sketch_length_gate(
        base, ["lang_guess"], "n_tokens", lo=(1, 10), hi=(9, 10), sub_bits=sub_bits
    )
    keep = exact_dedup_groups(gated.withColumnRenamed("_norm", text_col), text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return (
        gated.join(keep, on=id_col, how="inner")
        .select(
            F.col(id_col),
            "lang_guess",
            "n_tokens",
            split_assign(F.col(id_col), train_pct, val_pct).alias("split"),
        )
    )


def source_mix_plan(
    docs: DataFrame,
    token_cap: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source mixing ledger for corpus assembly (the bookkeeping
    behind data-mixture recipes a la The Pile / Dolma source tables):
    exact token supply, quality-gated supply, and the capped token
    budget a proportional-with-cap mixer would draw per source.

    All outputs are exact longs; the final mixture weight
    (capped_tokens / sum) is a rational left to the caller — emitting
    it would trip the cross-engine rounding policy for zero analytical
    gain.

    One fused projection + one map-side-combinable aggregate on
    ``source`` (low cardinality): at 100 TB this is a single scan, and
    the only reduce-side state is a handful of counters per source.
    """
    norm = normalize_text(F.col(text_col))
    d = docs.select(
        F.col(source_col).alias("source"),
        norm.alias("_norm"),
        words(norm).alias("_ws"),
    )
    n_words = F.size("_ws").cast("long")
    n_distinct = F.size(F.array_distinct("_ws")).cast("long")
    per_doc = d.select(
        "source",
        F.size(F.regexp_extract_all("_norm", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_tokens"),
        ((n_words >= 5) & (n_distinct * 10 >= n_words * 3)).alias("is_quality"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.col("is_quality").cast("long")).cast("long").alias("n_quality_docs"),
        F.sum(F.when(F.col("is_quality"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("quality_tokens"),
    )
    return agg.withColumn(
        "capped_tokens", F.least(F.col("quality_tokens"), F.lit(int(token_cap)))
    )


def chunk_documents(
    docs: DataFrame,
    window_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-window segmentation of long documents with overlap — the
    long-document splitting step of a pretraining pipeline (every doc
    longer than the context budget becomes overlapping windows;
    whitespace words stand in for tokens, same convention as
    pack_sequences). Output one row per segment:
    ``(doc_id, seg_idx, start_tok, n_seg_tokens, seg_text)``.

    All segment arithmetic is integer-exact: stride = window - overlap,
    n_segs = max(1, ceil((n - overlap) / stride)), start = seg * stride.
    The final segment may be shorter than the window (never empty); a
    doc at or under the window yields itself as one segment.

    Scale: per-row ``sequence`` + ``explode`` — no shuffle at all; the
    fan-out is bounded by n_tokens / stride per document, and only the
    segment slice (not the whole document) leaves the projection.
    """
    if not (0 <= overlap < window_tokens):
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window_tokens}")
    stride = window_tokens - overlap
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), words(norm).alias("_ws"))
    n = F.size("_ws").cast("long")
    n_segs = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(size(_ws) - {overlap} + {stride} - 1) div {stride}").cast("long"),
    )
    seg = d.select(
        "doc_id",
        F.col("_ws"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_segs - 1)).alias("seg_idx"),
    )
    start = F.col("seg_idx") * F.lit(stride)
    piece = F.slice("_ws", (start + 1).cast("int"), window_tokens)
    return seg.select(
        "doc_id",
        "seg_idx",
        start.alias("start_tok"),
        F.size(piece).cast("long").alias("n_seg_tokens"),
        F.array_join(piece, " ").alias("seg_text"),
    )


def mix_sample(
    docs: DataFrame,
    token_cap: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Execute the ``source_mix_plan`` ledger: downsample each source
    to its capped quality-token budget by deterministic hashing —
    a quality doc from source s survives iff

        md5_60(doc_id || '|mix') % quality_tokens(s) < capped_tokens(s)

    i.e. a keep-probability of capped/quality enforced with EXACT
    integer arithmetic (no float rates, no cross-engine rounding), the
    same per-item coin every run. Sources under their cap keep every
    quality doc (modulus test always true). Expected sampled tokens
    per source = its capped budget.

    Shape: the fused per-doc projection from source_mix_plan, the
    ledger aggregate (a handful of rows), one broadcast join back, a
    stateless hash filter. At 100 TB the ledger is still broadcast-
    sized: this is how you execute a mixture recipe in one pass.
    """
    norm = normalize_text(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(F.regexp_extract_all(norm, F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_tokens"),
        words(norm).alias("_ws"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        (
            (F.size("_ws") >= 5)
            & (F.size(F.array_distinct("_ws")) * 10 >= F.size("_ws") * 3)
        ).alias("is_quality"),
    )
    ledger = (
        per_doc.filter("is_quality")
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("quality_tokens"))
        .withColumn(
            "capped_tokens", F.least(F.col("quality_tokens"), F.lit(int(token_cap)))
        )
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (
        per_doc.filter("is_quality")
        .join(F.broadcast(ledger), "source")
        .filter(F.pmod(h, F.col("quality_tokens")) < F.col("capped_tokens"))
        .select("doc_id", "source", "n_tokens")
    )


def curriculum_buckets(
    docs: DataFrame,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum schedule: partition the corpus into ``n_buckets``
    equal-population difficulty tiers by lexical-diversity score and
    report each tier's volume — the ordering table a curriculum-
    learning data loader consumes (easy -> hard phase scheduling).

    Score: ``(n_distinct_words * 2^20) div n_words`` — a pure-integer
    q20 of the distinct-word ratio, so scores are bit-identical across
    engines and SFs (float policy: never a rounded rational).

    Bucketing is EXACT equal-frequency without a global NTILE: a
    corpus-wide ``NTILE() OVER (ORDER BY score)`` is a single-partition
    sort — the one window shape this repo bans at scale. Instead:

    1. histogram the scores (one map-side-combining aggregate; the q20
       domain is bounded at 2^20 distinct values, so the histogram is
       <= 1M rows REGARDLESS of corpus size),
    2. running-count the histogram (a window over the bounded
       histogram, not the corpus),
    3. derive the n_buckets-1 boundary scores at integer ranks
       ``ceil(k * n / n_buckets)`` = ``(k*n + n_buckets-1) div
       n_buckets``,
    4. broadcast the boundary array back and assign
       ``bucket = 1 + |{k : score > b_k}|``.

    Ties sit in the lower bucket (deterministic); with heavy ties the
    populations are as equal as the data allows. Output per bucket:
    ``(bucket, n_docs, sum_words, min_score_q20, max_score_q20)`` —
    all exact longs.
    """
    if n_buckets < 2:
        raise ValueError(f"need at least 2 buckets, got {n_buckets}")
    norm = normalize_text(F.col(text_col))
    scores = docs.select(
        F.col(id_col).alias("doc_id"), words(norm).alias("_ws")
    ).select(
        "doc_id",
        F.expr(
            "(cast(size(array_distinct(_ws)) as bigint) * 1048576)"
            " div cast(size(_ws) as bigint)"
        ).alias("score"),
        F.size("_ws").cast("long").alias("n_words"),
    )
    hist = scores.groupBy("score").agg(F.count(F.lit(1)).alias("_c"))
    cum_w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = hist.select("score", F.sum("_c").over(cum_w).alias("_cum"))
    total = scores.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    spark = docs.sparkSession
    ks = spark.createDataFrame([(k,) for k in range(1, n_buckets)], "k long")
    bounds = (
        cdf.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("_cum") >= F.expr(f"(k * _n + {n_buckets - 1}) div {n_buckets}"))
        .groupBy("k")
        .agg(F.min("score").alias("b"))
    )
    barr = bounds.groupBy().agg(F.array_sort(F.collect_list("b")).alias("_bs"))
    assigned = scores.crossJoin(F.broadcast(barr)).select(
        "score",
        "n_words",
        (
            F.lit(1)
            + F.size(F.filter("_bs", lambda b: F.col("score") > b))
        ).cast("long").alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.min("score").alias("min_score_q20"),
        F.max("score").alias("max_score_q20"),
    )


def systematic_weighted_sample(
    docs: DataFrame,
    k: int = 25,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic weighted sampling (with multiplicity) via
    systematic selection over a distributed prefix sum.

    Classic weighted reservoir sampling (Efraimidis-Spirakis) orders by
    u^(1/w) — a transcendental per-row key whose libm rounding differs
    across engines, exactly the cross-engine float trap CLAUDE.md bans.
    Systematic (grid) sampling needs only INTEGER arithmetic: lay the
    documents on a line in a deterministic hash-random order, each
    occupying a segment of length = its weight; with W = total weight,
    pick the k grid points j*W/k (j = 1..k); a document is selected
    once per grid point inside its segment:

        mult = floor(c_hi * k / W) - floor(c_lo * k / W)

    Σ mult = k exactly, and P(selected) ∝ weight, the same guarantee
    PPS sampling gives (Madow 1949 systematic PPS).

    The prefix sum is the scale problem: a single ORDER BY cumsum is a
    global unpartitioned window. Standard distributed fix (two-phase
    scan): bucket rows by the top hash bits, cumsum WITHIN each bucket
    (a partitioned window), and add per-bucket offsets computed from
    the n_buckets-row bucket-total table — bounded driver state per the
    CLAUDE.md rule, exact integers end to end. The DuckDB oracle runs
    the single-window formulation over the same (bucket, hash, id)
    total order and must agree bit for bit.

    Overflow: c_hi*k <= W*k; at 100 TB of chars (1e14) with k <= 1e4
    this still fits a long, beyond that promote to DECIMAL(38,0).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|wsamp"))), 1, 15),
        16,
        10,
    ).cast("long")
    base = docs.select(
        F.col(id_col),
        F.col("source"),
        F.col(weight_col).cast("long").alias("weight"),
        h.alias("_h"),
    ).withColumn("_b", F.col("_h") % n_buckets)
    # phase 1: bucket totals -> exclusive prefix offsets (bounded rows)
    totals = base.groupBy("_b").agg(F.sum("weight").cast("long").alias("_t"))
    rows = sorted((r["_b"], r["_t"]) for r in totals.collect())
    offsets, acc = [], 0
    for b, t in rows:
        offsets.append((b, acc))
        acc += t
    w_total = acc
    if w_total <= 0:
        return base.select(id_col, "source", "weight").limit(0).withColumn(
            "mult", F.lit(0).cast("long")
        )
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offsets, "_b long, _off long")
    # phase 2: within-bucket cumsum (partitioned window) + offset
    cum_w = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        base.join(F.broadcast(off_df), "_b")
        .withColumn("_c_hi", F.sum("weight").over(cum_w) + F.col("_off"))
        .withColumn("_c_lo", F.col("_c_hi") - F.col("weight"))
    )
    # integer floor division — operands are nonnegative longs
    mult = F.expr(f"(_c_hi * {int(k)}) div {w_total} - (_c_lo * {int(k)}) div {w_total}")
    return (
        c.withColumn("mult", mult.cast("long"))
        .filter(F.col("mult") > 0)
        .select(id_col, "source", "weight", "mult")
    )


def temperature_mix(
    docs: DataFrame,
    budget: int = 1_000_000,
    alpha_sqrt: bool = True,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled corpus mixing: allocate a document budget
    across sources proportionally to n_tokens^alpha (alpha = 0.5, the
    multilingual-LM upsampling convention) instead of raw mass, then
    Hamilton-apportion to exact integers.

    Output: (source, n_docs, n_tokens, share_q20, alloc);
    SUM(alloc) == budget exactly.

    Cross-engine: token counts are exact BIGINTs; sqrt emits an
    IRRATIONAL for any non-square input so the q20 share is stable
    (repo float rule), and both engines evaluate the identical double
    expression; the apportionment compares doubles only through
    floor() and the remainder sort, deterministic on identical bits.

    100-TB shape: one explode-free token count per row (size of the
    split array), a per-source aggregate with map-side combine, then
    all arithmetic on the BOUNDED |sources| table (unpartitioned
    windows over that table are the bounded-grain pattern).
    """
    from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, words

    per = docs.groupBy(F.col(source_col).alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(words(normalize_text(F.col(text_col)))).cast("long"))
        .cast("long")
        .alias("n_tokens"),
    )
    scaled = per.withColumn(
        "_m",
        F.expr("sqrt(cast(n_tokens as double))") if alpha_sqrt else F.col("n_tokens").cast("double"),
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ideal = (F.lit(float(budget)) * F.col("_m") / F.sum("_m").over(tot))
    based = scaled.select(
        "src",
        "n_docs",
        "n_tokens",
        F.expr(
            "cast(floor(_m / sum(_m) over () * 1048576 + 0.5e0) as bigint)"
        ).alias("share_q20"),
        F.floor(ideal).cast("long").alias("_base"),
        (ideal - F.floor(ideal)).alias("_frac"),
    )
    wrk = Window.orderBy(F.desc("_frac"), F.asc("src"))
    left = F.lit(budget).cast("long") - F.sum("_base").over(tot)
    return (
        based.withColumn("_rk", F.row_number().over(wrk))
        .withColumn("_left", left)
        .select(
            F.col("src").alias(source_col),
            "n_docs",
            "n_tokens",
            "share_q20",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("alloc"),
        )
    )
