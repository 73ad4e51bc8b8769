"""Mergeable cardinality sketches (KMV / k-minimum-values).

The reference's only cardinality tool is exact COUNT(DISTINCT ...)
(``src/etl/reporting.py`` summary queries, rebuilt in
``operators/reporting.py``). At 100 TB an exact distinct over a
high-cardinality key is a full shuffle of every distinct value; the
standard fix is a bounded-size mergeable sketch. HyperLogLog
(``approx_count_distinct``) is built in, but its register layout is
engine-private — useless for a cross-engine correctness gate.

KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") is the sketch you can pin exactly: hash every value with a
fixed hash, keep the k smallest distinct hashes per group. The sketch
IS the k hashes — deterministic integers, so a DuckDB oracle
reproduces it bit for bit. The estimator (k-1) * 2^60 / h_k is a
trivial client-side division over the emitted integers; emitting the
sketch rather than the float estimate keeps the interface exact
(CLAUDE.md float policy) and keeps the sketch mergeable (union = merge
hash sets, re-take k smallest — an associative combine).

100-TB shape: the inner distinct is a hash aggregate on
(group, hash) — map-side combinable, the same cost class as the
grouped count it serves; the rank window then sees at most the
distinct values, and only k longs per group leave the reduce side.
A production variant would replace the window with a k-size
min-heap UDAF; the window form stays whole-stage-codegen and is
exact at any k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def portable_hash60(c: Column) -> Column:
    """60-bit engine-portable value hash (md5 prefix as integer) —
    identical to ``llm/dedup.py shingle_hash``; duplicated here only
    as a Column helper for non-LLM callers."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per group: the KMV distinct-count sketch of ``value_col``.

    Output columns:
    - ``n_seen``: number of distinct hashes kept (= min(k, true
      distinct count) — when < k the sketch is exact);
    - ``kth_min_hash``: the largest kept hash (the estimator's h_k;
      NULL only for empty groups, which don't produce rows anyway);
    - ``minhashes``: the sorted kept hashes (the mergeable sketch).
    """
    h = portable_hash60(F.col(value_col).cast("string"))
    distinct = (
        df.select(*[F.col(g) for g in group_cols], h.alias("_h"))
        .groupBy(*group_cols, "_h")
        .agg(F.count(F.lit(1)).alias("_m"))  # multiplicity unused; groupBy = distinct
        .drop("_m")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    kept = distinct.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_seen"),
        F.max("_h").alias("kth_min_hash"),
        F.array_sort(F.collect_list("_h")).alias("minhashes"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------
#
# CMS (Cormode & Muthukrishnan 2005): d independent hash rows of w
# counters; an item's estimate is the MIN over its d counters, which
# NEVER underestimates (every counter the item hashes to holds its true
# count plus nonnegative collision mass). Like KMV above, the md5-based
# row hashes make the whole sketch engine-portable integers, so the
# DuckDB oracle reproduces it bit for bit — unlike Spark's built-in
# count_min_sketch aggregate, whose binary layout is engine-private.
#
# 100-TB shape: building the sketch is one map-side-combining aggregate
# over (row, bucket) — d*w counters total (a few KB) REGARDLESS of input
# scale, and sketches from different partitions/days merge by cellwise
# addition. Estimation joins the queried items against the broadcast
# sketch.


# ---------------------------------------------------------------------------
# HyperLogLog register table (cardinality estimation)
# ---------------------------------------------------------------------------
#
# HLL (Flajolet et al. 2007): split the value hash into a register index
# (top-level bucket) and a payload; each register keeps the maximum
# rho = (leading zeros of the payload) + 1. Spark's built-in
# approx_count_distinct IS HyperLogLog++, but its register blob is
# engine-private — useless for a cross-engine gate — so, exactly like the
# KMV/CMS sketches above, we materialize the registers as portable
# integers from the md5 value hash. rho is computed WITHOUT floating
# log2 (whose rounding at 2^k boundaries differs per libm): for a
# 52-bit payload w, rho = 53 - bit_length(w), and bit_length is the
# length of the binary string rendering (Spark ``bin()``, DuckDB
# ``printf('%b', ..)``) — exact in both engines.
#
# 100-TB shape: one map-side-combining MAX aggregate over
# (group, register) — at most 256 rows per group survive the map side —
# then a 256-row roll-up per group. Register tables from different
# partitions/days merge by cellwise MAX (associative), which is the
# whole point of carrying the sketch instead of the estimate.


def hll_register_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per group: the 256-register HLL sketch of ``value_col``,
    rolled up to exact-integer summary columns.

    Output columns (all exact integers — no float leaves the engine,
    per the CLAUDE.md cross-engine float policy):
    - ``n_registers_hit``: registers with >= 1 value (long, <= 256);
    - ``sum_rho``: sum of the per-register max rho (long);
    - ``harmonic_s53``: sum over all 256 registers of 2^(53 - rho)
      with rho = 0 for unhit registers — i.e. the HLL harmonic
      denominator scaled by 2^53, exact in a long (<= 256 * 2^53 < 2^62).
      The classic estimate is alpha_256 * 256^2 * 2^53 / harmonic_s53,
      a client-side division over the emitted integers (see
      tests/test_round3b_ops.py for the accuracy band).
    """
    h = portable_hash60(F.col(value_col).cast("string"))
    reg = df.select(*[F.col(g) for g in group_cols], h.alias("_h")).select(
        *group_cols,
        (F.col("_h") % 256).alias("_reg"),
        # integer div — double division would round 60-bit hashes
        F.expr("_h div 256").alias("_w"),
    )
    rho = F.when(F.col("_w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(_w)"))
    )
    per_reg = (
        reg.select(*group_cols, "_reg", rho.alias("_rho"))
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_mr"))
    )
    # F.shiftleft takes a literal shift count; a per-row count needs
    # the SQL form (both are the same JVM expression)
    term = F.expr("shiftleft(cast(1 as bigint), cast(53 - _mr as int))")
    return per_reg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers_hit"),
        F.sum("_mr").cast("long").alias("sum_rho"),
        (
            F.sum(term).cast("long")
            + (F.lit(256).cast("long") - F.count(F.lit(1)).cast("long"))
            * F.lit(1 << 53).cast("long")
        ).alias("harmonic_s53"),
    )


def _cms_bucket(c: Column, row: int, w: int) -> Column:
    return portable_hash60(F.concat(F.lit(f"cms{row}|"), c)) % w


def cms_table(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Build the (row, bucket, cnt) Count-Min table over every
    occurrence of ``value_col`` (multiplicities counted)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("row"),
                _cms_bucket(F.col(value_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimates(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-estimate every row of ``items``: min over the d counters.
    The sketch side is d*w rows — always broadcast."""
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("row"),
                        _cms_bucket(F.col(value_col), j, w).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).drop("rb")
    joined = probes.join(F.broadcast(cms), on=["row", "bucket"], how="inner")
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(F.min("cnt").cast("long").alias("cms_est"))


# ---------------------------------------------------------------------------
# Bloom filter (set-membership sketch)
# ---------------------------------------------------------------------------
#
# Bloom (1970): k bit positions per value in an m-bit array; membership
# probes all k — no false negatives, tunable false-positive rate
# (1 - e^(-kn/m))^k. Spark's own runtime bloom pushdown
# (spark.sql.optimizer.runtime.bloomFilter.enabled) covers join
# pruning INSIDE one engine; this one exists for the cross-engine /
# cross-run use: the filter is a table of (word_idx, bits) longs built
# from md5 positions, so it can be persisted, merged across days
# (cellwise OR), shipped to another engine, or used as a broadcast
# pre-filter in front of an expensive exact check (e.g. benchmark
# decontamination: probe the bloom first, run the shingle join only on
# probable hits).
#
# 100-TB shape: building is one map-side-combining BIT_OR aggregate to
# m/64 rows (a few KB) regardless of input size; probing joins items
# against the broadcast word table. Merge law: cellwise OR — the same
# mergeable-sketch contract as KMV/CMS/HLL above.

_BLOOM_SALTS = "bloom"


def _bloom_positions(c: Column, k_hashes: int, m_bits: int) -> list[Column]:
    return [
        portable_hash60(F.concat(F.lit(f"{_BLOOM_SALTS}{j}|"), c)) % m_bits
        for j in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Build the (word_idx, bits) Bloom table over distinct values of
    ``value_col``. Only words with at least one set bit are emitted
    (absent word = 0, the OR identity).

    Words pack 62 bits, not 64: DuckDB's ``<<`` raises on a shift into
    the sign bit (1 << 63) while Spark's wraps silently — 62-bit words
    keep every mask a positive long in BOTH engines, the same
    avoid-the-edge rule as the repo's 60-bit md5 hashes."""
    if m_bits <= 0:
        raise ValueError("m_bits must be positive")
    pos = F.explode(
        F.array(*_bloom_positions(F.col(value_col).cast("string"), k_hashes, m_bits))
    ).alias("_p")
    return (
        df.select(pos)
        .select(
            F.expr("_p div 62").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(_p % 62 as int))").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    items: DataFrame,
    value_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """items plus a ``might_contain`` flag (long 0/1): 1 iff every one
    of the value's k bits is set. The bloom side is <= m/64 rows —
    always broadcast; a LEFT join treats missing words as all-zero.

    Output has one row per DISTINCT item tuple (the groupBy collapses
    duplicate input rows). The flag test is ``sum(hit) == count(*)``
    (all probe rows hit), not ``== k_hashes``: with d duplicate rows a
    group holds d*k probes, so comparing to k would flag true members
    0 — a false negative violating the Bloom contract."""
    probes = items.select(
        "*",
        F.explode(
            F.array(*_bloom_positions(F.col(value_col).cast("string"), k_hashes, m_bits))
        ).alias("_p"),
    ).select(
        "*",
        F.expr("_p div 62").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(_p % 62 as int))").alias("_mask"),
    )
    j = probes.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(F.col("_mask")) == F.col("_mask")).cast("int")
    keys = [c for c in items.columns]
    return (
        j.groupBy(*keys)
        .agg((F.sum(hit) == F.count(F.lit(1))).cast("long").alias("might_contain"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two Bloom tables built with identical (m, k): cellwise OR."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


# ---------------------------------------------------------------------------
# KMV theta intersection (audience overlap)
# ---------------------------------------------------------------------------


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise group-overlap estimate from the KMV sketches — the
    theta-sketch intersection (Dasgupta et al., "Theta-Sketch
    Framework", 2016): for groups A, B with kth-min thresholds
    theta_A, theta_B (= 2^60, i.e. "everything kept", when the sketch
    holds fewer than k hashes and is exact),

        theta  = min(theta_A, theta_B)
        common = |{h in kept_A  ∩  kept_B : h < theta}|
        est    = common * 2^60 div theta        (exact when both exact)

    Every quantity is integer (the md5 hash space is [0, 2^60)), so
    the estimate is engine-portable without any float.  Output per
    unordered pair (a < b): (channel_a, channel_b, n_seen_a, n_seen_b,
    common, est_overlap).

    100-TB shape: this is WHY sketches exist — the exact overlap needs
    a users x groups^2 self-join, the sketch version joins two
    <= k-element arrays per group pair (groups^2 bounded rows, always
    broadcast).  Sketches stay mergeable across days/partitions
    (kmv_sketch), so the overlap matrix refreshes from stored sketches
    without rescanning the corpus.
    """
    sk = kmv_sketch(df, [group_col], value_col, k=k)
    cap = F.lit(1 << 60).cast("long")
    side = sk.select(
        F.col(group_col).alias("g"),
        F.col("n_seen"),
        F.when(F.col("n_seen") >= k, F.col("kth_min_hash")).otherwise(cap).alias("theta"),
        F.col("minhashes"),
    )
    a = side.select(
        F.col("g").alias("channel_a"),
        F.col("n_seen").alias("n_seen_a"),
        F.col("theta").alias("_ta"),
        F.col("minhashes").alias("_ma"),
    )
    b = side.select(
        F.col("g").alias("channel_b"),
        F.col("n_seen").alias("n_seen_b"),
        F.col("theta").alias("_tb"),
        F.col("minhashes").alias("_mb"),
    )
    pairs = a.crossJoin(b).filter(F.col("channel_a") < F.col("channel_b"))
    theta = F.least(F.col("_ta"), F.col("_tb"))
    common = F.size(
        F.filter(
            F.array_intersect("_ma", "_mb"), lambda h: h < theta
        )
    ).cast("long")
    return pairs.select(
        "channel_a",
        "channel_b",
        "n_seen_a",
        "n_seen_b",
        common.alias("common"),
        theta.alias("_theta"),
    ).select(
        "channel_a",
        "channel_b",
        "n_seen_a",
        "n_seen_b",
        "common",
        F.expr(
            f"cast(cast(common as decimal(38,0)) * {1 << 60} div _theta as bigint)"
        ).alias("est_overlap"),
    )
