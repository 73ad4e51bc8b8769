"""Stratified deterministic corpus sampling with exact apportionment.

A training-data pipeline rarely samples uniformly: it fixes a TOTAL
sample size k and splits it across strata (source, language, domain)
proportionally to stratum mass.  Doing that with per-stratum
`sample(fraction)` gives a binomially-noisy, run-dependent size; the
exact, reproducible version needs two pieces:

1. **Hamilton largest-remainder apportionment** of k across strata
   (the same integer method as the budget allocator,
   operators/reporting.py:355 — base = k*n_s div N, leftovers to the
   largest remainders, ties by stratum name).  Sum of quotas == k
   exactly, every quantity a long/DECIMAL.
2. **Within-stratum deterministic selection**: rank docs inside each
   stratum by (md5-hash, id) and keep the k_s smallest — a seeded
   uniform draw that is reproducible across runs AND engines.

The within-stratum rank uses the grouped two-phase scan
(``grouped_hash_rank``): bucket rows by hash inside each stratum,
cumsum counts per (stratum, bucket) — the bounded driver table is
|strata| x n_buckets rows — then a (stratum, bucket)-partitioned
window.  No stratum is ever sorted in a single task, so a stratum
with 10^12 rows shards exactly like the global two-phase rank
(operators/segmentation.py, llm/curation.py:595).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_hash_rank(
    df: DataFrame,
    group_col: str,
    id_col: str,
    out_col: str = "rank",
    n_buckets: int = 64,
    salt: str = "|strat",
) -> DataFrame:
    """Per-group rank (1-based) in deterministic (md5(id+salt), id)
    order, computed with a grouped two-phase scan (module docstring).

    Output: input columns + ``out_col``.  The rank matches a
    per-group ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    bucket, hash, id)`` — the oracle's single-window form — because
    bucket boundaries only refine the same total order.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    base = df.withColumn("_h", h).withColumn("_b", F.col("_h") % n_buckets)
    counts = sorted(
        (r["g"], r["b"], r["n"])
        for r in base.groupBy(
            F.col(group_col).alias("g"), F.col("_b").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )  # bounded driver state: |strata| x n_buckets rows
    offsets, acc, cur = [], 0, None
    for g, b, n in counts:
        if g != cur:
            cur, acc = g, 0
        offsets.append((g, b, acc))
        acc += n
    spark = df.sparkSession
    # ADVICE r04: the offsets schema must carry the group column's REAL
    # type — a hardcoded string silently miscasts non-string strata.
    gtype = df.schema[group_col].dataType.simpleString()
    off = spark.createDataFrame(
        offsets or [(None, 0, 0)], f"g {gtype}, b long, _off long"
    ).withColumnRenamed("g", group_col).withColumnRenamed("b", "_b")
    w = Window.partitionBy(group_col, "_b").orderBy("_h", id_col)
    return (
        base.join(F.broadcast(off), [group_col, "_b"])
        .withColumn(out_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_h", "_b", "_off")
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Exactly-k deterministic sample, Hamilton-apportioned across
    strata proportionally to stratum row counts.

    Output: (id, stratum, stratum_n, quota, rank) for the selected
    rows; COUNT(*) == k exactly.  Requires k <= N (total rows): a
    largest-remainder bump could land on an already-exhausted stratum
    with no redistribution, so over-asking would silently fall short
    of "all rows" — raise instead (ADVICE r04).

    The apportionment runs driver-side in exact integer Python over
    the BOUNDED |strata| count table (the repo's bounded-driver-loop
    pattern; grouped_hash_rank collects the same grain already) —
    bit-identical to the previous DECIMAL(38,0) SQL formula for every
    k <= N, with no extra distributed scan.
    """
    per_rows = sorted(
        (r["_s"], r["stratum_n"])
        for r in docs.groupBy(F.col(stratum_col).alias("_s"))
        .agg(F.count(F.lit(1)).cast("long").alias("stratum_n"))
        .collect()
    )
    total = sum(n for _, n in per_rows)
    if k > total:
        raise ValueError(
            f"stratified_sample: k={k} exceeds corpus size N={total}; "
            "exact-k apportionment requires k <= N"
        )
    base = {s: (k * n) // total for s, n in per_rows} if total else {}
    rem = {s: (k * n) % total for s, n in per_rows} if total else {}
    leftover = k - sum(base.values())
    for s, _ in sorted(per_rows, key=lambda r: (-rem[r[0]], r[0]))[:leftover]:
        base[s] += 1
    spark = docs.sparkSession
    stype = docs.schema[stratum_col].dataType.simpleString()
    quotas = spark.createDataFrame(
        [(s, n, min(n, base[s])) for s, n in per_rows] or [(None, 0, 0)],
        f"{stratum_col} {stype}, stratum_n long, quota long",
    )
    ranked = grouped_hash_rank(
        docs.select(id_col, stratum_col), stratum_col, id_col, "rank", n_buckets
    )
    return (
        ranked.join(F.broadcast(quotas), stratum_col)
        .filter(F.col("rank") <= F.col("quota"))
        .select(id_col, stratum_col, "stratum_n", "quota", "rank")
    )
