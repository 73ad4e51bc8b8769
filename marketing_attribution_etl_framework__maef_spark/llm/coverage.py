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
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidate_pool: int = 256,
) -> DataFrame:
    """Select k documents greedily maximizing new-shingle coverage.

    Output: (round, doc_id, gain, covered_total) — one row per
    selection in pick order; stops early if no document adds
    anything.  round is 1-based; covered_total is the running
    distinct-shingle count after the pick.

    CELF-style candidate pruning with TIE-SAFE paginated refills
    (r09, replacing the r08 Spark-tail fallback): marginal gains are
    monotone non-increasing under a growing covered set
    (submodularity), so only docs whose INITIAL gain reaches the
    current winning gain can contend.  The driver holds a candidate
    pool — pages of ``candidate_pool`` docs in (initial gain DESC,
    id ASC) order, with their exact shingle sets — and runs the k
    rounds as pure Python set arithmetic (bounded driver state:
    pages x candidate_pool docs x max-doc-shingles, the repo
    bounded-driver-state rule).

    Soundness per round, with t = the initial gain of the LAST
    fetched row (-1 once the whole corpus is pooled) and B = the
    largest pooled id whose initial gain == t:  every un-pooled doc
    has (initial < t) or (initial == t and id > B), and marginal <=
    initial, so the pooled argmax (d*, g*) is the GLOBAL argmax under
    (gain DESC, id ASC) whenever g* > t, or g* == t and d*.id <= B
    (an outside contender would tie at t but lose the id tie-break
    to d*, because every outside t-doc's id exceeds B >= d*.id).
    Otherwise admit the next page and retry the round.  Page refills
    are CHEAP (r10, per ADVICE r09): the (id, initial gain) ranks for
    the first ``rank_pages`` pages are collected in ONE top-N job up
    front (TakeOrdered, never a full sort or an OFFSET re-sort — the
    r09 shape re-ran the corpus aggregate + global sort per refill),
    and a refill fetches only the page's shingle SETS by semi-joining
    the page ids against the raw ``docs`` table BEFORE shingling, so
    the explode touches pool-sized data, not the corpus.  The r08
    "rare" Spark-side fallback was in fact the COMMON path on real
    data — near-uniform doc lengths put hundreds of docs in a 6-value
    gain band (sf0.1: 288 docs with gain >= the pool-256 threshold
    92), a single tie at the cutoff triggered it, and its k
    corpus-scale localCheckpoint rounds measured 18-50 s at sf0.1 vs
    ~2 s for this formulation.  At 100 TB the pattern is the same:
    ONE corpus-scale rank aggregate total, plus one bounded pool-only
    set fetch per page, with page count driven only by tie mass at
    the cutoff, not corpus size.
    """
    spark = docs.sparkSession
    # The full (doc, shingle) lineage is scanned ONCE, for the initial
    # rank top-N; set fetches shingle only the pooled docs.
    pairs_full = doc_shingles(docs, text_col, id_col)
    ranked = (
        pairs_full.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("gain"))
        .orderBy(F.desc("gain"), F.asc(id_col))
    )

    rank_pages = 4
    rank_rows: list = []
    pool_gain: dict = {}
    pool_sets: dict = {}
    state = {"page": 0, "rank_limit": 0, "threshold": None, "boundary_id": -1}

    def _fetch_ranks(n: int) -> None:
        # one TakeOrdered job; (gain DESC, id ASC) is a total order so
        # the collected prefix is exactly the global rank prefix
        rank_rows[:] = ranked.limit(n).collect()
        state["rank_limit"] = n

    def _load_page() -> None:
        lo = state["page"] * candidate_pool
        hi = lo + candidate_pool
        # refetch only if the page needs rows beyond the in-hand prefix
        # AND the prefix might not already be the whole corpus (a prefix
        # shorter than its limit IS the whole corpus); grow geometrically
        # on the rare deep-refill (tie mass outran the prefetch)
        while hi > len(rank_rows) and len(rank_rows) >= state["rank_limit"]:
            _fetch_ranks(max(hi, candidate_pool * rank_pages) * 2)
        rows = rank_rows[lo:hi]
        state["page"] += 1
        if hi >= len(rank_rows) and len(rank_rows) < state["rank_limit"]:
            state["threshold"] = -1  # whole corpus pooled after this page
        else:
            state["threshold"] = int(rows[-1]["gain"])
        for r in rows:
            pool_gain[r[id_col]] = int(r["gain"])
        if state["threshold"] >= 0:
            state["boundary_id"] = max(
                (d for d, g in pool_gain.items() if g == state["threshold"]),
                default=-1,
            )
        if rows:
            ids = spark.createDataFrame(
                [(r[id_col],) for r in rows], f"{id_col} long"
            )
            # filter the RAW docs first so shingling touches only the
            # page's docs (the corpus-wide explode was the refill cost)
            page_pairs = doc_shingles(
                docs.join(F.broadcast(ids), id_col, "left_semi"),
                text_col,
                id_col,
            )
            for row in (
                page_pairs.groupBy(id_col)
                .agg(F.collect_set("sh").alias("_shs"))
                .collect()
            ):
                pool_sets[row[id_col]] = set(row["_shs"])

    _fetch_ranks(candidate_pool * rank_pages)
    _load_page()
    if not pool_gain:
        return spark.createDataFrame(
            [], "round long, doc_id long, gain long, covered_total long"
        )

    out, covered_total = [], 0
    covered: set = set()
    rnd = 1
    while rnd <= k:
        best = None
        for d in sorted(pool_sets):
            g = len(pool_sets[d] - covered)
            if best is None or g > best[1]:
                best = (d, g)
        t = state["threshold"]
        if best is None:
            if t < 0:
                break  # corpus exhausted
            _load_page()
            continue
        d, g = best
        if t >= 0 and not (g > t or (g == t and d <= state["boundary_id"])):
            _load_page()  # un-pooled doc could win or tie-win this round
            continue
        if g == 0:
            break  # nothing left adds coverage
        covered_total += g
        out.append((rnd, d, g, covered_total))
        covered |= pool_sets.pop(d)
        rnd += 1
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
