"""Text analysis for training-data pipelines: normalization,
tokenization, shingling, statistics, quality scoring, language ID,
and winnowing document fingerprints.

All operators are native column expressions (whole-stage codegen, no
UDFs). Counters are emitted as exact integers wherever the quantity is
rational, so results are bit-stable across engines and scales.

Scale: every operator here is per-document (embarrassingly parallel —
no shuffle except the final aggregations, which are keyed by doc_id
and combine map-side). At 100 TB the only knob that matters is input
partition sizing; nothing below has cross-document state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Deliberately short: the heuristic scores distinct-word overlap and
# breaks ties alphabetically, which keeps it exactly reproducible in
# ANSI SQL for the oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "you"],
    "es": ["el", "los", "las", "y", "es", "una", "para", "con"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "zh": ["的", "是", "在", "了", "我"],
}

# BPE-ish token regex: letter runs, digit runs, single other symbols
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def normalize_text(c: Column) -> Column:
    """lower + trim + whitespace collapse — the canonical form every
    dedup/fingerprint operator keys on."""
    return F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")


def words(c: Column) -> Column:
    """Whitespace tokens of an already-normalized string."""
    return F.split(c, " ")


def word_shingles(words_col: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string>; documents shorter than k
    words yield one shingle (the whole text), so no document is
    silently dropped from dedup.

    Built from k shifted ``slice``s folded with ``zip_with`` — an
    order of magnitude faster than per-index ``element_at`` lookups
    inside a ``transform`` lambda (higher-order functions are
    interpreted, so per-element work must stay minimal). The shorter
    shifted slices pad with NULL, which ``concat_ws`` skips — exactly
    the short-document semantics we want."""
    n_out = F.greatest(F.size(words_col) - (k - 1), F.lit(1))
    shifted = [F.slice(words_col, i + 1, n_out) for i in range(k)]
    acc = shifted[-1]
    for prev in reversed(shifted[:-1]):
        acc = F.zip_with(prev, acc, lambda a, b: F.concat_ws(" ", a, b))
    return acc


def stats_cols(raw: Column, norm: Column, ws: Column) -> list[Column]:
    """The text_stats output columns as expressions over (raw text,
    normalized text, word array) — reusable by any one-scan fusion."""
    n_words = F.size(ws).cast("long")
    n_distinct = F.size(F.array_distinct(ws)).cast("long")
    return [
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.size(F.regexp_extract_all(norm, F.lit(TOKEN_REGEX), 0)).cast("long").alias("n_tokens"),
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("long").alias("sum_word_len"),
        F.array_max(F.transform(ws, F.length)).cast("long").alias("max_word_len"),
        ((n_words >= 5) & (n_distinct * 10 >= n_words * 3)).alias("is_quality"),
    ]


def lang_cols(ws_distinct: Column) -> list[Column]:
    """language_id output columns over a distinct-word array: argmax of
    stopword-overlap with alphabetical tie-break (sort by (-score,
    lang))."""
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(ws_distinct, F.array(*[F.lit(w) for w in wl]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, wl in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_sort(
        F.transform(scores, lambda s: F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang")))
    )[0]
    return [
        best["lang"].alias("lang_guess"),
        (-best["neg"]).cast("long").alias("lang_score"),
    ]


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + quality flag, all exact-integer:

    - n_chars_raw / n_chars_norm: lengths before/after normalization
    - n_words / n_distinct_words: whitespace tokens
    - n_tokens: BPE-ish regex token count (TOKEN_REGEX)
    - sum_word_len / max_word_len: for mean-word-length style filters
    - is_quality: the usual cheap pre-training gate — enough words and
      enough lexical diversity (>= 30% distinct), integer arithmetic
      only so the flag is deterministic.
    """
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col), F.col(text_col), norm.alias("_norm"))
    return d.select(
        F.col(id_col), *stats_cols(F.col(text_col), F.col("_norm"), words(F.col("_norm")))
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: score(lang) = |distinct
    words ∩ stopwords(lang)|, argmax with alphabetical tie-break.
    Pure set-intersection sizes — no floats, no model."""
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col), F.array_distinct(words(norm)).alias("_ws"))
    return d.select(F.col(id_col), *lang_cols(F.col("_ws")))


def top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction, tf-idf-style: terms ranked by
    tf/df (in-document frequency over corpus document frequency) with
    term-alphabetical tie-breaks. The score is a single IEEE division
    of two exact integers — deliberately not log-idf, whose libm
    rounding can differ across engines — so the ranking is bit-stable
    and oracle-checkable. Two hash aggregates + one broadcast-sized
    term-frequency join."""
    norm = normalize_text(F.col(text_col))
    ex = docs.select(F.col(id_col), F.explode(words(norm)).alias("term"))
    # df derives FROM tf (one row per (doc, term) already), not from a
    # second distinct pass over the exploded corpus. tf is deliberately
    # NOT persisted although two branches read it: measured at sf0.1, a
    # persist barrier serializes what AQE otherwise runs as parallel
    # branch scans (0.96 s -> 5.3 s); on a real cluster the same call
    # site reads tf from a checkpointed table instead.
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").withColumn(
        "_score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col(id_col), F.col("rnk").cast("long").alias("rnk"), "term", "tf", "df")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval: score every document against a fixed query
    term set (k1 = 1.2, b = 0.75) and keep the global top-k.

    The reference has no retrieval operator; this is part of the
    LLM-training-data layer (quality scoring / corpus search). The
    formula is the standard BM25+1 idf, ln((N - df + 1/2)/(df + 1/2) + 1),
    which is strictly positive so stopword-frequency terms cannot flip
    sign. Scores are irrational (a log times rationals), so the q20
    binary fixed-point quantization is boundary-safe, and the final
    rank orders by the *quantized* score with a doc-id tie-break —
    fully integer-deterministic across engines.

    Scale: two hash aggregates over the exploded term list (the filter
    to the tiny query vocabulary is pushed below the first shuffle, so
    the shuffled data is |query_terms| rows per doc, not the corpus
    vocabulary); df and the (N, sum_dl) scalars are broadcast; the
    global top-k is ``orderBy().limit(k)`` — Spark's
    TakeOrderedAndProject, a per-partition heap merge, never a
    single-task global sort. The k-row result then gets rank numbers
    from a window over those k rows only.
    """
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col), words(norm).alias("_ws"))
    d = d.select(id_col, "_ws", F.size("_ws").cast("long").alias("dl"))
    # nothing here is persisted although totals/tf/df all re-derive the
    # tokenized corpus: caching the corpus-sized _ws arrays measured
    # 1.8 s -> 8 s at sf0.1, and even a tiny tf persist serializes the
    # branch scans AQE otherwise runs in parallel (2.0 s -> 7.3 s). In
    # production (N, sum_dl) and tf come from stats tables maintained
    # at ingest — BM25 corpus statistics are queryset-independent.
    totals = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    ex = d.select(F.col(id_col), "dl", F.explode("_ws").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    tf = ex.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        ((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(1.2) * (
        F.lit(0.25) + F.lit(0.75) * ((F.col("dl") * F.col("n_docs")) / F.col("sum_dl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (idf * (F.col("tf") * F.lit(2.2)) / denom).alias("w"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("w").alias("_score"),
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
    )
    q = agg.select(
        F.col(id_col),
        "n_hit_terms",
        F.floor(F.col("_score") * F.lit(1048576.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q20"),
    )
    top = q.orderBy(F.desc("score_q20"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_q20"), F.asc(id_col))
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        F.col(id_col),
        "n_hit_terms",
        "score_q20",
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signal (the Gopher-style quality
    filter): duplicate word-bigram fraction, as exact integers.
    Emits (doc_id, n_bigrams, n_distinct_bigrams, is_repetitive) where
    is_repetitive <=> duplicated bigrams are >= 20% of all bigrams,
    thresholded by integer cross-multiplication. One-word documents
    yield their single word as the one 'bigram' (word_shingles'
    short-document rule), hence are never repetitive.

    Per-document column algebra only — no shuffle, fuses with the
    scan."""
    norm = normalize_text(F.col(text_col))
    bg = word_shingles(words(norm), 2)
    d = docs.select(F.col(id_col), bg.alias("_bg"))
    return d.select(F.col(id_col), *repetition_cols(F.col("_bg")))


def repetition_cols(bg: Column) -> list[Column]:
    """repetition_stats output columns over a word-bigram array."""
    n_bg = F.size(bg).cast("long")
    n_distinct = F.size(F.array_distinct(bg)).cast("long")
    return [
        n_bg.alias("n_bigrams"),
        n_distinct.alias("n_distinct_bigrams"),
        ((n_bg - n_distinct) * F.lit(5) >= n_bg).alias("is_repetitive"),
    ]


# PII patterns, deliberately restricted to syntax that java.util.regex
# and DuckDB's RE2 interpret identically (char classes + bounded
# quantifiers; no lookaround, no \\b)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9-]+\\.[a-z]{2,}"
LONG_NUMBER_RE = "[0-9]{10,}"


def scrub_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub for training corpora: count and redact email addresses
    and 10+-digit number runs (phone/account shaped) in the normalized
    text. Emits (doc_id, n_emails, n_long_numbers, scrub_hash) — the
    hash of the redacted text stands in for the text itself at the
    comparison interface, so the full scrubbed string never has to be
    value-compared.

    Per-document regexp work inside whole-stage codegen; no shuffle at
    all — at 100 TB this is a pure map pass that fuses with whatever
    scan feeds it."""
    norm = normalize_text(F.col(text_col))
    # numbers are counted on the EMAIL-REDACTED text so every count
    # corresponds to a substitution actually present in the output
    # (a digit run inside an email is covered by the email redaction)
    d = docs.select(
        F.col(id_col),
        norm.alias("_norm"),
        F.regexp_replace(norm, EMAIL_RE, "<email>").alias("_nomail"),
    )
    return d.select(F.col(id_col), *scrub_cols(F.col("_norm"), F.col("_nomail")))


def scrub_cols(norm: Column, nomail: Column) -> list[Column]:
    """scrub_pii output columns over (normalized, email-redacted)
    text."""
    return [
        F.size(F.regexp_extract_all(norm, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(nomail, F.lit(LONG_NUMBER_RE), 0))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(F.regexp_replace(nomail, LONG_NUMBER_RE, "<number>")).alias("scrub_hash"),
    ]


def doc_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-scan fusion of text_stats + language_id + repetition_stats +
    scrub_pii. All four are per-row column algebra, so the union of
    their outputs is a single chained projection — whole-stage codegen
    fuses it with the scan, zero exchanges. The unfused form (4
    projections of the same table joined on doc_id) costs 4 scans and
    3 shuffles at 100 TB for identical results; never do that."""
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col), F.col(text_col), norm.alias("_norm"))
    d = d.select(
        F.col(id_col),
        F.col(text_col),
        F.col("_norm"),
        words(F.col("_norm")).alias("_ws"),
        word_shingles(words(F.col("_norm")), 2).alias("_bg"),
        F.regexp_replace("_norm", EMAIL_RE, "<email>").alias("_nomail"),
    )
    return d.select(
        F.col(id_col),
        *stats_cols(F.col(text_col), F.col("_norm"), F.col("_ws")),
        *lang_cols(F.array_distinct(F.col("_ws"))),
        *repetition_cols(F.col("_bg")),
        *scrub_cols(F.col("_norm"), F.col("_nomail")),
    )


def unigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality score (the CCNet/KenLM-filter
    analogue): per document, the summed corpus surprisal of its words,
    in EXACT whole-bit units.

    For corpus total N and term count n_t, a word's surprisal is
    floor(log2(N / n_t)) bits — computed without floating log as
    ``length(bin(N div n_t)) - 1``, which is exact because
    floor(log2(r)) == floor(log2(floor(r))) for r >= 1 (no integer
    power of two can lie strictly between floor(r) and r). Rare-word
    documents score high bits/word; boilerplate scores low — the usual
    LM-perplexity quality signal, but bit-stable across engines (a
    float ln() sum would be order-dependent ulp noise).

    Plan: one explode -> term-count aggregate (map-side combining), a
    1-row total broadcast, one term join back (inverted-index shape —
    cost Σ tf, the same as top_terms/bm25), one per-doc aggregate. At
    100 TB the term dictionary join is a shuffle join keyed by term
    (or a broadcast when the vocabulary fits); never all-pairs."""
    norm = normalize_text(F.col(text_col))
    ex = docs.select(F.col(id_col), F.explode(words(norm)).alias("term"))
    tf = ex.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = tf.agg(F.sum("n_term").alias("n_total"))
    scored = ex.join(tf, "term").crossJoin(F.broadcast(total))
    bits = F.length(F.bin(F.expr("n_total div n_term"))) - 1
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_words"),
            F.sum(bits).cast("long").alias("surprisal_bits"),
        )
    )


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every char k-gram of the normalized text, take the minimum of
    each sliding window of ``window`` consecutive hashes, and keep the
    distinct minima. Emits (doc_id, n_fingerprints, min_fp).

    Entirely per-row array algebra — no explode, no shuffle, no sort:
    the k-gram hash array is built with one ``transform``, the sliding
    min is ``window`` shifted ``slice``s folded with
    ``zip_with(least)`` (the word_shingles trick; the shorter shifted
    slices pad with NULL, which ``least`` skips — exactly the
    shrinking-tail-window semantics). Replaces an earlier
    posexplode + bounded-window-MIN formulation: that one was also
    per-document, but paid a ~60x row explosion plus a per-partition
    (doc_id, pos) sort — measured 0.84s vs 0.54s median at sf0.1, and
    at 100 TB the explode version's sort spills while this one streams.
    """
    norm = normalize_text(F.col(text_col))
    d = docs.select(F.col(id_col), norm.alias("_norm"))
    m = F.greatest(F.length("_norm") - (k - 1), F.lit(1))  # k-gram count
    hs = F.transform(
        F.sequence(F.lit(1), m), lambda p: F.md5(F.substr(F.col("_norm"), p, F.lit(k)))
    )
    d2 = d.select(F.col(id_col), hs.alias("_hs"))
    n_out = F.greatest(F.size("_hs") - (window - 1), F.lit(1))
    shifted = [F.slice("_hs", i + 1, n_out) for i in range(window)]
    acc = shifted[0]
    for nxt in shifted[1:]:
        acc = F.zip_with(acc, nxt, lambda a, b: F.least(a, b))
    return d2.select(
        F.col(id_col),
        F.size(F.array_distinct(acc)).cast("long").alias("n_fingerprints"),
        F.array_min(acc).alias("min_fp"),
    )


def vocabulary(
    docs: DataFrame, k: int = 200, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary table: the top-``k`` terms by total frequency
    with exact (tf, df) longs — the artifact a tokenizer-training or
    stopword-induction step starts from. Per-(doc, term) counts first
    (map-side combinable), then one aggregate per term; the top-k is a
    TakeOrdered, never a global single-task sort."""
    per_doc = (
        docs.select(F.col(id_col).alias("_id"), F.explode(words(normalize_text(F.col(text_col)))).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    agg = per_doc.groupBy("term").agg(
        F.sum("_m").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    top = agg.orderBy(F.desc("tf"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"), "term", "tf", "df"
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation mining by pointwise mutual information over word
    bigrams: PMI = ln(p(ab) / (p(a) p(b))), computed as an explicit
    sum of logs of exact integer counts so both engines evaluate the
    identical float expression (counts can overflow a product at
    corpus scale; logs cannot). PMI values are irrational, so q20
    quantization is cross-engine safe (float policy). Output: top-k
    (rnk, bigram, n_ab, n_a, n_b, pmi_q20) with n_ab >= min_count.

    Shape: one bigram aggregate + one unigram aggregate + two joins on
    the term key (the unigram table is vocabulary-sized — broadcast at
    any corpus scale); top-k is a TakeOrdered."""
    norm = normalize_text(F.col(text_col))
    base = docs.select(words(norm).alias("_ws")).filter(F.size("_ws") >= 2)
    uni = (
        base.select(F.explode("_ws").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_u"))
    )
    bg = (
        base.select(F.explode(word_shingles(F.col("_ws"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(int(min_count)))
    )
    t_uni = uni.agg(F.sum("n_u").cast("long").alias("t_u"))
    t_bg = base.select(
        (F.size("_ws") - 1).cast("long").alias("_nb")
    ).agg(F.sum("_nb").cast("long").alias("t_b"))

    parts = F.split("bigram", " ")
    scored = (
        bg.withColumn("_a", parts.getItem(0))
        .withColumn("_b", parts.getItem(1))
        .join(uni.select(F.col("term").alias("_a"), F.col("n_u").alias("n_a")), "_a")
        .join(uni.select(F.col("term").alias("_b"), F.col("n_u").alias("n_b")), "_b")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bg))
    )
    pmi = (
        F.log(F.col("n_ab").cast("double"))
        - F.log(F.col("t_b").cast("double"))
        - F.log(F.col("n_a").cast("double"))
        - F.log(F.col("n_b").cast("double"))
        + F.lit(2.0) * F.log(F.col("t_u").cast("double"))
    )
    q = scored.select(
        "bigram", "n_ab", "n_a", "n_b",
        F.floor(pmi * F.lit(1048576.0) + F.lit(0.5)).cast("long").alias("pmi_q20"),
    )
    top = q.orderBy(F.desc("pmi_q20"), F.asc("bigram")).limit(k)
    w = Window.orderBy(F.desc("pmi_q20"), F.asc("bigram"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "bigram", "n_ab", "n_a", "n_b", "pmi_q20",
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    cos_num: int = 3,
    cos_den: int = 5,
    max_df_num: int = 1,
    max_df_den: int = 10,
) -> DataFrame:
    """Sparse TF-IDF cosine document pairs (within a block) — the
    classic bag-of-words similarity kernel, complementing BM25 (L4,
    query->doc) and embedding cosine (L19, dense): doc->doc over the
    term space.

    Cross-engine exactness: IDF uses WHOLE-BIT units —
    ibits(t) = bit_length(N div df(t)) — the unigram_surprisal trick
    (no libm log whose rounding differs per engine), so every weight
    tf * ibits is an exact integer, the dot product and squared norms
    are exact longs, and the cosine threshold is integer
    cross-multiplication:

        cos >= num/den  <=>  den^2 * dot^2 >= num^2 * norm2_a * norm2_b

    with the squares computed in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB oracle) — dot can reach ~1e11, so its square must not
    touch BIGINT.

    Scale shape: inverted-index join on (block, term), cost
    Σ df(term)^2. Unlike shingles, raw words have stopword-class terms
    with df ~ N that would square into an all-pairs blowup — terms in
    more than max_df_num/max_df_den (default 1/10) of the corpus are
    pruned (they carry ~zero IDF weight anyway; standard
    sparse-similarity practice, mirrored exactly in the oracle).
    """
    norm = normalize_text(F.col(text_col))
    ex = docs.select(
        F.col(block_col).alias("_blk"), F.col(id_col), F.explode(words(norm)).alias("term")
    )
    tf = ex.groupBy("_blk", id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    n_total = docs.groupBy().agg(F.count(F.lit(1)).cast("long").alias("_n"))
    df_ = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("_df") * int(max_df_den) <= F.col("_n") * int(max_df_num))  # stopword prune
        .select("term", F.expr("cast(length(bin(_n div _df)) as long)").alias("_ibits"))
    )
    # the weights table feeds THREE consumers (norms + both self-join
    # sides), each of which would otherwise recompute the corpus
    # explode + tf aggregate. Unlike the cheap slice-shingling shapes
    # (where a persist barrier LOSES to AQE's parallel branch scans —
    # CLAUDE.md perf rules), this lineage is expensive enough that the
    # checkpoint wins: A/B at sf0.1 3.3s -> 2.6s median. At production
    # scale this is a checkpoint-to-table.
    w = (
        tf.join(F.broadcast(df_), "term")
        .select("_blk", F.col(id_col), "term", (F.col("_tf") * F.col("_ibits")).alias("_w"))
        .localCheckpoint()
    )
    norms = w.groupBy("_blk", id_col).agg(
        F.sum(F.col("_w") * F.col("_w")).cast("long").alias("_norm2")
    )
    a = w.select("_blk", "term", F.col(id_col).alias("doc_a"), F.col("_w").alias("_wa"))
    b = w.select("_blk", "term", F.col(id_col).alias("doc_b"), F.col("_w").alias("_wb"))
    dots = (
        a.join(b, on=["_blk", "term"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("_blk", "doc_a", "doc_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("_blk"), F.col(id_col).alias("doc_a"), F.col("_norm2").alias("norm2_a"))
    nb = norms.select(F.col("_blk"), F.col(id_col).alias("doc_b"), F.col("_norm2").alias("norm2_b"))
    out = dots.join(na, ["_blk", "doc_a"]).join(nb, ["_blk", "doc_b"])
    dec = "decimal(38,0)"
    keep = F.expr(
        f"cast({cos_den * cos_den} as {dec}) * cast(dot as {dec}) * cast(dot as {dec})"
        f" >= cast({cos_num * cos_num} as {dec}) * cast(norm2_a as {dec}) * cast(norm2_b as {dec})"
    )
    return out.filter(keep).select("doc_a", "doc_b", "dot", "norm2_a", "norm2_b")


def hashed_features(
    docs: DataFrame,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009): every term
    is bucketed by an engine-portable md5 hash into a fixed
    n_features-dim count vector — the stateless vectorizer an
    LLM-data or CTR pipeline uses when a vocabulary dictionary is too
    big to ship.

    Statelessness is the scale story: no vocabulary build, no
    dictionary broadcast, one explode + one hash aggregate; two
    documents hash identically on any cluster and any engine.  The
    per-doc collect_list is bounded by n_features cells, never by
    document length (counts are pre-aggregated), so no whale-doc
    buffer risk.

    Output per doc: (doc_id, n_terms, nnz, vec_md5) where n_terms is
    the vector's L1 mass (total term count), nnz its nonzero cells,
    and vec_md5 pins the full sparse vector as md5 of the canonical
    "idx:cnt idx:cnt ..." string (indices ascending).  Exact integers
    + md5 only.
    """
    norm = normalize_text(F.col(text_col))
    terms = docs.select(F.col(id_col), F.explode(words(norm)).alias("term")).filter(
        F.col("term") != ""
    )
    bucketed = terms.select(
        id_col,
        (
            F.conv(F.substring(F.md5(F.concat(F.col("term"), F.lit("|feat"))), 1, 15), 16, 10)
            .cast("long")
            % n_features
        ).alias("idx"),
    )
    cells = bucketed.groupBy(id_col, "idx").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return cells.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("nnz"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(idx, cnt))),"
                    " s -> concat(cast(s.idx as string), ':', cast(s.cnt as string)))"
                ),
            )
        ).alias("vec_md5"),
    )


def bigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model quality score in EXACT whole-bit units —
    the conditional-probability upgrade of ``unigram_surprisal``.

    With corpus counts c(w1) (as LEFT CONTEXT, i.e. over non-final
    positions) and c(w1,w2) (bigram) and
    vocabulary size V, each bigram's add-1-smoothed surprisal is

        floor(log2( (c(w1) + V) / (c(w1,w2) + 1) )) bits,

    computed float-free as ``length(bin(x div y)) - 1`` (the
    unigram_surprisal device: floor(log2(r)) == floor(log2(floor(r)))
    for r >= 1 — both operands are positive and the ratio is >= 1
    because c(w1) >= c(w1,w2)).  Repetitive texts (low conditional
    surprisal) score low; the sum is order-independent integer
    arithmetic, bit-stable across engines.

    Output: (doc_id, n_bigrams, surprisal_bits).

    Plan: one explode to (doc, w1, w2) pairs via the shifted-slice
    zip (no per-index lambda work), corpus bigram + unigram count
    aggregates (map-side combining), a 1-row V broadcast, two
    dictionary joins back keyed by the gram — inverted-index cost
    Σ tf, never all-pairs, same 100-TB shape as bm25/top_terms."""
    norm = normalize_text(F.col(text_col))
    ws = words(norm)
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    vocab = (
        docs.select(F.explode(words(normalize_text(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .select("w")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    scored = (
        pairs.join(bi, ["w1", "w2"]).join(uni, "w1").crossJoin(F.broadcast(vocab))
    )
    bits = F.length(F.bin(F.expr("(c1 + v) div (c12 + 1)"))) - 1
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(bits).cast("long").alias("surprisal_bits"),
    )


def hapax_docs(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """Documents ranked by hapax legomena — terms whose DOCUMENT
    frequency is exactly 1 (they appear in no other document).  A high
    hapax count flags vocabulary-novel documents (specialist content
    worth keeping) or garbage (OCR noise, random strings) — either
    way, the docs a curation pass should look at first.

    Output: top ``top_n`` by (n_hapax DESC, doc_id ASC) —
    (doc_id, n_hapax, n_terms, hapax_ratio_q20), the ratio an exact
    integer q20 of the rational n_hapax/n_terms:
    (2*2^20*h + n) div (2*n).

    Scale: distinct (doc, term) + a term-grain df aggregate (the
    inverted-index shuffle every tf-idf op already pays); the hapax
    join is term-keyed, and the final top-n is a TakeOrdered over the
    bounded per-doc grain.
    """
    dt = (
        docs.select(
            "doc_id", F.explode(words(normalize_text(F.col("text")))).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    df_ = dt.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    per = (
        dt.join(df_, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum((F.col("_df") == 1).cast("long")).cast("long").alias("n_hapax"),
        )
    )
    return (
        per.orderBy(F.desc("n_hapax"), F.asc("doc_id"))
        .limit(top_n)
        .select(
            "doc_id",
            "n_hapax",
            "n_terms",
            F.expr("(2097152 * n_hapax + n_terms) div (2 * n_terms)")
            .cast("long")
            .alias("hapax_ratio_q20"),
        )
    )


def word_simpson(docs: DataFrame) -> DataFrame:
    """Per-document unigram Simpson diversity — the repetition screen
    that catches template spam the bigram repetition ratio (L47)
    misses when the repeats are non-adjacent.

    For word counts c over a doc of n words, collision mass is the
    RATIONAL sum(c^2)/n^2, and the inverse-Simpson "effective
    vocabulary size" n^2/sum(c^2) is emitted as an exact q20 via the
    integer half-up device floor(a/b + 1/2) = (2a + b) div (2b) —
    no float division, no log, so there is no cross-engine coin flip
    at all (unlike float entropy, whose libm log2 differs per engine).

    Output: (doc_id, n_words, n_distinct_words, sum_sq,
    inv_simpson_q20).  Widest integer: 2 * n^2 * 2^20 needs
    n <= ~2.1e6 words/doc for BIGINT; computed in DECIMAL(38,0) so the
    real bound is n <= ~3e8 — documented per the overflow-headroom
    rule.

    Scale: per-document explode + two-level count — both aggregates
    are keyed by doc_id (map-side combinable), no cross-document
    state.
    """
    counts = (
        docs.select(
            "doc_id", F.explode(words(normalize_text(F.col("text")))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.sum(F.expr("c * c")).cast("long").alias("sum_sq"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "sum_sq",
            F.expr(
                "cast((2 * cast(n_words as decimal(38,0)) * n_words * 1048576"
                " + sum_sq) div (2 * cast(sum_sq as decimal(38,0))) as bigint)"
            ).alias("inv_simpson_q20"),
        )
    )


def length_drift(docs: DataFrame, sub_bits: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length-distribution drift screen: normalized-text char lengths
    bucketed by the L87 log-histogram device, then the L235 exact-
    rational chi-square per bucket between the even (baseline) and odd
    (current) doc_id ingest halves — the data-ops alarm for a
    truncation bug or a source-mix shift that term-level drift (L181)
    can miss when the vocabulary is stable but documents shrink.

    Buckets NEW in the current half (no baseline mass) are emitted
    with a NULL contribution — their existence is the alarm (the
    mix_drift_chi2 convention).  Headroom mirrors mix_drift_chi2: the
    squared numerator times 2^21 stays in DECIMAL(38,0)/HUGEINT while
    the two half totals stay under ~6e7 documents.

    Output: (bucket_lb, n_base, n_cur, chi2_contrib_q20) — bounded at
    ~64 * 2^sub_bits rows; one map-side-combining aggregate over the
    corpus, then frameless windows on the bounded bucket grain.
    """
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import (
        log_bucket_lower,
    )

    n = docs.select(
        (F.col(id_col) % 2).alias("_h"),
        F.length(normalize_text(F.col(text_col))).cast("long").alias("_len"),
    )
    per = (
        n.select(log_bucket_lower("_len", sub_bits).alias("bucket_lb"), "_h")
        .groupBy("bucket_lb")
        .agg(
            F.sum(F.when(F.col("_h") == 0, 1).otherwise(0)).cast("long").alias("n_base"),
            F.sum(F.when(F.col("_h") == 1, 1).otherwise(0)).cast("long").alias("n_cur"),
        )
    )
    dec = "decimal(38,0)"
    w = "(partition by (case when n_base > 0 then 1 else 0 end))"
    per = per.withColumn(
        "_n", F.expr(f"sum(case when n_base > 0 then n_cur else 0 end) over {w}")
    ).withColumn(
        "_m", F.expr(f"sum(case when n_base > 0 then n_base else 0 end) over {w}")
    )
    num = f"(cast(n_cur as {dec}) * _m - cast(_n as {dec}) * n_base)"
    den = f"(cast(_n as {dec}) * n_base * _m)"
    return per.select(
        "bucket_lb",
        "n_base",
        "n_cur",
        F.expr(
            f"case when n_base > 0 and _n > 0 then"
            f" cast((2 * {num} * {num} * 1048576 + {den}) div (2 * {den}) as bigint)"
            f" end"
        ).alias("chi2_contrib_q20"),
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus-wide
    top-``vocab_size`` term vocabulary — the first question a
    fixed-vocabulary tokenizer or classifier asks of a new source
    ("how much of this text does my vocab even cover"), and the
    cheap complement of BPE fertility (L172): fertility measures
    subword blow-up, OOV measures outright misses.

    Vocabulary selection is a TOTAL order (count DESC, term ASC), so
    the top-V cut is deterministic in both engines.  The cut is an
    ``orderBy(...).limit(V)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heap + bounded driver merge),
    NOT an unpartitioned row_number window that would drag every
    distinct term through one partition (ADVICE r07).  The vocab is
    bounded (V rows) and broadcast; the per-source rollup is one
    map-side-combining aggregate over the exploded tokens.  oov_q20
    is the half-up device on exact integer counts.

    Output: (source, n_tokens, n_oov, oov_q20).
    """
    ex = docs.select(
        F.col(source_col).alias("source"),
        F.explode(words(normalize_text(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    vocab = (
        ex.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("_in"))
    )
    return (
        ex.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr(
                "cast((2 * n_oov * 1048576 + n_tokens) div (2 * n_tokens) as bigint)"
            ).alias("oov_q20"),
        )
    )


def code_screen(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Code-vs-prose screen: the cheap symbol-density heuristic every
    pre-training mix needs before routing documents to a code or prose
    pipeline — prose has near-zero {}[]();=<> density, code rarely
    dips below a few percent.

    Exact integers: symbol/digit counts are length deltas after
    deleting the class (regexp with explicit character classes both
    engines parse identically); ratios are half-up q20; the flag is
    integer cross-multiplication (symbols * 100 >= 3 * n_chars).

    Output: (doc_id, n_chars, n_symbol, n_digit, symbol_q20,
    digit_q20, is_codey) — one projection, no shuffle.
    """
    n = F.length(F.col(text_col)).cast("long")
    sym = (
        n - F.length(F.regexp_replace(F.col(text_col), r"[{}\[\]();=<>]", ""))
    ).cast("long")
    dig = (n - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))).cast("long")
    d = docs.select(
        F.col(id_col),
        n.alias("n_chars"),
        sym.alias("n_symbol"),
        dig.alias("n_digit"),
    ).filter(F.col("n_chars") > 0)
    q = "cast((2 * {c} * 1048576 + n_chars) div (2 * n_chars) as bigint)"
    return d.select(
        id_col,
        "n_chars",
        "n_symbol",
        "n_digit",
        F.expr(q.format(c="n_symbol")).alias("symbol_q20"),
        F.expr(q.format(c="n_digit")).alias("digit_q20"),
        (F.col("n_symbol") * 100 >= F.col("n_chars") * 3).cast("long").alias("is_codey"),
    )


def surprisal_mix(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Source x surprisal-band quality-mix matrix — the L286
    length-mix device applied to LM quality: each doc's mean
    whole-bit unigram surprisal under the frozen full-corpus L6d
    scorer, floored to an integer band (``total_bits div n_words``),
    crossed with source.  Low bands = boilerplate/templated mass,
    high bands = rare-token / noisy mass; the matrix is the
    per-source quality fingerprint a mixing plan reads next to the
    length fingerprint (L286) and the drift alarms (L263).

    Output: (source, band_bits, n_docs, share_q20) — share within
    source, half-up q20.  All exact integers (floor-log2 bits,
    integer division).

    Scale: the L6d plan (one explode + bounded vocab join) plus a
    (source, doc) aggregate and a frameless share window over the
    bounded (source x ~20 band) grain."""
    norm = normalize_text(F.col(text_col))
    ex = docs.select(
        "source",
        F.col(id_col).alias("_did"),
        F.explode(words(norm)).alias("term"),
    )
    tf = ex.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = tf.agg(F.sum("n_term").alias("n_total"))
    bits = F.length(F.bin(F.expr("n_total div n_term"))) - 1
    per_doc = (
        ex.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("source", "_did")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nw"),
            F.sum(bits).cast("long").alias("_tb"),
        )
        .select("source", F.expr("_tb div _nw").cast("long").alias("band_bits"))
    )
    return (
        per_doc.groupBy("source", "band_bits")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn(
            "share_q20",
            F.expr(
                "(2 * n_docs * 1048576 + sum(n_docs) over (partition by source))"
                " div (2 * sum(n_docs) over (partition by source))"
            ).cast("long"),
        )
    )


def surprisal_drift(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """LM-quality drift screen: the FULL-corpus unigram whole-bit
    surprisal model (the L6d scorer, frozen) applied to each even/odd
    doc_id ingest half — the perplexity-proxy alarm that fires when a
    new batch's text is systematically rarer (crawl rot, language
    shift) or more boilerplate (mean bits/word drops) even while
    lengths and vocabulary look stable (the L247/L181 blind spot).

    The scorer is a pure function of the WHOLE corpus (floor-log2 bits
    = length(bin(N div n_t)) - 1, exact integers), so both halves are
    scored on the same model and comparable.  Per half: scored words,
    total bits, mean bits/word as half-up q20; drift = mean(odd) -
    mean(even), a difference of exact longs.

    Output: (half, n_scored_words, total_bits, mean_bits_q20) — two
    rows; drift is row arithmetic downstream.  Scale: the L6d plan
    with one extra grouping column.
    """
    norm = normalize_text(F.col(text_col))
    ex = docs.select(
        (F.col(id_col) % 2).cast("long").alias("half"),
        F.explode(words(norm)).alias("term"),
    )
    tf = ex.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = tf.agg(F.sum("n_term").alias("n_total"))
    scored = ex.join(tf, "term").crossJoin(F.broadcast(total))
    bits = F.length(F.bin(F.expr("n_total div n_term"))) - 1
    return (
        scored.groupBy("half")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_words"),
            F.sum(bits).cast("long").alias("total_bits"),
        )
        .select(
            "half",
            "n_scored_words",
            "total_bits",
            F.expr(
                "cast(case when n_scored_words = 0 then 0 else"
                " (2 * cast(total_bits as decimal(38,0)) * 1048576 + n_scored_words)"
                " div (2 * cast(n_scored_words as decimal(38,0))) end as bigint)"
            ).alias("mean_bits_q20"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary growth curve: token volume and NEW distinct
    terms per doc-id decile, with running totals — "how fast does new
    data stop adding new vocabulary", the lexical twin of the shingle
    saturation curve (L217) and the capacity question every tokenizer
    budget starts from (Heaps 1978: V ~ k·N^beta; the curve here is
    the exact-integer raw material, slope fitting stays client-side).

    A term is NEW in the decile of the smallest doc_id containing it
    (deterministic: ids, not arrival order).  Exact integers end to
    end.  Shape: one explode, one min-aggregate on the term grain (the
    standard inverted-index shuffle), one 10-row window for the
    cumulative sums — bounded driver-free arithmetic at any corpus
    size.  Output: (bucket, n_tokens, new_terms, cum_tokens,
    cum_vocab).
    """
    ex = docs.select(
        F.col(id_col),
        F.explode(words(normalize_text(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    mx = docs.agg(F.max(id_col).cast("long").alias("_mx"))
    bucket_of = lambda c: F.expr(
        f"least({n_buckets - 1}, {c} * {n_buckets} div (_mx + 1))"
    ).cast("long")
    tokens = (
        ex.crossJoin(F.broadcast(mx))
        .select(bucket_of(id_col).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    first = ex.groupBy("term").agg(F.min(id_col).cast("long").alias("_fd"))
    fresh = (
        first.crossJoin(F.broadcast(mx))
        .select(bucket_of("_fd").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tokens.join(fresh, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce(F.col("new_terms"), F.lit(0)).cast("long").alias("new_terms"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("cum_vocab", F.sum("new_terms").over(w).cast("long"))
    )


def ngram_novelty(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-half n-gram novelty — the contamination/staleness screen
    between ingest halves: of each source's distinct word-8-grams in
    the SECOND half (odd doc_id), what share never occurred in the
    first (even) half?  Low novelty = the new ingest is re-crawling
    known text (dedup will eat it); it is the n-gram-level sibling of
    the unigram term-drift screen (L181) and the decontamination
    overlap device (L22) pointed at ingest freshness.

    Shingles are hashed to engine-portable 60-bit md5 longs; novelty
    is an anti-join against the even-half distinct-gram set (the same
    inverted-index grain as dedup, cost Sigma df, never quadratic);
    the rate is half-up q20 on exact integer counts.  Output:
    (source, n_grams, n_novel, novelty_q20).
    """
    hash60 = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    grams = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.explode(word_shingles(words(normalize_text(F.col(text_col))), k)).alias("_s"),
    ).select(
        F.col(id_col), "source", hash60(F.col("_s")).alias("gram")
    )
    base = (
        grams.filter(F.col(id_col) % 2 == 0).select("gram").distinct()
    )
    cur = (
        grams.filter(F.col(id_col) % 2 == 1).select("source", "gram").distinct()
    )
    novel = cur.join(base, "gram", "left_anti")
    n_all = cur.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    n_new = novel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return (
        n_all.join(n_new, "source", "left")
        .select(
            "source",
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty_q20",
            F.expr("(2 * n_novel * 1048576 + n_grams) div (2 * n_grams)").cast("long"),
        )
    )


def sentence_stats(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source sentence-length profile: sentences are the [.!?]+
    splits of the normalized text (trimmed, empties dropped — the
    trim+filter normalizes the one edge the two engines' regex-split
    semantics disagree on, trailing empties).  The quality-screen
    companion to per-doc text_stats at the SOURCE grain: a source
    whose mean sentence length collapses is lists/boilerplate, one
    whose max explodes is unsegmented concatenation.

    Exact integers: sentence counts and char totals; mean as half-up
    q20.  Shape: one explode + one map-side-combining aggregate per
    source — no cross-document state.  Output: (source, n_docs,
    n_sentences, total_chars, mean_len_q20, max_len).
    """
    norm = normalize_text(F.col(text_col))
    parts = docs.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        F.explode(F.split(norm, r"[.!?]+")).alias("_s"),
    ).select("source", "doc_id", F.trim(F.col("_s")).alias("s"))
    sent = parts.filter(F.col("s") != "").select(
        "source", "doc_id", F.length("s").cast("long").alias("slen")
    )
    return (
        sent.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("slen").cast("long").alias("total_chars"),
            F.max("slen").cast("long").alias("max_len"),
        )
        .select(
            "source",
            "n_docs",
            "n_sentences",
            "total_chars",
            F.expr("(2 * total_chars * 1048576 + n_sentences) div (2 * n_sentences)")
            .cast("long")
            .alias("mean_len_q20"),
            "max_len",
        )
    )


def gate_ablation(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-gate ABLATION: the marginal rejection audit over the
    fused gate (doc_profile's four rules).  Per rule: (n_failing,
    n_sole, words_sole) where n_sole counts docs rejected by that rule
    ALONE — the docs a one-rule relaxation would recover.  A rule with
    large n_failing but zero n_sole is redundant with the rest of the
    gate; the sole column is what threshold tuning actually needs.

    100-TB shape: identical cost to the gate itself — the flags are
    chained projections inside the one fused scan (whole-stage
    codegen), then a 4-way ``stack`` to the rule grain and one
    exchange on a 4-key aggregate."""
    f = doc_profile(docs, text_col, id_col)
    fq = (~F.col("is_quality")).cast("int")
    fr = F.col("is_repetitive").cast("int")
    fl = (F.col("lang_guess") != "en").cast("int")
    fp = ((F.col("n_emails") + F.col("n_long_numbers")) > 0).cast("int")
    base = f.select(
        F.col(id_col),
        "n_words",
        fq.alias("_fq"),
        fr.alias("_fr"),
        fl.alias("_fl"),
        fp.alias("_fp"),
        (fq + fr + fl + fp).alias("_nfail"),
    )
    long = base.select(
        "n_words",
        "_nfail",
        F.expr(
            "stack(4, 'low_quality', _fq, 'repetitive', _fr, 'lang', _fl, 'pii', _fp)"
            " as (rule, flag)"
        ),
    )
    return long.groupBy("rule").agg(
        F.sum("flag").cast("long").alias("n_failing"),
        F.sum(F.when((F.col("flag") == 1) & (F.col("_nfail") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_sole"),
        F.sum(
            F.when((F.col("flag") == 1) & (F.col("_nfail") == 1), F.col("n_words")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("words_sole"),
    )


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source DATASET CARD — the one-table datasheet a training
    run ships with its corpus: document and word volumes, mean doc
    length (q20 half-up), quality-gate pass count, English share, PII
    incidence, and exact-duplicate count (docs whose normalized text
    recurs anywhere in the corpus), one row per source.

    100-TB shape: every per-doc field is chained projection inside
    ONE fused scan (the doc_profile device); the only corpus-wide
    fact — exact-dup membership — is a frameless COUNT OVER
    (PARTITION BY md5(norm)) on the same lineage (one exchange on the
    hash, the L8 grouping), then one source-grain aggregate."""
    norm = normalize_text(F.col(text_col))
    d = docs.select(
        F.col(id_col), F.col(source_col).alias("source"), norm.alias("_norm")
    )
    d = d.select(
        F.col(id_col),
        "source",
        "_norm",
        words(F.col("_norm")).alias("_ws"),
        F.regexp_replace("_norm", EMAIL_RE, "<email>").alias("_nomail"),
    )
    n_words = F.size("_ws").cast("long")
    n_distinct = F.size(F.array_distinct(F.col("_ws"))).cast("long")
    flagged = d.select(
        "source",
        n_words.alias("_nw"),
        ((n_words >= 5) & (n_distinct * 10 >= n_words * 3)).alias("_is_q"),
        *lang_cols(F.array_distinct(F.col("_ws"))),
        (
            F.size(F.regexp_extract_all(F.col("_norm"), F.lit(EMAIL_RE), 0))
            + F.size(F.regexp_extract_all(F.col("_nomail"), F.lit(LONG_NUMBER_RE), 0))
            > 0
        ).alias("_has_pii"),
        F.md5("_norm").alias("_h"),
    )
    from pyspark.sql import Window

    dup = F.count(F.lit(1)).over(Window.partitionBy("_h"))
    per_doc = flagged.withColumn("_dup", (dup >= 2).cast("int"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nw").cast("long").alias("total_words"),
            F.sum(F.col("_is_q").cast("int")).cast("long").alias("n_quality"),
            F.sum((F.col("lang_guess") == "en").cast("int")).cast("long").alias("n_en"),
            F.sum(F.col("_has_pii").cast("int")).cast("long").alias("n_pii_docs"),
            F.sum("_dup").cast("long").alias("n_exact_dup"),
        )
        .select(
            "source",
            "n_docs",
            "total_words",
            F.expr("(2 * total_words * 1048576 + n_docs) div (2 * n_docs)")
            .cast("long")
            .alias("mean_words_q20"),
            "n_quality",
            "n_en",
            "n_pii_docs",
            "n_exact_dup",
        )
    )
