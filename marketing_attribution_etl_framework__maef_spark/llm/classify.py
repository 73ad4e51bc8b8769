"""Multinomial Naive Bayes language ID — train AND score in fixed
point, so the classifier is deterministic cross-engine.

The n-gram-heuristic language ID (llm/text.py:123) needs no training;
this is the supervised upgrade an LLM-data pipeline actually runs:
fit a multinomial NB on the labeled slice, score the corpus, report
the confusion matrix.

Everything that touches floats is quantized ONCE at train time:

- counts c(l,w), class token totals tot(l), vocabulary size V, doc
  counts n(l): exact longs from two hash aggregates;
- log-weights w_q20(l,w) = floor(ln((c+1)/(tot_l+V)) * 2^20 + 0.5)
  and the per-class unseen weight (c=0 case) and prior
  floor(ln(n_l/n) * 2^20 + 0.5): irrational values, q20-safe per the
  repo float policy (pow/cosine/sqrt precedents).

Scoring is then INTEGER arithmetic end to end:

    score(d,l) = prior_q20(l) + sum_w tf(d,w) * w_q20(l,w)
               + (tf_total(d) - tf_matched(d,l)) * unseen_q20(l)

— a sum of longs, immune to accumulation-order noise, so the argmax
(ties by lang ascending) is bit-stable and the whole pipeline is
oracle-checkable.

Scale: the weights table is |langs| x V rows keyed on word — an equi
shuffle join against the exploded corpus (token count, not doc
count, is the join cardinality); langs are bounded so the per-(doc,
lang) aggregate fans out by a small constant. No windows over
unbounded groups, no driver state at all (the quantization happens
inside the plan).

Reference parity: no counterpart — reference has no text layer; this
extends SURVEY §2.10's text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, words

_Q = 1_048_576  # 2^20


def _q20_ln(expr: str) -> str:
    return f"cast(floor(ln({expr}) * {_Q} + 0.5) as bigint)"


def token_tf(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, word) term frequency with the label carried:
    (doc_id, label, word, tf) — one tokenize+explode+aggregate of the
    corpus from which both the training counts (sum tf per (label,
    word)) and the per-doc scoring tf derive."""
    return (
        docs.select(
            F.col(id_col),
            F.col(label_col).alias("label"),
            F.explode(words(normalize_text(F.col(text_col)))).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy(id_col, "label", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> dict:
    """Fit multinomial NB; returns the three model tables (DataFrames):
    weights (label, word, w_q20), classes (label, prior_q20,
    unseen_q20), and the scalar vocab size df.

    ``counts``: optionally precomputed (label, word, c) token counts
    (e.g. a ``token_tf`` roll-up) — result-identical.
    """
    if counts is None:
        toks = docs.select(
            F.col(label_col).alias("label"),
            F.explode(words(normalize_text(F.col(text_col)))).alias("word"),
        ).filter(F.col("word") != "")
        counts = toks.groupBy("label", "word").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    tot = counts.groupBy("label").agg(F.sum("c").cast("long").alias("tot"))
    vocab = counts.select("word").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    n_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    n_all = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    classes = (
        n_docs.join(F.broadcast(n_all))
        .join(tot, "label")
        .join(F.broadcast(vocab))
        .select(
            "label",
            F.expr(_q20_ln("cast(n_l as double) / n")).alias("prior_q20"),
            F.expr(_q20_ln("1.0 / (tot + v)")).alias("unseen_q20"),
            "tot",
        )
    )
    weights = counts.join(tot, "label").join(F.broadcast(vocab)).select(
        "label",
        "word",
        F.expr(_q20_ln("cast(c + 1 as double) / (tot + v)")).alias("w_q20"),
    )
    return {"weights": weights, "classes": classes}


def nb_predict(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Score every doc against every class; argmax with label-ascending
    tie-break.  Output: (doc_id, pred_label, score_q20).

    Overflow headroom: the per-doc BIGINT sum(tf * w_q20) holds for
    documents up to ~2e11 tokens even at |w_q20| ~ ln(1e18-token
    corpus) * 2^20 (tests/test_overflow_headroom.py)."""
    if tf is None:
        tf = (
            docs.select(
                F.col(id_col), F.explode(words(normalize_text(F.col(text_col)))).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy(id_col, "word")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
    doc_tot = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("tf_total"))
    matched = (
        tf.join(model["weights"], "word")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("tf") * F.col("w_q20")).cast("long").alias("w_matched"),
            F.sum("tf").cast("long").alias("tf_matched"),
        )
    )
    classes = F.broadcast(model["classes"].select("label", "prior_q20", "unseen_q20"))
    scored = (
        doc_tot.join(classes)  # bounded fan-out: |langs| rows per doc
        .join(matched, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("prior_q20")
                + F.coalesce(F.col("w_matched"), F.lit(0))
                + (F.col("tf_total") - F.coalesce(F.col("tf_matched"), F.lit(0)))
                * F.col("unseen_q20")
            )
            .cast("long")
            .alias("score_q20"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_q20"), F.asc("label"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "score_q20")
    )


def nb_confusion(
    docs: DataFrame, label_col: str = "lang", text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-train + score + confusion matrix (bounded |langs|^2 rows).

    Output: (lang, pred_label, n_docs).

    Pass structure (r11 relabel + r12 fix, VERDICT r11 #4): sharing the
    lazy (doc, label, word, tf) lineage between consumers does NOT
    deduplicate compute — each consumer re-expands the tokenize (the
    r11 before/after plans were identical; that claim is withdrawn).
    What does reduce the pass count: materializing the (label, word, c)
    roll-up, which is vocabulary-sized (V x |langs| rows — tiny next to
    the doc x word tf table whose checkpoint measured SLOWER in r11),
    so the three training consumers (class totals, vocab size, weights)
    read one small checkpoint instead of re-running the corpus
    tokenize+explode+aggregate each.  Tokenize passes: 5 -> 3 (counts
    build + doc_tot + matched); plan scan count drops accordingly
    (plans/r12/llm_nb_langid_{before,after}.txt)."""
    tf_tab = token_tf(docs, label_col, text_col, id_col)
    counts = tf_tab.groupBy("label", "word").agg(
        F.sum("tf").cast("long").alias("c")
    ).localCheckpoint()
    model = nb_train(docs, label_col, text_col, counts=counts)
    pred = nb_predict(
        docs, model, text_col, id_col, tf=tf_tab.select(id_col, "word", "tf")
    )
    return (
        docs.select(F.col(id_col), F.col(label_col).alias("lang"))
        .join(pred, id_col)
        .groupBy("lang", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


CT_PROFILE_K = 15


def ct_char_profiles(docs: DataFrame, label_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Cavnar-Trenkle (1994) character-trigram rank profiles per
    language: top-K trigrams by (count DESC, gram ASC), rank 1..K.
    Exact integers; the (count, gram) total order makes ranks
    deterministic cross-engine."""
    tri = docs.select(
        F.col(label_col).alias("lang"), normalize_text(F.col(text_col)).alias("norm")
    ).select(
        "lang",
        F.explode(
            F.expr(
                "case when length(norm) >= 3 then"
                " transform(sequence(1, length(norm) - 2), i -> substr(norm, i, 3))"
                " else cast(array() as array<string>) end"
            )
        ).alias("g"),
    )
    counts = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    return (
        counts.withColumn("lrank", F.row_number().over(w).cast("long"))
        .filter(F.col("lrank") <= CT_PROFILE_K)
        .select("lang", "g", "lrank")
    )


def ct_predict(docs: DataFrame, profiles: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Out-of-place classification: each doc's top-K trigram profile is
    compared to every language profile; score = sum over the doc's
    grams of |doc_rank - lang_rank|, missing grams costing K.  Predict
    argmin with (score ASC, lang ASC) tie-break.

    Output: (doc_id, pred_lang, score).  The doc x lang fan-out is
    K x |languages| rows per doc — bounded by the label dimension, the
    same shape as nb_predict."""
    k = CT_PROFILE_K
    tri = docs.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("norm")
    ).select(
        id_col,
        F.explode(
            F.expr(
                "case when length(norm) >= 3 then"
                " transform(sequence(1, length(norm) - 2), i -> substr(norm, i, 3))"
                " else cast(array() as array<string>) end"
            )
        ).alias("g"),
    )
    dcounts = tri.groupBy(id_col, "g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wd = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("g"))
    dprof = (
        dcounts.withColumn("drank", F.row_number().over(wd).cast("long"))
        .filter(F.col("drank") <= k)
        .select(id_col, "g", "drank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        dprof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "g"], "left")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.coalesce(F.abs(F.col("drank") - F.col("lrank")), F.lit(k)))
            .cast("long")
            .alias("score")
        )
    )
    wp = Window.partitionBy(id_col).orderBy(F.asc("score"), F.asc("lang"))
    return (
        scored.withColumn("_rk", F.row_number().over(wp))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "score")
    )
