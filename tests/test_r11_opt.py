"""Round-11 OPTIMIZATION equivalence tests: every operator whose
internals changed for performance must produce bit-identical results
through both the old-style and optimized paths (the round's hard rule:
results never change)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.operators import segmentation as seg


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, lang, text) — b quotes a wholesale inside padding
        # (containment case), c is a near-jaccard copy of a, d unrelated,
        # e a different language block
        (1, "en", "alpha beta gamma delta epsilon zeta"),
        (2, "en", "intro words alpha beta gamma delta epsilon zeta trailing tail here"),
        (3, "en", "alpha beta gamma delta epsilon eta"),
        (4, "en", "totally different content with no shared phrases at all"),
        (5, "fr", "un deux trois quatre cinq six"),
        (6, "fr", "un deux trois quatre cinq sept"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pair_queries_with_precomputed_sets_identical(docs):
    """The staged _ngram_sets path (sets built once, localCheckpoint'd)
    must equal the inline path for BOTH pair operators."""
    sets = dd.blocked_shingle_sets(docs).localCheckpoint()
    assert _rows(dd.ngram_jaccard_pairs(docs)) == _rows(
        dd.ngram_jaccard_pairs(docs, sets=sets)
    )
    assert _rows(dd.containment_pairs(docs, cont_num=4, cont_den=5)) == _rows(
        dd.containment_pairs(docs, cont_num=4, cont_den=5, sets=sets)
    )


def test_rfm_stacked_rank_matches_per_axis_ranks(spark):
    """rfm_scores' single stacked two-phase rank must equal the three
    independent per-axis global ranks it replaced (within-axis rank =
    global rank - axis*n holds because axes sort disjointly)."""
    rows = [
        # (custkey, orderdate, totalprice) — ties on frequency and
        # monetary exercise the custkey tiebreak
        (1, "1994-01-05", 10.00),
        (1, "1994-03-01", 20.00),
        (2, "1994-02-01", 30.00),
        (3, "1994-03-01", 15.00),
        (3, "1994-01-01", 15.00),
        (4, "1994-02-20", 30.00),
        (5, "1994-01-30", 5.00),
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    )
    got = seg.rfm_scores(orders)
    base = got.select("custkey", "recency_days", "frequency", "monetary_cents")
    n = base.count()
    r = seg.global_row_number(base, ["recency_days", "custkey"], "_rr")
    r = r.withColumn("_rr_inv", (F.lit(n) + 1 - F.col("_rr")))
    f = seg.global_row_number(r, ["frequency", "custkey"], "_rf")
    m = seg.global_row_number(f, ["monetary_cents", "custkey"], "_rm")
    expected = m.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        seg._quintile("_rr_inv", n).alias("r_score"),
        seg._quintile("_rf", n).alias("f_score"),
        seg._quintile("_rm", n).alias("m_score"),
    )
    assert _rows(got) == _rows(expected)


def test_repeat_gate_array_formulation_matches_explode(spark, tmp_path):
    """IncrementalRepeatGate._gate's sorted-array run counting must
    equal the explode+groupBy multiplicity formulation it replaced."""
    from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

    rows = [
        # doc 1: 'a b c a b c a b c a b' repeats the 3-gram stream
        (1, "s1", "a b c a b c a b c a b"),
        (2, "s1", "one two three four five six seven eight nine"),
        (3, "s2", "x y x y x y x y x y x y"),
        (4, "s2", "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    drv = inc.IncrementalRepeatGate(spark, str(tmp_path / "gate"))
    k = 3
    sh = drv._word_shingles(drv._words(drv._normalize_text(F.col("text"))), k)
    inst = docs.select(
        "doc_id", "source", F.explode(F.transform(sh, drv._shingle_hash)).alias("sh")
    )
    expected_rep = {
        (r["doc_id"], r["source"]): r["_rep_inst"]
        for r in inst.groupBy("doc_id", "source", "sh")
        .agg(F.count(F.lit(1)).cast("long").alias("_m"))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.when(F.col("_m") >= 2, F.col("_m")).otherwise(0))
            .cast("long")
            .alias("_rep_inst")
        )
        .collect()
    }
    expected = {}
    for (doc, src), rep in expected_rep.items():
        n_docs, n_flag, tot = expected.get(src, (0, 0, 0))
        expected[src] = (n_docs + 1, n_flag + (1 if rep > 0 else 0), tot + rep)
    got = {
        r["source"]: (r["n_docs"], r["n_flagged"], r["rep_instances"])
        for r in drv._gate(docs, k=k).collect()
    }
    assert got == expected
