"""Unit tests for the round-3 operators: boilerplate-segment scrub,
incremental dedup, bucketed interval join, snapshot CDC diff, and
curriculum bucketing — each on a handmade fixture with hand-computed
expectations."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.curation import curriculum_buckets
from marketing_attribution_etl_framework__maef_spark.llm.dedup import boilerplate_scrub, incremental_dedup
from marketing_attribution_etl_framework__maef_spark.operators import funnel as fnl
from marketing_attribution_etl_framework__maef_spark.operators.cdc import snapshot_diff
from marketing_attribution_etl_framework__maef_spark.operators.intervals import interval_join_bucketed

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# boilerplate_scrub
# ---------------------------------------------------------------------------


def test_boilerplate_scrub_removes_shared_segments(spark):
    # segment size 2: "x y" is the shared boilerplate (docs 1 and 2);
    # every other segment is unique to its doc.
    docs = spark.createDataFrame(
        [
            (1, "x y a b c"),      # segs: "x y" | "a b" | "c"
            (2, "x y d e"),        # segs: "x y" | "d e"
            (3, "f g h i"),        # segs: "f g" | "h i"
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_scrub(docs, seg_words=2, min_docs=2).collect()
    }
    assert out[1]["n_segments"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["clean_fp"] == _md5("a b c")
    assert out[1]["clean_n_chars"] == len("a b c")
    assert out[2]["n_segments"] == 2 and out[2]["n_removed"] == 1
    assert out[2]["clean_fp"] == _md5("d e")
    assert out[3]["n_removed"] == 0 and out[3]["clean_fp"] == _md5("f g h i")


def test_boilerplate_scrub_fully_removed_doc(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x y")], "doc_id long, text string"
    )
    rows = boilerplate_scrub(docs, seg_words=2, min_docs=2).collect()
    for r in rows:
        assert r["n_removed"] == 1
        assert r["clean_n_chars"] == 0
        assert r["clean_fp"] == _md5("")


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_first_wins_and_anti_join(spark):
    corpus = spark.createDataFrame(
        [(1, "old doc one"), (2, "old doc two")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "old doc one"),   # collides with corpus -> dropped
            (11, "brand new a"),   # survives
            (12, "brand new a"),   # within-batch dup of 11 -> dropped
            (13, "  Brand NEW a "),  # normalize-identical to 11 -> dropped
            (14, "brand new b"),   # survives
        ],
        "doc_id long, text string",
    )
    rows = incremental_dedup(batch, corpus).collect()
    assert sorted(r["doc_id"] for r in rows) == [11, 14]


def test_incremental_dedup_empty_batch_and_disjoint(spark):
    corpus = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_dedup(empty, corpus).count() == 0
    disjoint = spark.createDataFrame([(5, "c d")], "doc_id long, text string")
    assert incremental_dedup(disjoint, corpus).collect()[0]["doc_id"] == 5


# ---------------------------------------------------------------------------
# interval_join_bucketed
# ---------------------------------------------------------------------------


@pytest.fixture()
def iv_fixture(spark):
    facts = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(minutes=5)),
            (2, T0 + dt.timedelta(minutes=30)),   # == end of w1 -> excluded (half-open)
            (3, T0 + dt.timedelta(minutes=29, seconds=59)),
            (4, T0 + dt.timedelta(hours=5)),      # in no window
            (5, T0 + dt.timedelta(minutes=45)),   # in w2 only
        ],
        "fact_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, T0, T0 + dt.timedelta(minutes=30)),
            (200, T0 + dt.timedelta(minutes=40), T0 + dt.timedelta(minutes=70)),
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    return facts, intervals


def test_interval_join_matches_and_half_open(spark, iv_fixture):
    facts, intervals = iv_fixture
    out = interval_join_bucketed(
        facts, intervals, "ts", "w_start", "w_end", bucket_seconds=600
    )
    pairs = sorted((r["window_id"], r["fact_id"]) for r in out.collect())
    assert pairs == [(100, 1), (100, 3), (200, 5)]


def test_interval_join_no_duplicate_pairs_with_tiny_buckets(spark, iv_fixture):
    # bucket much smaller than the interval: the interval explodes over
    # many buckets, but each fact lives in exactly one bucket, so every
    # (interval, fact) pair still joins at most once.
    facts, intervals = iv_fixture
    out = interval_join_bucketed(
        facts, intervals, "ts", "w_start", "w_end", bucket_seconds=60
    )
    pairs = [(r["window_id"], r["fact_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs)) == 3


def test_interval_join_rejects_column_collision(spark, iv_fixture):
    facts, intervals = iv_fixture
    with pytest.raises(ValueError, match="collision"):
        interval_join_bucketed(
            facts.withColumnRenamed("fact_id", "window_id"),
            intervals, "ts", "w_start", "w_end", 600,
        )


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, None)], "k long, v long, s string"
    )
    new = spark.createDataFrame(
        [(2, 21, "b"), (3, 30, None), (4, 40, "d")], "k long, v long, s string"
    )
    out = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert out == {1: "deleted", 2: "updated", 3: "unchanged", 4: "inserted"}


def test_snapshot_diff_null_vs_value_is_updated(spark):
    # NULL -> value must be 'updated', not 'unchanged' (null-safe compare)
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "x")], "k long, s string")
    rows = snapshot_diff(old, new, ["k"], ["s"]).collect()
    assert rows[0]["change_type"] == "updated"


# ---------------------------------------------------------------------------
# curriculum_buckets
# ---------------------------------------------------------------------------


def test_curriculum_equal_population_and_score_monotone(spark):
    # 8 docs with strictly increasing distinct-ratio scores -> with
    # n_buckets=4 every bucket gets exactly 2 docs, and score ranges
    # must be disjoint and increasing with the bucket id.
    texts = [
        "a a a a a a a a",        # 1/8
        "a a a a a a a b",        # 2/8
        "a a a a a a b c",        # 3/8
        "a a a a a b c d",        # 4/8
        "a a a a b c d e",        # 5/8
        "a a a b c d e f",        # 6/8
        "a a b c d e f g",        # 7/8
        "a b c d e f g h",        # 8/8
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = sorted(curriculum_buckets(docs, n_buckets=4).collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
    assert all(r["n_docs"] == 2 for r in rows)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score_q20"] < hi["min_score_q20"]
    assert sum(r["sum_words"] for r in rows) == 64


def test_curriculum_ties_share_a_bucket(spark):
    # all-identical scores collapse into bucket 1 (ties sit low)
    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(6)], "doc_id long, text string"
    )
    rows = curriculum_buckets(docs, n_buckets=3).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 1 and rows[0]["n_docs"] == 6


def test_curriculum_rejects_single_bucket(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="buckets"):
        curriculum_buckets(docs, n_buckets=1)


# ---------------------------------------------------------------------------
# funnel_stages / funnel_summary / cohort_retention
# ---------------------------------------------------------------------------


@pytest.fixture()
def funnel_events(spark):
    rows = [
        # u1 completes view -> click -> buy in order
        (1, "view", T0), (1, "click", T0 + dt.timedelta(minutes=1)),
        (1, "buy", T0 + dt.timedelta(minutes=2)),
        # u2: click BEFORE view, then no click after view -> stage 1
        (2, "click", T0), (2, "view", T0 + dt.timedelta(minutes=1)),
        # u3: click only (never viewed) -> stage 0
        (3, "click", T0),
        # u4: view then click, buy before click -> stage 2
        (4, "view", T0), (4, "buy", T0 + dt.timedelta(minutes=1)),
        (4, "click", T0 + dt.timedelta(minutes=2)),
        # u5: no funnel event types at all -> absent from output
        (5, "error", T0),
    ]
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_funnel_stages_strict_ordering(spark, funnel_events):
    out = {
        r["user_id"]: r["funnel_stage"]
        for r in fnl.funnel_stages(funnel_events, ["view", "click", "buy"]).collect()
    }
    assert out == {1: 3, 2: 1, 3: 0, 4: 2}


def test_funnel_summary_cumulative_reach(spark, funnel_events):
    rows = {
        r["funnel_stage"]: (r["n_users"], r["n_reached"])
        for r in fnl.funnel_summary(funnel_events, ["view", "click", "buy"]).collect()
    }
    assert rows == {0: (1, 4), 1: (1, 3), 2: (1, 2), 3: (1, 1)}


def test_funnel_equal_timestamp_does_not_count(spark):
    # strict ordering: a click at the exact same instant as the view
    # does not advance the funnel
    ev = spark.createDataFrame(
        [(1, "view", T0), (1, "click", T0)], "user_id long, event_type string, ts timestamp"
    )
    rows = fnl.funnel_stages(ev, ["view", "click"]).collect()
    assert rows[0]["funnel_stage"] == 1


def test_cohort_retention_day_grain(spark):
    d = lambda days, hours=0: T0 + dt.timedelta(days=days, hours=hours)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, d(0)), (1, d(0, 5)), (1, d(2)),   # cohort day0, active offsets {0, 2}
            (2, d(2)), (2, d(3)),                  # cohort day2, offsets {0, 1}
            (3, d(0)),                             # cohort day0, offset {0}
        ],
        "user_id long, ts timestamp",
    )
    out = {
        (r["cohort_period"].isoformat(), r["period_offset"]): r["n_active"]
        for r in fnl.cohort_retention(ev, grain="day").collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
        ("2024-01-03", 1): 1,
    }


def test_cohort_retention_rejects_bad_grain(spark):
    ev = spark.createDataFrame([(1, T0)], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="grain"):
        fnl.cohort_retention(ev, grain="month")


# ---------------------------------------------------------------------------
# group_topk / incremental_neardup_pairs
# ---------------------------------------------------------------------------


def test_group_topk_ranks_and_ties(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.topk import group_topk

    df = spark.createDataFrame(
        [("a", 1, 30), ("a", 2, 30), ("a", 3, 10), ("a", 4, 5), ("b", 5, 1)],
        "g string, id long, score long",
    )
    out = sorted(
        (r["g"], r["rnk"], r["id"])
        for r in group_topk(df, ["g"], [F.desc("score"), F.asc("id")], k=2).collect()
    )
    # tie on score=30 broken by id asc; only top-2 kept per group
    assert out == [("a", 1, 1), ("a", 2, 2), ("b", 1, 5)]


def test_group_topk_rejects_nonpositive_k(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.topk import group_topk

    df = spark.createDataFrame([("a", 1)], "g string, id long")
    with pytest.raises(ValueError, match="k"):
        group_topk(df, ["g"], [F.asc("id")], k=0)


def test_incremental_neardup_cross_set_only(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.dedup import incremental_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark plans and shuffles here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base + " extra tail"),             # near-dup of corpus doc 1
            (11, base + " extra tail"),             # identical to 10: batch-internal pair must NOT appear
            (12, "unrelated payload entirely novel content stream for testing"),
        ],
        "doc_id long, text string",
    )
    rows = incremental_neardup_pairs(batch, corpus).collect()
    pairs = sorted((r["doc_a"], r["doc_b"]) for r in rows)
    assert pairs == [(1, 10), (1, 11)]
    for r in rows:
        # J >= 1/2 held with exact integer sizes
        assert r["inter_size"] * 2 >= r["union_size"]


# ---------------------------------------------------------------------------
# bpe_merges
# ---------------------------------------------------------------------------


def test_bpe_merges_classic_example(spark):
    # Sennrich et al.'s canonical vocabulary: low x4, lower x2,
    # newest x5, widest x3 (split across two docs; counts are what
    # matter). Hand-derived first merges: (e,s)=8, (es,t)=8, then
    # (l,o)=6, (lo,w)=6, then the count-5 tie (e,w) beats (n,..),
    # (w,..) lexicographically, and (ew,est) follows.
    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest newest widest"),
            (2, "widest widest newest low"),
        ],
        "doc_id long, text string",
    )
    from marketing_attribution_etl_framework__maef_spark.llm.tokenizer import bpe_merges

    rows = [tuple(r) for r in sorted(bpe_merges(docs, n_merges=6).collect())]
    assert rows == [
        (1, "e", "s", "es", 8),
        (2, "es", "t", "est", 8),
        (3, "l", "o", "lo", 6),
        (4, "lo", "w", "low", 6),
        (5, "e", "w", "ew", 5),
        (6, "ew", "est", "ewest", 5),
    ]


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    # 'a a a' with merge (a,a) must become 'aa a', never 'a aa':
    # with word 'aaa' x3 and 'ab' x1: first merge is (a,a)=6
    # (aaa contributes two overlapping pairs -> counted 2 per word),
    # and after application the pair (aa,a) exists (greedy), not (a,aa).
    from marketing_attribution_etl_framework__maef_spark.llm.tokenizer import bpe_merges

    docs = spark.createDataFrame([(1, "aaa aaa aaa ab")], "doc_id long, text string")
    rows = [tuple(r) for r in sorted(bpe_merges(docs, n_merges=2).collect())]
    assert rows[0] == (1, "a", "a", "aa", 6)
    assert rows[1] == (2, "aa", "a", "aaa", 3)


def test_bpe_encode_counts(spark):
    from marketing_attribution_etl_framework__maef_spark.llm.tokenizer import bpe_encode_counts

    # merges (l,o) then (lo,w): 'low' -> 1 token, 'lower' -> low,e,r = 3,
    # 'slow' -> s,low = 2; unmerged 'dog' stays 3 chars
    docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "slow dog")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(docs, [("l", "o"), ("lo", "w")]).collect()
    }
    assert out == {1: (3, 1 + 3 + 1), 2: (2, 2 + 3)}


def test_channel_transitions_chain_and_absorbing_states(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.markov import channel_transitions

    j = spark.createDataFrame(
        [
            # conv A: view -> click
            ("A", "s1", T0, "view"),
            ("A", "s2", T0 + dt.timedelta(minutes=1), "click"),
            # conv B: click only
            ("B", "s3", T0, "click"),
            # conv C: tie on ts broken by session_id: s4 < s5
            ("C", "s4", T0, "view"),
            ("C", "s5", T0, "signup"),
        ],
        "conversion_id string, session_id string, event_ts timestamp, channel_label string",
    )
    out = {(r["src"], r["dst"]): r["n"] for r in channel_transitions(j).collect()}
    assert out == {
        ("(start)", "view"): 2,
        ("(start)", "click"): 1,
        ("view", "click"): 1,
        ("view", "signup"): 1,
        ("click", "(conversion)"): 2,
        ("signup", "(conversion)"): 1,
    }


def test_markov_removal_effects_two_path_chain(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.markov import removal_effects

    # two disjoint single-hop paths: (start)->view->(conv) and
    # (start)->click->(conv). Full-chain absorption = 1.0 (q20 2^20);
    # removing either channel kills exactly half the probability mass.
    j = spark.createDataFrame(
        [
            ("A", "s1", T0, "view"),
            ("B", "s2", T0, "click"),
        ],
        "conversion_id string, session_id string, event_ts timestamp, channel_label string",
    )
    rows = {r["removed_channel"]: r for r in removal_effects(j).collect()}
    assert rows["(none)"]["absorption_q20"] == 1 << 20
    assert rows["(none)"]["removal_q20"] == 0
    for ch in ("view", "click"):
        assert rows[ch]["absorption_q20"] == 1 << 19
        assert rows[ch]["removal_q20"] == 1 << 19


# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------


def test_bucketed_join_eliminates_exchange(spark):
    from marketing_attribution_etl_framework__maef_spark.sources.bucketed import (
        has_join_exchange,
        write_bucketed,
    )

    left = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "user_id long, a long"
    )
    right = spark.createDataFrame(
        [(i % 40, i) for i in range(200)], "user_id long, b long"
    )
    write_bucketed(left, "t_bleft", "/tmp/maef_test_bucketed/left", "user_id", 8, "user_id")
    write_bucketed(right, "t_bright", "/tmp/maef_test_bucketed/right", "user_id", 8, "user_id")
    j = spark.table("t_bleft").join(spark.table("t_bright"), "user_id")
    # the whole point: both sides pre-clustered -> no shuffle on the key
    assert not has_join_exchange(j, "user_id")
    # and the result is the plain join's result
    assert j.count() == 200
    # a non-bucketed twin of the same join DOES shuffle
    plain = left.join(right, "user_id")
    assert has_join_exchange(plain, "user_id")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import cms_estimates, cms_table

    words = ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1
    df = spark.createDataFrame([(w,) for w in words], "w string")
    cms = cms_table(df, "w", d=4, w=256)
    # total mass is conserved per row
    per_row = {r["row"]: 0 for r in cms.collect()}
    for r in cms.collect():
        per_row[r["row"]] += r["cnt"]
    assert all(v == len(words) for v in per_row.values())
    items = spark.createDataFrame([("alpha", 7), ("beta", 3), ("gamma", 1)], "w string, tf long")
    est = {r["w"]: r["cms_est"] for r in cms_estimates(cms, items, "w", d=4, w=256).collect()}
    for w, tf in (("alpha", 7), ("beta", 3), ("gamma", 1)):
        assert est[w] >= tf  # CMS never underestimates
    # 3 distinct items in 256 buckets: overwhelmingly collision-free,
    # and with d=4 rows a collision in EVERY row is impossible here —
    # the min must be exact
    assert est == {"alpha": 7, "beta": 3, "gamma": 1}


def test_cms_merges_by_cellwise_addition(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import cms_table

    a = spark.createDataFrame([("x",)] * 4, "w string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)], "w string")
    both = a.unionByName(b)
    merged = {
        (r["row"], r["bucket"]): r["cnt"] for r in cms_table(both, "w").collect()
    }
    ca = {(r["row"], r["bucket"]): r["cnt"] for r in cms_table(a, "w").collect()}
    cb = {(r["row"], r["bucket"]): r["cnt"] for r in cms_table(b, "w").collect()}
    summed = dict(ca)
    for k, v in cb.items():
        summed[k] = summed.get(k, 0) + v
    assert merged == summed


def test_incremental_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    from marketing_attribution_etl_framework__maef_spark import domain
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import cms_table
    from marketing_attribution_etl_framework__maef_spark.streaming import incremental as inc

    drv = inc.IncrementalCMS(spark, str(tmp_path / "cms"), value_col="user_id")
    ev = inc.stream_events_nanos(spark, f"{sf_dir}/events.parquet")
    drv.start(ev).awaitTermination()
    got = {(r["row"], r["bucket"]): r["cnt"] for r in drv.sketch().collect()}
    batch = cms_table(
        domain.load_table(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("_v")
        ),
        "_v",
    )
    want = {(r["row"], r["bucket"]): r["cnt"] for r in batch.collect()}
    assert got == want


def test_check_constraints_one_pass_ledger(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quality import check_constraints

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "b", None), (None, "zz", 3.0)],
        "id long, cat string, v double",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in check_constraints(
            df,
            row_rules={
                "id_not_null": F.col("id").isNull(),
                "v_nonneg": F.col("v") < 0,          # NULL v counts as violation
                "cat_known": ~F.col("cat").isin("a", "b"),  # NULL cat counts too
            },
            unique_keys={"id_unique": ["id"]},
        ).collect()
    }
    assert out == {
        "id_not_null": 1,
        "v_nonneg": 2,   # the -1 row and the NULL-v row
        "cat_known": 2,  # 'zz' and the NULL-cat row
        # count(*)=4 minus distinct non-NULL ids {1,2}=2: the duplicate
        # id=2 AND the NULL id both count as surplus (a NULL key can
        # never be proven unique; pair with a not-null rule to tell
        # the two failure modes apart)
        "id_unique": 2,
    }


def test_check_constraints_rejects_empty_ruleset(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.quality import check_constraints

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="rules"):
        check_constraints(df, row_rules={})


# ---------------------------------------------------------------------------
# shapley_attribution
# ---------------------------------------------------------------------------


def _sh_journeys(spark, rows):
    return spark.createDataFrame(rows, "conversion_id string, channel_label string")


def test_shapley_hand_computed_asymmetric(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.shapley import shapley_attribution

    # conv1 touched {a}; conv2 touched {a, b}:
    # v(0)=0, v(a)=1, v(b)=0, v(ab)=2 -> phi_a=3, phi_b=1 over denom 2!
    j = _sh_journeys(spark, [("c1", "a"), ("c2", "a"), ("c2", "b")])
    out = {r["channel"]: (r["phi_scaled"], r["denom"]) for r in
           shapley_attribution(j, ["a", "b"]).collect()}
    assert out == {"a": (3, 2), "b": (1, 2)}


def test_shapley_symmetry_and_efficiency(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.shapley import shapley_attribution

    # a and b appear in exchangeable roles -> equal credit; and the
    # scaled credits always sum to n! * total conversions
    j = _sh_journeys(spark, [("c1", "a"), ("c2", "a"), ("c2", "b"), ("c3", "b")])
    rows = shapley_attribution(j, ["a", "b"]).collect()
    out = {r["channel"]: r["phi_scaled"] for r in rows}
    assert out["a"] == out["b"]
    assert sum(out.values()) == 2 * 3  # n! x v(full) = 2 x 3 conversions


def test_shapley_rejects_unlisted_channel(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.shapley import shapley_attribution

    j = _sh_journeys(spark, [("c1", "a"), ("c1", "zz")])
    with pytest.raises(Exception, match="player universe"):
        shapley_attribution(j, ["a", "b"]).collect()


def test_interval_join_pre_epoch_timestamps(spark):
    # negative unix epochs: the truncating `div` would mis-bucket
    # without the uniform epoch shift — the 1969 fact must still land
    # in its 1969 window and nothing else
    t69 = dt.datetime(1969, 12, 31, 23, 0, 0)
    facts = spark.createDataFrame(
        [(1, t69 + dt.timedelta(minutes=10)), (2, dt.datetime(1970, 1, 1, 0, 30))],
        "fact_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, t69, t69 + dt.timedelta(minutes=30))],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    out = interval_join_bucketed(facts, intervals, "ts", "w_start", "w_end", 600)
    assert [(r["window_id"], r["fact_id"]) for r in out.collect()] == [(100, 1)]


# ---------------------------------------------------------------------------
# salted_join / snapshot_diff properties
# ---------------------------------------------------------------------------


def test_salted_join_result_identical_and_spreads_hot_key(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.skew import salted_join

    # one key holds 90% of the big side
    big = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 12)],
        "k long, payload long",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 12)], "k long, attr string")
    for n_salts in (1, 4, 16):
        got = sorted(map(tuple, salted_join(big, dim, ["k"], n_salts).collect()))
        want = sorted(map(tuple, big.join(dim, "k").collect()))
        assert got == want
    # left join keeps unmatched big rows
    big2 = big.unionByName(spark.createDataFrame([(99, 0)], "k long, payload long"))
    got = sorted(map(tuple, salted_join(big2, dim, ["k"], 4, how="left").collect()))
    want = sorted(map(tuple, big2.join(dim, "k", "left").collect()), key=lambda t: tuple(map(str, t)))
    assert sorted(got, key=lambda t: tuple(map(str, t))) == want
    # the hot key's rows really land in multiple salt buckets
    from pyspark.sql import functions as FF
    salts = (
        big.filter(FF.col("k") == 1)
        .withColumn("_s", FF.pmod(FF.xxhash64("k", "payload"), FF.lit(16)))
        .select("_s").distinct().count()
    )
    assert salts > 1


def test_salted_join_rejects_bad_args(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(df, df, ["k"], 0)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], 2, how="full")


def test_snapshot_diff_identity_and_disjoint_properties(spark):
    old = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    # identical snapshots -> everything unchanged
    same = snapshot_diff(old, old, ["k"], ["v"]).collect()
    assert {r["change_type"] for r in same} == {"unchanged"}
    # disjoint snapshots -> old side all deleted, new side all inserted
    new = spark.createDataFrame([(3, 30)], "k long, v long")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {1: "deleted", 2: "deleted", 3: "inserted"}


# ---------------------------------------------------------------------------
# zorder_value
# ---------------------------------------------------------------------------


def test_zorder_interleaves_bits_exactly(spark):
    from marketing_attribution_etl_framework__maef_spark.operators.zorder import zorder_value

    df = spark.createDataFrame([(3, 5)], "x long, y long")  # 0b011, 0b101
    out = df.select(zorder_value([F.col("x"), F.col("y")], bits=3).alias("z")).collect()
    # bit b of x -> position 2b; bit b of y -> position 2b+1:
    # x=011 -> bits at 0,2 ; y=101 -> bits at 1,5 -> z = 1+2+4+32 = 39
    assert out[0]["z"] == 39


def test_zorder_files_have_tighter_ranges_than_single_sort(spark, tmp_path):
    """The pruning argument, measured on real parquet metadata: write
    a 2-D grid sorted by z-value vs sorted by x only, and compare the
    per-file min/max WIDTH of the y column (x is tight in both). The
    z-sorted layout must bound y's per-file range; the x-sorted one
    leaves y unconstrained (full range in every file)."""
    pa = pytest.importorskip("pyarrow.parquet")
    import glob

    from marketing_attribution_etl_framework__maef_spark.operators.zorder import zorder_value

    n = 64
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )

    def ranges(path, order_col):
        (df.withColumn("_z", order_col).repartitionByRange(16, "_z")
           .sortWithinPartitions("_z").drop("_z")
           .write.mode("overwrite").parquet(path))
        widths = []
        for f in glob.glob(path + "/*.parquet"):
            md = pa.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = {md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                       for i in range(md.row_group(rg).num_columns)}
                st = col["y"].statistics
                widths.append(st.max - st.min)
        return sum(widths) / len(widths)

    z_width = ranges(str(tmp_path / "zorder"), zorder_value([F.col("x"), F.col("y")], bits=6))
    x_width = ranges(str(tmp_path / "xsort"), F.col("x"))
    # x-sorted files see essentially the full y range; z-sorted files
    # must be at least 2x tighter on y
    assert z_width * 2 < x_width


def test_kmv_estimator_quality(spark):
    """The KMV estimate (k-1) * 2^60 / h_k must land within ~20% of
    the true distinct count when k << n (standard error ~ 1/sqrt(k));
    and when n <= k the sketch is EXACT (n_seen == n)."""
    from marketing_attribution_etl_framework__maef_spark.operators.sketches import kmv_sketch

    n = 5000
    df = spark.createDataFrame(
        [("g", f"user{i}") for i in range(n)], "g string, u string"
    )
    row = kmv_sketch(df, ["g"], "u", k=256).collect()[0]
    assert row["n_seen"] == 256
    est = (256 - 1) * (1 << 60) / row["kth_min_hash"]
    assert abs(est - n) / n < 0.2
    small = spark.createDataFrame([("g", f"u{i}") for i in range(40)], "g string, u string")
    srow = kmv_sketch(small, ["g"], "u", k=256).collect()[0]
    assert srow["n_seen"] == 40 and len(srow["minhashes"]) == 40


def test_embedding_neardup_composes_with_ivf_blocking(spark):
    """The scale path embedding_neardup_pairs documents: block by IVF
    cluster (from ivf_assign) instead of a label column. Two planted
    exact-duplicate pairs far apart in space must each land in one
    cluster and be found; the composition must also never emit MORE
    than the label-blocked (ground-truth-blocked) run finds."""
    from marketing_attribution_etl_framework__maef_spark.llm import similarity as sim

    base = [
        (1, [1.0, 0.0, 0.0], 0), (2, [0.99, 0.01, 0.0], 0),   # near-dup pair A
        (3, [0.0, 1.0, 0.0], 1), (4, [0.0, 0.99, 0.01], 1),   # near-dup pair B
        (5, [0.0, 0.0, 1.0], 2),                               # singleton
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>, label int")
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0]), (12, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    assigned = sim.ivf_assign(emb, cents).select("vec_id", "cluster")
    blocked = emb.join(assigned, "vec_id")
    got = sorted(
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_neardup_pairs(blocked, threshold=0.9, block_col="cluster").collect()
    )
    want = sorted(
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_neardup_pairs(emb, threshold=0.9, block_col="label").collect()
    )
    assert got == want == [(1, 2), (3, 4)]
