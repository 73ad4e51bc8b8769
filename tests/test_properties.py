"""Property-based tests (SURVEY §5.4): random journey generators and
dedup/upsert algebraic laws, via hypothesis. Example counts are kept
small — every example is a Spark job."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.functions.cleaning import clean_float
from marketing_attribution_etl_framework__maef_spark.llm import dedup as dd
from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr
from marketing_attribution_etl_framework__maef_spark.operators.chunking import assign_chunks
from marketing_attribution_etl_framework__maef_spark.operators.loader import upsert

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

BASE_TS = dt.datetime(2024, 1, 1)


@st.composite
def journeys_strategy(draw):
    """1-8 journeys of 1-12 sessions each, with random engagement
    flags, channels, and minute offsets (ties allowed across
    journeys, unique session ids within)."""
    rows = []
    n_conv = draw(st.integers(1, 8))
    sid = 0
    for c in range(n_conv):
        n_sess = draw(st.integers(1, 12))
        for s in range(n_sess):
            sid += 1
            rows.append(
                (
                    f"c{c}",
                    f"s{sid:04d}",
                    BASE_TS + dt.timedelta(minutes=draw(st.integers(0, 500))),
                    BASE_TS + dt.timedelta(minutes=600),
                    draw(st.sampled_from(["Direct", "Search", "Email", "Social"])),
                    draw(st.integers(0, 1)),
                    draw(st.integers(0, 1)),
                    draw(st.integers(0, 1)),
                )
            )
    return rows


@given(journeys_strategy())
@settings(**_SETTINGS)
def test_attribution_contract_all_models(spark, rows):
    """Hard contract for every model (SURVEY §2.6): weights >= 0 and
    sum(ihc) per conversion == 1, for arbitrary journeys."""
    df = spark.createDataFrame(
        rows,
        "conversion_id string, session_id string, event_ts timestamp, conv_ts timestamp, "
        "channel_label string, holder_engagement int, closer_engagement int, "
        "impression_interaction int",
    )
    variants = [(m, {}) for m in attr.MODELS]
    # redistribution knobs, incl. both directional modes, must keep
    # the same hard contract on arbitrary journeys
    for direction in ("any_session", "earlier_sessions_only", "later_sessions_only"):
        variants.append(
            ("ihc", {"params": attr.IHCParams(
                redistribution_channel_labels=["Direct"],
                receive_threshold=0.05,
                redistribution_direction=direction,
            )})
        )
    for model, kw in variants:
        out = attr.attribute(df, model, **kw)
        rowsc = out.collect()
        assert all(r.ihc >= 0 for r in rowsc), (model, kw)
        sums = {}
        for r in rowsc:
            sums[r.conv_id] = sums.get(r.conv_id, 0.0) + r.ihc
        assert all(abs(s - 1.0) < 1e-9 for s in sums.values()), (model, kw, sums)


@given(st.lists(st.integers(1, 400), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_chunking_caps_property(spark, sizes):
    """Both caps hold for arbitrary journey-size sequences: <= 85
    journeys per chunk always; session cap exceeded by at most the
    last journey's sessions."""
    rows = [(f"c{i:04d}", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "conversion_id string, n_sessions int")
    agg = (
        assign_chunks(df, journey_cap=5, session_cap=50)
        .groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("n_j"), F.sum("n_sessions").alias("n_s"), F.max("n_sessions").alias("mx"))
        .collect()
    )
    for r in agg:
        assert r.n_j <= 5
        assert r.n_s <= 50 + r.mx


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.floats(0, 1, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_upsert_laws(spark, pairs):
    """Upsert: keys = union of keys; incoming wins on collisions;
    idempotent (applying the same incoming twice is a no-op)."""
    existing = spark.createDataFrame(
        [(f"c{a}", f"s{b}", -1.0) for a, b, _ in pairs],
        "conv_id string, session_id string, ihc double",
    ).dropDuplicates(["conv_id", "session_id"])
    incoming = spark.createDataFrame(
        [(f"c{a}", f"s{b}", float(v)) for a, b, v in pairs],
        "conv_id string, session_id string, ihc double",
    ).dropDuplicates(["conv_id", "session_id"])
    once = upsert(existing, incoming)
    twice = upsert(once, incoming)
    got_once = {(r.conv_id, r.session_id): r.ihc for r in once.collect()}
    got_twice = {(r.conv_id, r.session_id): r.ihc for r in twice.collect()}
    want = {(r.conv_id, r.session_id): r.ihc for r in incoming.collect()}
    assert got_once == want  # every existing key collides; incoming wins
    assert got_twice == got_once


@given(st.lists(st.text(alphabet="ab X", min_size=0, max_size=12), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_exact_dedup_idempotent(spark, texts):
    """exact_dedup is idempotent and survivor-stable: deduping the
    survivors changes nothing."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dd.exact_dedup(docs)
    twice = dd.exact_dedup(once)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b
    # survivor count == number of distinct normalized contents
    norms = {" ".join(t.lower().strip().split()) for t in texts}
    assert len(a) == len(norms)


def test_clean_float_never_emits_nonfinite(spark):
    import math

    vals = [0.0, -0.0, 1.5, -2.5, float("nan"), float("inf"), float("-inf"), 1e308, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = [r.y for r in df.select(clean_float(F.col("x")).alias("y")).collect()]
    assert all(v is None or math.isfinite(v) for v in out)


@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=60),
    st.integers(50, 300),
    st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_pack_sequences_caps_property(spark, token_counts, budget, max_docs):
    """For arbitrary token distributions and caps: every pack holds at
    most max_docs documents, exceeds the token budget by at most its
    largest member, and every document is packed exactly once."""
    from marketing_attribution_etl_framework__maef_spark.llm.curation import pack_sequences

    df = spark.createDataFrame(
        list(enumerate(token_counts)), "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, budget_tokens=budget, max_docs=max_docs).collect()
    assert len(out) == len(token_counts)
    packs: dict[int, list] = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(max(r.n_tokens, 1))
    for toks in packs.values():
        assert len(toks) <= max_docs
        assert sum(toks) <= budget + max(toks)


@given(st.integers(0, 100), st.integers(0, 100))
@settings(**_SETTINGS)
def test_stratified_sample_monotone_property(spark, p_small, p_big):
    """Sample nesting law: for any two rates, the lower-rate sample is
    a subset of the higher-rate sample of the same stratum."""
    from marketing_attribution_etl_framework__maef_spark.llm.curation import stratified_sample

    lo, hi = sorted((p_small, p_big))
    df = spark.createDataFrame(
        [(i, "en") for i in range(150)], "doc_id long, lang string"
    )
    small = {r.doc_id for r in stratified_sample(df, "lang", {"en": lo}).collect()}
    big = {r.doc_id for r in stratified_sample(df, "lang", {"en": hi}).collect()}
    assert small <= big


@st.composite
def asof_frames_strategy(draw):
    """Random left/right frames over few keys with tied timestamps
    allowed; right timestamps unique per key (merge_asof precondition
    for a deterministic match)."""
    keys = ["k1", "k2", "k3"]
    left = [
        (draw(st.sampled_from(keys)), BASE_TS + dt.timedelta(minutes=int(m)), i)
        for i, m in enumerate(draw(st.lists(st.integers(0, 300), min_size=1, max_size=25)))
    ]
    right = []
    used = set()
    for j, m in enumerate(draw(st.lists(st.integers(0, 300), min_size=0, max_size=25))):
        k = draw(st.sampled_from(keys))
        if (k, m) in used:
            continue
        used.add((k, m))
        right.append((k, BASE_TS + dt.timedelta(minutes=int(m)), j * 10))
    return left, right


@given(frames=asof_frames_strategy())
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, frames):
    """Third-implementation check: the union-and-carry asof_join must
    agree with pandas.merge_asof (backward, inclusive) on random
    frames — on top of the DuckDB ASOF JOIN oracle at sf0.01."""
    import pandas as pd

    from marketing_attribution_etl_framework__maef_spark.operators.asof import asof_join

    left_rows, right_rows = frames
    left = spark.createDataFrame(left_rows, "k string, lt timestamp, lid long")
    right = spark.createDataFrame(
        right_rows or [("zz", BASE_TS, -1)], "k string, rt timestamp, px long"
    )
    got = {
        r.lid: r.r_px
        for r in asof_join(left, right, on=["k"], left_time="lt", right_time="rt").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "lt", "lid"]).sort_values("lt")
    rp = pd.DataFrame(right_rows or [("zz", BASE_TS, -1)], columns=["k", "rt", "px"]).sort_values("rt")
    merged = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
    )
    want = {
        int(r.lid): (None if pd.isna(r.px) else int(r.px)) for r in merged.itertuples()
    }
    assert got == want


@st.composite
def intervals_strategy(draw):
    """Random facts + random (possibly overlapping/empty) intervals
    plus a bucket size, in whole seconds."""
    facts = [
        (i, BASE_TS + dt.timedelta(seconds=draw(st.integers(0, 7200))))
        for i in range(draw(st.integers(1, 25)))
    ]
    ivs = []
    for j in range(draw(st.integers(1, 8))):
        s = draw(st.integers(0, 7200))
        ivs.append(
            (
                100 + j,
                BASE_TS + dt.timedelta(seconds=s),
                BASE_TS + dt.timedelta(seconds=s + draw(st.integers(0, 3600))),
            )
        )
    bucket = draw(st.sampled_from([1, 7, 60, 600, 86400]))
    return facts, ivs, bucket


@given(intervals_strategy())
@settings(**_SETTINGS)
def test_interval_join_equals_brute_force(spark, data):
    """The bucketed range join must equal the naive inequality join
    for ANY bucket size (bucketing is pure plumbing)."""
    from marketing_attribution_etl_framework__maef_spark.operators.intervals import interval_join_bucketed

    facts, ivs, bucket = data
    fdf = spark.createDataFrame(facts, "fact_id long, ts timestamp")
    idf = spark.createDataFrame(ivs, "window_id long, w_start timestamp, w_end timestamp")
    got = sorted(
        (r["window_id"], r["fact_id"])
        for r in interval_join_bucketed(fdf, idf, "ts", "w_start", "w_end", bucket).collect()
    )
    want = sorted(
        (w, f) for f, t in facts for w, s, e in ivs if s <= t < e
    )
    assert got == want


@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=1, max_size=12),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_boilerplate_scrub_reconstruction_invariants(spark, word_lists):
    """For arbitrary corpora: segment counts add up, the cleaned
    fingerprint is exactly the md5 of the kept segments joined in
    order, and a min_docs above the corpus size removes nothing."""
    import hashlib

    from marketing_attribution_etl_framework__maef_spark.llm.dedup import boilerplate_scrub

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_scrub(ddf, seg_words=2, min_docs=2).collect()}
    assert set(out) == set(i for i, _ in docs)
    for i, ws in enumerate(word_lists):
        n_segs = (len(ws) + 1) // 2
        assert out[i]["n_segments"] == n_segs
        assert 0 <= out[i]["n_removed"] <= n_segs
    # nothing is boilerplate to itself: min_docs > corpus size
    none = boilerplate_scrub(ddf, seg_words=2, min_docs=len(docs) + 1).collect()
    for r in none:
        i = r["doc_id"]
        full = " ".join(word_lists[i])
        assert r["n_removed"] == 0
        assert r["clean_fp"] == hashlib.md5(full.encode()).hexdigest()


@given(st.lists(st.integers(1, 40), min_size=4, max_size=40), st.sampled_from([2, 3, 4, 8]))
@settings(**_SETTINGS)
def test_curriculum_partitions_the_corpus(spark, widths, n_buckets):
    """Buckets partition the corpus exactly (populations sum to n)
    and score ranges never interleave across buckets."""
    from marketing_attribution_etl_framework__maef_spark.llm.curation import curriculum_buckets

    # doc i: `widths[i]` words with i%3+1 distinct symbols -> assorted scores
    docs = [
        (i, " ".join(["xyz"[j % (i % 3 + 1)] for j in range(w)]))
        for i, w in enumerate(widths)
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(curriculum_buckets(ddf, n_buckets=n_buckets).collect(), key=lambda r: r["bucket"])
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score_q20"] <= hi["min_score_q20"]


@given(journeys_strategy())
@settings(**_SETTINGS)
def test_markov_contracts(spark, rows):
    """Transition counts conserve mass (sum n == sessions + 
    conversions) and every removal effect lies in [0, full]."""
    from marketing_attribution_etl_framework__maef_spark.operators.markov import channel_transitions, removal_effects

    df = spark.createDataFrame(
        [(c, s, ts, ch) for (c, s, ts, _end, ch, *_f) in rows],
        "conversion_id string, session_id string, event_ts timestamp, channel_label string",
    )
    n_sessions = len(rows)
    n_convs = len({r[0] for r in rows})
    total = sum(r["n"] for r in channel_transitions(df).collect())
    assert total == n_sessions + n_convs
    res = {r["removed_channel"]: r for r in removal_effects(df, horizon=12).collect()}
    full = res["(none)"]["absorption_q20"]
    assert 0 <= full <= 1 << 20
    for ch, r in res.items():
        if ch == "(none)":
            continue
        assert 0 <= r["removal_q20"] <= full
        assert r["absorption_q20"] + r["removal_q20"] == full


@given(
    weights=st.lists(st.integers(1, 500), min_size=1, max_size=30),
    k=st.integers(1, 12),
)
@settings(**_SETTINGS)
def test_weighted_sample_total_multiplicity_property(spark, weights, k):
    from marketing_attribution_etl_framework__maef_spark.llm.curation import systematic_weighted_sample

    df = spark.createDataFrame(
        [(i, "s", w) for i, w in enumerate(weights)],
        "doc_id long, source string, n_chars long",
    )
    rows = systematic_weighted_sample(df, k=k).collect()
    # grid sampling law: multiplicities sum to exactly k, and no doc
    # exceeds ceil(k * w / W) + 1 picks
    assert sum(r["mult"] for r in rows) == k
    total = sum(weights)
    for r in rows:
        assert r["mult"] <= (k * r["weight"]) // total + 1


@given(
    facts=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    ),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_ivm_parity_with_recompute_property(spark, facts, data):
    from marketing_attribution_etl_framework__maef_spark.operators import ivm

    # delete a random subset of existing rows, insert a random batch
    n_del = data.draw(st.integers(0, len(facts)))
    deleted = facts[:n_del]
    inserts = data.draw(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 100)),
            max_size=10,
        )
    )
    sum_cols = {"sx": F.col("x")}
    base = ivm.aggregate_snapshot(
        spark.createDataFrame(facts, "g string, x long"), ["g"], sum_cols
    )
    delta_rows = [(g, x, -1) for g, x in deleted] + [(g, x, 1) for g, x in inserts]
    if delta_rows:
        delta = spark.createDataFrame(delta_rows, "g string, x long, op int")
    else:
        delta = spark.createDataFrame([], "g string, x long, op int")
    maintained = sorted(
        map(tuple, ivm.apply_aggregate_delta(base, delta, ["g"], sum_cols).collect())
    )
    survivors = facts[n_del:] + inserts
    if survivors:
        recomputed = sorted(
            map(
                tuple,
                ivm.aggregate_snapshot(
                    spark.createDataFrame(survivors, "g string, x long"), ["g"], sum_cols
                ).collect(),
            )
        )
    else:
        recomputed = []
    assert maintained == recomputed


@given(values=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_hll_register_summary_matches_python_reference(spark, values):
    import hashlib

    from marketing_attribution_etl_framework__maef_spark.operators.sketches import hll_register_summary

    df = spark.createDataFrame([("g", v) for v in values], "grp string, v string")
    row = hll_register_summary(df, ["grp"], "v").collect()[0]
    regs = {}
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg, w = h % 256, h // 256
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s53 = sum(1 << (53 - r) for r in regs.values()) + (256 - len(regs)) * (1 << 53)
    assert row["n_registers_hit"] == len(regs)
    assert row["sum_rho"] == sum(regs.values())
    assert row["harmonic_s53"] == s53


@given(
    cents=st.lists(st.integers(1, 10_000_000), min_size=1, max_size=8),
    budget=st.integers(1, 1_000_000),
)
@settings(**_SETTINGS)
def test_budget_allocation_exact_and_fair(spark, cents, budget):
    """Hamilton apportionment laws: allocations sum to the budget
    EXACTLY, and each channel gets floor or ceil of its exact
    proportional share (never further away)."""
    from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt

    rows = [
        (i, "u", f"ch{i:02d}", "2024-01-01 08:00:00", c / 100.0)
        for i, c in enumerate(cents)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.channel: (r.value_cents, r.alloc_cents) for r in
           rpt.budget_allocation(ev, budget_cents=budget).collect()}
    total = sum(v for v, _ in got.values())
    assert sum(a for _, a in got.values()) == budget
    for v, a in got.values():
        lo = budget * v // total
        assert a in (lo, lo + 1)


@given(
    days=st.lists(st.tuples(st.integers(0, 30), st.integers(1, 100_000)),
                  min_size=1, max_size=10, unique_by=lambda t: t[0]),
)
@settings(**_SETTINGS)
def test_decayed_daily_sum_matches_python_reference(spark, days):
    """The q20 decayed sum equals the integer reference computed in
    plain Python over the same (day, cents) series."""
    import datetime as _dt

    from marketing_attribution_etl_framework__maef_spark.operators import timeseries as ts

    base = _dt.date(2024, 1, 1)
    rows = [
        (i, "u", "click", f"{base + _dt.timedelta(days=d)} 08:00:00", c / 100.0)
        for i, (d, c) in enumerate(days)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_day: r.decay_cents_q20
           for r in ts.decayed_daily_sum(ev, horizon_days=21).collect()}
    series = dict(days)
    for d, _ in days:
        expect = sum(
            c_i * (1 << (20 - (d - d_i)))
            for d_i, c_i in series.items()
            if 0 <= d - d_i <= 20
        )
        assert got[str(base + _dt.timedelta(days=d))] == expect


@given(values=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_log_histogram_bounds_match_python_reference(spark, values):
    """Bucket assignment and quantile bucket bounds equal a plain-
    Python reimplementation (sub_bits=2: keep the top 3 bits)."""
    from marketing_attribution_etl_framework__maef_spark.operators import quantiles as qtl

    def bucket(x):
        if x == 0:
            return 0
        g = max(x.bit_length() - 3, 0)
        return (x >> g) << g

    df = spark.createDataFrame([("g", v) for v in values], "grp string, x long")
    hist = {r.bucket_lb: r.c for r in qtl.log_histogram(df, ["grp"], "x").collect()}
    expect = {}
    for v in values:
        b = bucket(v)
        expect[b] = expect.get(b, 0) + 1
    assert hist == expect

    row = qtl.histogram_quantile_bounds(
        qtl.log_histogram(df, ["grp"], "x"), ["grp"], [("p50", 1, 2), ("p90", 9, 10)]
    ).collect()[0]
    n = len(values)
    cdf = sorted(expect.items())

    def bound(num, den):
        cum = 0
        for b, c in cdf:
            cum += c
            if cum * den >= n * num:
                return b

    assert row["p50"] == bound(1, 2)
    assert row["p90"] == bound(9, 10)
    assert row["n_values"] == n


@st.composite
def funnel_events_strategy(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 4))):
        for _ in range(draw(st.integers(1, 10))):
            eid += 1
            rows.append(
                (
                    eid,
                    f"u{u}",
                    draw(st.sampled_from(["signup", "view", "click"])),
                    draw(st.integers(0, 200)),  # minutes from base
                )
            )
    return rows


@given(rows=funnel_events_strategy(), window_hours=st.sampled_from([1, 2, 48]))
@settings(**_SETTINGS)
def test_window_funnel_matches_python_simulator(spark, rows, window_hours):
    """window_funnel equals a sequential per-user Python automaton:
    anchor = min step-1 time; each later step = min event strictly
    after the previous step and within the anchor window."""
    from marketing_attribution_etl_framework__maef_spark.operators import funnel as fnl

    steps = ["signup", "view", "click"]
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(e, u, t, base + dt.timedelta(minutes=m)) for e, u, t, m in rows],
        "event_id long, user_id string, event_type string, ts timestamp",
    )
    # python simulator
    per_user = {}
    for _, u, t, m in rows:
        per_user.setdefault(u, []).append((t, m))
    win_min = window_hours * 60
    stages = {}
    for u, evs in per_user.items():
        stage = 0
        t1 = min((m for t, m in evs if t == steps[0]), default=None)
        if t1 is not None:
            stage = 1
            prev = t1
            for s in steps[1:]:
                nxt = min(
                    (m for t, m in evs if t == s and m > prev and m - t1 <= win_min),
                    default=None,
                )
                if nxt is None:
                    break
                stage += 1
                prev = nxt
        stages[u] = stage
    from collections import Counter

    at = Counter(stages.values())
    expect = {
        k: (v, sum(v2 for k2, v2 in at.items() if k2 >= k)) for k, v in at.items()
    }
    got = {
        r.funnel_stage: (r.n_users, r.n_reached)
        for r in fnl.window_funnel(ev, steps, window_hours=window_hours).collect()
    }
    assert got == expect


@st.composite
def scd2_events_strategy(draw):
    """1-4 keys, 1-12 events each: random attrs from a 3-letter
    alphabet, random minute offsets (ties allowed — the tiebreak column
    must resolve them deterministically)."""
    out = []
    tb = 0
    for k in range(draw(st.integers(1, 4))):
        n = draw(st.integers(1, 12))
        for _ in range(n):
            tb += 1
            out.append(
                (
                    f"k{k}",
                    draw(st.sampled_from(["a", "b", "c"])),
                    BASE_TS + dt.timedelta(minutes=draw(st.integers(0, 30))),
                    f"t{tb:04d}",
                )
            )
    return out


@given(scd2_events_strategy())
@settings(**_SETTINGS)
def test_scd2_interval_laws(spark, rows):
    """SCD2 algebraic laws, vs a Python reference run-length encoding:
    (1) per key, versions are 1..n dense; (2) exactly one open row
    (valid_to_us = -1, is_current = 1) and it is the max version;
    (3) intervals chain (version v's close == v+1's open); (4)
    adjacent versions differ in attribute; (5) n_events sums to the
    key's event count; (6) the (version, attr, n_events) sequence
    equals the reference RLE of the (ts, tiebreak)-sorted stream."""
    from marketing_attribution_etl_framework__maef_spark.operators import cdc as _cdc

    df = spark.createDataFrame(rows, "uid string, ch string, ts timestamp, tb string")
    got = _cdc.scd2_intervals(df, ["uid"], "ch", "ts", "tb").collect()
    by_key: dict[str, list] = {}
    for r in got:
        by_key.setdefault(r.uid, []).append(r)
    events_by_key: dict[str, list] = {}
    for uid, ch, ts, tb in rows:
        events_by_key.setdefault(uid, []).append((ts, tb, ch))
    assert set(by_key) == set(events_by_key)
    for uid, rs in by_key.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert [r.is_current for r in rs] == [0] * (len(rs) - 1) + [1]
        assert rs[-1].valid_to_us == -1
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.ch != b.ch
        # Python reference RLE over the totally-ordered stream
        seq = [c for _, _, c in sorted(events_by_key[uid])]
        rle = []
        for c in seq:
            if rle and rle[-1][0] == c:
                rle[-1][1] += 1
            else:
                rle.append([c, 1])
        assert [(r.ch, r.n_events) for r in rs] == [tuple(x) for x in rle]
        assert sum(r.n_events for r in rs) == len(seq)
