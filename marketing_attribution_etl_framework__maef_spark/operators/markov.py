"""Markov-chain attribution building block: the channel transition
matrix.

Markov (removal-effect) attribution models the customer journey as a
first-order chain over channels with absorbing (start)/(conversion)
states; its input is the transition count matrix this operator
produces. The reference delegates all attribution modelling to its
external IHC API (/root/reference/src/api/ihc_api.py) — this extends
the model family the engine supports natively, alongside the six
positional models in operators/attribution.py.

Shape: one LAG/LEAD window partitioned by conversion_id (the same
partitioning every attribution model here uses, so at warehouse scale
the journey shuffle is shared), then a count aggregate over (src, dst)
— a matrix bounded by (channels + 2)^2 rows whatever the input scale.
Ordering ties break on session_id, so the chain is total and the
counts deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START = "(start)"
CONVERSION = "(conversion)"


def channel_transitions(
    journeys: DataFrame,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Transition counts over per-conversion journeys:
    ``(start) -> first channel``, ``channel -> next channel``, and
    ``last channel -> (conversion)``. Output: (src, dst, n)."""
    w = Window.partitionBy(part_col).orderBy(*[F.asc(c) for c in order_cols])
    ordered = journeys.select(
        F.col(part_col),
        F.col(channel_col).alias("_ch"),
        F.lag(channel_col).over(w).alias("_prev"),
        F.lead(channel_col).over(w).alias("_next"),
    )
    steps = ordered.select(
        F.coalesce(F.col("_prev"), F.lit(START)).alias("src"), F.col("_ch").alias("dst")
    )
    finals = ordered.filter(F.col("_next").isNull()).select(
        F.col("_ch").alias("src"), F.lit(CONVERSION).alias("dst")
    )
    return (
        steps.unionByName(finals)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


Q20 = 1 << 20


def removal_effects(
    journeys: DataFrame,
    horizon: int = 25,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Markov removal-effect attribution over the transition matrix.

    For the full chain and for each single-channel removal, compute the
    probability (q20 fixed point) that a journey starting at (start)
    reaches (conversion) within ``horizon`` steps; a channel's removal
    effect is the drop vs the full chain. The horizon is part of the
    operator's definition (truncated-horizon absorption), so the result
    is exact — no convergence tolerance to disagree on.

    Arithmetic is integer end to end: probabilities are q20 longs and
    each step is ``floor(sum_j n(s->j) * p(j) / sum_j n(s->j))`` —
    products stay under 2^63 for transition counts up to ~2^42 (raise
    to q10 beyond that). Order-independent (integer sums), so
    deterministic at any parallelism and bit-equal to the oracle's
    unrolled-SQL twin by construction.

    Scale: the corpus-sized work is exactly the transition-count
    aggregate (channel_transitions); the matrix it produces is bounded
    by (|channels| + 2)^2 ROWS REGARDLESS OF INPUT SCALE, so it is
    pulled to the driver (same bounded-collect pattern as the k-means
    centroid pull and the BPE argmax) and the absorption recurrence
    runs as plain integer arithmetic there — running ``horizon``
    Spark jobs over a 50-row table would pay ~horizon job latencies
    for no parallelism gain.

    Output: ``(removed_channel, absorption_q20, removal_q20)`` with
    removed_channel = '(none)' for the full chain.
    """
    trans = channel_transitions(journeys, part_col, channel_col, order_cols).collect()
    edges: dict[str, list[tuple[str, int]]] = {}
    for r in trans:
        edges.setdefault(r["src"], []).append((r["dst"], r["n"]))
    channels = sorted(
        {s for s in edges if s != START}
        | {d for outs in edges.values() for d, _ in outs if d != CONVERSION}
    )

    def absorb(removed: str | None) -> int:
        p = {CONVERSION: Q20}
        for _ in range(horizon):
            nxt = {CONVERSION: Q20}
            for s, outs in edges.items():
                if s == removed:
                    continue
                tot = sum(n for _, n in outs)
                num = sum(
                    n * p.get(d, 0) for d, n in outs if d != removed
                )
                nxt[s] = num // tot
            p = nxt
        return p.get(START, 0)

    full = absorb(None)
    rows = [("(none)", full, 0)] + [
        (c, absorb(c), full - absorb(c)) for c in channels
    ]
    return journeys.sparkSession.createDataFrame(
        rows, "removed_channel string, absorption_q20 long, removal_q20 long"
    )


def pagerank_channels(
    journeys: DataFrame,
    iterations: int = 20,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """PageRank centrality over the channel->channel transition graph
    (the (start)/(conversion) absorbing edges are dropped; what remains
    is the within-journey handoff graph). A published alternative lens
    on channel importance next to removal_effects — centrality of a
    channel as a handoff hub rather than its absorption contribution.

    Fixed-iteration (truncated) power method in q20 integers, damping
    17/20 (= 0.85 exactly, a rational the integer arithmetic carries
    losslessly):

        pr_0(v)     = Q20 // N
        pr_{t+1}(v) = (3 * Q20) // (20 * N)
                    + sum_u (17 * pr_t(u) * n(u,v)) // (20 * deg(u))
                    + (17 * sum_{dangling u} pr_t(u)) // (20 * N)

    with one floor PER TERM (per inbound edge, and once for the pooled
    dangling mass) — an order-independent integer recurrence the
    unrolled-SQL oracle reproduces bit for bit. The truncated horizon
    is part of the definition, so there is no convergence tolerance to
    disagree on (same design as removal_effects).

    Scale: identical to removal_effects — the corpus-sized work is the
    transition aggregate; the graph is bounded by (|channels|)^2 rows
    regardless of input scale, so it is pulled to the driver and the
    recurrence runs as plain integer arithmetic (the CLAUDE.md
    bounded-collect rule).

    Output: (channel, pagerank_q20), one row per graph node.
    """
    trans = channel_transitions(journeys, part_col, channel_col, order_cols)
    edges = [
        (r["src"], r["dst"], r["n"])
        for r in trans.filter(
            (F.col("src") != START) & (F.col("dst") != CONVERSION)
        ).collect()
    ]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n_nodes = len(nodes)
    if not n_nodes:
        return journeys.sparkSession.createDataFrame(
            [], "channel string, pagerank_q20 long"
        )
    deg = {v: 0 for v in nodes}
    for s, _, n in edges:
        deg[s] += n
    pr = {v: Q20 // n_nodes for v in nodes}
    base = (3 * Q20) // (20 * n_nodes)
    for _ in range(iterations):
        dangling = sum(p for v, p in pr.items() if deg[v] == 0)
        dang_term = (17 * dangling) // (20 * n_nodes)
        nxt = {v: base + dang_term for v in nodes}
        for s, d, n in edges:
            nxt[d] += (17 * pr[s] * n) // (20 * deg[s])
        pr = nxt
    rows = [(v, pr[v]) for v in nodes]
    return journeys.sparkSession.createDataFrame(
        rows, "channel string, pagerank_q20 long"
    )


def pair_transitions(
    journeys: DataFrame,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Second-order transition counts: states are the last TWO
    channels encoded ``prev|cur`` ('^' pads the first touch), plus
    (start)/(conversion).  Output: (src, dst, n).

    Edges per ordered journey c1..cn:
    (start) -> '^|c1';  'c_{i-1}|c_i' -> 'c_i|c_{i+1}';
    last pair state -> (conversion).
    """
    w = Window.partitionBy(part_col).orderBy(*[F.asc(c) for c in order_cols])
    ordered = journeys.select(
        F.col(part_col),
        F.col(channel_col).alias("_ch"),
        F.lag(channel_col).over(w).alias("_prev"),
        F.lead(channel_col).over(w).alias("_next"),
    ).withColumn(
        "_state", F.concat_ws("|", F.coalesce(F.col("_prev"), F.lit("^")), F.col("_ch"))
    )
    starts = ordered.filter(F.col("_prev").isNull()).select(
        F.lit(START).alias("src"), F.col("_state").alias("dst")
    )
    steps = ordered.filter(F.col("_next").isNotNull()).select(
        F.col("_state").alias("src"),
        F.concat_ws("|", F.col("_ch"), F.col("_next")).alias("dst"),
    )
    finals = ordered.filter(F.col("_next").isNull()).select(
        F.col("_state").alias("src"), F.lit(CONVERSION).alias("dst")
    )
    return (
        starts.unionByName(steps)
        .unionByName(finals)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def removal_effects_order2(
    journeys: DataFrame,
    horizon: int = 25,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Second-order Markov removal-effect attribution: the removal
    test erases every PAIR STATE containing the channel (both the
    memory and the current position), capturing the path dependence a
    first-order chain cannot ("view->click converts; click->view does
    not").  Same truncated-horizon integer q20 recurrence, same
    bounded-collect pattern — the pair-state matrix is
    (|channels|^2 + |channels| + 2) rows REGARDLESS of input scale.

    Output: (removed_channel, absorption_q20, removal_q20) with
    '(none)' for the full chain — the schema of removal_effects
    (operators/markov.py:61), one model order up.
    """
    trans = pair_transitions(journeys, part_col, channel_col, order_cols).collect()
    edges: dict[str, list[tuple[str, int]]] = {}
    for r in trans:
        edges.setdefault(r["src"], []).append((r["dst"], r["n"]))
    channels = sorted(
        {
            c
            for s in edges
            if s not in (START, CONVERSION)
            for c in s.split("|")
            if c != "^"
        }
        | {
            c
            for outs in edges.values()
            for d, _ in outs
            if d not in (START, CONVERSION)
            for c in d.split("|")
            if c != "^"
        }
    )

    def hit(state: str, removed: str | None) -> bool:
        if removed is None or state in (START, CONVERSION):
            return False
        return removed in state.split("|")

    def absorb(removed: str | None) -> int:
        p = {CONVERSION: Q20}
        for _ in range(horizon):
            nxt = {CONVERSION: Q20}
            for s, outs in edges.items():
                if hit(s, removed):
                    continue
                tot = sum(n for _, n in outs)
                num = sum(n * p.get(d, 0) for d, n in outs if not hit(d, removed))
                nxt[s] = num // tot
            p = nxt
        return p.get(START, 0)

    full = absorb(None)
    rows = [("(none)", full, 0)] + [(c, absorb(c), full - absorb(c)) for c in channels]
    return journeys.sparkSession.createDataFrame(
        rows, "removed_channel string, absorption_q20 long, removal_q20 long"
    )


def next_best_channel(
    journeys: DataFrame,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Next-best-channel recommendation: for every source state in the
    first-order chain (including ``(start)``), the argmax next step
    with a Laplace-smoothed transition probability.

    This is the serving-side companion to the removal-effect models —
    "a user just came through paid_search: which channel converts the
    path most often next?" — the greedy policy over the same
    transition matrix ``channel_transitions`` already produces.

    Probability is add-one smoothed over the GLOBAL destination
    vocabulary V (so unseen edges are never certain-zero and every
    src's distribution sums to one): p = (n+1) / (n_total + V), emitted
    q20 via the half-away-from-zero integer device on nonnegative
    counts.  Argmax ties break on destination name ascending, so the
    pick is total and cross-engine deterministic.

    Scale: the matrix is bounded by (channels + 2)^2 regardless of
    input rows (CLAUDE.md bounded-state rule); the only data-scaled
    work is the shared journey window scan.  V is a 1-row broadcast
    crossJoin (the J6 scalar-subquery shape).

    Reference: extends the attribution family beyond the reference's
    external IHC API (/root/reference/src/api/ihc_api.py) — no native
    model exists there.
    """
    t = channel_transitions(journeys, part_col, channel_col, order_cols)
    vocab = t.agg(F.countDistinct("dst").cast("long").alias("n_dst"))
    tot = t.groupBy("src").agg(F.sum("n").cast("long").alias("n_total"))
    w = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    best = t.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        best.join(tot, "src")
        .crossJoin(F.broadcast(vocab))
        .select(
            "src",
            F.col("dst").alias("best_next"),
            F.col("n").cast("long").alias("n_best"),
            "n_total",
            "n_dst",
            F.expr(
                f"(2 * (n + 1) * {Q20} + (n_total + n_dst))"
                " div (2 * (n_total + n_dst))"
            )
            .cast("long")
            .alias("prob_q20"),
        )
    )


def expected_path_length(
    journeys: DataFrame,
    horizon: int = 25,
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
    order_cols: tuple[str, str] = ("event_ts", "session_id"),
) -> DataFrame:
    """Expected touches-to-conversion per starting state over the
    journey Markov chain — the planning twin of removal_effects: where
    removal asks "how much conversion mass does channel c carry",
    this asks "how LONG is the road from c", the number budget pacing
    and frequency-capping decisions key on.

    e_r(s) = E[min(T, r)] with T the hitting time of (conversion):

        e_0(s) = 0;  e_r(conversion) = 0
        e_r(s)  = 2^20 + floor(sum_j n(s->j) e_{r-1}(j) / sum_j n(s->j))

    — the same truncated-horizon q20 integer recurrence as
    removal_effects (horizon is part of the definition, so the value
    is exact; no convergence tolerance to disagree on), same bounded
    (channels + 2)^2 driver matrix, same unrolled-SQL oracle twin.

    Output: (state, exp_steps_q20) for (start) and every channel.
    """
    trans = channel_transitions(journeys, part_col, channel_col, order_cols).collect()
    edges: dict[str, list[tuple[str, int]]] = {}
    for r in trans:
        edges.setdefault(r["src"], []).append((r["dst"], r["n"]))
    states = sorted(
        {s for s in edges} | {d for outs in edges.values() for d, _ in outs}
    )
    e = {s: 0 for s in states}
    for _ in range(horizon):
        nxt = {}
        for s in states:
            if s == CONVERSION:
                nxt[s] = 0
                continue
            outs = edges.get(s, [])
            if not outs:
                nxt[s] = Q20
                continue
            tot = sum(n for _, n in outs)
            nxt[s] = Q20 + sum(n * e[d] for d, n in outs) // tot
        e = nxt
    rows = [(s, e[s]) for s in states if s != CONVERSION]
    return journeys.sparkSession.createDataFrame(
        rows, "state string, exp_steps_q20 long"
    )


def budget_reallocation(journeys: DataFrame, events: DataFrame, horizon: int = 25) -> DataFrame:
    """Attribution-to-budget bridge: each channel's Markov
    removal-effect SHARE vs its spend share, and the gap between them
    — the one-table answer to "which channels are over/under-funded
    relative to the conversion mass they actually carry" (positive gap
    = carries more conversion mass than its spend share: fund it).

    Composition of two oracle-gated kernels: L60 removal effects
    (truncated-horizon q20 recurrence on the bounded transition
    matrix) and the exact-cents session spend aggregate.  Channels
    with spend but no removal row (never on a converting path) carry
    removal 0.  Shares are sign-aware half-up q20 with zero-total
    guards; the gap is a difference of exact longs.

    Output: (channel, cents, removal_q20, spend_share_q20,
    removal_share_q20, gap_q20) — bounded at |channels| rows.
    """
    rem = removal_effects(journeys, horizon=horizon).filter(
        F.col("removed_channel") != "(none)"
    ).select(F.col("removed_channel").alias("channel"), "removal_q20")
    spend = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(F.col("event_type").alias("channel"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    )
    j = spend.join(rem, "channel", "left").select(
        "channel",
        "cents",
        F.coalesce("removal_q20", F.lit(0)).cast("long").alias("removal_q20"),
    )
    w = Window.partitionBy()
    j = j.withColumn("_tc", F.sum("cents").over(w)).withColumn(
        "_tr", F.sum("removal_q20").over(w)
    )
    dec = "decimal(38,0)"

    def share(col, tot):
        return (
            f"case when {tot} <= 0 then 0 else"
            f" case when {col} >= 0 then"
            f" (2 * cast({col} as {dec}) * 1048576 + {tot}) div (2 * cast({tot} as {dec}))"
            f" else -((2 * cast(-{col} as {dec}) * 1048576 + {tot}) div (2 * cast({tot} as {dec}))) end end"
        )

    return j.select(
        "channel",
        "cents",
        "removal_q20",
        F.expr(f"cast({share('cents', '_tc')} as bigint)").alias("spend_share_q20"),
        F.expr(f"cast({share('removal_q20', '_tr')} as bigint)").alias("removal_share_q20"),
        F.expr(
            f"cast({share('removal_q20', '_tr')} - {share('cents', '_tc')} as bigint)"
        ).alias("gap_q20"),
    )
