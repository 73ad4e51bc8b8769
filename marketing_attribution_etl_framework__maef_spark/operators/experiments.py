"""Experiment readouts beyond raw counts: Wilson confidence intervals
and difference-in-differences.

The A/B report (operators/reporting.py ab_lift_report) deliberately
stops at exact counts; the two questions a growth team asks next are
"what is the uncertainty band on each rate?" (Wilson score interval —
the standard small-n-safe CI, Wilson 1927) and "what is the causal
lift when the split is a before/after rollout rather than a random
split?" (two-by-two difference-in-differences).

No reference parity (the reference has no statistics layer); extends
the §2.10 experimentation family next to L109 ab_lift.

Cross-engine policy: counts are exact BIGINTs end-to-end.  The Wilson
bound needs sqrt — an IRRATIONAL output for any non-degenerate input,
so q20 emission is safe per the repo float rule (CLAUDE.md); both
engines evaluate the IDENTICAL double expression tree (z literals
written 1.96e0/3.8416e0 — e-notation parses as DOUBLE in both
engines, where a bare decimal literal parses as DECIMAL and the two
engines lower mixed DECIMAL arithmetic differently), and IEEE doubles
make +,*,/ and sqrt deterministic given identical operands.  The DiD estimate stays
rational, so it is NEVER computed in doubles: each cell mean is
quantized to q20 via integer division first and the estimate is a
difference of exact q20 integers.

100-TB shape: everything collapses to per-group counts with map-side
combine before any arithmetic; group cardinality is the channel/cell
dimension, so the post-agg expressions run on bounded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z2_TIMES_1e4 = 38416  # z = 1.96 => z^2 = 3.8416 exactly

# the shared double-expression (Spark SQL and DuckDB parse the same
# text): n, s are BIGINT columns in scope
_WILSON_CENTER = "((s / cast(n as double)) + 3.8416e0 / (2 * n)) / (1 + 3.8416e0 / n)"
_WILSON_HALF = (
    "(1.96e0 * sqrt((s / cast(n as double)) * (1 - s / cast(n as double)) / n"
    " + 3.8416e0 / (4 * cast(n as double) * n))) / (1 + 3.8416e0 / n)"
)


def wilson_rates(trials: DataFrame, group_col: str = "channel") -> DataFrame:
    """Per-group conversion rate with a 95% Wilson score interval.

    ``trials``: one row per trial with ``group_col`` and 0/1 ``hit``.
    Output: (group, n, s, lo_q20, hi_q20) with lo/hi the q20-quantized
    interval endpoints; groups with n = 0 cannot occur (group keys come
    from the rows themselves).
    """
    per = trials.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("hit").cast("long")).cast("long").alias("s"),
    )
    q20 = "cast(floor(({expr}) * 1048576 + 0.5e0) as bigint)"
    return per.select(
        F.col("g").alias(group_col),
        "n",
        "s",
        F.expr(q20.format(expr=f"({_WILSON_CENTER}) - ({_WILSON_HALF})")).alias("lo_q20"),
        F.expr(q20.format(expr=f"({_WILSON_CENTER}) + ({_WILSON_HALF})")).alias("hi_q20"),
    )


def did_lift(
    assignments: DataFrame,
    outcomes: DataFrame,
    cutover: str,
    user_col: str = "user_id",
) -> DataFrame:
    """Two-by-two difference-in-differences over a before/after
    rollout.

    ``assignments``: (user_col, treated 0/1) — one row per user.
    ``outcomes``: (user_col, day 'yyyy-MM-dd', cents) purchase facts.
    Cells are (treated, period >= cutover); each cell mean is the
    exact q20 of cell_cents / cell_users, with cell_users the number
    of ASSIGNED users in the arm (a fixed panel: users without
    purchases count as zeros, which is why the denominator comes from
    assignments, not outcomes).

    Output: one row (t_pre_q20, t_post_q20, c_pre_q20, c_post_q20,
    did_q20), did = (t_post - t_pre) - (c_post - c_pre), exact
    integer arithmetic on the quantized means.
    """
    arm_sizes = assignments.groupBy("treated").agg(
        F.count(F.lit(1)).cast("long").alias("arm_users")
    )
    cells = (
        outcomes.join(assignments, user_col)
        .withColumn("post", (F.col("day") >= F.lit(cutover)).cast("int"))
        .groupBy("treated", "post")
        .agg(F.sum("cents").cast("long").alias("cell_cents"))
        .join(F.broadcast(arm_sizes), "treated")
        .select(
            "treated",
            "post",
            F.expr("cast(cast(cell_cents as decimal(38,0)) * 1048576 div arm_users as bigint)").alias("mean_q20"),
        )
    )
    # 2x2 collapse on a bounded 4-row table
    flat = cells.select(
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_q20"))).alias("t_pre_q20"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_q20"))).alias("t_post_q20"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_q20"))).alias("c_pre_q20"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_q20"))).alias("c_post_q20"),
    )
    return flat.select(
        F.coalesce("t_pre_q20", F.lit(0)).cast("long").alias("t_pre_q20"),
        F.coalesce("t_post_q20", F.lit(0)).cast("long").alias("t_post_q20"),
        F.coalesce("c_pre_q20", F.lit(0)).cast("long").alias("c_pre_q20"),
        F.coalesce("c_post_q20", F.lit(0)).cast("long").alias("c_post_q20"),
        (
            (F.coalesce("t_post_q20", F.lit(0)) - F.coalesce("t_pre_q20", F.lit(0)))
            - (F.coalesce("c_post_q20", F.lit(0)) - F.coalesce("c_pre_q20", F.lit(0)))
        )
        .cast("long")
        .alias("did_q20"),
    )


def srm_check(events: DataFrame, salt: str = "ab") -> DataFrame:
    """Sample-ratio-mismatch guardrail for the 50/50 experiment split:
    the FIRST check an experimentation platform runs before any lift
    readout (a skewed split invalidates the experiment regardless of
    the metric).  chi-square with df=1 against the 0.95 critical value
    3.8416, decided by EXACT integer cross-multiplication:

        srm_flag = (n_a - n_b)^2 * 10000  >  38416 * (n_a + n_b)

    (3.8416 = 38416/10000 exactly, so no float enters the decision —
    the e-notation literal rule taken one step further).

    Output: 1 row (n_users, n_a, n_b, chi2_num, chi2_den, srm_flag).

    Scale: one distinct-user aggregate with a conditional count —
    map-side combinable, constant reduce.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|" + salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    per_user = events.select("user_id", bucket.alias("_b")).distinct()
    agg = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("_b") < 50).cast("long")).cast("long").alias("n_a"),
        F.sum((F.col("_b") >= 50).cast("long")).cast("long").alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    return agg.select(
        "n_users",
        "n_a",
        "n_b",
        (d * d).cast("long").alias("chi2_num"),
        (F.col("n_a") + F.col("n_b")).cast("long").alias("chi2_den"),
        (d * d * F.lit(10000) > F.lit(38416) * (F.col("n_a") + F.col("n_b")))
        .cast("long")
        .alias("srm_flag"),
    )


def cuped_adjusted_lift(events: DataFrame, cutover: str, salt: str = "ab") -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013) in
    EXACT integers: per user, pre-period activity x (event count
    before the cutover) and post-period revenue y (purchase cents at
    or after it); variants from the canonical salted-md5 bucket; the
    pooled regression adjustment theta = Sxy/Sxx never materializes —
    the adjusted mean difference

        (ybar_A - ybar_B) - theta * (xbar_A - xbar_B)

    is emitted as the cross-multiplied integer NUMERATOR

        adj_num = (sy_a*n_b - sy_b*n_a) * Sxx - (sx_a*n_b - sx_b*n_a) * Sxy

    over the positive denominator n_a*n_b*Sxx, so its SIGN is the
    adjusted lift's sign and ratios of adj_num across runs are exact.
    Sxy/Sxx are the n-scaled pooled moments (integers).

    Output: 1 row (n_a, n_b, sx_a, sx_b, sy_a, sy_b, sxx_str, sxy_str,
    adj_num_str, adj_sign) — wide integers ship as decimal strings
    (adj_num ~ 1e24 at the documented SF bound, inside
    DECIMAL(38,0)/HUGEINT).

    Scale: ONE user-grain aggregate over raw events (map-side
    combinable conditional sums), then constant-size moment algebra.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|" + salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    cut = F.lit(cutover).cast("date")
    pre = F.col("ts").cast("date") < cut
    is_buy = F.col("event_type") == "purchase"
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(pre.cast("long")).cast("long").alias("x"),
            F.sum(
                F.when(
                    (~pre) & is_buy, F.round(F.col("value") * 100, 0).cast("long")
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select("user_id", "x", "y")
        .withColumn("_b", bucket)
        .withColumn("_a", (F.col("_b") < 50).cast("long"))
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_a").cast("long").alias("n_a"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx_raw"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy_raw"),
        F.sum(F.expr("cast(_a as decimal(38,0)) * x")).alias("sx_a"),
        F.sum(F.expr("cast(_a as decimal(38,0)) * y")).alias("sy_a"),
    )
    c = m.select(
        "n",
        "n_a",
        (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
        F.col("sx_a").cast("long").alias("sx_a"),
        (F.col("sx") - F.col("sx_a")).cast("long").alias("sx_b"),
        F.col("sy_a").cast("long").alias("sy_a"),
        (F.col("sy") - F.col("sy_a")).cast("long").alias("sy_b"),
        F.expr("cast(n as decimal(38,0)) * sxx_raw - sx * sx").alias("_sxx"),
        F.expr("cast(n as decimal(38,0)) * sxy_raw - sx * sy").alias("_sxy"),
    )
    adj = F.expr(
        "(cast(sy_a as decimal(38,0)) * n_b - cast(sy_b as decimal(38,0)) * n_a) * _sxx"
        " - (cast(sx_a as decimal(38,0)) * n_b - cast(sx_b as decimal(38,0)) * n_a) * _sxy"
    )
    return c.select(
        "n_a",
        "n_b",
        "sx_a",
        "sx_b",
        "sy_a",
        "sy_b",
        F.col("_sxx").cast("string").alias("sxx_str"),
        F.col("_sxy").cast("string").alias("sxy_str"),
        adj.cast("string").alias("adj_num_str"),
        F.when(adj > 0, 1).when(adj < 0, -1).otherwise(0).cast("long").alias("adj_sign"),
    )


def mde_components(events: DataFrame, salt: str = "ab") -> DataFrame:
    """Experiment power planning: the minimum-detectable-effect (MDE)
    of the 50/50 conversion-rate test as an EXACT RATIONAL —

        mde^2 = (z_{a/2} + z_b)^2 * 2 * p(1-p) * (1/n_a + 1/n_b)

    with alpha=.05 / power=.8, so (1.96 + 0.8416)^2 = 2.8016^2 =
    784896256/10^8 exactly (the SRM device: the z constant enters as
    an exact rational, never a float).  With p = c/n:

        mde2_num = 784896256 * 2 * c * (n-c) * (n_a + n_b)
        mde2_den = 10^8 * n^2 * n_a * n_b

    Output: 1 row (n_users, n_a, n_b, n_converters, mde2_num_str,
    mde2_den_str, mde2_q20) — the q20 is the exact half-up of the
    rational; take a square root downstream to read the MDE itself.

    Scale: one distinct-user aggregate with conditional counts.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|" + salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    per_user = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("_cv")
    ).withColumn("_a", (bucket < 50).cast("long"))
    agg = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("_a").cast("long").alias("n_a"),
        F.sum("_cv").cast("long").alias("n_converters"),
    ).select(
        "n_users",
        "n_a",
        (F.col("n_users") - F.col("n_a")).cast("long").alias("n_b"),
        "n_converters",
    )
    num = F.expr(
        "cast(784896256 as decimal(38,0)) * 2 * n_converters"
        " * (n_users - n_converters) * (n_a + n_b)"
    )
    den = F.expr(
        "cast(100000000 as decimal(38,0)) * n_users * n_users * n_a * n_b"
    )
    return agg.select(
        "n_users",
        "n_a",
        "n_b",
        "n_converters",
        num.cast("string").alias("mde2_num_str"),
        den.cast("string").alias("mde2_den_str"),
        F.expr(
            "cast((2 * cast(784896256 as decimal(38,0)) * 2 * n_converters"
            " * (n_users - n_converters) * (n_a + n_b) * 1048576"
            " + cast(100000000 as decimal(38,0)) * n_users * n_users * n_a * n_b)"
            " div (2 * cast(100000000 as decimal(38,0)) * n_users * n_users * n_a * n_b)"
            " as bigint)"
        ).alias("mde2_q20"),
    )


def mix_drift_chi2(events: DataFrame) -> DataFrame:
    """Chi-square channel-mix drift monitor: is THIS week's traffic
    mix across channels consistent with LAST week's?  The k-cell
    generalization of the 2-arm SRM check (srm_check) — the standard
    pipeline-health alarm for "a channel's tracking broke / a bot
    flood shifted the mix" that a per-channel volume alert misses
    because it has no notion of composition.

    Windows are anchored to the data's own max event date D: current =
    (D-7, D], baseline = (D-14, D-7] — self-anchoring so the monitor
    needs no wall clock (replayable, oracle-checkable).

    Per channel i with baseline count m_i (m = SUM m_i, baseline-
    present channels only) and current count o_i (n = SUM o_i over the
    same channels):

        contrib_i = (o_i - n*m_i/m)^2 / (n*m_i/m)
                  = (o_i*m - n*m_i)^2 / (n*m_i*m)    -- exact rational

    emitted q20 via the half-up device in DECIMAL(38,0) (== oracle
    HUGEINT).  Headroom (ADVICE r06 #3 — in terms of the WINDOW TOTALS
    n and m, not per-cell counts): |o_i*m - n*m_i| <= 2*n*m, so the
    squared numerator times 2^21 needs (2nm)^2 * 2^21 < 10^38, i.e.
    n*m < ~3.5e15 — safe while both weekly window totals stay under
    ~6e7 events; beyond that, pre-aggregate to a coarser unit (the
    monitor's resolution, not its math, is the limit).  Channels that
    are NEW this week (no baseline mass) cannot enter the chi-square;
    they are emitted with n_base = 0 and a NULL contribution — the
    alarm for them is their very existence.  Sum the contributions
    against chi2_{k-1} downstream; the operator stays decision-free.

    Scale: two map-side-combining aggregates to the channel grain;
    everything after runs on bounded rows.  Output: (channel, n_cur,
    n_base, chi2_contrib_q20).
    """
    sess = events.filter(F.col("event_type") != "purchase")
    daily = sess.groupBy(
        F.col("event_type").alias("channel"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return mix_drift_chi2_from_daily(daily)


def mix_drift_chi2_from_daily(daily: DataFrame) -> DataFrame:
    """The mix-drift chi-square over a pre-aggregated (channel, d, n)
    daily count table — the entry point the streaming twin feeds with
    its closed daily windows (mix_drift_chi2 reduces raw events to
    this grain first; results identical)."""
    mx = daily.agg(F.max("d").alias("_mx"))
    d = daily.crossJoin(F.broadcast(mx)).select(
        "channel",
        F.datediff(F.col("_mx"), F.col("d")).alias("_age"),
        "n",
    )
    per = d.filter(F.col("_age") < 14).groupBy("channel").agg(
        F.sum(F.when(F.col("_age") < 7, F.col("n")).otherwise(0)).cast("long").alias("n_cur"),
        F.sum(F.when(F.col("_age") >= 7, F.col("n")).otherwise(0)).cast("long").alias("n_base"),
    )
    dec = "decimal(38,0)"
    # totals over the BASELINE-PRESENT cells only (the chi-square's
    # sample space); new channels are excluded from n and m
    w = "(partition by (case when n_base > 0 then 1 else 0 end))"
    per = per.withColumn(
        "_n",
        F.expr(f"sum(case when n_base > 0 then n_cur else 0 end) over {w}"),
    ).withColumn(
        "_m",
        F.expr(f"sum(case when n_base > 0 then n_base else 0 end) over {w}"),
    )
    num = f"(cast(n_cur as {dec}) * _m - cast(_n as {dec}) * n_base)"
    den = f"(cast(_n as {dec}) * n_base * _m)"
    return per.select(
        "channel",
        "n_cur",
        "n_base",
        F.expr(
            f"case when n_base > 0 and _n > 0 then"
            f" cast((2 * {num} * {num} * 1048576 + {den}) div (2 * {den}) as bigint)"
            f" end"
        ).alias("chi2_contrib_q20"),
    )


def matched_lift(events: DataFrame, channel: str = "click") -> DataFrame:
    """Exact-cell matched exposure lift — the observational causal
    screen between a raw exposed-vs-not comparison (confounded) and a
    full experiment (L109/L222): users are matched on PRE-period
    behavior cells and the treated-minus-control outcome gap is read
    within each cell, so selection on past activity cannot masquerade
    as lift.

    Windows: the calendar is split at its midpoint (pre = first half,
    post = rest).  Covariate cell = (log-bucket of pre-period session
    count — the L87 bucket device — , pre-period purchaser flag).
    Treated = exposed to ``channel`` in the POST period; outcome =
    post-period purchase cents.

    Per cell the gap is the exact rational (st*nc - sc*nt)/(nt*nc) in
    cents, emitted as a sign-aware half-up q20; cells missing either
    arm emit NULL lift (the unmatched-support report — silently
    dropping them would overstate coverage).  Everything else is
    integer.  DECIMAL(38,0) headroom: |st|,|sc| < 1e16 cents and
    counts < 1e9 keep the cross product under 1e38.

    Scale: two map-side-combining aggregates (user grain, then cell
    grain); output bounded by ~64*4 cells x 2.

    Output: (cell_sessions_lb, pre_buyer, n_treated, n_control,
    treated_cents, control_cents, lift_cents_q20).
    """
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import (
        log_bucket_lower,
    )

    span = events.groupBy().agg(
        F.min(F.col("ts").cast("date")).alias("_d0"),
        F.max(F.col("ts").cast("date")).alias("_d1"),
    )
    ev = events.crossJoin(F.broadcast(span)).withColumn(
        "_pre",
        F.datediff(F.col("ts").cast("date"), F.col("_d0")) * 2
        <= F.datediff(F.col("_d1"), F.col("_d0")),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("_pre") & (F.col("event_type") != "purchase"), 1).otherwise(0)
        )
        .cast("long")
        .alias("pre_sessions"),
        F.max(
            F.when(F.col("_pre") & (F.col("event_type") == "purchase"), 1).otherwise(0)
        )
        .cast("long")
        .alias("pre_buyer"),
        F.max(
            F.when(~F.col("_pre") & (F.col("event_type") == F.lit(channel)), 1).otherwise(0)
        )
        .cast("long")
        .alias("_treated"),
        F.sum(
            F.when(
                ~F.col("_pre") & (F.col("event_type") == "purchase"),
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("post_cents"),
    )
    cells = per_user.groupBy(
        log_bucket_lower("pre_sessions", 2).alias("cell_sessions_lb"),
        "pre_buyer",
    ).agg(
        F.sum("_treated").cast("long").alias("n_treated"),
        F.sum(1 - F.col("_treated")).cast("long").alias("n_control"),
        F.sum(F.col("_treated") * F.col("post_cents")).cast("long").alias("treated_cents"),
        F.sum((1 - F.col("_treated")) * F.col("post_cents"))
        .cast("long")
        .alias("control_cents"),
    )
    dec = "decimal(38,0)"
    num = f"(cast(treated_cents as {dec}) * n_control - cast(control_cents as {dec}) * n_treated)"
    den = f"(cast(n_treated as {dec}) * n_control)"
    return cells.select(
        "cell_sessions_lb",
        "pre_buyer",
        "n_treated",
        "n_control",
        "treated_cents",
        "control_cents",
        F.expr(
            f"case when n_treated > 0 and n_control > 0 then"
            f" cast(case when {num} >= 0 then (2 * {num} * 1048576 + {den}) div (2 * {den})"
            f" else -((2 * -{num} * 1048576 + {den}) div (2 * {den})) end as bigint)"
            f" end"
        ).alias("lift_cents_q20"),
    )


def ab_quantile_effects(
    events: DataFrame,
    salt: str = "ab",
    split_pct: int = 50,
) -> DataFrame:
    """Quantile treatment effects for the A/B split: per-buyer total
    purchase cents compared at p25/p50/p75 between variants — the
    distributional readout the mean-lift report (L109 ab_lift) hides:
    a treatment that moves only the whale tail leaves the median flat,
    and vice versa.

    Assignment is the repo's canonical salted-md5 user bucket (the
    EXACT expression in ab_lift_report, so the two readouts describe
    the same experiment).  The population is BUYERS (users with >= 1
    purchase); the outcome is their exact-cents purchase total; the
    quantiles are exact PERCENTILE_DISC (L37 device — rank ==
    ceil(p*n), an actual data value, no interpolation floats).

    Output: (p, cents_a, cents_b, diff_cents), 3 rows.
    Scale: one user-grain aggregate, then percentile_disc's per-variant
    rank window — at 100 TB swap in the mergeable log-histogram sketch
    (L87) for the same readout with bounded state.
    """
    from marketing_attribution_etl_framework__maef_spark.operators.quantiles import (
        percentile_disc,
    )

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|" + salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    is_purchase = F.col("event_type") == "purchase"
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(
                F.when(is_purchase, F.round(F.col("value") * 100, 0).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("cents"),
            F.max(is_purchase.cast("long")).alias("_buyer"),
        )
        .filter(F.col("_buyer") == 1)
        .select(
            F.when(bucket < split_pct, F.lit("A")).otherwise(F.lit("B")).alias("variant"),
            "cents",
        )
    )
    q = percentile_disc(per_user, ["variant"], "cents", [0.25, 0.5, 0.75])
    return (
        q.groupBy("p")
        .agg(
            F.max(F.when(F.col("variant") == "A", F.col("cents"))).cast("long").alias("cents_a"),
            F.max(F.when(F.col("variant") == "B", F.col("cents"))).cast("long").alias("cents_b"),
        )
        .withColumn("diff_cents", (F.col("cents_b") - F.col("cents_a")).cast("long"))
    )


def geo_holdout_lift(nation_period: DataFrame) -> DataFrame:
    """Matched-market (geo-holdout) incrementality readout — the
    family member DiD (``did_lift``), CUPED and ``matched_lift`` leave
    open: each TREATED market's post-period revenue is compared to a
    share-scaled counterfactual built from the pooled CONTROL markets,

        counterfactual_t = post_ctrl * pre_t / pre_ctrl   (half-up cents)
        lift_t           = post_t - counterfactual_t

    i.e. the control pool supplies the pre→post trend and each
    treated market supplies its own pre-period scale — the standard
    holdout-market analysis run when a channel is switched on in some
    geos only.  Exact integer cents end to end: the division is one
    half-up integer cross-multiplication per treated market.

    Input grain: one row per market with (nation, is_treated,
    pre_cents, post_cents) — the caller aggregates facts down to this
    bounded grain first, so this function only ever sees
    |markets| rows.

    100-TB shape: the heavy work is the caller's one fact-scan
    aggregate to the market grain; here the control pool is a 1-row
    aggregate broadcast across the treated rows."""
    ctrl = nation_period.filter(~F.col("is_treated")).agg(
        F.sum("pre_cents").cast("long").alias("ctrl_pre_cents"),
        F.sum("post_cents").cast("long").alias("ctrl_post_cents"),
    )
    treated = nation_period.filter(F.col("is_treated"))
    return (
        treated.crossJoin(F.broadcast(ctrl))
        .select(
            "nation",
            F.col("pre_cents").cast("long").alias("pre_cents"),
            F.col("post_cents").cast("long").alias("post_cents"),
            "ctrl_pre_cents",
            "ctrl_post_cents",
            F.expr(
                "(2 * ctrl_post_cents * pre_cents + ctrl_pre_cents)"
                " div (2 * ctrl_pre_cents)"
            )
            .cast("long")
            .alias("counterfactual_cents"),
        )
        .withColumn(
            "lift_cents",
            (F.col("post_cents") - F.col("counterfactual_cents")).cast("long"),
        )
    )
