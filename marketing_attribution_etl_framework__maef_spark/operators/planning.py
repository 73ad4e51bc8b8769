"""Campaign-planning diagnostics over the MAEF event stream.

The reference stops at the channel x date roll-up
(`src/etl/reporting.py:57-98`); these are the planner-side reads a
marketing team layers on top of that warehouse: WHEN to schedule
(dayparting), WHO the spend acquires (new vs returning), whether a
channel is actually trending (Mann-Kendall), how spend leads response
(lead-lag), and whether a month's budget is pacing to plan.

Every operator is exact-integer end to end (cents / milli-units /
counts / sign sums) so the DuckDB oracle matches bit for bit — the
repo's cross-engine arithmetic rules.

100-TB shape: all five reduce raw events to a bounded grain in ONE
map-side-combinable aggregate — (dow x hour) is 168 cells, the daily
grains are bounded by days x channels — and do the quadratic or
windowed part (MK pairs, pacing cumsum) on that bounded grain only.
Nothing here shuffles more than once on an unbounded key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# exact integer day-of-week: days-since-epoch + 4 mod 7 (1970-01-01 was
# a Thursday), 0 = Sunday. Both engines compute date-date as integer
# days, so this never consults a locale or timezone the way
# date_format('E') / dayname() would.  (Functions, not module constants:
# Column construction needs an active SparkContext.)
def _dow():
    return F.pmod(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) + 4, 7
    ).cast("long")


def _cents():
    return F.round(F.col("value") * 100, 0).cast("long")


def dayparting(events: DataFrame) -> DataFrame:
    """Session / conversion / revenue heatmap by (day-of-week, hour).

    Output: (dow, hour, n_sessions, n_conversions, revenue_cents) —
    the scheduling grid behind flight planning.  dow is the exact
    integer epoch-day device above; hour is the NTZ timestamp's hour
    field (identical in both engines — no zone math on NTZ).

    Scale: one aggregate to a <=168-cell grid; fully map-side
    combinable, reduce side is constant.
    """
    return (
        events.select(
            _dow().alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            (F.col("event_type") == "purchase").alias("_conv"),
            _cents().alias("_cents"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.sum((~F.col("_conv")).cast("long")).cast("long").alias("n_sessions"),
            F.sum(F.col("_conv").cast("long")).cast("long").alias("n_conversions"),
            F.sum(F.when(F.col("_conv"), F.col("_cents")).otherwise(0))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


def new_vs_returning(events: DataFrame) -> DataFrame:
    """Daily audience split: users whose FIRST-ever event falls on the
    day vs returning users, with purchase revenue attributed to each
    cohort.

    Output: (event_day, n_new_users, n_returning_users,
    new_revenue_cents, returning_revenue_cents).

    Scale: first-touch is one groupBy(user) min — the reach-curve
    shuffle; daily activity is a distinct on (day, user).  Both are
    single shuffles on user_id and the join is co-partitioned on the
    same key, so AQE plans one exchange per side.  The output grain is
    bounded by days.
    """
    day = F.date_format("ts", "yyyy-MM-dd")
    first = events.groupBy("user_id").agg(F.min(day).alias("_first_day"))
    active = events.select(day.alias("event_day"), "user_id").distinct()
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("event_day"), "user_id")
        .agg(F.sum(_cents()).cast("long").alias("_cents"))
    )
    flagged = (
        active.join(first, "user_id")
        .join(purch, ["event_day", "user_id"], "left")
        .select(
            "event_day",
            (F.col("event_day") == F.col("_first_day")).alias("_new"),
            F.coalesce(F.col("_cents"), F.lit(0)).cast("long").alias("_cents"),
        )
    )
    return flagged.groupBy("event_day").agg(
        F.sum(F.col("_new").cast("long")).cast("long").alias("n_new_users"),
        F.sum((~F.col("_new")).cast("long")).cast("long").alias("n_returning_users"),
        F.sum(F.when(F.col("_new"), F.col("_cents")).otherwise(0))
        .cast("long")
        .alias("new_revenue_cents"),
        F.sum(F.when(~F.col("_new"), F.col("_cents")).otherwise(0))
        .cast("long")
        .alias("returning_revenue_cents"),
    )


def mann_kendall_trend(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test per channel over the daily session-count
    series: S = sum over day pairs i<j of sign(x_j - x_i), plus the
    tie-corrected variance numerator

        var18 = 18 * Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)

    (t = size of each group of tied values).  All integers — the test
    statistic a planner checks before believing a channel is "growing".

    Output: (channel, n_days, s_stat, var18).

    Scale: the daily grain is bounded by channels x days, so the pair
    self-join is quadratic only in DAYS (a few hundred rows per
    channel), never in events.  One unbounded-key shuffle total (the
    daily aggregate).
    """
    daily = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    a = daily.select("channel", F.col("event_day").alias("d1"), F.col("x").alias("x1"))
    b = daily.select("channel", F.col("event_day").alias("d2"), F.col("x").alias("x2"))
    s = (
        a.join(b, "channel")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("channel")
        .agg(
            F.sum(
                F.when(F.col("x2") > F.col("x1"), 1)
                .when(F.col("x2") < F.col("x1"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("channel").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        daily.groupBy("channel", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("channel")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("long").alias("_tie_sum")
        )
    )
    return (
        n.join(s, "channel", "left")
        .join(ties, "channel")
        .select(
            "channel",
            "n_days",
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("long").alias("s_stat"),
            (
                F.expr("n_days * (n_days - 1) * (2 * n_days + 5)") - F.col("_tie_sum")
            )
            .cast("long")
            .alias("var18"),
        )
    )


def leadlag_response(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Lagged covariance between a channel's daily session volume and
    total purchase revenue ``lag`` days LATER — the "how long after
    spend does response land" read that sets adstock decay.

    For each (channel, lag in 0..max_lag) over the dense day spine
    [min event day, max event day]:

        cov_num = n * sum(x_d * y_{d+lag}) - sum(x_d) * sum(y_{d+lag})

    with x zero-filled on inactive days and y zero-filled on
    no-purchase days, n = spine length - lag.  Exact integers
    (counts x cents) assembled in DECIMAL(38,0), emitted BIGINT —
    widest product n * Sxy <= 10^4 days * (10^7 sessions * 10^9
    cents/day * 10^4 days) ~ 10^24, far inside DECIMAL(38,0).

    Output: (channel, lag, n_days, cov_num).

    Scale: the dense grid is (channels x spine-days) rows built by a
    sequence explode over the 1-row min/max aggregate — bounded, never
    a shuffle of raw events; raw events are touched by exactly two
    map-side-combinable daily aggregates.
    """
    day = F.date_format("ts", "yyyy-MM-dd")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("_d0"), F.max(F.to_date("ts")).alias("_d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("_d0", "_d1")).alias("_d")
    ).select(F.date_format("_d", "yyyy-MM-dd").alias("event_day"))
    channels = (
        events.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"))
        .distinct()
    )
    x = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(F.col("event_type").alias("channel"), day.alias("event_day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    y = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("event_day"))
        .agg(F.sum(_cents()).cast("long").alias("y"))
    )
    # dense (channel, day-index) grid, zero-filled both sides
    idx = F.datediff(F.to_date("event_day"), F.to_date(F.lit("1970-01-01")))
    grid = (
        spine.crossJoin(F.broadcast(channels))
        .join(x, ["channel", "event_day"], "left")
        .join(F.broadcast(y), "event_day", "left")
        .select(
            "channel",
            idx.cast("long").alias("_i"),
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    lags = grid.sparkSession.range(0, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    gx = grid.select("channel", "_i", "x")
    gy = grid.select(
        F.col("channel").alias("_ch2"), F.col("_i").alias("_j"), F.col("y")
    )
    paired = (
        gx.crossJoin(F.broadcast(lags))
        .join(
            gy,
            (F.col("channel") == F.col("_ch2"))
            & (F.col("_j") == F.col("_i") + F.col("lag")),
        )
        .select("channel", "lag", "x", "y")
    )
    return (
        paired.groupBy("channel", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.expr("cast(x as decimal(38,0))")).alias("_sx"),
            F.sum(F.expr("cast(y as decimal(38,0))")).alias("_sy"),
            F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("_sxy"),
        )
        .select(
            "channel",
            "lag",
            "n_days",
            F.expr(
                "cast(cast(n_days as decimal(38,0)) * _sxy - _sx * _sy as bigint)"
            ).alias("cov_num"),
        )
    )


def budget_pacing(events: DataFrame) -> DataFrame:
    """Month-to-date spend pacing per paid channel.

    For every (channel, month, day) with spend, compares cumulative
    month-to-date spend against the linear pace target
    (month_total * day_of_month / days_in_month) by exact integer
    cross-multiplication:

        pace_flag = sign(cum * days_in_month - month_total * day_of_month)

    (+1 ahead of pace, -1 behind, 0 exactly on).  Spend is in COST
    MILLI-UNITS: the MAEF cost contract is cost = value * 0.1 at 3
    decimals (domain.session_costs), so cost * 1000 == value * 100 —
    an exact integer both engines agree on.

    Output: (channel, month, event_day, spend_milli, cum_milli,
    month_milli, day_of_month, days_in_month, pace_flag).

    Scale: one daily aggregate over paid sessions (map-side
    combinable), then a window cumsum and a month-total window over
    the bounded (channel x day) grain.
    """
    daily = (
        events.filter(F.col("event_type").isin("click", "signup"))
        .groupBy(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.sum(_cents()).cast("long").alias("spend_milli"))
    )
    wcum = (
        Window.partitionBy("channel", "month")
        .orderBy("event_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("channel", "month")
    d = daily.withColumn("month", F.substring("event_day", 1, 7))
    return d.select(
        "channel",
        "month",
        "event_day",
        "spend_milli",
        F.sum("spend_milli").over(wcum).cast("long").alias("cum_milli"),
        F.sum("spend_milli").over(wtot).cast("long").alias("month_milli"),
        F.dayofmonth(F.to_date("event_day")).cast("long").alias("day_of_month"),
        F.dayofmonth(F.last_day(F.to_date("event_day"))).cast("long").alias("days_in_month"),
    ).withColumn(
        "pace_flag",
        F.when(
            F.col("cum_milli") * F.col("days_in_month")
            > F.col("month_milli") * F.col("day_of_month"),
            1,
        )
        .when(
            F.col("cum_milli") * F.col("days_in_month")
            < F.col("month_milli") * F.col("day_of_month"),
            -1,
        )
        .otherwise(0)
        .cast("long"),
    )


def theil_sen_slope(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend slope per channel over the daily
    session-count series: the MEDIAN of all pairwise slopes
    (x_j - x_i) / (day_j - day_i), i < j — the estimator that shrugs
    off the outlier days that wreck the OLS slope (volume_response /
    ols_trend).

    Median selection orders pairs by (slope-as-double, dy, dx, d1,
    d2) and takes row (n+1) div 2.  The double-keyed order is PART OF
    THIS OPERATOR'S DEFINITION (ADVICE r05): the division is ONE IEEE
    op both engines perform identically, so the order is total and
    cross-engine deterministic — but two distinct rationals that
    collide in double (possible above ~2^53 in |dy| or between
    near-equal slopes differing past the 53rd bit) are ordered by the
    integer tiebreak rather than exact value, so the selected "lower
    median" may then sit one adjacent element off the true rational
    median.  At the daily-count grain (|dy| < 2^40ish) collisions
    require genuinely equal slopes, where the tiebreak is harmless;
    callers needing the exact rational median at extreme magnitudes
    should sort by integer cross-multiplication instead (O(n^2)
    comparator — not windowable, hence not the default).  The
    reported slope IS exact: q20 of the chosen pair's RATIONAL dy/dx
    via the signed half-away-from-zero integer device
    (+-(2*|dy|*2^20 + dx) div (2*dx)) — no float in the output.

    Output: (channel, n_pairs, dy, dx, slope_q20).

    Scale: like mann_kendall_trend, quadratic only in the bounded
    (channel x day) grain; raw events reduce map-side first.
    """
    daily = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("channel"),
            F.to_date(F.date_format("ts", "yyyy-MM-dd")).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    a = daily.select("channel", F.col("d").alias("d1"), F.col("x").alias("x1"))
    b = daily.select("channel", F.col("d").alias("d2"), F.col("x").alias("x2"))
    pairs = (
        a.join(b, "channel")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "channel",
            (F.col("x2") - F.col("x1")).cast("long").alias("dy"),
            F.datediff("d2", "d1").cast("long").alias("dx"),
            "d1",
            "d2",
        )
    )
    w = Window.partitionBy("channel").orderBy(
        (F.col("dy").cast("double") / F.col("dx")).asc(), "dy", "dx", "d1", "d2"
    )
    ranked = pairs.withColumn("_rn", F.row_number().over(w)).join(
        pairs.groupBy("channel").agg(F.count(F.lit(1)).cast("long").alias("n_pairs")),
        "channel",
    )
    return ranked.filter(F.expr("_rn = (n_pairs + 1) div 2")).select(
        "channel",
        "n_pairs",
        "dy",
        "dx",
        F.expr(
            "case when dy >= 0 then (2 * dy * 1048576 + dx) div (2 * dx)"
            " else -((2 * (-dy) * 1048576 + dx) div (2 * dx)) end"
        )
        .cast("long")
        .alias("slope_q20"),
    )


def mix_response_ols2(events: DataFrame, emit_q20: bool = True) -> DataFrame:
    """Two-regressor media-mix OLS per channel PAIR: for every
    unordered pair (a, b), fit daily purchase cents on both channels'
    daily session volumes (with intercept) over the dense day spine,
    and emit the exact-integer Cramer's-rule solution:

        Caa = n*Sxaxa - Sxa^2   (n-scaled centered moments, all integer)
        det = Caa*Cbb - Cab^2
        b1  = (Cay*Cbb - Cby*Cab) / det      b2 symmetric

    q20 coefficients via the signed half-away-from-zero device.  This
    is the first-order answer to "does channel a still move revenue
    once channel b is controlled for" — single-regressor slopes
    (volume_response_ols) double-count correlated flights.

    Headroom (ADVICE r05 corrected derivation): with D days, X max
    sessions/day, Y max purchase cents/day the moments bound as
    |caa|,|cbb|,|cab| <= D^2*X^2 and |cay|,|cby| <= D^2*X*Y, so the
    widest q20-path intermediate 2*|cay*cbb - cby*cab|*2^20 + det is
    <= ~2^22 * D^4*X^3*Y.  DECIMAL(38,0)/HUGEINT therefore require

        D^4 * X^3 * Y  <=  ~2.4e31

    e.g. one year (D=365, D^4~1.8e10) at X=1e4 sessions/day leaves
    Y <= ~1.3e9 cents/day ($13M/day) — fine for a single property,
    NOT fine for 10^4 days x 10^6 sessions x 10^9 cents (that needs
    ~1e49).  Beyond the bound, call with ``emit_q20=False``: the
    coefficients ship as exact decimal strings (b1_num_str,
    b2_num_str over det_str — the cuped_adjusted_lift adj_num_str
    device), whose widest value is the numerator itself (~D^4*X^3*Y,
    no 2^21 blow-up) and which Spark computes in DECIMAL(38,0) up to
    ~1e38 — consumers divide at whatever precision they need.

    Output (emit_q20=True):  (channel_a, channel_b, n_days, det_str,
    b1_q20, b2_q20); (emit_q20=False): (channel_a, channel_b, n_days,
    det_str, b1_num_str, b2_num_str).  Collinear pairs (det = 0) drop
    out.

    Scale: raw events reduce to the (channel x day) grain map-side;
    the pair join and the 9-moment reduce run on that bounded grain.
    The final Cramer arithmetic is per-pair scalar work.
    """
    day = F.date_format("ts", "yyyy-MM-dd")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("_d0"), F.max(F.to_date("ts")).alias("_d1")
    )
    spine = bounds.select(F.explode(F.sequence("_d0", "_d1")).alias("_d")).select(
        F.date_format("_d", "yyyy-MM-dd").alias("event_day")
    )
    channels = (
        events.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"))
        .distinct()
    )
    x = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(F.col("event_type").alias("channel"), day.alias("event_day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    y = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("event_day"))
        .agg(F.sum(_cents()).cast("long").alias("y"))
    )
    grid = (
        spine.crossJoin(F.broadcast(channels))
        .join(x, ["channel", "event_day"], "left")
        .join(F.broadcast(y), "event_day", "left")
        .select(
            "channel",
            "event_day",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    ga = grid.select(
        F.col("channel").alias("channel_a"),
        "event_day",
        F.col("x").alias("xa"),
        "y",
    )
    gb = grid.select(
        F.col("channel").alias("channel_b"),
        F.col("event_day").alias("_day2"),
        F.col("x").alias("xb"),
    )
    paired = ga.join(
        gb,
        (F.col("event_day") == F.col("_day2"))
        & (F.col("channel_a") < F.col("channel_b")),
    )
    m = paired.groupBy("channel_a", "channel_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.expr("cast(xa as decimal(38,0))")).alias("sa"),
        F.sum(F.expr("cast(xb as decimal(38,0))")).alias("sb"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(xa as decimal(38,0)) * xa")).alias("saa"),
        F.sum(F.expr("cast(xb as decimal(38,0)) * xb")).alias("sbb"),
        F.sum(F.expr("cast(xa as decimal(38,0)) * xb")).alias("sab"),
        F.sum(F.expr("cast(xa as decimal(38,0)) * y")).alias("say"),
        F.sum(F.expr("cast(xb as decimal(38,0)) * y")).alias("sby"),
    )
    c = m.select(
        "channel_a",
        "channel_b",
        "n_days",
        F.expr("cast(n_days as decimal(38,0)) * saa - sa * sa").alias("caa"),
        F.expr("cast(n_days as decimal(38,0)) * sbb - sb * sb").alias("cbb"),
        F.expr("cast(n_days as decimal(38,0)) * sab - sa * sb").alias("cab"),
        F.expr("cast(n_days as decimal(38,0)) * say - sa * sy").alias("cay"),
        F.expr("cast(n_days as decimal(38,0)) * sby - sb * sy").alias("cby"),
    ).withColumn("det", F.expr("caa * cbb - cab * cab"))
    kept = c.filter(F.col("det") != 0)
    if not emit_q20:
        # beyond-headroom scale path: exact numerators as strings, no
        # 2^21 q20 blow-up (see docstring derivation)
        return kept.select(
            "channel_a",
            "channel_b",
            "n_days",
            F.col("det").cast("decimal(38,0)").cast("string").alias("det_str"),
            F.expr("cay * cbb - cby * cab").cast("string").alias("b1_num_str"),
            F.expr("cby * caa - cay * cab").cast("string").alias("b2_num_str"),
        )
    qdev = (
        "case when {num} >= 0 then (2 * ({num}) * 1048576 + det) div (2 * det)"
        " else -((2 * (-({num})) * 1048576 + det) div (2 * det)) end"
    )
    return kept.select(
        "channel_a",
        "channel_b",
        "n_days",
        F.col("det").cast("decimal(38,0)").cast("string").alias("det_str"),
        F.expr(qdev.format(num="cay * cbb - cby * cab")).cast("long").alias("b1_q20"),
        F.expr(qdev.format(num="cby * caa - cay * cab")).cast("long").alias("b2_q20"),
    )


def reach_frontier(events: DataFrame, k: int = 3) -> DataFrame:
    """Greedy reach-maximizing channel portfolio: pick k channels one
    at a time, each maximizing the count of NOT-yet-reached users —
    the media-plan "which k channels buy the most incremental reach"
    question (submodular max-coverage, same (1 - 1/e) greedy as
    llm/coverage.py, at the channel->user grain).

    Output: (round, channel, gain, covered_total) in pick order;
    stops early when no channel adds reach.

    Scale: the live (channel, user) table is distinct-projected once
    (bounded by channels x users) and only SHRINKS — each round
    anti-joins out the winner's users, so fully-covered channels
    disappear for free and the loop state is localCheckpoint'd
    (greedy_coverage's pruning device).  Driver state per round is
    one row; k is bounded by the channel dimension.
    """
    spark = events.sparkSession
    pairs = (
        events.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    out, covered_total = [], 0
    for rnd in range(1, k + 1):
        top = (
            pairs.groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("channel"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        ch, gain = top[0]["channel"], top[0]["gain"]
        covered_total += gain
        out.append((rnd, ch, int(gain), covered_total))
        winner_users = pairs.filter(F.col("channel") == ch).select("user_id")
        pairs = pairs.join(winner_users, "user_id", "left_anti").localCheckpoint()
    return spark.createDataFrame(
        out, "round long, channel string, gain long, covered_total long"
    )


def burstiness_screen(events: DataFrame) -> DataFrame:
    """Overdispersion (burstiness) screen per channel: is the daily
    session-count variance above Poisson (variance > mean)?  Bursty
    channels (bot flights, batched imports) fail Poisson and need the
    IVT screen; the test is exact-integer:

        var_num  = n * sum(x^2) - (sum x)^2        (n^2 * (n-1)/n ... scaled)
        bursty   = var_num > (n - 1) * sum(x)      (== sample var > mean)

    Output: (channel, n_days, total_sessions, var_num, bursty_flag).
    Widest integer n * sum(x^2) ~ 10^4 * 10^4 * (10^7)^2 = 10^22 —
    assembled in DECIMAL(38,0), emitted BIGINT at the documented SF
    bound.

    Scale: one daily aggregate (map-side), one bounded channel reduce.
    """
    daily = (
        events.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    m = daily.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("_sx"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("_sxx"),
    )
    return m.select(
        "channel",
        "n_days",
        F.col("_sx").cast("long").alias("total_sessions"),
        F.expr("cast(cast(n_days as decimal(38,0)) * _sxx - _sx * _sx as bigint)").alias(
            "var_num"
        ),
        (
            F.expr("cast(n_days as decimal(38,0)) * _sxx - _sx * _sx")
            > F.expr("(cast(n_days as decimal(38,0)) - 1) * _sx")
        )
        .cast("long")
        .alias("bursty_flag"),
    )


def share_of_voice(ev: DataFrame) -> DataFrame:
    """Weekly channel share-of-voice with week-over-week share delta —
    the budget-steering readout the reference's channel report
    (``src/etl/reporting.py:57-98``) implies but never rolls up to the
    weekly-mix grain.

    Weeks are integer weeks since the epoch Monday (datediff from
    1970-01-05 ``div`` 7 — engine-portable and NTZ/LTZ-agnostic, the
    dow_seasonal_index device).  Exact integer cents; share is the
    half-up q20 device with a zero-total guard; delta compares a
    channel's share against its previous OBSERVED week (a channel dark
    for a week sees the gap across it), NULL for the first week.

    Output: (week, channel, n_sessions, cents, share_q20, delta_q20)
    — bounded at channels x weeks; two map-side-combining aggregates
    plus two frameless/ordered windows on the bounded grain.
    """
    sess = ev.filter(F.col("event_type") != "purchase")
    per = sess.groupBy(
        F.expr(
            "cast(datediff(cast(ts as date), cast('1970-01-05' as date))"
            " div 7 as long)"
        ).alias("week"),
        F.col("event_type").alias("channel"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    per = per.withColumn("_tot", F.sum("cents").over(Window.partitionBy("week")))
    per = per.withColumn(
        "share_q20",
        F.expr(
            "cast(case when _tot = 0 then 0 else"
            " (2 * cast(cents as decimal(38,0)) * 1048576 + _tot)"
            " div (2 * cast(_tot as decimal(38,0))) end as bigint)"
        ),
    )
    w = Window.partitionBy("channel").orderBy("week")
    return per.select(
        "week",
        "channel",
        "n_sessions",
        "cents",
        "share_q20",
        (F.col("share_q20") - F.lag("share_q20").over(w)).cast("long").alias("delta_q20"),
    )


def rank_stability(ev: DataFrame) -> DataFrame:
    """Channel spend-rank stability across the two calendar halves —
    Spearman's rho on the half-period spend rankings, the one-number
    answer to "is the channel pecking order stable or churning" that
    feeds mix-review cadence decisions.

    Ranks use the TOTAL order (cents DESC, channel ASC) — no ties, so
    no tie-corrected variant is needed and both engines rank
    identically (documented: this is the deterministic-total-order
    Spearman, not the tie-averaged one).  Channels silent in a half
    rank with 0 cents (dense channel set).  rho = 1 - 6*sum(d^2) /
    (n(n^2-1)) stays an exact rational of integers and is emitted as a
    sign-aware half-up q20, constant over the per-channel rows; n < 2
    emits NULL rho (the statistic is undefined).

    Output: (channel, cents_h1, cents_h2, rank_h1, rank_h2, d2,
    rho_q20) — bounded at |channels| rows; two map-side-combining
    aggregates + rank windows on the bounded grain.
    """
    span = ev.groupBy().agg(
        F.min(F.col("ts").cast("date")).alias("_d0"),
        F.max(F.col("ts").cast("date")).alias("_d1"),
    )
    sess = (
        ev.filter(F.col("event_type") != "purchase")
        .crossJoin(F.broadcast(span))
        .withColumn(
            "_h1",
            F.datediff(F.col("ts").cast("date"), F.col("_d0")) * 2
            <= F.datediff(F.col("_d1"), F.col("_d0")),
        )
    )
    per = sess.groupBy(F.col("event_type").alias("channel")).agg(
        F.sum(
            F.when(F.col("_h1"), F.round(F.col("value") * 100, 0).cast("long")).otherwise(0)
        )
        .cast("long")
        .alias("cents_h1"),
        F.sum(
            F.when(~F.col("_h1"), F.round(F.col("value") * 100, 0).cast("long")).otherwise(0)
        )
        .cast("long")
        .alias("cents_h2"),
    )
    w1 = Window.orderBy(F.desc("cents_h1"), F.asc("channel"))
    w2 = Window.orderBy(F.desc("cents_h2"), F.asc("channel"))
    ranked = (
        per.withColumn("rank_h1", F.row_number().over(w1).cast("long"))
        .withColumn("rank_h2", F.row_number().over(w2).cast("long"))
        .withColumn(
            "d2",
            (
                (F.col("rank_h1") - F.col("rank_h2"))
                * (F.col("rank_h1") - F.col("rank_h2"))
            ).cast("long"),
        )
    )
    wall = Window.partitionBy()
    ranked = ranked.withColumn("_n", F.count(F.lit(1)).over(wall)).withColumn(
        "_sd2", F.sum("d2").over(wall)
    )
    num = "(cast(_n as decimal(38,0)) * (_n * _n - 1) - 6 * cast(_sd2 as decimal(38,0)))"
    den = "(cast(_n as decimal(38,0)) * (_n * _n - 1))"
    return ranked.select(
        "channel",
        "cents_h1",
        "cents_h2",
        "rank_h1",
        "rank_h2",
        "d2",
        F.expr(
            f"case when _n < 2 then null else"
            f" cast(case when {num} >= 0 then (2 * {num} * 1048576 + {den}) div (2 * {den})"
            f" else -((2 * -{num} * 1048576 + {den}) div (2 * {den})) end as bigint) end"
        ).alias("rho_q20"),
    )


def effective_frequency(events: DataFrame) -> DataFrame:
    """Effective-frequency curve: purchase rate by per-user touch
    count — the media-planning question behind frequency capping
    (L184): after how many touches does the marginal conversion
    probability flatten?  Users are bucketed by the BINARY MAGNITUDE
    of their total non-purchase touch count (bucket = bit length: 1,
    2-3, 4-7, 8-15, ... — the integer-exact log grid the L87 histogram
    sketch uses, portable because both engines ship bin()); a user
    converts if they have any purchase.

    Exact integers: per-bucket user and buyer counts, rate as half-up
    q20 via (2a*2^20 + b) div (2b).  Scale: one user-grain aggregate
    (map-side combining conditional counts) then a ~64-row roll-up.
    Output: (touch_bucket, n_users, n_buyers, buy_rate_q20).
    """
    is_purchase = F.col("event_type") == "purchase"
    per_user = events.groupBy("user_id").agg(
        F.sum((~is_purchase).cast("long")).cast("long").alias("_touches"),
        F.max(is_purchase.cast("long")).cast("long").alias("_buyer"),
    )
    bucket = F.when(F.col("_touches") == 0, F.lit(0)).otherwise(
        F.length(F.expr("bin(_touches)"))
    )
    return (
        per_user.select(bucket.cast("long").alias("touch_bucket"), "_buyer")
        .groupBy("touch_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("_buyer").cast("long").alias("n_buyers"),
        )
        .withColumn(
            "buy_rate_q20",
            F.expr("(2 * n_buyers * 1048576 + n_users) div (2 * n_users)").cast("long"),
        )
    )


def channel_affinity(events: DataFrame) -> DataFrame:
    """Channel-pair audience affinity (lift matrix): for every
    unordered channel pair, observed co-audience vs the independence
    expectation — lift = P(a and b) / (P(a) * P(b)) — the portfolio
    question channel_synergy (L195) answers at the JOURNEY grain asked
    at the cheaper USER-INCIDENCE grain (reach planning, not
    attribution).

    Exact integers end to end: audiences and co-audiences are distinct
    user counts; lift is half-up q20 of the rational
    (n_ab * n_users) / (n_a * n_b) via integer cross-multiplication —
    no float crosses engines.  Scale: the distinct (user, channel)
    incidence is one aggregate; the pair self-join fans each user's
    bounded channel set (<= |channels|) quadratically per user, never
    across users.  Output: (channel_a, channel_b, n_a, n_b, n_pair,
    lift_q20).
    """
    inc = (
        events.filter(F.col("event_type") != "purchase")
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    n_users = inc.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    per_ch = inc.groupBy("channel").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = inc.select("user_id", F.col("channel").alias("channel_a"))
    b = inc.select("user_id", F.col("channel").alias("channel_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("channel_a") < F.col("channel_b"))
        .groupBy("channel_a", "channel_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    return (
        pairs.join(
            F.broadcast(per_ch.select(F.col("channel").alias("channel_a"), F.col("n").alias("n_a"))),
            "channel_a",
        )
        .join(
            F.broadcast(per_ch.select(F.col("channel").alias("channel_b"), F.col("n").alias("n_b"))),
            "channel_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "channel_a",
            "channel_b",
            "n_a",
            "n_b",
            "n_pair",
            F.expr("(2 * n_pair * _n * 1048576 + n_a * n_b) div (2 * n_a * n_b)")
            .cast("long")
            .alias("lift_q20"),
        )
    )


def error_impact(events: DataFrame) -> DataFrame:
    """Error-exposure conversion screen: purchase rate for users who
    hit at least one 'error' event vs users who hit none — the
    site-reliability question marketing dashboards bury (is the error
    page costing conversions?), answered with the same exact-integer
    contract as the A/B readout (L109): the significance test belongs
    in the notebook, the warehouse emits exact counts.

    Output: (has_error, n_users, n_buyers, buy_rate_q20).  Scale: one
    user-grain aggregate (map-side combining flags), then a 2-row
    roll-up.
    """
    per_user = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "error").cast("long")).alias("_err"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("_buyer"),
    )
    return (
        per_user.groupBy(F.col("_err").cast("boolean").alias("has_error"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("_buyer").cast("long").alias("n_buyers"),
        )
        .withColumn(
            "buy_rate_q20",
            F.expr("(2 * n_buyers * 1048576 + n_users) div (2 * n_users)").cast("long"),
        )
    )
