"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a SURVEY.md §2 operator implemented
Spark-first in ``marketing_attribution_etl_framework__maef_spark``; each ``oracle_sql()`` entry is the
same computation in DuckDB SQL over the identical parquet inputs.
The MAEF relational model (conversions / session_sources /
session_costs) is derived from the driver's ``events`` table by the
rules in ``marketing_attribution_etl_framework__maef_spark/domain.py`` — mirrored verbatim in the
``_CONV``/``_SESS``/``_COSTS`` CTE fragments below so both engines see
identical inputs.

Float policy: per-row rational arithmetic (1/n, a*b) is left unrounded
— IEEE ops on identical inputs are bit-identical across engines.
Order-dependent aggregates (SUM over many doubles) and transcendental
outputs (pow) are ROUND'ed to 6 decimals on BOTH sides so the value
hash is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import domain, schemas
from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr
from marketing_attribution_etl_framework__maef_spark.operators import chunking
from marketing_attribution_etl_framework__maef_spark.operators import journeys as jny
from marketing_attribution_etl_framework__maef_spark.operators import loader as ldr
from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt
from marketing_attribution_etl_framework__maef_spark.plans.pipeline import AttributionPipeline, PipelineConfig

LOOKBACK_DAYS = 30

# ---------------------------------------------------------------------------
# shared DuckDB CTE fragments mirroring marketing_attribution_etl_framework__maef_spark/domain.py
# ---------------------------------------------------------------------------

_CONV = """
conv AS (
  SELECT CAST(event_id AS VARCHAR) AS conv_id,
         CAST(user_id AS VARCHAR)  AS user_id,
         ts                        AS conv_ts,
         value                     AS revenue
  FROM events WHERE event_type = 'purchase'
)"""

_SESS = """
sess AS (
  SELECT CAST(event_id AS VARCHAR) AS session_id,
         CAST(user_id AS VARCHAR)  AS user_id,
         ts                        AS event_ts,
         event_type                AS channel_name,
         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS holder_engagement,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END           AS closer_engagement,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END            AS impression_interaction,
         value
  FROM events WHERE event_type <> 'purchase'
)"""

_COSTS = """
costs AS (
  SELECT session_id, ROUND(value * 0.1, 6) AS cost
  FROM sess WHERE channel_name IN ('click','signup')
)"""

_JOURNEYS = f"""
journeys AS (
  SELECT c.conv_id AS conversion_id, s.session_id, c.conv_ts, s.event_ts,
         s.channel_name AS channel_label, s.holder_engagement,
         s.closer_engagement, s.impression_interaction, c.revenue
  FROM conv c JOIN sess s ON c.user_id = s.user_id
  WHERE s.event_ts <= c.conv_ts
    AND s.event_ts >= c.conv_ts - INTERVAL {LOOKBACK_DAYS} DAY
)"""


def _journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jny.build_journeys(
        domain.conversions(spark, sf_dir),
        domain.session_sources(spark, sf_dir),
        strict_before=False,
        lookback_days=LOOKBACK_DAYS,
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_journey_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + P1 + P4 + W2: the journey-construction join and the 8-field
    JSON contract projection."""
    return jny.journey_entries(_journeys(spark, sf_dir))


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_linear(_journeys(spark, sf_dir))


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_last_touch(_journeys(spark, sf_dir))


def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_first_touch(_journeys(spark, sf_dir))


def q_attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_u_shaped(_journeys(spark, sf_dir))


def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = attr.attribute_time_decay(_journeys(spark, sf_dir))
    return df.select("conv_id", "session_id", F.round("ihc", 6).alias("ihc"))


def q_channel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-J6 + A1 + P9-P11 + W1 over linear attribution, corrected
    grain (SURVEY §2.8.2)."""
    journeys = _journeys(spark, sf_dir)
    rep = rpt.channel_report(
        attr.attribute_linear(journeys),
        domain.session_sources(spark, sf_dir),
        domain.session_costs(spark, sf_dir),
        domain.conversions(spark, sf_dir),
        mode="corrected",
    )
    return rep.select(
        "channel_name",
        "date",
        F.round("cost", 6).alias("cost"),
        F.round("ihc", 6).alias("ihc"),
        F.round("ihc_revenue", 6).alias("ihc_revenue"),
    )


def q_channel_report_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: cpo / roas derived metrics with zero-guards."""
    journeys = _journeys(spark, sf_dir)
    rep = rpt.channel_report(
        attr.attribute_linear(journeys),
        domain.session_sources(spark, sf_dir),
        domain.session_costs(spark, sf_dir),
        domain.conversions(spark, sf_dir),
        mode="corrected",
    )
    out = rpt.export_report(rep)
    return out.select(
        "channel_name",
        "date",
        F.round("cost", 6).alias("cost"),
        F.round("ihc", 6).alias("ihc"),
        F.round("ihc_revenue", 6).alias("ihc_revenue"),
        F.round("cpo", 6).alias("cpo"),
        F.round("roas", 6).alias("roas"),
    )


def _q20(c: F.Column) -> F.Column:
    """Cross-engine-stable quantization for attribution weights.

    The weights are small rationals (sums of 0.3/k, 0.4/k, 1/n ...)
    whose true values often sit EXACTLY on decimal rounding boundaries
    (e.g. 2.53/6.4 = 0.3953125), while each engine's partition-SUM
    lands +-1ulp either side depending on summation order — so any
    decimal ROUND is a per-run coin flip. Binary fixed point
    floor(x * 2^20 + 0.5) is stable: dyadic rationals scale to exact
    integers (distance 0.5 from the floor boundary) and odd-denominator
    rationals stay >= 1/(2q) away, so 1e-10-level sum noise can never
    flip the bucket."""
    return F.floor(c * F.lit(1048576.0) + F.lit(0.5)).cast("long")


def q_attribution_ihc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — the flagship 3-phase Initializer/Holder/Closer model
    (operators/attribution.py:attribute_ihc), default phase weights.
    ihc_q20 = weight in 1/2^20 fixed-point units (see _q20)."""
    df = attr.attribute_ihc(_journeys(spark, sf_dir))
    return df.select("conv_id", "session_id", _q20(F.col("ihc")).alias("ihc_q20"))


def q_attribution_ihc_redist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 with both redistribution knobs armed (src/api/ihc_api.py:54-72
    parameter surface): 'view' channel credit redistributed, plus a
    receive_threshold floor."""
    params = attr.IHCParams(
        redistribution_channel_labels=["view"], receive_threshold=0.05
    )
    df = attr.attribute_ihc(_journeys(spark, sf_dir), params)
    return df.select("conv_id", "session_id", _q20(F.col("ihc")).alias("ihc_q20"))


def q_channel_report_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8.2 replicate grain: the shipped fan-out arithmetic
    (src/etl/reporting.py:57-98), computed via the exact factorization
    (no M x N pair materialization)."""
    journeys = _journeys(spark, sf_dir)
    rep = rpt.channel_report(
        attr.attribute_linear(journeys),
        domain.session_sources(spark, sf_dir),
        domain.session_costs(spark, sf_dir),
        domain.conversions(spark, sf_dir),
        mode="replicate",
    )
    return rep.select(
        "channel_name",
        "date",
        F.round("cost", 4).alias("cost"),
        F.round("ihc", 4).alias("ihc"),
        F.round("ihc_revenue", 4).alias("ihc_revenue"),
    )


def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ordered group-to-list (src/api/ihc_api.py:17-23) — the
    sort_array(collect_list(struct)) pattern, rendered as a path string."""
    g = jny.group_journeys(_journeys(spark, sf_dir))
    return g.select(
        "conversion_id",
        "n_sessions",
        F.array_join(F.transform("sessions", lambda s: s["session_id"]), ",").alias("path"),
    )


def q_chunk_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: deterministic two-level chunk bin-packing
    (src/api/ihc_api.py:25-52 caps)."""
    g = jny.group_journeys(_journeys(spark, sf_dir)).select("conversion_id", "n_sessions")
    return chunking.assign_chunks(g)


def q_report_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + A4 + A5: cardinality summary, MIN scalar, global SUM."""
    journeys = _journeys(spark, sf_dir)
    rep = rpt.channel_report(
        attr.attribute_linear(journeys),
        domain.session_sources(spark, sf_dir),
        domain.session_costs(spark, sf_dir),
        domain.conversions(spark, sf_dir),
        mode="corrected",
    )
    return rep.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("channel_name").alias("n_channels"),
        F.countDistinct("date").alias("n_dates"),
        F.min("date").alias("min_date"),
        F.round(F.sum("ihc"), 4).alias("total_ihc"),
    )


def _loader_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic envelope fixture built from the linear-attribution
    output (mirrors the malformed-response taxonomy of
    src/etl/load.py:34-114): valid rows packed into statusCode-200
    chunk envelopes, plus injected blank-id rows (dropped by P7),
    NULL-ihc duplicates (P2 default + A6 dedup), exact duplicates (A6),
    and three broken envelopes (2x status 500, 1x missing status)."""
    att = attr.attribute_linear(_journeys(spark, sf_dir))
    rows = att.select(F.col("conv_id").alias("conversion_id"), "session_id", "ihc")
    last = F.substring("session_id", -1, 1)
    payload = (
        rows.unionByName(
            rows.filter(last == "0").withColumn("conversion_id", F.lit(""))
        )
        .unionByName(
            rows.filter(last == "1").withColumn("ihc", F.lit(None).cast("double"))
        )
        .unionByName(rows.filter(last == "2"))
    )
    env = ldr.pack_envelopes(
        payload,
        # try_cast: blank-id rows land in a NULL chunk (ANSI mode)
        chunk=F.pmod(F.col("conversion_id").try_cast("bigint"), F.lit(20)),
    )
    bad = spark.createDataFrame(
        [(500, None, None), (500, None, None), (None, None, None)],
        schemas.API_RESPONSE_ENVELOPE,
    )
    return env.unionByName(bad)


def q_loader_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S10 + P2 + P7 + P12 + A6: the full envelope -> explode ->
    validate -> dedup -> upsert chain (src/etl/load.py:16-147). The
    injected invalid/duplicate rows must all wash out, so the loaded
    table equals the linear attribution exactly."""
    envelopes = _loader_envelopes(spark, sf_dir)
    out = ldr.dedup_results(ldr.validate_results(ldr.explode_envelopes(envelopes)))
    att = attr.attribute_linear(_journeys(spark, sf_dir))
    seed = att.filter(F.substring("session_id", -1, 1) == "3").withColumn(
        "ihc", F.lit(-1.0)
    )
    return ldr.upsert(seed, out)  # incoming wins on every key


def q_loader_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + W3 path: histogram of envelope failure classes
    (src/etl/load.py:30,41-67)."""
    return ldr.error_counts(_loader_envelopes(spark, sf_dir))


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — same computations, same aliases
# ---------------------------------------------------------------------------

_ORACLE_JOURNEY_ENTRIES = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id, session_id,
       strftime(event_ts, '%Y-%m-%d %H:%M:%S') AS timestamp,
       channel_label, holder_engagement, closer_engagement,
       CASE WHEN event_ts = conv_ts THEN 1 ELSE 0 END AS conversion,
       impression_interaction
FROM journeys
"""

_ORACLE_ATTR_LINEAR = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id AS conv_id, session_id,
       1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
FROM journeys
"""

_ORACLE_ATTR_LAST = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id AS conv_id, session_id,
       CASE WHEN ROW_NUMBER() OVER w = COUNT(*) OVER (PARTITION BY conversion_id)
            THEN 1.0 ELSE 0.0 END AS ihc
FROM journeys
WINDOW w AS (PARTITION BY conversion_id ORDER BY event_ts, session_id)
"""

_ORACLE_ATTR_FIRST = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id AS conv_id, session_id,
       CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1.0 ELSE 0.0 END AS ihc
FROM journeys
WINDOW w AS (PARTITION BY conversion_id ORDER BY event_ts, session_id)
"""

_ORACLE_ATTR_U = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id AS conv_id, session_id,
       CASE WHEN n = 1 THEN 1.0
            WHEN n = 2 THEN 0.5
            WHEN rn = 1 THEN 0.4
            WHEN rn = n THEN 0.4
            ELSE 0.2 / (n - 2) END AS ihc
FROM (
  SELECT conversion_id, session_id,
         ROW_NUMBER() OVER (PARTITION BY conversion_id ORDER BY event_ts, session_id) AS rn,
         COUNT(*) OVER (PARTITION BY conversion_id) AS n
  FROM journeys
)
"""

_ORACLE_ATTR_DECAY = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS},
weighted AS (
  SELECT conversion_id, session_id,
         POWER(2.0, -((epoch_us(conv_ts) - epoch_us(event_ts)) / 1e6 / 86400.0) / 7.0) AS w
  FROM journeys
)
SELECT conversion_id AS conv_id, session_id,
       ROUND(CASE WHEN SUM(w) OVER (PARTITION BY conversion_id) > 0
             THEN w / SUM(w) OVER (PARTITION BY conversion_id)
             ELSE 1.0 / COUNT(*) OVER (PARTITION BY conversion_id) END, 6) AS ihc
FROM weighted
"""

# shared IHC raw-weight CTEs (mirrors operators/attribution.py:attribute_ihc
# default IHCParams: initializer 0.3 / holder 0.3 / closer 0.4)
_IHC_RAW = """
ihc_base AS (
  SELECT conversion_id, session_id, channel_label,
         holder_engagement, closer_engagement,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER pw AS n,
         SUM(closer_engagement) OVER pw AS n_closer,
         SUM(holder_engagement) OVER pw AS n_holder
  FROM journeys
  WINDOW w AS (PARTITION BY conversion_id ORDER BY event_ts, session_id),
         pw AS (PARTITION BY conversion_id)
),
ihc_raw AS (
  SELECT conversion_id, session_id, channel_label, n,
      (CASE WHEN rn = 1 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN n_closer > 0
            THEN CASE WHEN closer_engagement = 1 THEN 0.4 / n_closer ELSE 0.0 END
            ELSE CASE WHEN rn = n THEN 0.4 ELSE 0.0 END END)
    + (CASE WHEN n_holder > 0
            THEN CASE WHEN holder_engagement = 1 THEN 0.3 / n_holder ELSE 0.0 END
            ELSE 0.3 / n END) AS raw_w
  FROM ihc_base
)"""

_ORACLE_ATTR_IHC = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}, {_IHC_RAW}
SELECT conversion_id AS conv_id, session_id,
       CAST(FLOOR((CASE WHEN SUM(raw_w) OVER pw > 0
                        THEN raw_w / SUM(raw_w) OVER pw
                        ELSE 1.0 / n END) * 1048576.0 + 0.5) AS BIGINT) AS ihc_q20
FROM ihc_raw
WINDOW pw AS (PARTITION BY conversion_id)
"""

_ORACLE_ATTR_IHC_REDIST = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}, {_IHC_RAW},
kept AS (
  SELECT *, (channel_label NOT IN ('view')) AND (raw_w >= 0.05) AS keep
  FROM ihc_raw
),
redist AS (
  SELECT conversion_id, session_id, n,
         CASE WHEN SUM(CASE WHEN keep THEN raw_w ELSE 0.0 END) OVER pw > 0
              THEN CASE WHEN keep THEN raw_w ELSE 0.0 END
              ELSE raw_w END AS raw2
  FROM kept
  WINDOW pw AS (PARTITION BY conversion_id)
)
SELECT conversion_id AS conv_id, session_id,
       CAST(FLOOR((CASE WHEN SUM(raw2) OVER pw > 0
                        THEN raw2 / SUM(raw2) OVER pw
                        ELSE 1.0 / n END) * 1048576.0 + 0.5) AS BIGINT) AS ihc_q20
FROM redist
WINDOW pw AS (PARTITION BY conversion_id)
"""

_ORACLE_JOURNEY_PATHS = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS}
SELECT conversion_id, COUNT(*) AS n_sessions,
       string_agg(session_id, ',' ORDER BY event_ts, session_id) AS path
FROM journeys
GROUP BY conversion_id
"""

_ORACLE_CHUNKS = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS},
grouped AS (
  SELECT conversion_id, COUNT(*) AS n_sessions FROM journeys GROUP BY 1
),
staged AS (
  SELECT conversion_id, n_sessions,
         CAST(FLOOR(COALESCE(SUM(GREATEST(n_sessions, 1)) OVER
           (ORDER BY conversion_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 2750) AS BIGINT) AS s_id
  FROM grouped
)
SELECT conversion_id, n_sessions,
       s_id * 2751
         + CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY s_id ORDER BY conversion_id) - 1)
                      / 85) AS BIGINT) AS chunk_id
FROM staged
"""

_ORACLE_REPORT_REPLICATE = f"""
WITH {_CONV}, {_SESS}, {_COSTS}, {_JOURNEYS},
attribution AS (
  SELECT conversion_id AS conv_id, session_id,
         1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
  FROM journeys
),
ar_agg AS (
  SELECT ss.channel_name,
         strftime(ss.event_ts, '%Y-%m-%d') AS date,
         SUM(a.ihc) AS s_ihc,
         SUM(c.revenue * a.ihc) AS s_rev,
         COUNT(*) AS n_ar
  FROM attribution a
  JOIN sess ss ON a.session_id = ss.session_id
  JOIN conv c ON a.conv_id = c.conv_id
  WHERE ss.channel_name IS NOT NULL AND ss.channel_name <> ''
  GROUP BY 1, 2
),
cc_agg AS (
  SELECT COALESCE(NULLIF(ss.channel_name, ''), 'unknown') AS channel_name,
         strftime(ss.event_ts, '%Y-%m-%d') AS date,
         SUM(COALESCE(co.cost, 0)) AS s_cost,
         COUNT(*) AS n_cc
  FROM sess ss LEFT JOIN costs co ON ss.session_id = co.session_id
  GROUP BY 1, 2
),
rep AS (
  SELECT ar.channel_name, ar.date,
         COALESCE(cc.s_cost, 0) * ar.n_ar AS cost,
         ar.s_ihc * COALESCE(cc.n_cc, 1) AS ihc,
         ar.s_rev * COALESCE(cc.n_cc, 1) AS ihc_revenue
  FROM ar_agg ar LEFT JOIN cc_agg cc
    ON ar.channel_name = cc.channel_name AND ar.date = cc.date
  WHERE ar.channel_name <> 'unknown'
    AND ar.date >= (SELECT MIN(strftime(conv_ts, '%Y-%m-%d')) FROM conv)
)
SELECT channel_name, date, ROUND(cost, 4) AS cost, ROUND(ihc, 4) AS ihc,
       ROUND(ihc_revenue, 4) AS ihc_revenue
FROM rep
"""

_ORACLE_LOADER_ROUNDTRIP = _ORACLE_ATTR_LINEAR  # loader must reproduce it exactly

_ORACLE_LOADER_ERRORS = f"""
WITH {_CONV}, {_SESS}, {_JOURNEYS},
att AS (SELECT DISTINCT conversion_id, session_id FROM journeys),
chunks AS (
  SELECT DISTINCT (CAST(conversion_id AS BIGINT) % 20) AS c FROM att
)
SELECT 'ok' AS error_code,
       (SELECT COUNT(*) FROM chunks)
       + (CASE WHEN EXISTS (SELECT 1 FROM att WHERE session_id LIKE '%0')
               THEN 1 ELSE 0 END) AS count
UNION ALL SELECT 'status_500', CAST(2 AS BIGINT)
UNION ALL SELECT 'missing_status', CAST(1 AS BIGINT)
"""

_ORACLE_REPORT_BODY = f"""
WITH {_CONV}, {_SESS}, {_COSTS}, {_JOURNEYS},
attribution AS (
  SELECT conversion_id AS conv_id, session_id,
         1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
  FROM journeys
),
ar AS (
  SELECT ss.channel_name,
         strftime(ss.event_ts, '%Y-%m-%d') AS date,
         COALESCE(SUM(a.ihc), 0) AS ihc,
         COALESCE(SUM(c.revenue * a.ihc), 0) AS ihc_revenue
  FROM attribution a
  JOIN sess ss ON a.session_id = ss.session_id
  JOIN conv c ON a.conv_id = c.conv_id
  WHERE ss.channel_name IS NOT NULL AND ss.channel_name <> ''
  GROUP BY 1, 2
),
cc AS (
  SELECT COALESCE(NULLIF(ss.channel_name, ''), 'unknown') AS channel_name,
         strftime(ss.event_ts, '%Y-%m-%d') AS date,
         COALESCE(SUM(co.cost), 0) AS cost
  FROM sess ss LEFT JOIN costs co ON ss.session_id = co.session_id
  GROUP BY 1, 2
),
report AS (
  SELECT ar.channel_name, ar.date,
         COALESCE(cc.cost, 0) AS cost, ar.ihc, ar.ihc_revenue
  FROM ar LEFT JOIN cc ON ar.channel_name = cc.channel_name AND ar.date = cc.date
  WHERE ar.channel_name <> 'unknown'
    AND ar.date >= (SELECT MIN(strftime(conv_ts, '%Y-%m-%d')) FROM conv)
)
"""

_ORACLE_REPORT = (
    _ORACLE_REPORT_BODY
    + """
SELECT channel_name, date, ROUND(cost, 6) AS cost, ROUND(ihc, 6) AS ihc,
       ROUND(ihc_revenue, 6) AS ihc_revenue
FROM report
"""
)

_ORACLE_REPORT_EXPORT = (
    _ORACLE_REPORT_BODY
    + """
SELECT channel_name, date, ROUND(cost, 6) AS cost, ROUND(ihc, 6) AS ihc,
       ROUND(ihc_revenue, 6) AS ihc_revenue,
       ROUND(CASE WHEN ihc > 0 THEN cost / ihc ELSE 0 END, 6) AS cpo,
       ROUND(CASE WHEN cost > 0 THEN ihc_revenue / cost ELSE 0 END, 6) AS roas
FROM report
"""
)

_ORACLE_REPORT_SUMMARY = (
    _ORACLE_REPORT_BODY
    + """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT channel_name) AS n_channels,
       COUNT(DISTINCT date) AS n_dates,
       MIN(date) AS min_date,
       ROUND(SUM(ihc), 4) AS total_ihc
FROM report
"""
)


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full pipeline (journeys -> IHC attribution ->
    corrected channel report with cpo/roas) on sf0.001."""
    pipe = AttributionPipeline(
        spark, "/root/testdata/sf0.001", PipelineConfig(model="ihc")
    )
    return pipe.export()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "maef_journey_entries": q_journey_entries,
        "maef_attribution_linear": q_attribution_linear,
        "maef_attribution_last_touch": q_attribution_last_touch,
        "maef_attribution_first_touch": q_attribution_first_touch,
        "maef_attribution_u_shaped": q_attribution_u_shaped,
        "maef_attribution_time_decay": q_attribution_time_decay,
        "maef_attribution_ihc": q_attribution_ihc,
        "maef_attribution_ihc_redist": q_attribution_ihc_redist,
        "maef_channel_report": q_channel_report,
        "maef_channel_report_export": q_channel_report_export,
        "maef_channel_report_replicate": q_channel_report_replicate,
        "maef_journey_paths": q_journey_paths,
        "maef_chunk_assignment": q_chunk_assignment,
        "maef_report_summary": q_report_summary,
        "maef_loader_roundtrip": q_loader_roundtrip,
        "maef_loader_errors": q_loader_errors,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "maef_journey_entries": _ORACLE_JOURNEY_ENTRIES,
        "maef_attribution_linear": _ORACLE_ATTR_LINEAR,
        "maef_attribution_last_touch": _ORACLE_ATTR_LAST,
        "maef_attribution_first_touch": _ORACLE_ATTR_FIRST,
        "maef_attribution_u_shaped": _ORACLE_ATTR_U,
        "maef_attribution_time_decay": _ORACLE_ATTR_DECAY,
        "maef_attribution_ihc": _ORACLE_ATTR_IHC,
        "maef_attribution_ihc_redist": _ORACLE_ATTR_IHC_REDIST,
        "maef_channel_report": _ORACLE_REPORT,
        "maef_channel_report_export": _ORACLE_REPORT_EXPORT,
        "maef_channel_report_replicate": _ORACLE_REPORT_REPLICATE,
        "maef_journey_paths": _ORACLE_JOURNEY_PATHS,
        "maef_chunk_assignment": _ORACLE_CHUNKS,
        "maef_report_summary": _ORACLE_REPORT_SUMMARY,
        "maef_loader_roundtrip": _ORACLE_LOADER_ROUNDTRIP,
        "maef_loader_errors": _ORACLE_LOADER_ERRORS,
    }
