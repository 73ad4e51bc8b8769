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

from marketing_attribution_etl_framework__maef_spark import domain
from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr
from marketing_attribution_etl_framework__maef_spark.operators import journeys as jny
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
        "maef_channel_report": q_channel_report,
        "maef_channel_report_export": q_channel_report_export,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "maef_journey_entries": _ORACLE_JOURNEY_ENTRIES,
        "maef_attribution_linear": _ORACLE_ATTR_LINEAR,
        "maef_attribution_last_touch": _ORACLE_ATTR_LAST,
        "maef_attribution_first_touch": _ORACLE_ATTR_FIRST,
        "maef_attribution_u_shaped": _ORACLE_ATTR_U,
        "maef_attribution_time_decay": _ORACLE_ATTR_DECAY,
        "maef_channel_report": _ORACLE_REPORT,
        "maef_channel_report_export": _ORACLE_REPORT_EXPORT,
    }
