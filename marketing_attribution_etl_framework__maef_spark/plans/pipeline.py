"""End-to-end pipeline driver (SURVEY §3.4).

The reference's five Airflow stages (``dags/ihc_api_dag.py:257-307``:
setup_database >> transform_data >> send_data_to_api >>
load_attribution_results >> create_channel_report) collapse into one
lazy DataFrame lineage inside a single SparkSession — process hops and
XCom/file handoffs disappear; node boundaries remain only at shuffles
(the J1 join, the attribution window, the report agg) and sinks.

Runtime verification mirrors the reference's checks (SURVEY §5):
non-empty transform (``transform.py:264-265``), sum(ihc) > 0
(``load.py:120-123``), non-empty report (``reporting.py:104-106``).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import domain
from marketing_attribution_etl_framework__maef_spark.functions.dates import date_range_predicate, validate_date_range
from marketing_attribution_etl_framework__maef_spark.operators import attribution as attr
from marketing_attribution_etl_framework__maef_spark.operators import journeys as jny
from marketing_attribution_etl_framework__maef_spark.operators import reporting as rpt


@dataclass
class PipelineConfig:
    model: str = "ihc"
    strict_before: bool = False       # SURVEY §2.8.1 decision: <= semantics
    lookback_days: int | None = 30    # v1 lookback, honored per §2.8.6
    report_mode: str = "corrected"    # §2.8.2 decision
    start: str | None = None          # conversion date range (DAG contract)
    end: str | None = None


class AttributionPipeline:
    """Raw tables -> journeys -> attribution -> channel report."""

    def __init__(self, spark: SparkSession, sf_dir: str, config: PipelineConfig | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cfg = config or PipelineConfig()

    # -- stage 1-2: inputs + journey construction -------------------------
    def conversions(self) -> DataFrame:
        conv = domain.conversions(self.spark, self.sf_dir)
        if self.cfg.start and self.cfg.end:
            # today= arms the 'end not in the future' guard
            # (dates.py, mirroring dags/ihc_api_dag.py:56-63)
            validate_date_range(self.cfg.start, self.cfg.end, today=dt.date.today())
            conv = conv.filter(
                date_range_predicate(F.col("conv_ts"), self.cfg.start, self.cfg.end)
            )
        return conv

    def sessions(self) -> DataFrame:
        sess = domain.session_sources(self.spark, self.sf_dir)
        if self.cfg.start and self.cfg.end:
            buffer = self.cfg.lookback_days or 0
            sess = sess.filter(
                date_range_predicate(F.col("event_ts"), self.cfg.start, self.cfg.end, buffer_days=buffer)
            )
        return sess

    def journeys(self) -> DataFrame:
        return jny.build_journeys(
            self.conversions(),
            self.sessions(),
            strict_before=self.cfg.strict_before,
            lookback_days=self.cfg.lookback_days,
        )

    # -- stage 3: attribution ---------------------------------------------
    def attribution(self) -> DataFrame:
        return attr.attribute(self.journeys(), self.cfg.model)

    # -- stage 5: reporting -----------------------------------------------
    def report(self) -> DataFrame:
        return rpt.channel_report(
            self.attribution(),
            self.sessions(),
            domain.session_costs(self.spark, self.sf_dir),
            self.conversions(),
            mode=self.cfg.report_mode,
        )

    def export(self) -> DataFrame:
        return rpt.export_report(self.report())

    # -- runtime verification (SURVEY §5) ----------------------------------
    def run_with_checks(self) -> DataFrame:
        journeys = self.journeys()
        if journeys.limit(1).count() == 0:
            raise ValueError("transform produced no journey entries")  # transform.py:264-265
        attribution = attr.attribute(journeys, self.cfg.model)
        total = attribution.agg(F.sum("ihc")).first()[0] or 0.0
        if total <= 0:
            raise ValueError("total ihc <= 0")  # load.py:120-123
        report = rpt.channel_report(
            attribution,
            self.sessions(),
            domain.session_costs(self.spark, self.sf_dir),
            self.conversions(),
            mode=self.cfg.report_mode,
        )
        out = rpt.export_report(report)
        if out.limit(1).count() == 0:
            raise ValueError("channel report is empty")  # reporting.py:104-106
        return out
