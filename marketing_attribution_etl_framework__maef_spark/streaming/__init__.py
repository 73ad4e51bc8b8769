"""Structured-Streaming surface (SURVEY §2.9(a)): watermarked intake
of events and incremental attribution via ``foreachBatch``."""

from marketing_attribution_etl_framework__maef_spark.streaming.incremental import (
    IncrementalAttribution,
    dedup_stream,
    stream_events,
    windowed_channel_volume,
)
from marketing_attribution_etl_framework__maef_spark.streaming.neardup import IncrementalNearDedup
from marketing_attribution_etl_framework__maef_spark.streaming.sessionize import sessionize
from marketing_attribution_etl_framework__maef_spark.streaming.sessionize_tws import sessionize_tws

__all__ = [
    "IncrementalAttribution",
    "IncrementalNearDedup",
    "dedup_stream",
    "sessionize",
    "sessionize_tws",
    "stream_events",
    "windowed_channel_volume",
]
