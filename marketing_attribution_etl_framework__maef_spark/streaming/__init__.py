"""Structured-Streaming surface (SURVEY §2.9(a)): watermarked intake
of events and incremental attribution via ``foreachBatch``."""

from marketing_attribution_etl_framework__maef_spark.streaming.incremental import (
    IncrementalAttribution,
    stream_events,
    windowed_channel_volume,
)

__all__ = ["IncrementalAttribution", "stream_events", "windowed_channel_volume"]
