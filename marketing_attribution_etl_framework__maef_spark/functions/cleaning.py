"""Scalar cleaning helpers — pure ``pyspark.sql.functions`` column
expressions (JVM-side, codegen-friendly; no UDFs).

Reproduces:
- ``clean_float`` (``src/etl/transform.py:194-200``): NaN/±Inf -> 0.0
- COALESCE/NULLIF normalization (``src/etl/reporting.py:60-61,76-77``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_float(c: Column) -> Column:
    """NaN and ±Inf scrubbed to 0.0, NULL preserved (SURVEY P3)."""
    return (
        F.when(F.isnan(c) | c.isin(float("inf"), float("-inf")), F.lit(0.0))
        .otherwise(c)
    )


def nullif_empty(c: Column) -> Column:
    """SQL ``NULLIF(c, '')`` as an expression."""
    return F.when(c == "", F.lit(None)).otherwise(c)


def normalize_channel(c: Column) -> Column:
    """``COALESCE(NULLIF(channel_name,''),'unknown')``
    (``src/etl/reporting.py:60-61``)."""
    return F.coalesce(nullif_empty(c), F.lit("unknown"))


def normalize_date(c: Column, fallback: Column) -> Column:
    """``COALESCE(NULLIF(event_date,''), fallback)``
    (``src/etl/reporting.py:76-77``)."""
    return F.coalesce(nullif_empty(c), fallback)
