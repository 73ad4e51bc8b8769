"""Date-range validation and predicates.

Reproduces ``src/utils/date_utils.py:6-42`` and the DAG guards
(``dags/ihc_api_dag.py:56-63``): ISO format, start <= end, end not in
the future, span <= 365 days; plus the conversion-window predicate with
lookback buffer from the (commented) v1 transform
(``src/etl/transform.py:54-95``) which SURVEY §2.8.6 decides to honor.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RANGE_DAYS = 365  # dags/ihc_api_dag.py:63


def validate_date_range(start: str, end: str, today: dt.date | None = None) -> tuple[dt.date, dt.date]:
    """Driver-side validation (plain Python, SURVEY §2.7)."""
    try:
        s = dt.date.fromisoformat(start)
        e = dt.date.fromisoformat(end)
    except ValueError as exc:  # bad format
        raise ValueError(f"dates must be YYYY-MM-DD: {exc}") from exc
    if s > e:
        raise ValueError(f"start {s} after end {e}")
    if today is not None and e > today:
        raise ValueError(f"end {e} is in the future")
    if (e - s).days > MAX_RANGE_DAYS:
        raise ValueError(f"range exceeds {MAX_RANGE_DAYS} days")
    return s, e


def date_range_predicate(c: Column, start: str, end: str, buffer_days: int = 0) -> Column:
    """``c BETWEEN start - buffer AND end`` on a date/timestamp column.

    The reference widened the window with lookback buffers (45d/7d,
    ``src/etl/transform.py:54-61,78-89``) composed into the SQL WHERE —
    here it is a plain predicate Catalyst pushes down to the parquet
    scan (row-group min/max skipping at scale).
    """
    lo = F.date_sub(F.lit(start).cast("date"), buffer_days)
    hi = F.lit(end).cast("date")
    return (c.cast("date") >= lo) & (c.cast("date") <= hi)
