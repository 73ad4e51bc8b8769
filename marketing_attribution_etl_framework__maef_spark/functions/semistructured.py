"""Semi-structured (JSON string column) extraction.

The reference's interchange formats are JSON files (SURVEY §1.2), but
its tables hold no JSON columns; the harness's ``events.props`` does —
the classic "properties bag" of an event stream. Extraction uses
``get_json_object`` (JsonPath, JVM-side, codegen-friendly); for a
fixed, fully-known schema at 100 TB prefer ``from_json`` with an
explicit StructType once per pipeline so Catalyst prunes unparsed
fields — both spellings are expression-level, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_long(col: Column, path: str) -> Column:
    """Extract a JSON integer field as a long (NULL on absent path or
    malformed document — same contract as DuckDB's json_extract)."""
    return F.get_json_object(col, path).cast("long")
