"""Explicit schemas for every table and interchange contract.

The reference declares its tables in SQL DDL
(``data/sql/challenge_db_create.sql:6-48``) and lets pandas infer types
on read (``src/database/db_utils.py:75``). The rebuild uses declared
``StructType`` everywhere — no inference in the engine path (SURVEY
§1.3).

Type decisions (SURVEY §1.3):
- TEXT ids/labels  -> StringType
- REAL money/ihc   -> DoubleType (reference does raw float arithmetic)
- 0/1 flags        -> IntegerType (the JSON contract emits ints,
  ``src/etl/transform.py:252-255``)
- date/time TEXT   -> kept as typed TimestampType/DateType internally;
  rendered back to 'yyyy-MM-dd' strings at the sinks for contract
  parity.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- the five relational tables (challenge_db_create.sql) -------------------

CONVERSIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("conv_date", T.StringType(), False),  # 'YYYY-MM-DD'
        T.StructField("conv_time", T.StringType(), False),  # 'HH:MM:SS'
        T.StructField("revenue", T.DoubleType(), False),
    ]
)

SESSION_COSTS = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("cost", T.DoubleType(), True),  # nullable in DDL :18
    ]
)

SESSION_SOURCES = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_date", T.StringType(), False),
        T.StructField("event_time", T.StringType(), False),
        T.StructField("channel_name", T.StringType(), False),
        T.StructField("holder_engagement", T.IntegerType(), False),
        T.StructField("closer_engagement", T.IntegerType(), False),
        T.StructField("impression_interaction", T.IntegerType(), False),
    ]
)

ATTRIBUTION_CUSTOMER_JOURNEY = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_id", T.StringType(), False),
        T.StructField("ihc", T.DoubleType(), False),
    ]
)

CHANNEL_REPORTING = T.StructType(
    [
        T.StructField("channel_name", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("cost", T.DoubleType(), False),
        T.StructField("ihc", T.DoubleType(), False),
        T.StructField("ihc_revenue", T.DoubleType(), False),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "conversions": CONVERSIONS,
    "session_costs": SESSION_COSTS,
    "session_sources": SESSION_SOURCES,
    "attribution_customer_journey": ATTRIBUTION_CUSTOMER_JOURNEY,
    "channel_reporting": CHANNEL_REPORTING,
}

# --- JSON interchange contracts (SURVEY §1.2) --------------------------------

# Journey entry: transform output / attribution input
# (``src/etl/transform.py:247-256``; ``data/output/required_format.json``).
JOURNEY_ENTRY = T.StructType(
    [
        T.StructField("conversion_id", T.StringType(), False),
        T.StructField("session_id", T.StringType(), False),
        T.StructField("timestamp", T.StringType(), False),  # 'YYYY-MM-DD HH:MM:SS'
        T.StructField("channel_label", T.StringType(), False),
        T.StructField("holder_engagement", T.IntegerType(), False),
        T.StructField("closer_engagement", T.IntegerType(), False),
        T.StructField("conversion", T.IntegerType(), False),
        T.StructField("impression_interaction", T.IntegerType(), False),
    ]
)

# Attribution API response envelope (``src/etl/load.py:37-49``;
# ``data/output/api_response.json``).
API_VALUE_ROW = T.StructType(
    [
        T.StructField("conversion_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("initializer", T.DoubleType(), True),
        T.StructField("holder", T.DoubleType(), True),
        T.StructField("closer", T.DoubleType(), True),
        T.StructField("ihc", T.DoubleType(), True),
    ]
)

API_RESPONSE_ENVELOPE = T.StructType(
    [
        T.StructField("statusCode", T.IntegerType(), True),
        T.StructField("value", T.ArrayType(API_VALUE_ROW), True),
        T.StructField("partialFailureErrors", T.ArrayType(T.StringType()), True),
    ]
)

# --- driver-provided scale-harness tables (TESTDATA.md) ----------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
