"""maef_spark — a PySpark-native rebuild of the capability surface of
harsh199323/Marketing-Attribution-ETL-Framework--MAEF (reference read-only at
/root/reference/).

The reference is a batch marketing-attribution ETL pipeline (Airflow +
SQLite + pandas + an external IHC attribution HTTP API). This package
re-expresses that surface Spark-first:

- declared ``StructType`` schemas for the five relational tables and the
  two JSON interchange contracts (``schemas``);
- the journey-construction join, native windowed attribution models,
  loader validation, and channel reporting as pure DataFrame -> DataFrame
  operators (``operators``);
- parquet/JSON/CSV sources and sinks plus the copy-and-verify warehouse
  step (``sources``);
- scalar helpers (NaN/Inf scrubbing, null normalization, date handling)
  built only from ``pyspark.sql.functions`` (``functions``);
- the end-to-end pipeline driver with the reference's runtime
  verification checks (``plans``);
- structured-streaming ingestion with watermarked windowed aggregation,
  foreachBatch incremental attribution and near-dup dedup, and the
  gap+cap stateful sessionizer (``streaming``);
- the LLM-training-data extension layer: dedup (exact / MinHash-LSH /
  SimHash / blocked Jaccard / cluster resolution), similarity search
  (brute + IVF + k-means + sign-LSH cosine top-k), text analysis and
  retrieval, corpus curation (sampling, decontamination, packing,
  PII scrub), and multimodal binary-column plumbing
  (``llm``).

No code is copied from the reference; file:line citations in docstrings
point at the behavior being reproduced.
"""

from marketing_attribution_etl_framework__maef_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
