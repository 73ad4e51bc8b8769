"""Deterministic train/val/test corpus splitting with leakage audit.

The last step of every training-data pipeline: assign each document
to a split by a salted hash of its id (stable under reshuffles,
re-ingests, and engine changes — never `rand()`), then AUDIT the
split: exact-content duplicates that straddle splits leak evaluation
data into training.  The audit is the split-aware restatement of
exact dedup (llm/dedup.py) — same md5 content key, grouped by split
membership instead of collapsed.

100-TB shape: the split assignment is a stateless per-row expression
(no shuffle at all — it can ride the ingest write and become a
partition column).  The leakage audit is one content-hash aggregate
(the same shuffle exact dedup already pays) re-joined to the per-doc
grain by the content key; everything downstream is a bounded
(source x split) roll-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark.llm.text import normalize_text, words


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_slices: int = 20,
    n_val: int = 1,
    n_test: int = 1,
    salt: str = "|split",
) -> DataFrame:
    """docs + (split string): hash-slice doc ids into train/val/test.

    slice = md5_60(id || salt) % n_slices; the top ``n_test`` slices
    are test, the next ``n_val`` are val, the rest train (18/1/1 by
    default).  Purely functional in the id — no RNG, no state.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    s = h % n_slices
    return docs.withColumn(
        "split",
        F.when(s >= n_slices - n_test, F.lit("test"))
        .when(s >= n_slices - n_test - n_val, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def split_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per (source, split): doc count, token count, and the count of
    docs whose exact normalized content also appears in ANOTHER split
    (cross-split leakage — the contamination the split must prevent).

    Output: (source, split, n_docs, n_tokens, leaked_docs).
    """
    d = assign_split(docs, id_col=id_col).select(
        F.col(source_col).alias("source"),
        "split",
        F.md5(normalize_text(F.col(text_col))).alias("_ch"),
        F.size(F.filter(words(normalize_text(F.col(text_col))), lambda x: x != ""))
        .cast("long")
        .alias("_tok"),
    )
    leaked = (
        d.groupBy("_ch")
        .agg(F.countDistinct("split").alias("_ns"))
        .filter(F.col("_ns") > 1)
        .select("_ch", F.lit(1).alias("_leak"))
    )
    # leaked is unbounded (any amount of content can straddle splits) —
    # plain hash join, AQE may still broadcast it when it measures small
    j = d.join(leaked, "_ch", "left")
    return j.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.sum(F.coalesce(F.col("_leak"), F.lit(0))).cast("long").alias("leaked_docs"),
    )
