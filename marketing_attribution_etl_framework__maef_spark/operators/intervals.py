"""Bucketed interval (range-predicate) join.

A pure range join — ``fact.ts BETWEEN dim.start AND dim.end`` with no
equi key — has no hash-join plan: naively it is a broadcast-nested-loop
(O(|fact| * |intervals|)), which is the canonical 100-TB scale-killer.
The distributed formulation is time bucketing: pick a bucket width on
the order of the interval length, explode every interval over the
buckets it covers, bucket every fact row once, hash-join on the bucket
id, and re-check the exact range predicate. Cost becomes
O(|fact| + |intervals| * avg_buckets_per_interval) shuffled on a
high-cardinality integer key, and each (interval, fact) pair meets at
most once — a fact row has exactly one bucket, and an interval carries
a given bucket id at most once — so no post-join distinct is needed.

This is the same decomposition Databricks' range-join bin hints and
Flink's interval join use; here it is plain DataFrame ops, so Catalyst
still pushes filters below the explode and AQE handles a skewed bucket
(e.g. a flash-sale hour) with skew-join splitting.

Bucket ids are derived with ``unix_micros(ts.cast("timestamp"))`` —
the established pattern for NTZ-or-LTZ-agnostic epoch arithmetic
(operators/features.py) — never a raw numeric cast, which is illegal
on NTZ timestamps under ANSI mode (see CLAUDE.md). Bucket ids are
internal join keys only; the exact range predicate is re-checked on
the raw timestamp columns, so the id derivation never leaks into
results.

Reference scope: the MAEF reference has only equi joins
(/root/reference/src/etl/transform.py journey join); this operator is
part of the training-data layer (event enrichment against campaign /
maintenance / flash windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shifts every practical epoch positive (back to ~year -29000) so the
# truncating `div` behaves as floor division; without it a pre-1970
# timestamp (negative unix_micros) would round toward zero and land in
# the wrong bucket. Uniform shift — bucket ids stay internally
# consistent, which is all they need to be.
_EPOCH_SHIFT_US = 1_000_000_000_000_000_000


def _bucket(ts_col: str, bucket_seconds: int):
    """Integer bucket id of a timestamp column — integer arithmetic
    end-to-end (unix_micros -> div), no float rounding."""
    return F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) + {_EPOCH_SHIFT_US})"
        f" div {int(bucket_seconds) * 1_000_000}"
    )


def interval_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Join every fact row to every interval with
    ``start <= ts < end`` (half-open, so an event on the boundary of
    two adjacent windows lands in exactly one).

    ``bucket_seconds`` should be on the order of the typical interval
    length: too small explodes intervals over many buckets, too large
    packs unrelated rows into one join key. Columns of ``facts`` and
    ``intervals`` must be disjoint; output carries both sides' columns.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"fact/interval column collision: {sorted(overlap)}")

    f_bkt = facts.withColumn("_bkt", _bucket(ts_col, bucket_seconds))
    # an interval [start, end) covers buckets bucket(start)..bucket(end):
    # the end bucket is only needed when end is not bucket-aligned, but
    # including it unconditionally is harmless — the exact predicate
    # below drops the excess rows.
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(_bucket(start_col, bucket_seconds), _bucket(end_col, bucket_seconds))
        ),
    )
    return (
        f_bkt.join(iv, on="_bkt", how="inner")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bkt")
    )
