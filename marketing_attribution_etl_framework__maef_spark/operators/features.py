"""Per-entity rolling time-window features (RANGE-frame windows).

The reference computes no rolling features, but its journey join is a
degenerate one (everything in a 30-day lookback); a real attribution /
training-data pipeline derives per-user activity features — "events in
the last 7 days", "spend in the last 7 days", "seconds since previous
event" — at every event. These are RANGE-frame window aggregates:

- the frame is defined on the event-time axis (epoch seconds), so tied
  timestamps are peers and both engines include the full peer group —
  no tie-break ambiguity in the aggregate;
- the recency delta uses a ROWS-frame lag with an explicit id
  tie-break, which IS order-sensitive, so it gets its own window.

100-TB shape: one shuffle on the entity key; both windows share the
(user_id, time) sort, and the RANGE frame is evaluated with a sliding
pointer (O(n) per partition, state bounded by the window span). This
is the batch twin of a streaming sliding-window aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_user_features(
    events: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """Per event: rolling count + value sum over the trailing
    ``window_days`` (inclusive of the current event and its time
    peers), and microseconds since the user's previous event (NULL for
    the first). The rolling value sum is emitted as exact integer
    cents: value has 2-decimal granularity and a rolling SUM(double)
    is order-sensitive, so at large SF ulp noise meets rounding ties
    (ADVICE r02 / the repo float rule). Output: event_id, user_id,
    n_window, value_cents_window, usecs_since_prev."""
    span = window_days * 86400 * 1_000_000
    # microsecond epoch: exact integers in both engines (DuckDB's
    # epoch() returns fractional seconds; truncation there vs here
    # drifts by one second). NTZ-safe via the UTC-identity cast.
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    d = events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
        epoch.alias("_es"),
    )
    w_range = (
        Window.partitionBy("user_id").orderBy("_es").rangeBetween(-span, 0)
    )
    w_rows = Window.partitionBy("user_id").orderBy("_es", "event_id")
    return d.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w_range).cast("long").alias("n_window"),
        F.sum("_cents").over(w_range).cast("long").alias("value_cents_window"),
        (F.col("_es") - F.lag("_es").over(w_rows)).cast("long").alias("usecs_since_prev"),
    )


def user_feature_vector(events: DataFrame) -> DataFrame:
    """Per-user lifetime feature vector — the entity-level feature
    table an LTV / churn / propensity model trains on, all from ONE
    conditional-aggregate scan (no self-joins, no windows):

    - n_sessions / n_purchases: non-purchase vs purchase event counts
    - n_channels: distinct non-purchase channels touched
    - active_days: distinct active calendar days
    - revenue_cents: purchase revenue, exact integer cents
    - first_day / last_day: activity span ('yyyy-MM-dd' strings, the
      cross-engine day rendering)

    The reference has no feature layer at all (its pandas pipeline
    ends at the channel report); this is the standard extension a
    production MAEF grows. 100-TB shape: one shuffle on user_id with
    full map-side combining — every column is an algebraic aggregate;
    conditional counts stay in whole-stage codegen."""
    is_purchase = F.col("event_type") == "purchase"
    return events.groupBy("user_id").agg(
        F.sum((~is_purchase).cast("long")).cast("long").alias("n_sessions"),
        F.sum(is_purchase.cast("long")).cast("long").alias("n_purchases"),
        F.countDistinct(F.when(~is_purchase, F.col("event_type")))
        .cast("long")
        .alias("n_channels"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).cast("long").alias("active_days"),
        F.sum(
            F.when(is_purchase, F.round(F.col("value") * 100, 0).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
        .cast("long")
        .alias("revenue_cents"),
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("first_day"),
        F.max(F.date_format("ts", "yyyy-MM-dd")).alias("last_day"),
    )
