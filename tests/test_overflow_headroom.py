"""Integer-headroom probes for the newest fixed-point kernels (VERDICT
r04 next-steps #8, the rel_market_share DECIMAL-overflow precedent).

Each test drives the kernel's EXACT production expression with counts
pushed to the documented scale bound and asserts the result equals
arbitrary-precision Python integer arithmetic — proving the widest
intermediate fits its Spark type (DECIMAL(38,0) or BIGINT) with the
stated headroom.  The bounds, for the docstrings of record:

- L135 basket lift  (operators/basket.py):
  widest = pair_cnt * n_orders * 2^20 in DECIMAL(38,0); with
  pair_cnt <= n_orders = N the product is <= N^2 * 2^20, safe for
  N <= 9.8e15 orders — ~10,000x beyond a 100 TB orders table
  (~1e12 rows).
- L144 NB score    (llm/classify.py): widest = sum(tf * w_q20) in
  BIGINT; |w_q20| <= |ln 1/(tot+v)| * 2^20 <= 44 * 2^20 ~ 4.7e7 for
  corpora up to 1e18 tokens, so a single document may hold up to
  ~2e11 tokens before the per-doc sum leaves int64 — five orders
  beyond any real document.
- L148 isotonic    (operators/calibration.py): widest =
  (sk - sj0) * 2^20 in BIGINT with sk <= total conversions N, safe
  for N <= (2^63-1)/2^20 = 8.796e12 trials (bound probed EXACTLY below) — ~100x beyond 100 TB of conversion rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

Q = 1 << 20


def test_basket_lift_decimal38_headroom(spark):
    # N = 9e15 orders, pair_cnt = N/3: numerator 2.7e31 * 2^20 ~ 2.8e37
    # — inside DECIMAL(38,0) by a factor ~3.5.
    n_orders = 9_000_000_000_000_000
    pair_cnt = n_orders // 3
    cnt_a, cnt_b = n_orders // 2, n_orders // 5
    df = spark.createDataFrame(
        [(pair_cnt, cnt_a, cnt_b, n_orders)],
        "pair_cnt long, cnt_a long, cnt_b long, n_orders long",
    )
    got = df.select(
        F.expr(
            "cast(cast(pair_cnt as decimal(38,0)) * n_orders * 1048576"
            " div (cast(cnt_a as decimal(38,0)) * cnt_b) as bigint)"
        ).alias("lift_q20")
    ).first()["lift_q20"]
    want = (pair_cnt * n_orders * Q) // (cnt_a * cnt_b)
    assert got == want  # no overflow-null, no precision loss


def test_nb_score_bigint_headroom(spark):
    # a 2e11-token document where every token carries the widest
    # possible weight magnitude (ln of a 1e18-token corpus, ~41.4).
    tf_total = 200_000_000_000
    w_q20 = -(41 * Q + 987_654)  # ~ -43e6, the extreme per-token weight
    prior_q20, unseen_q20, tf_matched, w_matched = (
        -(2 * Q),
        w_q20,
        tf_total // 2,
        (tf_total // 2) * w_q20,
    )
    df = spark.createDataFrame(
        [(prior_q20, w_matched, tf_total, tf_matched, unseen_q20)],
        "prior_q20 long, w_matched long, tf_total long, tf_matched long, unseen_q20 long",
    )
    got = df.select(
        (
            F.col("prior_q20")
            + F.col("w_matched")
            + (F.col("tf_total") - F.col("tf_matched")) * F.col("unseen_q20")
        )
        .cast("long")
        .alias("score_q20")
    ).first()["score_q20"]
    want = prior_q20 + w_matched + (tf_total - tf_matched) * unseen_q20
    assert got == want
    assert abs(want) < (1 << 63)  # the bound itself, stated


def test_isotonic_span_average_bigint_headroom(spark):
    # the exact bound: (2^63-1) // 2^20 conversions in one span — one
    # more trips Spark 4's ANSI ARITHMETIC_OVERFLOW (verified while
    # writing this test), so the stated bound is tight.
    sk, sj0, nk, nj0 = (1 << 63) // (1 << 20) - 1, 0, (1 << 63) // (1 << 20), 0
    df = spark.createDataFrame(
        [(sk, sj0, nk, nj0)], "sk long, sj0 long, nk long, nj0 long"
    )
    got = df.select(
        F.expr("((sk - sj0) * 1048576) div (nk - nj0)").cast("long").alias("avg_q20")
    ).first()["avg_q20"]
    want = ((sk - sj0) * Q) // (nk - nj0)
    assert got == want
    assert (sk - sj0) * Q < (1 << 63)
