"""Shapley-value attribution over channel coalitions.

The third data-driven attribution model family (beside the positional
models of operators/attribution.py and the Markov removal effects of
operators/markov.py): each channel's credit is its Shapley value under
the coalition characteristic

    v(S) = number of converting journeys whose touched-channel set is
           a subset of S

(the "reach" characteristic of the marketing-Shapley literature —
a journey converts under coalition S iff every channel it touched is
present). With n channels the whole computation lives on the subset
lattice of 2^n coalition masks — BOUNDED BY THE CHANNEL ALPHABET, not
the data: the only corpus-scale work is one aggregate collapsing each
conversion to its channel bitmask.

Everything is exact integer arithmetic: the Shapley weights
|S|! (n-|S|-1)! are pre-scaled by n! so

    phi_scaled(c) = sum over S not containing c of
                    w(|S|) * (v(S + c) - v(S)),   w(s) = s!(n-1-s)!

is an exact long, with the efficiency property
sum_c phi_scaled(c) = n! * v(full set) checkable in integers
(property-tested). Output (channel, phi_scaled, denom = n!): callers
divide when they want the rational credit.

Shape: one shuffle (conversion -> bitmask via bit_or), a <=2^n-row
count table, a 2^n x 2^n subset-sum join, and a 2^n x n marginal
table — all broadcast-trivial at ANY input scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shapley_attribution(
    journeys: DataFrame,
    channels: list[str],
    part_col: str = "conversion_id",
    channel_col: str = "channel_label",
) -> DataFrame:
    """Exact Shapley credit per channel. ``channels`` fixes the player
    universe and the bit order; a journey touching a channel outside
    it raises (an unlisted player would silently corrupt v)."""
    n = len(channels)
    if n < 1 or n > 20:
        raise ValueError(f"need 1..20 channels, got {n}")
    spark = journeys.sparkSession
    bit = {c: 1 << i for i, c in enumerate(channels)}
    bit_expr = F.when(F.col(channel_col) == channels[0], F.lit(bit[channels[0]]))
    for c in channels[1:]:
        bit_expr = bit_expr.when(F.col(channel_col) == c, F.lit(bit[c]))
    bit_expr = bit_expr.otherwise(
        F.raise_error(F.concat(F.lit("channel outside the player universe: "), F.col(channel_col)))
    )
    # corpus-scale part: conversion -> touched-channel bitmask
    masks = (
        journeys.select(F.col(part_col), bit_expr.alias("_b"))
        .groupBy(part_col)
        .agg(F.bit_or("_b").alias("mask"))
    )
    cnt = masks.groupBy("mask").agg(F.count(F.lit(1)).cast("long").alias("n_conv"))
    # full lattice 0..2^n-1 (masks absent from the data count 0)
    lattice = spark.range(0, 1 << n).select(F.col("id").cast("int").alias("smask"))
    # v(S) = sum of counts over subsets of S
    v = (
        lattice.join(cnt, F.col("mask").bitwiseAND(F.col("smask")) == F.col("mask"), "left")
        .groupBy("smask")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("v"))
    )
    weights = {s: math.factorial(s) * math.factorial(n - 1 - s) for s in range(n)}
    players = spark.createDataFrame([(c, bit[c]) for c in channels], "channel string, b int")
    va = v.select(F.col("smask").alias("_s"), F.col("v").alias("_vs"))
    vb = v.select(F.col("smask").alias("_sb"), F.col("v").alias("_vsb"))
    pairs = (
        players.crossJoin(va)
        .filter(F.col("_s").bitwiseAND(F.col("b")) == 0)
        .withColumn("_sb", F.col("_s").bitwiseOR(F.col("b")))
        .join(vb, "_sb")
    )
    w_col = None
    for s, w in weights.items():
        clause = (F.bit_count("_s") == s, F.lit(w))
        w_col = F.when(*clause) if w_col is None else w_col.when(*clause)
    return (
        pairs.groupBy("channel")
        .agg(F.sum(w_col * (F.col("_vsb") - F.col("_vs"))).cast("long").alias("phi_scaled"))
        .withColumn("denom", F.lit(math.factorial(n)).cast("long"))
    )
