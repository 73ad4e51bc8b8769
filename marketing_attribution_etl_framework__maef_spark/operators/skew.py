"""Explicit salting for skewed joins.

AQE's skew-join handling splits oversized partitions at runtime, and
that is the first line of defense; explicit salting remains the tool
for the cases AQE cannot fix: a broadcast-ineligible dimension joined
on a key where ONE value dominates (the Direct-Traffic pattern in
attribution data), or a shuffle whose skew is known at write time.
The journey join carries the same idea as inline knobs
(operators/journeys.py salt/broadcast options); this is the reusable
general form.

Mechanics: the skewed (large) side gets a deterministic per-row salt
in [0, n_salts) — a hash of the whole row, so the salt is stable for
a given row but spreads identical join keys across n_salts reduce
partitions. The small side is replicated once per salt value
(explode over 0..n_salts-1), so every (key, salt) bucket holds the
complete small-side group and the join result is EXACTLY the plain
join's (property: result-identical for any n_salts — tested).

Cost model: the replicated side grows n_salts-fold, so choose
n_salts ~ (hot-key rows / target partition rows) and keep the
replicated side the smaller one. This trades n_salts x small-side
shuffle volume for eliminating the single hot reduce task — the right
trade exactly when one key holds a large fraction of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (large, hot-keyed) with ``small`` on ``on``,
    spreading each hot key over ``n_salts`` buckets. Supported hows:
    inner / left (semantics where the unreplicated side drives)."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in skewed.columns or _SALT in small.columns:
        raise ValueError(f"reserved column {_SALT} present in an input")
    l = skewed.withColumn(_SALT, F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)))
    r = small.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, on=[*on, _SALT], how=how).drop(_SALT)
