"""Right-to-be-forgotten (GDPR Art. 17) user purge.

The reference pipeline stores user-keyed session and conversion rows
(``challenge_db_create.sql``) with no deletion path — a compliance gap
every production marketing warehouse must close. The purge is an
anti-join rewrite: every user-keyed table drops the tombstoned users'
rows, and the job's contract is the VERIFIED count ledger (rows
before, rows after, tombstoned rows remaining — which must be zero),
because an unverified delete is indistinguishable from a no-op.

100-TB shape: the tombstone list is small relative to the fact tables
(requests arrive in batches) — broadcast LEFT ANTI joins, so each
table is one scan + rewrite with no shuffle of the fact side. On a
real lakehouse the rewrite goes through the partition-pruned MERGE
path (sources/io.py) so only files containing tombstoned users are
rewritten; the ledger query is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_users(df: DataFrame, tombstones: DataFrame, user_col: str = "user_id") -> DataFrame:
    """The purged view of ``df``: rows whose ``user_col`` is NOT in
    ``tombstones`` (single column, same name). Broadcast anti-join."""
    return df.join(F.broadcast(tombstones.select(user_col)), user_col, "left_anti")


def purge_ledger(
    tables: dict[str, DataFrame], tombstones: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Purge every table and emit the verification ledger: one row per
    table with (n_before, n_after, n_tombstoned_remaining). The last
    column is the compliance proof and must be 0."""
    out = None
    ts = tombstones.select(user_col)
    for name, df in sorted(tables.items()):
        purged = purge_users(df, ts, user_col)
        remaining = purged.join(F.broadcast(ts), user_col, "left_semi")
        row = (
            df.agg(F.count(F.lit(1)).cast("long").alias("n_before"))
            .crossJoin(purged.agg(F.count(F.lit(1)).cast("long").alias("n_after")))
            .crossJoin(
                remaining.agg(
                    F.count(F.lit(1)).cast("long").alias("n_tombstoned_remaining")
                )
            )
            .select(F.lit(name).alias("table_name"), "*")
        )
        out = row if out is None else out.unionByName(row)
    return out


def pseudonymize(
    df: DataFrame,
    user_col: str = "user_id",
    salt: str = "maef-pseudo-v1",
) -> tuple[DataFrame, DataFrame]:
    """GDPR Art. 4(5) pseudonymization: replace the direct identifier
    with a salted keyed token, and emit the re-identification mapping
    as a SEPARATE table (to be stored under separate access control —
    that separation is what makes the data pseudonymous rather than
    anonymous).

    The token is the engine-portable md5 of (salt || id): deterministic
    (same user -> same token, so joins/aggregations on the
    pseudonymized table still work) and non-reversible without the
    mapping table.  Purely columnar — no shuffle added to ``df``; the
    mapping is one distinct-aggregate over the id column.

    Returns (pseudonymized df, mapping df[user_col, token]).
    """
    token = F.md5(F.concat(F.lit(salt + "|"), F.col(user_col).cast("string")))
    out = df.withColumn(user_col, token)
    mapping = (
        df.select(user_col).distinct().select(F.col(user_col), token.alias("token"))
    )
    return out, mapping
