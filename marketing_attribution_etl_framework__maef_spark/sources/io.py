"""Sources and sinks (SURVEY §2.1 S1-S11).

Parquet is the canonical storage (replacing SQLite); JSON and CSV
sinks reproduce the reference's interchange contracts. Single-file
"contract parity" outputs use coalesce(1) + rename — fine for
report-sized data, never used on the big paths.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_attribution_etl_framework__maef_spark import schemas


class Warehouse:
    """Parquet-backed replacement for the reference ``DataWarehouse``
    (``src/database/db_utils.py``): named tables under a root dir,
    registered as temp views for free SQL access (SURVEY §3.4)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def create_initial_schema(self) -> None:
        """S2 (``db_utils.py:42-65``): declare the five tables. With
        parquet + explicit StructType there is no DDL to execute — we
        materialize empty tables so downstream full-scans always
        resolve.

        The empty files are written with pyarrow directly (schema via
        ``DataFrame.toArrow`` so the Spark<->Arrow type mapping stays
        canonical): DDL is metadata, and five empty
        ``createDataFrame([]).write`` round-trips cost ~0.9 s of Spark
        job overhead EACH (measured — 4.5 s of a 12 s pipeline run)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            from pyspark.sql.pandas.types import to_arrow_schema
        except ImportError:  # older pyspark layout
            to_arrow_schema = None

        for name, schema in schemas.TABLE_SCHEMAS.items():
            if not os.path.exists(self.path(name)):
                if to_arrow_schema is not None:
                    empty = pa.Table.from_pylist([], schema=to_arrow_schema(schema))
                else:
                    empty = self.spark.createDataFrame([], schema).toArrow()
                os.makedirs(self.path(name), exist_ok=True)
                pq.write_table(empty, os.path.join(self.path(name), "part-00000.parquet"))

    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """S3/S9/S11 sink: overwrite == the reference's
        DELETE-then-reload (``reporting.py:52-54``) and
        ``if_exists='replace'`` (``db_utils.py:79``).

        ``partition_by``: hive-style partition columns (the scale
        replacement for the reference's date-suffixed target DBs,
        ``dags/ihc_api_dag.py:87``) — date predicates then prune whole
        partitions at the scan (SURVEY §4 'partition pruning')."""
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, table: str) -> DataFrame:
        """S1: full-table scan (``db_utils.py:75``)."""
        return self.spark.read.parquet(self.path(table))

    def register_views(self) -> None:
        for name in schemas.TABLE_SCHEMAS:
            if os.path.exists(self.path(name)):
                self.read(name).createOrReplaceTempView(name)

    def copy_from(self, source: "Warehouse", tables: list[str] | None = None) -> None:
        """S3 (``db_utils.py:67-84``): copy source -> target per table."""
        for name in tables or list(schemas.TABLE_SCHEMAS):
            if os.path.exists(source.path(name)):
                self.write(name, source.read(name))

    def verify_copy(self, source: "Warehouse", tables: list[str] | None = None) -> dict[str, int]:
        """S4/A2 (``db_utils.py:86-102``): row-count equality."""
        counts = {}
        for name in tables or list(schemas.TABLE_SCHEMAS):
            if not os.path.exists(source.path(name)):
                continue
            src_n = source.read(name).count()
            dst_n = self.read(name).count()
            if src_n != dst_n:
                raise ValueError(f"copy verification failed for {name}: {src_n} != {dst_n}")
            counts[name] = src_n
        return counts


def merge_upsert(
    wh: Warehouse,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Storage-level MERGE (upsert) into a parquet table: rows whose
    key matches an update are replaced, new keys are appended.

    This is the keyed-write path the reference drives through SQLite
    ``INSERT OR REPLACE`` (``src/database/db_utils.py:79``,
    ``src/etl/load.py:103-116``), rebuilt for immutable parquet. No
    transactional table format is available in this environment, so the
    mechanics are explicit and the scale story lives in
    ``partition_cols``:

    - with partition columns, only the partitions PRESENT IN THE
      UPDATE BATCH are read (the semi-join below prunes the scan) and
      only those partitions are rewritten
      (``partitionOverwriteMode=dynamic``) — at 100 TB a daily upsert
      touches days, not the table;
    - without them, the merge is a full rewrite and is only for small
      dimension tables (documented, same contract).

    With partition pruning the partition value must be determined by
    the key (e.g. the date is part of the key) — a key that moved
    partitions would leave its old row in an untouched partition.
    The update batch must hold at most one row per key (enforced —
    DataFrames have no row order, so REPLACE has no winner to pick).

    The merged frame is localCheckpointed before the write because the
    sink overwrites the files the plan reads from.
    """
    dup = (
        updates.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"merge_upsert into {table}: update batch repeats a key in "
            f"{key_cols}; a keyed REPLACE needs exactly one row per key "
            "(deduplicate the batch first — there is no row order to pick "
            "a winner from)"
        )
    if not os.path.exists(wh.path(table)):
        wh.write(table, updates, partition_by=partition_cols)
        return
    target = wh.read(table)
    if partition_cols:
        parts = updates.select(*partition_cols).distinct()
        target = target.join(parts.hint("broadcast"), on=partition_cols, how="left_semi")
    survivors = target.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = survivors.unionByName(updates.select(*survivors.columns)).localCheckpoint()
    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = (
            writer.partitionBy(*partition_cols)
            .option("partitionOverwriteMode", "dynamic")
        )
    writer.parquet(wh.path(table))


def compact_table(
    wh: Warehouse,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction: rewrite a table's many small part files
    into ceil(total_bytes / target_file_bytes) files.

    Incremental sinks (streaming foreachBatch, daily merge_upsert)
    accrete small files; at scale the resulting scan pays one task +
    one open per file. Compaction is the standard maintenance pass:
    size the output file count from the actual byte size (the same
    statistics-driven sizing AQE applies to shuffles), repartition, and
    rewrite — for partitioned tables, repartition BY the partition
    columns so each hive partition collapses to its own few files
    instead of every output task writing a sliver of every partition.
    Returns {files_before, files_after, bytes}."""
    root = wh.path(table)
    files = [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]
    total = sum(os.path.getsize(p) for p in files)
    n_out = max(1, -(-total // target_file_bytes))
    df = wh.read(table)
    if partition_cols:
        compacted = df.repartition(int(n_out), *partition_cols)
    else:
        compacted = df.repartition(int(n_out))
    compacted = compacted.localCheckpoint()
    writer = compacted.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(root)
    after = [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]
    return {"files_before": len(files), "files_after": len(after), "bytes": total}


def save_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table for co-located joins: two tables bucketed
    (and sorted) on the same key with the same bucket count join with
    ZERO exchanges — the sort-merge join reads co-bucketed files
    directly. This is the storage-level answer to the J1 journey join
    at 100 TB: bucket conversions AND session_sources by user_id once
    at ingest, and every subsequent journey build skips both shuffles.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *key_cols)
        .sortBy(*(sort_cols or key_cols))
        .saveAsTable(name)
    )


def _single_file(out_dir: str, final_path: str, ext: str) -> None:
    part = glob.glob(os.path.join(out_dir, f"part-*{ext}"))
    if not part:
        raise FileNotFoundError(f"no part file in {out_dir}")
    shutil.move(part[0], final_path)
    shutil.rmtree(out_dir, ignore_errors=True)


def write_json_single(df: DataFrame, path: str) -> None:
    """S5 (``transform.py:276-288``): journey entries to one JSON file
    (JSON-lines; the reference writes an indented array — compare
    parsed, not textually, per SURVEY §7)."""
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").json(tmp)
    _single_file(tmp, path, ".json")


def write_csv_single(df: DataFrame, path: str) -> None:
    """S7 (``reporting.py:169-170``): header CSV, one file."""
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    _single_file(tmp, path, ".csv")


def write_orc_single(df: DataFrame, path: str) -> None:
    """ORC single-file sink — the columnar interchange format besides
    parquet that Spark ships natively (no extra packages). Same
    move-the-part-file contract as the CSV/JSON sinks; at scale drop
    the coalesce and write the directory form."""
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").orc(tmp)
    _single_file(tmp, path, ".orc")


def read_journey_entries(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    """Journey-entry JSON source with the declared contract schema.

    Default is JSON-lines (what ``write_json_single`` emits, so the
    package's own sink round-trips). Pass ``multiline=True`` only for
    the reference's indented-array files
    (``data/output/required_format.json`` style), where one JSON value
    spans the whole file.
    """
    return spark.read.schema(schemas.JOURNEY_ENTRY).json(path, multiLine=multiline)
