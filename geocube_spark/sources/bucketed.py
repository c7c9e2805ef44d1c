"""Bucketed catalog tables: shuffle-free fact⋈fact joins at 100 TB.

The catalog's hottest join is datasets⋈records on record_id (J1 and every
cube read).  At fleet scale BOTH sides are too big to broadcast, so the
plain plan shuffles the fact table on every query.  Hive-style bucketing
(``DataFrameWriter.bucketBy`` — files pre-hash-partitioned AND pre-sorted
by the join key, bucket count recorded in the table catalog) moves that
shuffle to WRITE time, once: a SortMergeJoin of two tables bucketed by
the same key and count needs NO Exchange and NO Sort on either side —
Catalyst proves the co-location from table metadata.

This is the Spark-native equivalent of the reference's PostGIS-side
btree(record_id) clustering: the storage layout IS the optimization.
``tests/test_bucketed.py`` asserts the exchange-free plan; the
``bucketed_catalog_join`` registry query hash-checks the results against
the DuckDB oracle (bucketing must never change answers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, mode: str = "overwrite"
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``.

    The pre-write repartition on (n_buckets, key) yields exactly ONE file
    per bucket — minimal file count and the layout a reader (or a future
    sorted-scan optimizer) can trust.  Note Spark 3+ keeps a residual
    in-partition Sort under the SMJ regardless (sortBy read-side trust is
    legacy-gated, SPARK-28621); the ELIMINATED operator is the Exchange —
    the only one that costs network at 100 TB."""
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def ensure_bucketed_catalog(
    spark: SparkSession, fixture_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Materialize the fixture datasets/records as co-bucketed tables
    (same key, same bucket count — the co-location precondition) once per
    warehouse; returns the two table names."""
    dt, rt = "gc_bucketed_datasets", "gc_bucketed_records"
    if not spark.catalog.tableExists(dt) or not spark.catalog.tableExists(rt):
        # no persistent metastore in this deployment: a previous session's
        # table DATA may survive in the warehouse dir while its metadata
        # (incl. the bucket spec) did not — the files are a derived cache
        # of the fixtures, so clear and rebuild
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (dt, rt):
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet").select(
            "id", "record_id", "instance_id", "container_uri", "status"
        )
        records = spark.read.parquet(f"{fixture_dir}/records.parquet").select(
            F.col("id").alias("record_id"), "name", "datetime"
        )
        write_bucketed(datasets, dt, "record_id", n_buckets)
        write_bucketed(records, rt, "record_id", n_buckets)
    return dt, rt


def bucketed_join(spark: SparkSession, dt: str, rt: str) -> DataFrame:
    """J1 over the co-bucketed tables.  The merge hint pins SortMergeJoin
    so the plan demonstrably carries ZERO Exchange (a broadcast would
    also be shuffle-free here but only because the fixture dim is small —
    the bucketed SMJ is the shape that still holds when records is
    petabyte-sized)."""
    d = spark.table(dt)
    r = spark.table(rt)
    return d.hint("merge").join(r, "record_id")
