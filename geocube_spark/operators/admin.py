"""Admin operations (SURVEY §7 Phase 4): TidyDB, UpdateDatasets,
DeleteDatasets, DownloadCube.

Reference: internal/grpc/admin.go:34-65 -> internal/svc/admin.go:16;
UpdateDatasets impact pg_containers.go:433-473 (A5); deletion machine
internal/svc/operations.go:120-334; downloader grpc/downloader.go:47-158.

All expressed as pure DataFrame transforms over the catalog tables; the
caller persists via an overwrite/MERGE — idempotent like the reference's
retry arcs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocube_spark.plans.find_datasets import DatasetFilters, find_datasets


def update_datasets_impact(datasets: DataFrame, flt: DatasetFilters) -> DataFrame:
    """A5 dry-run (pg_containers.go:436-459): COUNT(*) grouped by the
    7-scalar DataMapping over the datasets the update would touch."""
    d = find_datasets(datasets, None, flt)
    return d.groupBy(
        F.col("dmapping.dtype").alias("dtype"),
        F.col("dmapping.no_data").alias("no_data"),
        F.col("dmapping.min_value").alias("min_value"),
        F.col("dmapping.max_value").alias("max_value"),
        F.col("dmapping.real_min_value").alias("real_min_value"),
        F.col("dmapping.real_max_value").alias("real_max_value"),
        F.col("dmapping.exponent").alias("exponent"),
    ).agg(F.count(F.lit(1)).alias("n_datasets"))


def update_datasets(
    datasets: DataFrame, flt: DatasetFilters, new_dmapping: dict
) -> DataFrame:
    """Apply the UpdateDatasets mapping change to the selected rows (the
    write side of A5's dry run)."""
    target_ids = find_datasets(datasets, None, flt).select("id")
    # match the EXISTING struct's field order (parquet writers may store the
    # mapping fields in any order; CASE WHEN needs identical struct types)
    field_order = datasets.schema["dmapping"].dataType.fieldNames()
    new_struct = F.struct(
        *[F.lit(new_dmapping[k]).alias(k) for k in field_order]
    ).cast(datasets.schema["dmapping"].dataType)
    flagged = datasets.join(
        target_ids.withColumnRenamed("id", "_uid").withColumn("_hit", F.lit(True)),
        datasets["id"] == F.col("_uid"),
        "left",
    )
    return flagged.withColumn(
        "dmapping", F.when(F.col("_hit"), new_struct).otherwise(F.col("dmapping"))
    ).drop("_uid", "_hit")


def delete_datasets(
    datasets: DataFrame,
    containers: DataFrame,
    flt: DatasetFilters,
) -> tuple[DataFrame, DataFrame]:
    """DeleteDatasets (operations.go:255-334): drop the selected datasets;
    managed containers left with zero datasets are garbage-collected.

    Returns (surviving_datasets, deleted_container_uris).
    """
    doomed = find_datasets(datasets, None, flt).select("id")
    survivors = datasets.join(doomed, "id", "left_anti")
    live_uris = survivors.select("container_uri").distinct()
    dead_containers = (
        containers.filter(F.col("managed"))
        .join(live_uris, containers["uri"] == F.col("container_uri"), "left_anti")
        .select("uri")
    )
    return survivors, dead_containers


def purge_pending_deletions(
    manifest: DataFrame, ignore_not_found: bool = True
) -> DataFrame:
    """The storage-GC step that CONSUMES the ``pending_deletions`` manifest
    delete_datasets writes — the Delete/BulkDelete strategy of the
    reference's storage layer (interface/storage/filesystem/strategy.go;
    semantics pinned by its strategy_test.go: missing files error unless
    IgnoreNotFound).

    Runs DISTRIBUTED: each executor partition deletes its own URIs
    (mapInPandas — the driver never loops over the manifest, so a
    fleet-wide GC of 10^8 dead containers is one narrow scan).  Only
    ``file://``/plain paths are deleted here; other schemes report
    ``unsupported`` for the deployment's object-store hook to consume.

    Returns (uri, status) with status in {deleted, missing, unsupported,
    error}; with ``ignore_not_found=False`` a missing file raises inside
    the task like the reference's default strategy.
    """
    import pandas as pd

    inf = bool(ignore_not_found)

    def drop(batches):
        import os

        for pdf in batches:
            statuses = []
            for uri in pdf["uri"]:
                path = uri
                if uri.startswith("file://"):
                    path = uri[len("file://"):]
                elif "://" in uri:
                    statuses.append("unsupported")
                    continue
                try:
                    os.remove(path)
                    statuses.append("deleted")
                except FileNotFoundError:
                    if not inf:
                        raise
                    statuses.append("missing")
                except OSError:
                    statuses.append("error")
            yield pd.DataFrame({"uri": pdf["uri"], "status": statuses})

    return manifest.select("uri").mapInPandas(drop, "uri string, status string")


def get_cube_from_metadatas(
    metadata: DataFrame,
    tiles: DataFrame,
    nodata: float,
    min_valid_fraction: float = 0.0,
) -> DataFrame:
    """DownloadCube parity (grpc/downloader.go:47-158): build a cube from a
    CALLER-SUPPLIED metadata DataFrame (container_uri, record_id,
    record_datetime) — the Phase-2 executor without the catalog query."""
    from geocube_spark.operators.mosaic import filter_valid_slices, mosaic_blocks

    joined = tiles.join(F.broadcast(metadata), "container_uri")
    merged = mosaic_blocks(joined, nodata=nodata)
    return filter_valid_slices(merged, nodata=nodata, min_valid_fraction=min_valid_fraction)
