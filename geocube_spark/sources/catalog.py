"""Catalog table IO: entity writers with reference-parity validation.

Reference: bulk COPY ingest (pg_records.go:19-55, pg_containers.go:170-230)
-> parquet append; entity validation ported from record.go:174-214,
variable.go:286-328, dataset.go:191-220; AOI dedup-by-hash record.go:33-58.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geocube_spark import schemas
from geocube_spark.functions.geometry import geom_hash, wkb_bounds

_URN = re.compile(r"^[a-zA-Z0-9_\-.:]+$")  # urn.go:43 name charset

TABLES = {
    "aoi": schemas.AOI,
    "records": schemas.RECORD,
    "variables": schemas.VARIABLE,
    "instances": schemas.INSTANCE,
    "containers": schemas.CONTAINER,
    "datasets": schemas.DATASET,
    "layouts": schemas.LAYOUT,
    "cells": schemas.CELL,
    "tiles": schemas.TILE,
    "jobs": schemas.JOB,
    "tasks": schemas.TASK,
    "locked_datasets": schemas.LOCKED_DATASET,
}


class Catalog:
    """A directory of parquet tables, one per entity."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.root}/{name}.parquet"

    def _recover(self, name: str) -> None:
        """If a previous swap crashed after target->backup but before
        tmp->target, the ``.bak`` is the only copy of the table — restore
        it.  Called from every access path so a crashed swap is healed on
        the next read, exists() check, or write (never silently treated as
        'table absent', which would lose the data on the next bootstrap)."""
        target = self.path(name)
        backup = f"{target}.bak"
        if os.path.exists(backup) and not os.path.exists(target):
            os.rename(backup, target)

    def read(self, name: str) -> DataFrame:
        self._recover(name)
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        self._recover(name)
        return os.path.exists(self.path(name))

    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> None:
        """Read-modify-OVERWRITE safe: materialize to a temp dir first, then
        swap — Spark cannot overwrite a path that one of the plan's inputs
        is still lazily reading (Delta's MERGE would replace this dance).

        Crash-safety of the swap (reference: the consolidater job state
        machine guarantees atomic ACTIVE<->TODELETE, job.go:350-641): each
        os.rename is atomic on POSIX, but the target->backup / tmp->target
        pair is not jointly atomic.  The failure windows are:
          * crash after target->backup, before tmp->target: ``target`` is
            missing but ``target.bak`` holds the full previous table — we
            restore it here on the error path, and a later write of the same
            table would find no target and succeed fresh;
          * crash after tmp->target, before backup delete: both the new
            table and a stale ``.bak`` exist — the .bak is garbage-collected
            on the next successful write.
        The backup is only deleted AFTER the swap succeeded; on failure it
        is restored so the table is never lost (a Delta/Iceberg commit-log
        sink would make this a single atomic metadata swap).
        """
        import shutil
        import uuid as _uuid

        target = self.path(name)
        tmp = f"{self.root}/.tmp_{name}_{_uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)

        def _rm(path: str) -> None:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.remove(path)

        backup = f"{target}.bak"
        self._recover(name)  # a crashed swap's .bak is the only copy — heal first
        _rm(backup)  # stale .bak from an earlier COMPLETED swap
        had_backup = os.path.exists(target)
        if had_backup:
            os.rename(target, backup)
        try:
            os.rename(tmp, target)
        except BaseException:
            if had_backup and not os.path.exists(target):
                os.rename(backup, target)  # restore — never lose the table
            _rm(tmp)
            raise
        _rm(backup)


def validate_record_name(name: str) -> None:
    if not _URN.match(name):
        raise ValueError(f"invalid record URN name: {name!r}")


def make_aoi_rows(geoms_wkb: list[bytes]) -> list[dict]:
    """AOI rows with dedup-by-hash: identical geometry -> identical id
    (record.go:33-58, pg_records.go:228-253)."""
    seen: dict[str, dict] = {}
    for wkb in geoms_wkb:
        h = geom_hash(wkb)
        if h in seen:
            continue
        xmin, ymin, xmax, ymax = wkb_bounds(wkb)
        seen[h] = {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "aoi:" + h)),
            "hash": h,
            "geom_wkb": wkb,
            "bbox": {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax},
        }
    return list(seen.values())


def validate_dmapping(dm: dict) -> None:
    """dataformat.go:53-93 invariants: min<max, real_min<real_max when
    exponent != 1 the internal range must start at 0 is NOT required by the
    reference — it requires Range valid and exponent > 0."""
    if not dm["min_value"] < dm["max_value"]:
        raise ValueError("dmapping: min_value must be < max_value")
    if not dm["real_min_value"] < dm["real_max_value"]:
        raise ValueError("dmapping: real_min_value must be < real_max_value")
    if dm["exponent"] <= 0:
        raise ValueError("dmapping: exponent must be > 0")
    if dm["dtype"] not in schemas.DTYPE_BOUNDS:
        raise ValueError(f"dmapping: unknown dtype {dm['dtype']}")


def update_record_tags(
    records: DataFrame,
    record_ids: list[str],
    add: dict[str, str] | None = None,
    remove: list[str] | None = None,
) -> DataFrame:
    """C11 tag map ops (pg_records.go:336-377): ``tags || hstore`` merge for
    adds/overwrites, key deletion for removes — JVM-side map_concat /
    map_filter, applied only to the selected records."""
    hit = F.col("id").isin(record_ids)
    tags = F.col("tags")
    if add:
        new_map = F.create_map(
            *[x for k, v in sorted(add.items()) for x in (F.lit(k), F.lit(v))]
        )
        # map_concat raises on duplicate keys: drop overwritten keys first
        add_keys = list(add)
        tags = F.map_concat(
            F.map_filter(tags, lambda k, _: ~k.isin(*add_keys)), new_map
        )
    if remove:
        rm = list(remove)
        tags = F.map_filter(tags, lambda k, _: ~k.isin(*rm))
    return records.withColumn("tags", F.when(hit, tags).otherwise(F.col("tags")))


def tidy_catalog(catalog: Catalog, dry_run: bool = False) -> dict[str, int]:
    """TidyDB (J7 anti-joins, pg_records.go:176-191,323-333;
    pg_containers.go:100-109): delete records/AOIs/containers no dataset
    references.  Returns per-table removed counts; unless ``dry_run``, the
    pruned tables are written back (the reference's TidyDB really deletes).

    Write order matters: ``aoi`` first (its pruned plan reads the *current*
    records table), then ``records``, then ``containers`` — each write only
    depends on tables not yet swapped, so no plan re-reads a replaced path.
    """
    datasets = catalog.read("datasets")
    records = catalog.read("records")
    aoi = catalog.read("aoi")
    containers = catalog.read("containers")

    live_records = records.join(
        datasets.select("record_id").distinct(),
        records["id"] == F.col("record_id"),
        "left_semi",
    )
    live_aoi = aoi.join(
        live_records.select("aoi_id").distinct(),
        aoi["id"] == F.col("aoi_id"),
        "left_semi",
    )
    live_containers = containers.join(
        datasets.select("container_uri").distinct(),
        containers["uri"] == F.col("container_uri"),
        "left_semi",
    )
    removed = {
        "records": records.count() - live_records.count(),
        "aoi": aoi.count() - live_aoi.count(),
        "containers": containers.count() - live_containers.count(),
    }
    if not dry_run:
        if removed["aoi"]:
            catalog.write("aoi", live_aoi)
        if removed["records"]:
            catalog.write("records", live_records)
        if removed["containers"]:
            catalog.write("containers", live_containers)
    return removed
