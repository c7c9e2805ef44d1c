"""FindRecords / ListRecords — records-side catalog query.

Reference: interface/database/pg/pg_records.go:80-154 (FindRecords), with
the AOI join (J2) taken only when a spatial filter or loadAOI is requested.
Pagination semantics per pg.go:217-225 (L1).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocube_spark.functions.geometry import bbox_intersects
from geocube_spark.functions.globs import like_filter
from geocube_spark.plans.find_datasets import _tag_predicate


@dataclass
class RecordFilters:
    ids: list[str] | None = None  # F2 (GetRecords RPC / ReadRecords id = ANY($1))
    name_glob: str | None = None  # F9/F5
    time_from: datetime | None = None  # F3
    time_to: datetime | None = None
    tags: dict[str, str] | None = None  # F4
    aoi_extent: tuple[float, float, float, float] | None = None  # F10 coarse
    load_aoi: bool = False  # J2 join even without filter
    order: bool = True
    offset: int = 0
    limit: int | None = None


def find_records(records: DataFrame, aoi: DataFrame | None, flt: RecordFilters) -> DataFrame:
    r = records
    if flt.ids is not None:
        # F2 for records (pg_records.go:196 id = ANY($1)): an explicit
        # user-supplied id list — an IN-list literal, pushed to the scan.
        # The list is request-sized by construction (an RPC argument); a
        # relation-sized id set belongs in a semi-join, not a filter.
        r = r.filter(F.col("id").isin(list(flt.ids)))
    if flt.name_glob is not None:
        r = r.filter(like_filter(F.col("name"), flt.name_glob))
    if flt.time_from is not None:
        r = r.filter(F.col("datetime") >= F.lit(flt.time_from))
    if flt.time_to is not None:
        r = r.filter(F.col("datetime") <= F.lit(flt.time_to))
    if flt.tags:
        for k, v in sorted(flt.tags.items()):
            r = r.filter(_tag_predicate(F.col("tags"), k, v))

    if aoi is not None and (flt.aoi_extent is not None or flt.load_aoi):
        a = aoi
        if flt.aoi_extent is not None:  # F10: coarse bbox phase of ST_Intersects
            a = a.filter(bbox_intersects(F.col("bbox"), *flt.aoi_extent))
        a = a.select(
            F.col("id").alias("aoi_id"),
            F.col("geom_wkb").alias("aoi_wkb"),
            F.col("bbox").alias("aoi_bbox"),
        )
        r = r.join(F.broadcast(a), "aoi_id", "inner")  # J2, aoi is the dim side

    if flt.order:
        r = r.orderBy(F.col("datetime"), F.col("id"))
    if flt.offset:
        r = r.offset(flt.offset)
    if flt.limit is not None:
        r = r.limit(flt.limit)
    return r
