"""STAC ingest: SpatioTemporal Asset Catalog items -> records/datasets.

Beyond-reference source (S-class): STAC is the de-facto public catalog
format for satellite imagery (Landsat/Sentinel on AWS/Azure publish it);
the reference's own catalog is bespoke Postgres, so a migrating user's
first job is exactly this mapping — STAC item -> geocube record (id,
datetime, tags, AOI) and STAC asset -> geocube dataset (container URI,
bands, dtype).

Spark-first: an item collection is newline-delimited JSON read with an
EXPLICIT schema (``spark.read.schema(...).json`` — one pass, no
inference scan, malformed rows surface as nulls under PERMISSIVE mode
instead of failing the job).  Bounding boxes come from the GeoJSON
coordinates with pure JVM array functions (flatten + transform +
array_min/max — no UDF); only the WKB encoding of the footprint runs
through an Arrow batch (the same geojson codec the AOI path uses).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Explicit STAC item schema — the stable core subset (STAC spec 1.0.0).
# Polygon coordinates only (ring -> [[x, y], ...]); MultiPolygon items
# should be pre-exploded by the catalog exporter (the common AWS/Planet
# collections publish Polygon footprints).
STAC_ITEM_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("collection", StringType()),
        StructField(
            "geometry",
            StructType(
                [
                    StructField("type", StringType()),
                    StructField(
                        "coordinates",
                        ArrayType(ArrayType(ArrayType(DoubleType()))),
                    ),
                ]
            ),
        ),
        StructField(
            "properties",
            StructType(
                [
                    StructField("datetime", StringType()),
                    StructField("platform", StringType()),
                    StructField("constellation", StringType()),
                    StructField("gsd", DoubleType()),
                    StructField("eo:cloud_cover", DoubleType()),
                    StructField("proj:epsg", DoubleType()),
                ]
            ),
        ),
        StructField(
            "assets",
            MapType(
                StringType(),
                StructType(
                    [
                        StructField("href", StringType()),
                        StructField("type", StringType()),
                        StructField("roles", ArrayType(StringType())),
                    ]
                ),
            ),
        ),
    ]
)


def read_stac_items(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited STAC items with the explicit core schema."""
    return spark.read.schema(STAC_ITEM_SCHEMA).json(path)


def _ring_xs(col):
    return F.transform(F.flatten(col), lambda p: p[0])


def _ring_ys(col):
    return F.transform(F.flatten(col), lambda p: p[1])


def stac_items_to_records(items: DataFrame) -> DataFrame:
    """STAC item -> record row: (id, name, datetime, tags, bbox struct,
    geom WKB).  Tags carry the searchable STAC properties (platform,
    constellation, gsd, cloud cover) as strings — the reference's record
    tag model (F4 predicates apply unchanged)."""
    xs = _ring_xs(F.col("geometry.coordinates"))
    ys = _ring_ys(F.col("geometry.coordinates"))
    with_bbox = items.select(
        F.col("id"),
        F.coalesce(F.col("collection"), F.lit("stac")).alias("collection"),
        F.concat_ws("/", "collection", "id").alias("name"),
        F.to_timestamp(F.col("properties.datetime")).alias("datetime"),
        F.map_filter(
            F.create_map(
                F.lit("platform"), F.col("properties.platform"),
                F.lit("constellation"), F.col("properties.constellation"),
                F.lit("gsd"), F.col("properties.gsd").cast("string"),
                F.lit("cloud_cover"),
                F.col("properties.`eo:cloud_cover`").cast("string"),
            ),
            lambda _k, v: v.isNotNull(),
        ).alias("tags"),
        F.struct(
            F.array_min(xs).alias("xmin"),
            F.array_min(ys).alias("ymin"),
            F.array_max(xs).alias("xmax"),
            F.array_max(ys).alias("ymax"),
        ).alias("bbox"),
        # JVM-side JSON serialization: a deeply-nested array column with
        # all-null rows trips Arrow's pandas conversion, and a JSON string
        # column is Arrow-trivial — the UDF parses it back per row
        F.when(
            F.col("geometry.type").isNotNull(), F.to_json(F.col("geometry"))
        ).alias("_gjson"),
    )

    @F.pandas_udf(BinaryType())
    def geom_wkb(gjsons: pd.Series) -> pd.Series:
        from geocube_spark.functions.geojson import geojson_to_wkb

        return pd.Series(
            [None if g is None else geojson_to_wkb(g) for g in gjsons]
        )

    return with_bbox.withColumn("geom_wkb", geom_wkb(F.col("_gjson"))).drop(
        "_gjson"
    )


def stac_assets_to_datasets(items: DataFrame, roles: list[str] | None = None) -> DataFrame:
    """STAC asset -> dataset row: one per (item, asset key), container
    URI = asset href.  ``roles`` filters to e.g. ['data'] (skip
    thumbnails/metadata assets) — the common ingest shape."""
    exploded = items.select(
        F.col("id").alias("record_id"),
        F.coalesce(F.col("properties.`proj:epsg`"), F.lit(4326.0))
        .cast("int")
        .alias("crs_srid"),
        F.explode("assets").alias("asset_key", "asset"),
    )
    if roles:
        exploded = exploded.filter(
            F.arrays_overlap(
                F.coalesce(F.col("asset.roles"), F.array()),
                F.array(*[F.lit(r) for r in roles]),
            )
        )
    return exploded.select(
        "record_id",
        "asset_key",
        F.col("asset.href").alias("container_uri"),
        F.col("asset.type").alias("media_type"),
        "crs_srid",
        F.lit("ACTIVE").alias("status"),
    )


def write_stac_fixture(path: str, n_items: int = 40, seed_mod: int = 97) -> None:
    """Deterministic STAC item collection (JSONL) — closed-form fields so
    a SQL oracle can re-derive every aggregate."""
    with open(path, "w") as f:
        for i in range(n_items):
            lon0 = float((i * 3) % 30)
            lat0 = float((i * 7) % 20)
            item = {
                "type": "Feature",
                "stac_version": "1.0.0",
                "id": f"item-{i:04d}",
                "collection": "demo" if i % 2 == 0 else "alt",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [
                            [lon0, lat0],
                            [lon0 + 1.0, lat0],
                            [lon0 + 1.0, lat0 + 0.5],
                            [lon0, lat0 + 0.5],
                            [lon0, lat0],
                        ]
                    ],
                },
                "properties": {
                    "datetime": f"2021-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                    "T00:00:00Z",
                    "platform": f"sat-{i % 3}",
                    "constellation": "demo-constellation",
                    "gsd": float(10 + (i % 4) * 10),
                    "eo:cloud_cover": float((i * 13) % seed_mod),
                    "proj:epsg": 32631.0,
                },
                "assets": {
                    "data": {
                        "href": f"s3://demo/{i:04d}/B01.tif",
                        "type": "image/tiff; application=geotiff",
                        "roles": ["data"],
                    },
                    "thumbnail": {
                        "href": f"s3://demo/{i:04d}/thumb.png",
                        "type": "image/png",
                        "roles": ["thumbnail"],
                    },
                },
            }
            f.write(json.dumps(item) + "\n")
