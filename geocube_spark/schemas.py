"""StructType schemas mirroring the reference catalog DDL.

Reference: /root/reference/interface/database/pg/create.sql (DDL),
internal/geocube/{record,dataset,variable,layout}.go (entities).
Mapping per SURVEY.md §1.4: HSTORE -> map<string,string>, geometry ->
WKB binary + denormalized bbox struct for file-skipping, DataMapping ->
flat 7-scalar struct.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TAGS = MapType(StringType(), StringType())

# bbox struct: min/max columns are what Parquet stats prune on (SURVEY O2);
# always derived from geom at write time.
BBOX = StructType(
    [
        StructField("xmin", DoubleType(), False),
        StructField("ymin", DoubleType(), False),
        StructField("xmax", DoubleType(), False),
        StructField("ymax", DoubleType(), False),
    ]
)

# DataFormat (dataformat.go:13-17): dtype + nodata + internal range.
DFORMAT = StructType(
    [
        StructField("dtype", StringType(), False),
        StructField("no_data", DoubleType(), False),
        StructField("min_value", DoubleType(), False),
        StructField("max_value", DoubleType(), False),
    ]
)

# DataMapping (dataformat.go:19-26): DataFormat + external range + exponent.
DMAPPING = StructType(
    [
        StructField("dtype", StringType(), False),
        StructField("no_data", DoubleType(), False),
        StructField("min_value", DoubleType(), False),
        StructField("max_value", DoubleType(), False),
        StructField("real_min_value", DoubleType(), False),
        StructField("real_max_value", DoubleType(), False),
        StructField("exponent", DoubleType(), False),
    ]
)

AOI = StructType(
    [
        StructField("id", StringType(), False),
        StructField("hash", StringType(), False),  # sha1(WKB), dedup key (record.go:33-58)
        StructField("geom_wkb", BinaryType(), False),
        StructField("bbox", BBOX, False),
    ]
)

RECORD = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("datetime", TimestampType(), False),
        StructField("tags", TAGS, False),
        StructField("aoi_id", StringType(), False),
    ]
)

VARIABLE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("unit", StringType(), True),
        StructField("description", StringType(), True),
        StructField("bands", ArrayType(StringType()), False),
        StructField("dformat", DFORMAT, False),
        StructField("palette", StringType(), True),
        StructField("resampling_alg", StringType(), False),
    ]
)

INSTANCE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("metadata", TAGS, False),
        StructField("variable_id", StringType(), False),
    ]
)

CONTAINER = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("managed", BooleanType(), False),
        StructField("storage_class", StringType(), False),
    ]
)

# The fact table (create.sql:83-114, dataset.go:28-42).
DATASET = StructType(
    [
        StructField("id", StringType(), False),
        StructField("record_id", StringType(), False),
        StructField("instance_id", StringType(), False),
        StructField("container_uri", StringType(), False),
        StructField("subdir", StringType(), False),
        StructField("bands", ArrayType(ShortType()), False),
        StructField("status", StringType(), False),  # ACTIVE | INACTIVE | TODELETE
        StructField("dmapping", DMAPPING, False),
        StructField("geom_wkb", BinaryType(), False),
        StructField("bbox", BBOX, False),
        StructField("shape_srid", IntegerType(), False),
        StructField("overviews", BooleanType(), False),
        StructField("locked_by_job_id", StringType(), True),
    ]
)

LAYOUT = StructType(
    [
        StructField("name", StringType(), False),
        StructField("grid_flags", ArrayType(StringType()), False),
        StructField("grid_parameters", TAGS, False),
        StructField("block_x_size", IntegerType(), False),
        StructField("block_y_size", IntegerType(), False),
        StructField("max_records", IntegerType(), False),
        StructField("overviews_min_size", IntegerType(), False),
        StructField("interlacing_pattern", StringType(), False),
    ]
)

CELL = StructType(
    [
        StructField("id", StringType(), False),
        StructField("grid", StringType(), False),
        StructField("crs", StringType(), False),
        StructField("srid", IntegerType(), False),
        StructField("geom_wkb", BinaryType(), False),
        StructField("bbox", BBOX, False),
    ]
)

# Affine geotransform, 6 coefficients (layouts.proto:18-25).
AFFINE = StructType(
    [StructField(c, DoubleType(), False) for c in ("a", "b", "c", "d", "e", "f")]
)

# Tile table: the pixel plane as data (FIXTURES.md §T).  Fixed-size blocks
# keyed by (container, band, level, block) — partition-friendly, and the unit
# of all raster operators.
TILE = StructType(
    [
        StructField("container_uri", StringType(), False),
        StructField("band", ShortType(), False),
        StructField("level", ShortType(), False),  # 0 = full res, >0 overview
        StructField("block_x", IntegerType(), False),
        StructField("block_y", IntegerType(), False),
        StructField("px", ArrayType(DoubleType()), False),  # row-major block
        StructField("crs_srid", IntegerType(), False),
        StructField("pix_to_crs", AFFINE, False),
    ]
)

JOB = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("type", StringType(), False),
        StructField("state", StringType(), False),
        StructField("payload", StringType(), False),
        StructField("active_tasks", IntegerType(), False),
        StructField("failed_tasks", IntegerType(), False),
        StructField("execution_level", IntegerType(), False),
        StructField("waiting", BooleanType(), False),
        StructField("creation_ts", TimestampType(), False),
        StructField("last_update_ts", TimestampType(), False),
    ]
)

TASK = StructType(
    [
        StructField("id", StringType(), False),
        StructField("job_id", StringType(), False),
        StructField("state", StringType(), False),  # NEW PENDING DONE FAILED CANCELLED
        StructField("payload", BinaryType(), True),
        # delivery-attempt counter (the message queue's TryCount,
        # cmd/consolidater/main.go:131-137): a task redelivered more than
        # the retry cap is dead-lettered as FAILED("too many tries")
        StructField("try_count", IntegerType(), False),
    ]
)

# create.sql job_logs + pg_jobs.go:15-26 logsSubtable: (time, severity,
# status, message) per job, served newest-first and paginated by the RPC.
JOB_LOG = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("severity", StringType(), False),
        StructField("status", StringType(), False),
        StructField("message", StringType(), False),
    ]
)

LOCKED_DATASET = StructType(
    [
        StructField("dataset_id", StringType(), False),
        StructField("job_id", StringType(), False),
        StructField("flag", IntegerType(), False),  # 0=INIT 1=TODELETE (job.go:886)
    ]
)

# DType bounds, mirroring bitmap/datatype.go:29-41.  Used by the cast clamp.
# Complex64 bounds are ±MaxFloat64 like the reference (datatype.go:29-33);
# complex tile data is represented as interleaved (re, im) pairs in the px
# array (the GDAL band-interleave convention).
DTYPE_BOUNDS: dict[str, tuple[float, float]] = {
    "UInt8": (0.0, 255.0),
    "UInt16": (0.0, 65535.0),
    "UInt32": (0.0, 4294967295.0),
    "Int8": (-128.0, 127.0),
    "Int16": (-32768.0, 32767.0),
    "Int32": (-2147483648.0, 2147483647.0),
    "Float32": (-3.4028234663852886e38, 3.4028234663852886e38),
    "Float64": (-1.7976931348623157e308, 1.7976931348623157e308),
    "Complex64": (-1.7976931348623157e308, 1.7976931348623157e308),
}

INT_DTYPES = {"UInt8", "UInt16", "UInt32", "Int8", "Int16", "Int32"}
COMPLEX_DTYPES = {"Complex64"}


def can_cast_to(src: str, dst: str) -> bool:
    """Cast lattice per datatype.go:43-58: identity always casts; complex is
    ONE-WAY (complex only to complex, real never to complex); every real
    type casts to every real type."""
    if src not in DTYPE_BOUNDS or dst not in DTYPE_BOUNDS:
        return False
    if src == dst:
        return True
    if src in COMPLEX_DTYPES:
        return dst in COMPLEX_DTYPES
    return dst not in COMPLEX_DTYPES
