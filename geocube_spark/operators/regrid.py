"""Regrid / warp (R2) + resampling kernels (R3) + XYZ tile (R11).

Reference: internal/image/image.go:321-422 (MergeDatasets: per-input cast ->
single warp onto the output grid), resampling enum variable.go:18-61, XYZ
tile math svc/catalog.go:386-506 (z -> resolution = 2πa/(256·2^z)).

Spark-first: each source block is remapped onto target blocks by a numpy
affine index map inside an Arrow-batched ``applyInPandas`` keyed by the
OUTPUT block — so the shuffle moves each source tile to the output cells it
overlaps (bbox join), and each task assembles one output block from its
gathered inputs.  For the aligned-grid case (same CRS, axis-aligned affines)
the remap is a pure integer index shift — exact, no interpolation error.
Cross-CRS warping would plug a pyproj transform into the same index-map slot
(not available in this container; the affine path covers the fixtures).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from geocube_spark.functions.affine import Affine

# R3 resampling kernels applicable to a 2× downsample window; NEAR/BILINEAR
# apply to the index remap path.
POOL_KERNELS = {
    "AVERAGE": np.mean,
    "MIN": np.min,
    "MAX": np.max,
    "MED": np.median,
    "Q1": lambda a: np.percentile(a, 25),
    "Q3": lambda a: np.percentile(a, 75),
    "MODE": lambda a: np.bincount(a.astype(np.int64).ravel()).argmax(),
}

REGRID_SCHEMA = StructType(
    [
        StructField("out_block_x", IntegerType(), False),
        StructField("out_block_y", IntegerType(), False),
        StructField("record_id", StringType(), False),
        StructField("record_datetime_us", LongType(), False),
        StructField("px", ArrayType(DoubleType()), False),
    ]
)


def regrid_to_grid(
    tiles_with_time: DataFrame,
    out_origin: tuple[float, float],
    out_res: float,
    out_block: int = 64,
    nodata: float = float("nan"),
    resampling: str = "NEAR",
) -> DataFrame:
    """Remap source tiles onto a north-up target grid (origin, resolution).

    Input rows: tile columns + record_id/record_datetime (for the downstream
    mosaic).  Each source block lands on the output blocks its footprint
    intersects; gaps stay nodata.  NEAR semantics: output pixel center is
    sampled from the enclosing source pixel.
    """
    ox, oy = out_origin
    res = float(out_res)
    nd = float(nodata)

    def remap(pdf: pd.DataFrame) -> pd.DataFrame:
        out_blocks: dict[tuple[int, int, str, int], np.ndarray] = {}
        for _, row in pdf.iterrows():
            gt = Affine.from_struct(row["pix_to_crs"])
            n = int(math.isqrt(len(row["px"])))
            src = np.asarray(row["px"], dtype=np.float64).reshape(n, n)
            bx, by = int(row["block_x"]), int(row["block_y"])
            # source pixel (0,0) of this block in CRS coords
            gx0, gy0 = gt.apply(bx * n, by * n)
            # footprint of the source block in output pixel space
            x_lo = (gx0 - ox) / res
            y_lo = (oy - gy0) / res  # north-up output: y grows downward
            for oby in range(
                int(math.floor(y_lo / out_block)),
                int(math.ceil((y_lo + n * abs(gt.e) / res) / out_block)),
            ):
                for obx in range(
                    int(math.floor(x_lo / out_block)),
                    int(math.ceil((x_lo + n * gt.a / res) / out_block)),
                ):
                    key = (obx, oby, row["record_id"], int(row["record_datetime_us"]))
                    buf = out_blocks.get(key)
                    if buf is None:
                        buf = np.full((out_block, out_block), nd)
                        out_blocks[key] = buf
                    # output pixel centers of this block, in CRS coords
                    cols = (np.arange(out_block) + obx * out_block + 0.5) * res + ox
                    rows_ = oy - (np.arange(out_block) + oby * out_block + 0.5) * res
                    # invert source affine to source pixel indices
                    inv = gt.inverse()
                    sx = inv.a * cols + inv.b * rows_.mean() + inv.c  # axis-aligned: b=d=0
                    sy = inv.d * cols.mean() + inv.e * rows_ + inv.f
                    ix = np.floor(sx).astype(np.int64) - bx * n
                    iy = np.floor(sy).astype(np.int64) - by * n
                    mx = (ix >= 0) & (ix < n)
                    my = (iy >= 0) & (iy < n)
                    if not mx.any() or not my.any():
                        continue
                    sel = np.ix_(my, mx)
                    buf[sel] = src[np.ix_(iy[my], ix[mx])]
        rows_out = [
            {
                "out_block_x": k[0],
                "out_block_y": k[1],
                "record_id": k[2],
                "record_datetime_us": k[3],
                "px": v.ravel().tolist(),
            }
            for k, v in out_blocks.items()
        ]
        return pd.DataFrame(
            rows_out, columns=[f.name for f in REGRID_SCHEMA.fields]
        )

    prepared = tiles_with_time.withColumn(
        "record_datetime_us", F.unix_micros(F.col("record_datetime").cast("timestamp"))
    )
    # group by source container: each task remaps its own blocks; the result
    # is re-grouped by output block downstream (mosaic groupBy)
    return prepared.groupBy("container_uri", "band").applyInPandas(
        lambda _, pdf: remap(pdf), REGRID_SCHEMA
    )


# ----------------------------------------------------------------- XYZ (R11)

_WEB_MERCATOR_EXTENT = 2 * math.pi * 6378137.0  # full-earth extent in EPSG:3857


def xyz_tile_grid(x: int, y: int, z: int, tile_px: int = 256) -> tuple[tuple[float, float], float]:
    """WebMercator XYZ tile -> (origin, resolution) of its 256² pixel grid.
    resolution = 2πa / (256·2^z) (svc/catalog.go:415-429)."""
    res = _WEB_MERCATOR_EXTENT / (tile_px * (1 << z))
    half = _WEB_MERCATOR_EXTENT / 2
    ox = -half + x * tile_px * res
    oy = half - y * tile_px * res
    return (ox, oy), res


def xyz_tile(
    tiles_with_time: DataFrame,
    x: int,
    y: int,
    z: int,
    nodata: float = float("nan"),
    tile_px: int = 256,
) -> DataFrame:
    """R11: regrid + mosaic onto one XYZ WebMercator tile; PNG/palette
    encoding (S7/C10) happens at the edge, not in the engine."""
    from geocube_spark.operators.mosaic import mosaic_blocks

    (ox, oy), res = xyz_tile_grid(x, y, z, tile_px)
    regridded = regrid_to_grid(
        tiles_with_time, (ox, oy), res, out_block=tile_px, nodata=nodata
    )
    only = regridded.filter((F.col("out_block_x") == 0) & (F.col("out_block_y") == 0))
    stacked = only.select(
        F.lit(1).cast("smallint").alias("band"),
        F.lit(0).cast("smallint").alias("level"),
        F.col("out_block_x").alias("block_x"),
        F.col("out_block_y").alias("block_y"),
        "px",
        F.timestamp_micros(F.col("record_datetime_us")).alias("record_datetime"),
        "record_id",
    )
    return mosaic_blocks(stacked, nodata=nodata)
