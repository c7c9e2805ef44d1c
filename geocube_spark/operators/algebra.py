"""Map algebra over tile-table px arrays (C-family raster scalar ops).

The reference casts/scales pixels at consolidation time (CastFile,
internal/image/image.go:356-450) but leaves derived indices (NDVI & co)
to clients.  Here per-pixel algebra is a first-class engine op: pure
higher-order functions on the px array — JVM codegen, no UDF, no shuffle;
an arbitrary two-band expression runs at scan speed and composes with
partition pruning on (level, block) like every other tile op.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_algebra(
    tiles: DataFrame,
    fn: Callable[..., Column],
    in_cols: tuple[str, ...] = ("px",),
    out_col: str = "px_out",
) -> DataFrame:
    """Apply a per-pixel expression over one or two aligned band arrays.

    ``fn`` receives one Column per input (the pixel values, zipped
    element-wise) and returns the output pixel Column.  One input uses
    ``transform``; two use ``zip_with`` (arrays must be block-aligned —
    the tile table guarantees it by construction).
    """
    if len(in_cols) == 1:
        expr = F.transform(F.col(in_cols[0]), lambda x: fn(x))
    elif len(in_cols) == 2:
        expr = F.zip_with(F.col(in_cols[0]), F.col(in_cols[1]), lambda a, b: fn(a, b))
    else:
        raise ValueError("map_algebra supports 1 or 2 input bands")
    return tiles.withColumn(out_col, expr)


def normalized_difference(
    tiles: DataFrame,
    band_a: str,
    band_b: str,
    out_col: str = "nd",
) -> DataFrame:
    """(b − a) / (b + a) per pixel — the NDVI/NDWI/NBR family."""
    return map_algebra(
        tiles,
        lambda a, b: (b - a) / (b + a),
        in_cols=(band_a, band_b),
        out_col=out_col,
    )
