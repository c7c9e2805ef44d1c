"""O8: automatic overview-level selection (gdal -ovr AUTO semantics).

Reference parity: the warp step picks the pyramid level whose resolution
matches the requested output resolution (`/root/reference/internal/image/
image.go:402`; level resolutions are base_res * 2^L per
`handler_consolidation.go:489-500`).  Without this, a zoomed-out read of a
100x catalog pays a full-resolution scan — exactly the read amplification
overviews exist to kill.

Spark-first: the chosen level is a DRIVER-side literal, so the
``level = N`` predicate is a constant equality that reaches the parquet
scan as a partition filter (pyramid stores are written
``partitionBy("level")``) or a pushed filter — the planner never touches
the finer levels' files at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_overview_level(base_res: float, out_res: float, max_level: int) -> int:
    """Coarsest pyramid level whose resolution (base_res * 2^L) is still
    <= the requested output resolution — never coarser than requested, so
    the subsequent warp only ever downsamples by < 2x (image.go:402).

    out_res <= base_res (zoom-in / native read) -> level 0.
    """
    if out_res <= base_res:
        return 0
    lvl = int(math.floor(math.log2(out_res / float(base_res))))
    return max(0, min(lvl, int(max_level)))


def scan_at_overview(
    tiles: DataFrame,
    base_res: float,
    out_res: float,
    max_level: int,
) -> tuple[DataFrame, int]:
    """Prune a multi-level tile store to the auto-selected overview level
    and rescale each tile's affine to that level's pixel size.

    Returns (pruned frame, chosen level).  The filter is a literal
    equality — Catalyst pushes it into the scan (partition pruning when
    the store is partitioned by level), so I/O is the overview's 4^-L
    fraction of the base data.  The affine's linear part scales by 2^L
    (level-L pixels are 2^L base pixels on each axis; the origin is
    unchanged), keeping georeferencing exact for the downstream warp.
    """
    lvl = auto_overview_level(base_res, out_res, max_level)
    pruned = tiles.filter(F.col("level") == F.lit(lvl))
    if lvl > 0 and "pix_to_crs" in tiles.columns:
        s = float(2**lvl)
        pruned = pruned.withColumn(
            "pix_to_crs",
            F.struct(
                (F.col("pix_to_crs.a") * s).alias("a"),
                (F.col("pix_to_crs.b") * s).alias("b"),
                F.col("pix_to_crs.c").alias("c"),
                (F.col("pix_to_crs.d") * s).alias("d"),
                (F.col("pix_to_crs.e") * s).alias("e"),
                F.col("pix_to_crs.f").alias("f"),
            ),
        )
    return pruned, lvl
