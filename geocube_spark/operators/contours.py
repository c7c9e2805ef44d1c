"""Distributed contour extraction (marching squares — gdal_contour's core).

Cells live BETWEEN pixel centers, so a cell whose top-left pixel sits on a
block's last row/column needs one pixel from the facing neighbor block:
each block ships its FIRST column / first row / corner pixel to its
left / up / up-left neighbor (a 1-px halo, the same 2·(w+h)/block² volume
argument as the focal ops), then marches its own cells locally with
linear edge interpolation.  Segment endpoints are stitched into polylines
relationally: endpoints quantize to integer keys, segments sharing an
endpoint key link up, and the connected-components operator labels each
polyline (the size-adaptive fast path makes small contour graphs one
task).  Nothing raster-sized shuffles — only halo strips and the
segment/endpoint stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SEG_SCHEMA = StructType(
    [
        StructField("level_i", IntegerType(), False),
        StructField("x1", DoubleType(), False),
        StructField("y1", DoubleType(), False),
        StructField("x2", DoubleType(), False),
        StructField("y2", DoubleType(), False),
    ]
)

_Q = 1 << 20  # endpoint quantization for exact stitching keys


def contour_segments(
    tiles: DataFrame,
    levels: list[float],
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """(level_i, x1, y1, x2, y2): marching-squares segments in pixel-center
    coordinates (x = col, y = row), linearly interpolated per cell edge."""
    b = int(block)

    def strip(which: str):
        idx = F.sequence(F.lit(0), F.lit(b * b - 1))
        if which == "col0":
            pred = lambda i: i % b == 0  # noqa: E731
        elif which == "row0":
            pred = lambda i: i < b  # noqa: E731
        else:  # corner
            pred = lambda i: i == 0  # noqa: E731
        sel = F.filter(idx, pred)
        return F.transform(sel, lambda i: F.element_at(px_col, (i + 1).cast("int")))

    pieces = [
        F.struct(
            F.col("block_x").alias("tx"), F.col("block_y").alias("ty"),
            F.lit(0).alias("kind"), F.col(px_col).alias("vals"),
        ),
        F.struct(
            (F.col("block_x") - 1).alias("tx"), F.col("block_y").alias("ty"),
            F.lit(1).alias("kind"), strip("col0").alias("vals"),
        ),
        F.struct(
            F.col("block_x").alias("tx"), (F.col("block_y") - 1).alias("ty"),
            F.lit(2).alias("kind"), strip("row0").alias("vals"),
        ),
        F.struct(
            (F.col("block_x") - 1).alias("tx"), (F.col("block_y") - 1).alias("ty"),
            F.lit(3).alias("kind"), strip("corner").alias("vals"),
        ),
    ]
    exploded = tiles.select(
        F.explode(F.array(*pieces)).alias("m")
    ).select(
        F.col("m.tx").alias("block_x"),
        F.col("m.ty").alias("block_y"),
        F.col("m.kind").alias("kind"),
        F.col("m.vals").alias("vals"),
    )
    lv = [float(x) for x in levels]

    def march(pdf: pd.DataFrame) -> pd.DataFrame:
        bx = int(pdf["block_x"].iloc[0])
        by = int(pdf["block_y"].iloc[0])
        body = None
        right = bottom = corner = None
        for kind, vals in zip(pdf["kind"], pdf["vals"]):
            a = np.asarray(vals, dtype=np.float64)
            if kind == 0:
                body = a.reshape(b, b)
            elif kind == 1:
                right = a  # neighbor's first column
            elif kind == 2:
                bottom = a  # neighbor's first row
            else:
                corner = a[0]
        if body is None:
            return pd.DataFrame(
                {"level_i": [], "x1": [], "y1": [], "x2": [], "y2": []}
            )
        ext = np.full((b + 1, b + 1), np.nan)
        ext[:b, :b] = body
        if right is not None:
            ext[:b, b] = right
        if bottom is not None:
            ext[b, :b] = bottom
        if corner is not None:
            ext[b, b] = corner
        gx0, gy0 = bx * b, by * b
        rows = []
        for li, level in enumerate(lv):
            for ci in range(b):
                for cj in range(b):
                    v00 = ext[ci, cj]
                    v01 = ext[ci, cj + 1]
                    v10 = ext[ci + 1, cj]
                    v11 = ext[ci + 1, cj + 1]
                    if np.isnan(v01) or np.isnan(v10) or np.isnan(v11):
                        continue  # raster edge: no cell
                    case = (
                        (v00 > level)
                        | ((v01 > level) << 1)
                        | ((v11 > level) << 2)
                        | ((v10 > level) << 3)
                    )
                    if case in (0, 15):
                        continue
                    x, y = gx0 + cj, gy0 + ci

                    def interp(va, vb):
                        # selected edges always straddle the level (va != vb);
                        # unselected edges may divide by zero harmlessly
                        with np.errstate(divide="ignore", invalid="ignore"):
                            return (level - va) / (vb - va)

                    top = (x + interp(v00, v01), y)
                    botm = (x + interp(v10, v11), y + 1)
                    left = (x, y + interp(v00, v10))
                    rght = (x + 1, y + interp(v01, v11))
                    segs = {
                        1: [(left, top)], 14: [(left, top)],
                        2: [(top, rght)], 13: [(top, rght)],
                        4: [(rght, botm)], 11: [(rght, botm)],
                        8: [(botm, left)], 7: [(botm, left)],
                        3: [(left, rght)], 12: [(left, rght)],
                        6: [(top, botm)], 9: [(top, botm)],
                        5: [(left, botm), (top, rght)],
                        10: [(left, top), (rght, botm)],
                    }[int(case)]
                    for (ax, ay), (bx_, by_) in segs:
                        rows.append((li, float(ax), float(ay), float(bx_), float(by_)))
        return pd.DataFrame(
            rows, columns=["level_i", "x1", "y1", "x2", "y2"]
        )

    return (
        exploded.groupBy("block_x", "block_y")
        .applyInPandas(lambda _k, p: march(p), _SEG_SCHEMA)
    )


def contour_report(
    tiles: DataFrame,
    levels: list[float],
    block: int = 64,
    px_col: str = "px",
) -> DataFrame:
    """(level, n_polylines, n_segments, total_length): segments stitched
    into polylines via endpoint-key connected components."""
    from geocube_spark.operators.dedup import connected_components

    segs = contour_segments(tiles, levels, block, px_col).withColumn(
        "sid", F.monotonically_increasing_id()
    ).localCheckpoint()

    def key(xc, yc):
        # exact pair-pack: quantized coords stay < 2^31, product < 2^63
        return F.round(xc * _Q).cast("long") * F.lit(1 << 32) + F.round(
            yc * _Q
        ).cast("long")

    # endpoint stream: (level, endpoint key, segment id); two segments
    # sharing a key link — min segment id per key is the link target
    eps = segs.select(
        "level_i", "sid", key(F.col("x1"), F.col("y1")).alias("k")
    ).unionByName(
        segs.select("level_i", "sid", key(F.col("x2"), F.col("y2")).alias("k"))
    )
    mins = eps.groupBy("level_i", "k").agg(F.min("sid").alias("m"))
    links = (
        eps.join(mins, ["level_i", "k"])
        .filter(F.col("sid") != F.col("m"))
        .select(F.col("sid").alias("doc_a"), F.col("m").alias("doc_b"))
        .distinct()
    )
    comp = connected_components(links).select(
        F.col("node").alias("sid"), "component"
    )
    labeled = segs.join(comp, "sid", "left").select(
        "level_i",
        F.coalesce("component", F.col("sid")).alias("poly"),
        F.sqrt(
            (F.col("x2") - F.col("x1")) ** 2 + (F.col("y2") - F.col("y1")) ** 2
        ).alias("seg_len"),
    )
    lv_map = F.array(*[F.lit(float(x)) for x in levels])
    return (
        labeled.groupBy("level_i")
        .agg(
            F.countDistinct("poly").cast("long").alias("n_polylines"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.round(F.sum("seg_len"), 6).alias("total_length"),
        )
        .select(
            F.element_at(lv_map, F.col("level_i") + 1).alias("level"),
            "n_polylines",
            "n_segments",
            "total_length",
        )
        .orderBy("level")
    )
