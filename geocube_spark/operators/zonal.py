"""Zonal statistics: per-zone aggregates of raster pixel values (R-family
companion op — the classic EO analysis the reference's GetCube consumers
run client-side; here it's pushed into the engine as one declarative plan,
parity surface: raster dataflow over the tile table of
internal/image/image.go-produced datasets).

Plan shape (and why it scales):
- zones are a SMALL dimension (thousands at most): broadcast θ-join
  against the tile table on bbox overlap — the same J5 shape as
  cover_custom_cells, a BroadcastNestedLoopJoin by design (declared in
  the plan-audit exemption list).  The tile side stays partition-pruned
  and never shuffles.
- the per-(tile, zone) window aggregation is pure JVM higher-order
  functions over the px array (filter/transform/aggregate — no UDF, no
  Python), emitting one partial row per overlap;
- a final groupBy(zone) merges partials with map-side combine: the only
  shuffle is O(#overlaps), never O(pixels).

Pixel-inclusion rule: pixel CENTER inside the zone's [min, max) bbox —
standard rasterization semantics, exact when zone edges land on pixel
edges (the fixture case, making the SQL oracle bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    block: int = 64,
    nodata: float | None = None,
    px_col: str = "px",
    strategy: str = "auto",
) -> DataFrame:
    """Per-zone count/sum/min/max/mean over every tile the zone overlaps.

    ``tiles``: tile-table rows (block_x, block_y, px, pix_to_crs struct).
    ``zones``: (zone_id, xmin, ymin, xmax, ymax) in the tile CRS, treated
    as closed-open boxes.  Returns one row per zone_id.

    ``strategy`` (see :func:`operators.spatialjoin.adaptive_bbox_join`):
    ``auto`` broadcasts a small zones table (the BNLJ-by-design plan) and
    switches to the grid-bucketed equi-join when zones outgrow
    ``autoBroadcastJoinThreshold`` — the θ-join never degenerates to a
    non-broadcast nested loop at scale.
    """
    from geocube_spark.operators.spatialjoin import adaptive_bbox_join

    a = F.col("pix_to_crs.a")
    e = F.col("pix_to_crs.e")  # negative (north-up)
    tile_x0 = F.col("pix_to_crs.c") + F.col("block_x") * block * a
    tile_y0 = F.col("pix_to_crs.f") + F.col("block_y") * block * e

    t = tiles.withColumn("tile_x0", tile_x0).withColumn("tile_y0", tile_y0)
    # bbox overlap: tile spans [tile_x0, tile_x0 + block*a) ×
    # (tile_y0 + block*e, tile_y0]  (half-open -> strict predicate)
    joined = adaptive_bbox_join(
        t,
        zones,
        big_box=(
            F.col("tile_x0"),
            F.col("tile_y0") + block * e,
            F.col("tile_x0") + block * a,
            F.col("tile_y0"),
        ),
        q_box=(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")),
        closed=False,
        strategy=strategy,
    )

    # in-tile pixel window of the zone (pixel-center rule, clamped)
    cx0 = F.greatest(
        F.lit(0), F.ceil((F.col("xmin") - F.col("tile_x0")) / a - 0.5)
    ).cast("int")
    cx1 = F.least(
        F.lit(block - 1),
        (F.ceil((F.col("xmax") - F.col("tile_x0")) / a - 0.5) - 1),
    ).cast("int")
    # rows: center_y = tile_y0 + (j + 0.5)·e with e < 0; ymin <= y < ymax.
    # Dividing by e < 0 flips the inequalities, so the inclusive bound is
    # floor+1 / floor here (ceil/ceil-1 would treat ymax as inclusive and
    # ymin as exclusive whenever a zone edge lands exactly on pixel
    # centers — the x axis keeps its ceil forms because a > 0)
    ry0 = F.greatest(
        F.lit(0), F.floor((F.col("ymax") - F.col("tile_y0")) / e - 0.5) + 1
    ).cast("int")
    ry1 = F.least(
        F.lit(block - 1),
        F.floor((F.col("ymin") - F.col("tile_y0")) / e - 0.5),
    ).cast("int")
    w = (
        joined.withColumn("cx0", cx0)
        .withColumn("cx1", cx1)
        .withColumn("ry0", ry0)
        .withColumn("ry1", ry1)
        .filter((F.col("cx0") <= F.col("cx1")) & (F.col("ry0") <= F.col("ry1")))
    )

    idx = F.sequence(F.lit(0), F.lit(block * block - 1))
    inside = F.filter(
        idx,
        lambda i: (i % block >= F.col("cx0"))
        & (i % block <= F.col("cx1"))
        & (F.floor(i / block) >= F.col("ry0"))
        & (F.floor(i / block) <= F.col("ry1")),
    )
    vals = F.transform(inside, lambda i: F.element_at(px_col, (i + 1).cast("int")))
    if nodata is not None:
        vals = F.filter(vals, lambda v: v != F.lit(float(nodata)))

    carry = [k for k in ("band", "level") if k in tiles.columns]
    partial = w.select(
        "zone_id",
        *carry,
        F.size(vals).alias("p_n"),
        F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v).alias("p_sum"),
        F.array_min(vals).alias("p_min"),
        F.array_max(vals).alias("p_max"),
    ).filter(F.col("p_n") > 0)

    return (
        partial.groupBy("zone_id", *carry)
        .agg(
            F.sum("p_n").cast("long").alias("n_pixels"),
            F.sum("p_sum").alias("sum_value"),
            F.min("p_min").alias("min_value"),
            F.max("p_max").alias("max_value"),
        )
        .withColumn("mean_value", F.col("sum_value") / F.col("n_pixels"))
    )
