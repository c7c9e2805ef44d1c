"""Overview pyramid (A8) — hierarchical 2× downsampling of the tile table.

Reference: internal/image/cog.go:161-177 (BuildOverviews loop),
handler_consolidation.go:489-500 (levels math), consolidation_event.go:160-164
(resampling choice — AVERAGE for smooth algorithms, else NEAR/MIN/MAX/MODE).

Spark-first: one groupBy per level.  A level-L block (bw×bh) aggregates 4
level-(L-1) blocks; pixel (r,c) pools the 2×2 source window.  Implemented as
an explode-free JVM reduction: the 4 child blocks are collected per parent
block and combined with a single ``transform`` over output indices.
AVERAGE/MIN/MAX are nodata-aware (C14).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pool2x2(children: Column, bw: int, bh: int, alg: str, nodata: float) -> Column:
    """children: map<int, array<double>> keyed by quadrant (dy*2+dx).
    Output pixel (r,c) pools source pixels (2r%bh,2c%bw)... quadrant chosen
    by which child block the 2× source coordinate falls into."""
    nd = F.lit(float(nodata))

    def src(quad: Column, idx: Column) -> Column:
        return F.element_at(F.element_at(children, quad.cast("int")), idx.cast("int") + 1)

    def pooled(i: Column) -> Column:
        r, c = (i / bw).cast("int"), i % bw
        sr, sc = r * 2, c * 2  # source row/col within the 2×-res parent area
        quad = (sr / bh).cast("int") * 2 + (sc / bw).cast("int")
        rr, cc = sr % bh, sc % bw
        vals = F.array(
            src(quad, rr * bw + cc),
            src(quad, rr * bw + cc + 1),
            src(quad, (rr + 1) * bw + cc),
            src(quad, (rr + 1) * bw + cc + 1),
        )
        valid = F.filter(
            vals, lambda v: ~(F.when(F.isnan(nd), F.isnan(v)).otherwise(v == nd))
        )
        if alg == "AVERAGE":
            agg = F.aggregate(valid, F.lit(0.0), lambda a, v: a + v) / F.size(valid)
        elif alg == "MIN":
            agg = F.array_min(valid)
        elif alg == "MAX":
            agg = F.array_max(valid)
        else:  # NEAR: top-left source pixel
            agg = F.element_at(vals, 1)
        return F.when(F.size(valid) == 0, nd).otherwise(agg)

    return F.transform(F.sequence(F.lit(0), F.lit(bw * bh - 1)), pooled)


def build_level(
    tiles: DataFrame,
    level: int,
    block_w: int = 64,
    block_h: int = 64,
    alg: str = "AVERAGE",
    nodata: float = 0.0,
) -> DataFrame:
    """Build overview level ``level`` from level-1 rows of ``tiles``.

    Shuffle: one hash partition per parent block — 4:1 reduction per level,
    so the whole pyramid is a geometric series of ever-smaller shuffles.
    """
    src = tiles.filter(F.col("level") == level - 1)
    keyed = src.select(
        "container_uri",
        "band",
        (F.col("block_x") / 2).cast("int").alias("pbx"),
        (F.col("block_y") / 2).cast("int").alias("pby"),
        ((F.col("block_y") % 2) * 2 + (F.col("block_x") % 2)).alias("quad"),
        "px",
        "crs_srid",
        "pix_to_crs",
    )
    grouped = keyed.groupBy("container_uri", "band", "pbx", "pby").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("quad"), F.col("px")))
        ).alias("children"),
        F.first("crs_srid").alias("crs_srid"),
        F.first("pix_to_crs").alias("pix_to_crs"),
    )
    return grouped.select(
        "container_uri",
        "band",
        F.lit(level).cast("smallint").alias("level"),
        F.col("pbx").alias("block_x"),
        F.col("pby").alias("block_y"),
        _pool2x2(F.col("children"), block_w, block_h, alg, nodata).alias("px"),
        "crs_srid",
        "pix_to_crs",
    )


def build_pyramid(
    tiles: DataFrame,
    max_level: int,
    block_w: int = 64,
    block_h: int = 64,
    alg: str = "AVERAGE",
    nodata: float = 0.0,
) -> DataFrame:
    """Full pyramid: driver loop over levels (A8), each level a narrow
    4:1-reduction job; result = union of all levels."""
    out = tiles.filter(F.col("level") == 0)
    acc = out
    for lvl in range(1, max_level + 1):
        nxt = build_level(acc, lvl, block_w, block_h, alg, nodata)
        acc = nxt
        out = out.unionByName(nxt)
    return out
