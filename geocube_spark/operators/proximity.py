"""Raster proximity: per-pixel distance to the nearest target pixel.

GDAL parity surface: ``gdal_proximity.py`` / ``GDALComputeProximity``
(-values + -maxdist semantics), the preprocessing step for
distance-to-cloud / distance-to-water masks the reference's GetCube
consumers run on exported rasters (`/root/reference/internal/image/
image.go` produces the tiles; proximity is computed client-side today —
here it is pushed into the engine as one declarative plan).

Plan shape (and why it scales):
- targets are extracted per block with a JVM higher-order filter — one
  narrow pass, O(targets) rows out, pixels never explode;
- each target replicates to the blocks whose max-dist halo can see it
  (``ring = ceil(max_dist / block)`` — a 3x3 neighborhood for the
  common max_dist <= block case), then ONE hash shuffle groups targets
  per block: the same bounded-halo exchange as the focal operators,
  shuffle volume O(targets * ring^2), never O(pixels);
- the per-pixel min squared distance is a nested higher-order
  expression over the px array vs the block's (small) candidate list —
  whole-stage JVM, no Python, no per-pixel shuffle;
- correctness of the halo: any target within Euclidean max_dist of a
  pixel differs by <= max_dist on each axis, so it lies inside the
  pixel block's ring — the candidate set is a superset of the
  Euclidean ball, and a superset min that lands <= max_dist^2 IS the
  true min.

Distances are reported as exact INTEGER squared distances (sum per
block), so the DuckDB oracle — a quadratic pixel x target join — must
match bit-for-bit with no float tolerance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _targets(tiles: DataFrame, target_value: float, block: int) -> DataFrame:
    """(tgi, tgj) global coords of every pixel equal to target_value."""
    idx = F.sequence(F.lit(0), F.size("px") - 1)
    hit = F.filter(idx, lambda k: F.col("px")[k] == F.lit(target_value))
    return (
        tiles.select("block_x", "block_y", hit.alias("ks"))
        .select("block_x", "block_y", F.explode("ks").alias("k"))
        .select(
            (F.col("block_x") * block + F.col("k") % block).alias("tgi"),
            (F.col("block_y") * block + (F.col("k") / block).cast("int")).alias("tgj"),
        )
    )


def proximity_summary(
    tiles: DataFrame,
    max_dist: int,
    target_value: float = 0.0,
    block: int = 64,
) -> DataFrame:
    """Per-block proximity census: n_reached / n_unreached pixels and the
    exact integer sum of min squared distances (targets themselves count
    as reached with distance 0).  A pixel is reached iff some target lies
    within Euclidean ``max_dist``."""
    ring = math.ceil(max_dist / block)
    offsets = [(di, dj) for di in range(-ring, ring + 1) for dj in range(-ring, ring + 1)]
    tg = _targets(tiles, target_value, block)
    off = F.array(
        *[F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj")) for di, dj in offsets]
    )
    # replicate each target into every block whose halo can see it
    rep = tg.select(
        "tgi",
        "tgj",
        F.explode(off).alias("o"),
    ).select(
        ((F.col("tgi") / block).cast("int") + F.col("o.di")).alias("block_x"),
        ((F.col("tgj") / block).cast("int") + F.col("o.dj")).alias("block_y"),
        F.struct(
            F.col("tgi").cast("long").alias("x"), F.col("tgj").cast("long").alias("y")
        ).alias("t"),
    )
    per_block = rep.groupBy("block_x", "block_y").agg(
        F.collect_list("t").alias("tgts")
    )
    joined = tiles.select("block_x", "block_y", "px").join(
        per_block, ["block_x", "block_y"], "left"
    )

    cap = F.lit(int(max_dist) * int(max_dist)).cast("long")
    big = F.lit(2**62).cast("long")

    def min_d2(k: Column) -> Column:
        gi = (F.col("block_x") * block + k % block).cast("long")
        gj = (F.col("block_y") * block + (k / block).cast("int")).cast("long")
        best = F.aggregate(
            F.coalesce(F.col("tgts"), F.array()),
            big,
            lambda acc, t: F.least(
                acc, (gi - t["x"]) * (gi - t["x"]) + (gj - t["y"]) * (gj - t["y"])
            ),
        )
        return F.when(best <= cap, best)

    d2s = F.transform(F.sequence(F.lit(0), F.size("px") - 1), min_d2)
    cells = joined.select(
        "block_x",
        "block_y",
        F.size("px").alias("n_px"),
        F.size(F.filter(d2s, lambda d: d.isNotNull())).alias("n_reached"),
        F.aggregate(
            d2s, F.lit(0).cast("long"), lambda acc, d: acc + F.coalesce(d, F.lit(0))
        ).alias("sum_min_d2"),
    )
    return cells.select(
        F.col("block_x").cast("int").alias("block_x"),
        F.col("block_y").cast("int").alias("block_y"),
        F.col("n_reached").cast("long").alias("n_reached"),
        (F.col("n_px") - F.col("n_reached")).cast("long").alias("n_unreached"),
        F.col("sum_min_d2").cast("long").alias("sum_min_d2"),
    ).orderBy("block_x", "block_y")
