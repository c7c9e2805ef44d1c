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
        n_valid = F.size(valid)
        if alg == "AVERAGE":
            agg = F.aggregate(valid, F.lit(0.0), lambda a, v: a + v) / n_valid
        elif alg == "MIN":
            agg = F.array_min(valid)
        elif alg == "MAX":
            agg = F.array_max(valid)
        elif alg in ("MED", "Q1", "Q3"):
            # order statistics over the (≤4-element) sorted valid window;
            # MED averages the two middles for even counts (GDAL semantics)
            s = F.array_sort(valid)
            if alg == "MED":
                lo_i = ((n_valid + 1) / 2).cast("int")
                hi_i = (n_valid / 2 + 1).cast("int")
                agg = (F.element_at(s, lo_i) + F.element_at(s, hi_i)) / 2.0
            elif alg == "Q1":
                agg = F.element_at(s, F.greatest((n_valid / 4).cast("int"), F.lit(1)))
            else:  # Q3
                agg = F.element_at(
                    s, F.least(((n_valid * 3 + 3) / 4).cast("int"), n_valid)
                )
        elif alg == "MODE":
            # most frequent value; ties -> smallest (deterministic)
            s = F.array_sort(valid)
            agg = F.aggregate(
                s,
                F.struct(
                    F.lit(None).cast("double").alias("best"),
                    F.lit(0).alias("best_n"),
                    F.lit(None).cast("double").alias("cur"),
                    F.lit(0).alias("cur_n"),
                ),
                lambda acc, v: F.struct(
                    F.when(
                        (acc["cur"] == v) & (acc["cur_n"] + 1 > acc["best_n"]), v
                    )
                    .when(acc["best"].isNull(), v)
                    .otherwise(acc["best"])
                    .alias("best"),
                    F.when(
                        (acc["cur"] == v) & (acc["cur_n"] + 1 > acc["best_n"]),
                        acc["cur_n"] + 1,
                    )
                    .when(acc["best"].isNull(), F.lit(1))
                    .otherwise(acc["best_n"])
                    .alias("best_n"),
                    v.alias("cur"),
                    F.when(acc["cur"] == v, acc["cur_n"] + 1).otherwise(F.lit(1)).alias(
                        "cur_n"
                    ),
                ),
                lambda acc: acc["best"],
            )
        else:  # NEAR: top-left source pixel
            agg = F.element_at(vals, 1)
        return F.when(n_valid == 0, nd).otherwise(agg)

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


def pyramid_delta(
    tiles_l0: DataFrame,
    prev_pyramid: DataFrame,
    touched: DataFrame,
    max_level: int,
    block_w: int = 64,
    block_h: int = 64,
    alg: str = "AVERAGE",
    nodata: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """Incremental overview maintenance: recompute ONLY the ancestor path
    of the changed level-0 blocks (consolidation_event.go's per-container
    rebuild, narrowed to the touched set — the step a landing-zone ingest
    stream needs so overviews stay fresh without full-pyramid rebuilds).

    ``touched``: (container_uri, band, block_x, block_y) of CHANGED
    level-0 blocks — dim-sized per ingest batch, broadcast everywhere.
    Each level recomputes exactly the parents of the previous level's
    affected set; their sibling children come from the UPDATED lower
    level (untouched siblings ride through from ``prev_pyramid``), so a
    single changed block costs O(max_level) block pools, not a rebuild.

    Returns ``(delta, updated)``: the freshly rebuilt overview rows
    (what an incremental writer upserts) and the full refreshed pyramid
    (level 0 verbatim + carried + rebuilt overviews).
    """
    key = ["container_uri", "band", "block_x", "block_y"]
    affected = touched.select(*key).distinct()
    updated = tiles_l0.filter(F.col("level") == 0)
    out_delta = None
    lower_full = updated
    for lvl in range(1, max_level + 1):
        parents = (
            affected.select(
                "container_uri",
                "band",
                (F.col("block_x") / 2).cast("int").alias("block_x"),
                (F.col("block_y") / 2).cast("int").alias("block_y"),
            ).distinct()
        )
        # children of the affected parents, from the UPDATED lower level:
        # broadcast semi-join on the derived parent key — no fan-out
        children = (
            lower_full.withColumn(
                "_pbx", (F.col("block_x") / 2).cast("int")
            )
            .withColumn("_pby", (F.col("block_y") / 2).cast("int"))
            .join(
                F.broadcast(
                    parents.select(
                        "container_uri",
                        "band",
                        F.col("block_x").alias("_pbx"),
                        F.col("block_y").alias("_pby"),
                    )
                ),
                ["container_uri", "band", "_pbx", "_pby"],
                "left_semi",
            )
            .drop("_pbx", "_pby")
        )
        rebuilt = build_level(children, lvl, block_w, block_h, alg, nodata)
        carried = (
            prev_pyramid.filter(F.col("level") == lvl)
            .join(F.broadcast(parents), key, "left_anti")
        )
        lower_full = carried.unionByName(rebuilt)
        updated = updated.unionByName(lower_full)
        out_delta = (
            rebuilt if out_delta is None else out_delta.unionByName(rebuilt)
        )
        affected = parents
    return out_delta, updated
