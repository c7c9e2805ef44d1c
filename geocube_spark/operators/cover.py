"""Grid cover / TileAOI (R8) — AOI -> stream of cells.

Reference: internal/utils/grid/regulargrid.go:169-261 (rasterized cover),
singlecellgrid.go:53-105, customgrid.go:70-108, dispatch abstractgrid.go:53-66,
dedup layout.go:73-113 (L3).

Spark-first: the reference rasterizes the AOI to find covered cells; at Spark
scale the same output contract (unique cell URIs; cells may overlap the AOI
boundary, all-touched semantics) falls out of integer range arithmetic on the
AOI bbox + an exact intersect filter, exploded into a DataFrame.  The custom
grid is the J5 spatial join against a cells table.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geocube_spark.functions.geometry import clip_convex, decode_wkb
from geocube_spark.functions.localdf import values_df


def cover_for_layout(
    spark: SparkSession,
    layout_row,
    aoi_rects: list[tuple[float, float, float, float]],
    cells: DataFrame | None = None,
):
    """Grid dispatch (abstractgrid.go:53-66, §2.10 plugin surface): pick the
    cover strategy from a layout row's grid_parameters.

    regular -> DataFrame of cells; singlecell -> one (ox, oy, w, h) tuple;
    custom -> J5 spatial join against the cells table.
    """
    params = dict(layout_row["grid_parameters"])
    grid = params.get("grid", "regular")
    if grid == "regular":
        spec = RegularGridSpec(
            crs=params.get("crs", "epsg:4326"),
            cell_size=int(params.get("cell_size", "256")),
            resolution=float(params.get("resolution", "1")),
            ox=float(params.get("ox", "0")),
            oy=float(params.get("oy", "0")),
        )
        return cover_regular(spark, aoi_rects, spec)
    if grid == "singlecell":
        spec = RegularGridSpec(
            crs=params.get("crs", "epsg:4326"),
            cell_size=1,
            resolution=float(params.get("resolution", "1")),
        )
        return cover_singlecell(aoi_rects, spec)
    if cells is None:
        raise ValueError(f"custom grid {grid!r} needs a cells table")
    cell_df = cells.filter(F.col("grid") == grid)
    if "subgrid" in params or "resolution" in params:
        # newCustomGrid (customgrid.go:44-54): 'resolution' alone implies
        # subgrid=singlecell; either way the cover recurses per cell
        return cover_custom_subgrid(aoi_rects, cell_df, params)
    return cover_custom(aoi_rects, cell_df)


@dataclass
class RegularGridSpec:
    """grid_parameters of a 'regular' layout (FIXTURES.md layouts)."""

    crs: str
    cell_size: int  # pixels per cell edge
    resolution: float  # CRS units per pixel
    ox: float = 0.0
    oy: float = 0.0

    @property
    def cell_span(self) -> float:
        return self.cell_size * self.resolution


def cover_regular(
    spark: SparkSession,
    aoi_rects: list[tuple[float, float, float, float]],
    spec: RegularGridSpec,
) -> DataFrame:
    """Regular-grid cover: candidate (i,j) ranges from each rect's bbox,
    exploded distributively, exact-filtered, deduped by cell URI (L3).

    The candidate enumeration is a DataFrame sequence-explode, so a huge AOI
    never materializes on the driver (contrast the reference's in-memory
    rasterization bounded by RAM/10 — svc/service.go:515).
    """
    # LocalRelation literal (no Python-RDD bridge); for very large AOI lists
    # a repartition after the explode spreads the work
    rects_df = values_df(
        spark,
        [(i,) + tuple(map(float, r)) for i, r in enumerate(aoi_rects)],
        ["rect_id", "xmin", "ymin", "xmax", "ymax"],
    )
    return cover_regular_df(rects_df, spec)


def cover_regular_df(rects_df: DataFrame, spec: RegularGridSpec) -> DataFrame:
    """Regular-grid cover over a DataFrame of AOI rects
    (rect_id, xmin, ymin, xmax, ymax) — the lazy core of
    :func:`cover_regular`.  Taking a DataFrame keeps callers whose extent
    is itself a Spark aggregate (e.g. consolidation planning over the
    job's locked datasets) a SINGLE lazy plan: no driver round-trip
    between the extent reduction and the cell explode."""
    span = spec.cell_span
    i0 = F.floor((F.col("xmin") - spec.ox) / span).cast("long")
    i1 = F.ceil((F.col("xmax") - spec.ox) / span).cast("long") - 1
    j0 = F.floor((F.col("ymin") - spec.oy) / span).cast("long")
    j1 = F.ceil((F.col("ymax") - spec.oy) / span).cast("long") - 1
    cells = (
        rects_df.select(
            "rect_id",
            "xmin",
            "ymin",
            "xmax",
            "ymax",
            F.explode(F.sequence(i0, F.greatest(i1, i0))).alias("i"),
            j0.alias("j0"),
            j1.alias("j1"),
        )
        .select(
            "rect_id",
            "xmin",
            "ymin",
            "xmax",
            "ymax",
            "i",
            F.explode(F.sequence(F.col("j0"), F.greatest(F.col("j1"), F.col("j0")))).alias("j"),
        )
        .withColumn("cell_xmin", spec.ox + F.col("i") * span)
        .withColumn("cell_ymin", spec.oy + F.col("j") * span)
        .withColumn("cell_xmax", F.col("cell_xmin") + span)
        .withColumn("cell_ymax", F.col("cell_ymin") + span)
        # exact phase: cell rect ∩ aoi rect non-empty (all-touched: >= on edges)
        .filter(
            (F.col("cell_xmin") < F.col("xmax"))
            & (F.col("cell_xmax") > F.col("xmin"))
            & (F.col("cell_ymin") < F.col("ymax"))
            & (F.col("cell_ymax") > F.col("ymin"))
        )
    )
    return (
        cells.select(
            F.concat_ws("/", F.lit("cell"), F.col("i"), F.col("j")).alias("cell_uri"),
            "i",
            "j",
            "cell_xmin",
            "cell_ymin",
            "cell_xmax",
            "cell_ymax",
        )
        .dropDuplicates(["cell_uri"])  # L3 dedup (layout.go:82-101)
    )


def cover_regular_wkb(
    spark: SparkSession,
    aoi_wkb: bytes,
    spec: RegularGridSpec,
) -> DataFrame:
    """Regular-grid cover of a GENERAL polygon AOI (concave, holed,
    multi-part — e.g. a country outline like the reference's France
    test AOI, internal/utils/grid/regulargrid_test.go).

    Two-phase like everything spatial here: candidate cells enumerate from
    the polygon's bbox exactly as the rect cover does (distributed
    sequence-explode), then an Arrow-batched exact filter keeps only cells
    whose rect has positive-area overlap with the polygon — the declarative
    analogue of the reference's rasterized cover, minus the driver-RAM
    bound (regulargrid.go:169-261, svc/service.go:515)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    from geocube_spark.functions.geometry import rect_clip_area_wkb, wkb_bounds

    bounds = wkb_bounds(aoi_wkb)
    candidates = cover_regular(spark, [bounds], spec)
    wkb = bytes(aoi_wkb)

    @pandas_udf(BooleanType())
    def cell_hits_polygon(
        x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                rect_clip_area_wkb(wkb, (a, b, c, d)) > 1e-12
                for a, b, c, d in zip(x0, y0, x1, y1)
            ],
            index=x0.index,
        )

    return candidates.filter(
        cell_hits_polygon(
            F.col("cell_xmin"), F.col("cell_ymin"), F.col("cell_xmax"), F.col("cell_ymax")
        )
    )


def cover_singlecell(
    aoi_rects: list[tuple[float, float, float, float]], spec: RegularGridSpec
) -> tuple[float, float, int, int]:
    """Singlecell grid (singlecellgrid.go:52-86): the AOI bbox becomes ONE
    cell.  Reference semantics exactly: origin = the RAW TOP-LEFT bound
    (min x, MAX y — no snapping; the pix->CRS affine is
    Translation(ox, oy) * Scale(res, -res)), sizes = round(extent/res)
    half-away-from-zero (Go math.Round).  Ported reference test:
    tests/test_cover_parity.py::test_singlecell_reference_cell."""
    import math

    xmin = min(r[0] for r in aoi_rects)
    ymin = min(r[1] for r in aoi_rects)
    xmax = max(r[2] for r in aoi_rects)
    ymax = max(r[3] for r in aoi_rects)
    res = abs(spec.resolution)
    w = int(math.floor(abs(xmax - xmin) / res + 0.5))
    h = int(math.floor(abs(ymax - ymin) / res + 0.5))
    return xmin, ymax, w, h


def cover_custom_subgrid(
    aoi_rects: list[tuple[float, float, float, float]],
    cells: DataFrame,
    parameters: dict[str, str],
) -> DataFrame:
    """CustomGrid.Covers composition (customgrid.go:70-108): the J5 cell
    intersections each get a SUBGRID built in the cell's OWN CRS, and the
    per-cell intersection is covered with it, emitting ``cellID/<subURI>``
    tiles.

    Parameter semantics follow newCustomGrid (customgrid.go:44-54): either
    ``subgrid`` names the subgrid kind, or ``resolution`` alone implies
    ``subgrid=singlecell``.  Subgrid kinds:

    - ``singlecell`` (singlecellgrid.go:52-86): the intersection's bbox in
      the cell CRS becomes ONE tile, URI ``cellID/originX/originY/w/h``
      with origin = projected top-left and w/h = round(extent/res)
      half-away-from-zero.  The reference projects only the RING VERTICES
      (FlatCoords, no densification) before taking bounds — for the
      rectilinear intersections produced by cover_custom that is exactly
      the 4 bbox corners, which is what we project.
    - ``regular`` (regulargrid.go:169-261): integer range arithmetic over
      the projected intersection bbox in the cell CRS, URI ``cellID/i/j``
      with the reference's orientation (pixToCRS = Translation(ox,oy) *
      Scale(res,-res): row j counts y-DOWN from oy).

    Scale: the whole composition is one DataFrame plan — J5 join ->
    Arrow-batched per-srid corner projection -> sequence-explode — so a
    worldwide AOI against a million-cell grid never funnels through the
    driver.  Projected bounds are rounded to 1e-3 CRS units (mm) on both
    the engine and oracle sides so floor/ceil boundaries sit ~6 orders of
    magnitude above the ~3 nm numpy-vs-SQL transform noise (same trick as
    the warp oracles' binary-exact grid constants).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    params = dict(parameters)
    subgrid = params.get("subgrid")
    if subgrid is None:
        if "resolution" not in params:
            raise ValueError(
                "customGrid: need either parameters 'subgrid' or 'resolution' "
                "(customgrid.go:44-50)"
            )
        subgrid = "singlecell"
    res = abs(float(params["resolution"]))

    inter = cover_custom(aoi_rects, cells)

    @pandas_udf(ArrayType(DoubleType()))
    def project_bounds(srid: pd.Series, bounds: pd.Series) -> pd.Series:
        import numpy as np

        from geocube_spark.functions.crs import transform_points

        n = len(srid)
        out = [None] * n
        sr = srid.to_numpy()
        bb = np.array([list(b) for b in bounds], dtype=np.float64).reshape(n, 4)
        for s in np.unique(sr):
            idx = np.nonzero(sr == s)[0]
            x0, y0, x1, y1 = (bb[idx, k] for k in range(4))
            # the 4 corners of each rectilinear intersection
            xs = np.concatenate([x0, x1, x1, x0])
            ys = np.concatenate([y0, y0, y1, y1])
            px, py = transform_points(4326, int(s), xs, ys)
            px = px.reshape(4, len(idx))
            py = py.reshape(4, len(idx))
            # mm quantum: the numpy-vs-SQL transform twins agree to ~3 nm,
            # so a 1e-3 rounding boundary is ~6 orders of magnitude away
            # from the noise (same reasoning as the warp oracles' 1024 m
            # grid constants)
            bxmin = np.round(px.min(axis=0), 3)
            bymin = np.round(py.min(axis=0), 3)
            bxmax = np.round(px.max(axis=0), 3)
            bymax = np.round(py.max(axis=0), 3)
            for k, i in enumerate(idx):
                out[i] = [float(bxmin[k]), float(bymin[k]), float(bxmax[k]), float(bymax[k])]
        return pd.Series(out)

    proj = (
        inter.withColumn("crs_bounds", project_bounds(F.col("srid"), F.col("isect_bounds")))
        .withColumn("bx0", F.element_at("crs_bounds", 1))
        .withColumn("by0", F.element_at("crs_bounds", 2))
        .withColumn("bx1", F.element_at("crs_bounds", 3))
        .withColumn("by1", F.element_at("crs_bounds", 4))
    )

    if subgrid == "singlecell":
        # width/height = round(extent/res) half away from zero (Go math.Round)
        w = F.floor(F.abs(F.col("bx1") - F.col("bx0")) / res + 0.5).cast("long")
        h = F.floor(F.abs(F.col("by1") - F.col("by0")) / res + 0.5).cast("long")
        return proj.select(
            F.col("id").alias("cell_id"),
            "srid",
            F.concat_ws(
                "/",
                F.col("id"),
                F.format_string("%.3f", F.col("bx0")),
                F.format_string("%.3f", F.col("by1")),
                w.cast("string"),
                h.cast("string"),
            ).alias("cell_uri"),
            F.col("bx0").alias("origin_x"),
            F.col("by1").alias("origin_y"),
            w.alias("width"),
            h.alias("height"),
        )

    if subgrid == "regular":
        cell_size = int(params.get("cell_size", "256"))
        ox = float(params.get("ox", "0"))
        oy = float(params.get("oy", "0"))
        span = cell_size * res
        # reference orientation: i counts x-up from ox, row j counts y-DOWN
        # from oy (regulargrid.go:120-121 pixToCRS Scale(res,-res))
        i0 = F.floor((F.col("bx0") - ox) / span).cast("long")
        i1 = F.ceil((F.col("bx1") - ox) / span).cast("long") - 1
        j0 = F.floor((oy - F.col("by1")) / span).cast("long")
        j1 = F.ceil((oy - F.col("by0")) / span).cast("long") - 1
        tiles = proj.select(
            F.col("id").alias("cell_id"),
            "srid",
            "bx0",
            "by0",
            "bx1",
            "by1",
            F.explode(F.sequence(i0, F.greatest(i1, i0))).alias("i"),
            j0.alias("j0"),
            j1.alias("j1"),
        ).select(
            "cell_id",
            "srid",
            "bx0",
            "by0",
            "bx1",
            "by1",
            "i",
            F.explode(F.sequence(F.col("j0"), F.greatest(F.col("j1"), F.col("j0")))).alias("j"),
        )
        # exact phase: subcell rect ∩ projected intersection bbox non-empty
        cxmin = ox + F.col("i") * span
        cymax = oy - F.col("j") * span
        tiles = tiles.filter(
            (cxmin < F.col("bx1"))
            & (cxmin + span > F.col("bx0"))
            & (cymax > F.col("by0"))
            & (cymax - span < F.col("by1"))
        )
        return (
            tiles.select(
                F.concat_ws("/", F.col("cell_id"), F.col("i"), F.col("j")).alias("cell_uri"),
                "cell_id",
                "srid",
                "i",
                "j",
                cxmin.alias("tile_xmin"),
                (cymax - span).alias("tile_ymin"),
                (cxmin + span).alias("tile_xmax"),
                cymax.alias("tile_ymax"),
            )
            .dropDuplicates(["cell_uri"])  # L3 dedup (layout.go:82-101)
        )

    raise ValueError(f"customGrid: unknown subgrid kind {subgrid!r}")


def cover_custom(
    aoi_rects: list[tuple[float, float, float, float]],
    cells: DataFrame,
) -> DataFrame:
    """Custom grid (J5, pg_grids.go:113-151): spatial join AOI × cells table
    returning the intersection geometry per cell; empty/degenerate
    intersections dropped (dimension filter pg_grids.go:126).

    Two-phase: bbox prune (pushdown-friendly) then exact convex clip UDF.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    spark = cells.sparkSession
    rects_df = values_df(
        spark,
        [(i,) + tuple(map(float, r)) for i, r in enumerate(aoi_rects)],
        ["rect_id", "q_xmin", "q_ymin", "q_xmax", "q_ymax"],
    )
    # size-adaptive bbox prune: a tiny query-rect list broadcasts (BNLJ by
    # design), a huge one switches to the grid-bucketed equi-join — only
    # bbox survivors reach the exact clip UDF either way (O3)
    from geocube_spark.operators.spatialjoin import adaptive_bbox_join

    pruned = adaptive_bbox_join(
        cells,
        rects_df,
        big_box=(
            F.col("bbox.xmin"),
            F.col("bbox.ymin"),
            F.col("bbox.xmax"),
            F.col("bbox.ymax"),
        ),
        q_box=(
            F.col("q_xmin"),
            F.col("q_ymin"),
            F.col("q_xmax"),
            F.col("q_ymax"),
        ),
        closed=True,
    )

    @pandas_udf(ArrayType(DoubleType()))
    def clip_bounds(
        wkb: pd.Series, qxmin: pd.Series, qymin: pd.Series, qxmax: pd.Series, qymax: pd.Series
    ) -> pd.Series:
        from geocube_spark.functions.geometry import _ring_area, clip_ring_rect, decode_wkb_polygons

        out = []
        for b, x0, y0, x1, y1 in zip(wkb, qxmin, qymin, qxmax, qymax):
            # union of the clipped bboxes over ALL polygons of a
            # MultiPolygon — stopping at the first overlapping part would
            # understate the intersection extent for multi-part geometries
            acc: list[float] | None = None
            rect = (x0, y0, x1, y1)
            for rings in decode_wkb_polygons(bytes(b)):
                ext = clip_ring_rect(rings[0], rect)
                if len(ext) < 3:
                    continue
                area = abs(_ring_area(ext))
                for hole in rings[1:]:
                    h = clip_ring_rect(hole, rect)
                    if len(h) >= 3:
                        area -= abs(_ring_area(h))
                if area > 1e-12:
                    xs, ys = ext[:, 0], ext[:, 1]
                    part = [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]
                    if acc is None:
                        acc = part
                    else:
                        acc = [
                            min(acc[0], part[0]),
                            min(acc[1], part[1]),
                            max(acc[2], part[2]),
                            max(acc[3], part[3]),
                        ]
            out.append(acc)
        return pd.Series(out)

    clipped = pruned.withColumn(
        "isect_bounds",
        clip_bounds(
            F.col("geom_wkb"), F.col("q_xmin"), F.col("q_ymin"), F.col("q_xmax"), F.col("q_ymax")
        ),
    ).filter(F.col("isect_bounds").isNotNull())
    return clipped.select(
        "id", "grid", "crs", "srid", "isect_bounds"
    ).dropDuplicates(["id"])
