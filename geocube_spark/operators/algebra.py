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


def pansharpen_brovey(
    tiles: DataFrame,
    r_col: str,
    g_col: str,
    b_col: str,
    pan_col: str,
    out_prefix: str = "sharp_",
) -> DataFrame:
    """Brovey-transform pansharpening (the classical ratio method, public
    remote-sensing algebra): each multispectral band is scaled by the
    ratio of the high-resolution panchromatic band to the MS intensity,

        out_i = ms_i * pan / ((r + g + b) / 3)

    Pure nested ``zip_with`` — JVM codegen end-to-end, no UDF, no shuffle;
    composes with the tile table's (level, block) partition pruning, so at
    100 TB it runs at scan speed like every other map-algebra op.  The
    bands must be block-aligned arrays (the tile-table invariant); a zero
    intensity yields 0 (nodata-safe), matching the GDAL pansharpen
    convention of guarding the ratio.
    """
    r, g, b, p = (F.col(c) for c in (r_col, g_col, b_col, pan_col))
    intensity = F.zip_with(r, F.zip_with(g, b, lambda x, y: x + y), lambda x, s: (x + s) / 3.0)
    ratio = F.zip_with(
        p,
        intensity,
        lambda pan, i: F.when(i != 0, pan / i).otherwise(F.lit(0.0)),
    )
    out = tiles.withColumn("_ratio", ratio)
    for c in (r_col, g_col, b_col):
        out = out.withColumn(
            f"{out_prefix}{c}",
            F.zip_with(F.col(c), F.col("_ratio"), lambda v, q: v * q),
        )
    return out.drop("_ratio")


def histogram_equalize(
    tiles: DataFrame,
    px_col: str = "px",
    bins: int = 256,
    vmin: float = 0.0,
    vmax: float = 256.0,
    out_col: str = "px_eq",
) -> DataFrame:
    """Global histogram equalization (the classical contrast-stretch:
    remap each pixel through the corpus-wide value CDF so the output
    histogram is ~uniform):

        eq(v) = round((cdf(bin(v)) - cdf_min) / (N - cdf_min) * (bins-1))

    with cdf_min = the CDF at the first non-empty bin (Gonzalez & Woods'
    standard formulation); a constant image maps to 0.

    Scale shape: ONE pass builds the histogram (explode + groupBy(bin)
    with map-side partial combine — the shuffle is O(partitions·bins),
    never the pixels); the CDF is a bins-row window; the lookup table
    rides back as a 1-row broadcast array and the remap is a pure
    ``transform`` at scan speed.  All arithmetic is integer counts, so
    any engine reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    width = (float(vmax) - float(vmin)) / bins

    def bin_of(v):
        return F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0), F.floor((v - F.lit(float(vmin))) / F.lit(width))),
        ).cast("int")

    hist = (
        tiles.select(F.explode(px_col).alias("v"))
        .select(bin_of(F.col("v")).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    all_w = Window.partitionBy()
    lut_rows = (
        hist.withColumn("cdf", F.sum("n").over(w))
        .withColumn("n_total", F.sum("n").over(all_w))
        .withColumn("cdf_min", F.min("cdf").over(all_w))
        .select(
            "bin",
            F.when(
                F.col("n_total") > F.col("cdf_min"),
                F.round(
                    (F.col("cdf") - F.col("cdf_min"))
                    / (F.col("n_total") - F.col("cdf_min"))
                    * (bins - 1)
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("remap"),
        )
    )
    # dense LUT: empty bins inherit the previous non-empty bin's remap is
    # unnecessary — no pixel maps to an empty bin by construction, so a
    # sparse (bin -> remap) array with sentinel 0 gaps is sufficient
    lut = lut_rows.agg(
        F.map_from_arrays(
            F.collect_list("bin"), F.collect_list("remap")
        ).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(bins - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)),
        ).alias("lut")
    )
    return tiles.crossJoin(F.broadcast(lut)).withColumn(
        out_col,
        F.transform(F.col(px_col), lambda v: F.element_at(F.col("lut"), bin_of(v) + 1)),
    ).drop("lut")


def histogram_match(
    src_tiles: DataFrame,
    ref_tiles: DataFrame,
    px_col: str = "px",
    src_bins: int = 256,
    ref_bins: int = 256,
    out_col: str = "px_matched",
) -> DataFrame:
    """Histogram matching (specification): remap ``src`` pixels so their
    value distribution follows the reference's — the standard radiometric
    normalization before mosaicking scenes from different acquisitions
    (Gonzalez & Woods §3.3.2).  Values are assumed integer-valued in
    [0, bins); the output pixel is the matched REFERENCE bin index:

        match(b) = min{ u : CDF_ref(u) >= CDF_src(b) }

    All comparisons cross-multiply the raw integer CDF counts
    (cdf_ref * N_src >= cdf_src * N_ref), so any engine reproduces the
    LUT bit-for-bit — no floating-point CDF normalization.

    Scale shape: two histogram passes (explode + groupBy(bin), map-side
    combined — the shuffles are O(partitions * bins), never the pixels);
    the CDF-inverse lookup is built WITHOUT an inequality join by
    interleaving both CDF tables on the common integer key
    cdf * N_other and taking a reverse running min over the ref rows — a
    (src_bins + ref_bins)-row window.  The LUT rides back as a 1-row
    broadcast array and the remap is a pure ``transform`` at scan speed.
    """
    from pyspark.sql import Window

    def hist(tiles: DataFrame) -> DataFrame:
        return (
            tiles.select(F.explode(px_col).alias("v"))
            .select(F.col("v").cast("int").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    cw = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    hs = hist(src_tiles).withColumn("cdf", F.sum("n").over(cw)).withColumn(
        "nt", F.sum("n").over(tot)
    )
    hr = hist(ref_tiles).withColumn("cdf", F.sum("n").over(cw)).withColumn(
        "nt", F.sum("n").over(tot)
    )
    # shared integer axis: src keys = cdf_s * N_r, ref keys = cdf_r * N_s.
    # At equal key the ref row must fall in the src row's FOLLOWING frame
    # (CDF_ref == CDF_src counts as matched), so ref sorts after src.
    nr = hr.agg(F.max("nt").alias("x"))
    ns = hs.agg(F.max("nt").alias("x"))
    s_rows = hs.crossJoin(F.broadcast(nr)).select(
        F.col("bin").alias("src_bin"),
        F.lit(None).cast("long").alias("ref_bin"),
        (F.col("cdf") * F.col("x")).alias("key"),
        F.lit(0).alias("is_ref"),
    )
    r_rows = hr.crossJoin(F.broadcast(ns)).select(
        F.lit(None).cast("long").alias("src_bin"),
        F.col("bin").alias("ref_bin"),
        (F.col("cdf") * F.col("x")).alias("key"),
        F.lit(1).alias("is_ref"),
    )
    fw = Window.orderBy("key", "is_ref").rowsBetween(0, Window.unboundedFollowing)
    lut_rows = (
        s_rows.unionByName(r_rows)
        .withColumn("matched", F.min("ref_bin").over(fw))
        .filter(F.col("src_bin").isNotNull())
        .select("src_bin", F.col("matched").cast("double").alias("remap"))
    )
    lut = lut_rows.agg(
        F.map_from_arrays(
            F.collect_list("src_bin"), F.collect_list("remap")
        ).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(src_bins - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
        ).alias("lut")
    )
    return (
        src_tiles.crossJoin(F.broadcast(lut))
        .withColumn(
            out_col,
            F.transform(
                F.col(px_col),
                lambda v: F.element_at(F.col("lut"), v.cast("int") + 1),
            ),
        )
        .drop("lut")
    )


# Landsat C2-style QA bit semantics (the bits every cloud-masking pipeline
# reads); pixels with any of the three set are non-clear.
QA_BIT_CLOUD = 3
QA_BIT_SHADOW = 4
QA_BIT_SNOW = 5


def qa_mask_summary(
    tiles: DataFrame,
    qa_col: str = "qa",
    px_col: str = "px",
    group_cols: tuple[str, ...] = ("block_x", "block_y"),
) -> DataFrame:
    """Per-block QA accounting over aligned (px, qa) arrays: flag counts,
    clear-pixel count, and the clear-masked value sum — the cloud-mask
    reduction every composite/mosaic pipeline runs before aggregation.

    Pure higher-order functions (filter/zip_with/aggregate) over the two
    arrays — JVM codegen, no UDF, no shuffle beyond the final per-block
    groupBy; integer bit tests make any engine agree exactly."""

    def bit_count(bit: int) -> Column:
        return F.size(
            F.filter(F.col(qa_col), lambda q: q.bitwiseAND(F.lit(1 << bit)) != 0)
        ).cast("long")

    any_mask = (1 << QA_BIT_CLOUD) | (1 << QA_BIT_SHADOW) | (1 << QA_BIT_SNOW)
    clear_cnt = F.size(
        F.filter(F.col(qa_col), lambda q: q.bitwiseAND(F.lit(any_mask)) == 0)
    ).cast("long")
    clear_sum = F.aggregate(
        F.zip_with(
            F.col(px_col),
            F.col(qa_col),
            lambda v, q: F.when(q.bitwiseAND(F.lit(any_mask)) == 0, v).otherwise(
                F.lit(0.0)
            ),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    per_tile = tiles.select(
        *group_cols,
        F.size(F.col(px_col)).cast("long").alias("n_px"),
        bit_count(QA_BIT_CLOUD).alias("n_cloud"),
        bit_count(QA_BIT_SHADOW).alias("n_shadow"),
        bit_count(QA_BIT_SNOW).alias("n_snow"),
        clear_cnt.alias("n_clear"),
        clear_sum.alias("clear_sum"),
    )
    return (
        per_tile.groupBy(*group_cols)
        .agg(
            F.sum("n_px").cast("long").alias("n_px"),
            F.sum("n_cloud").cast("long").alias("n_cloud"),
            F.sum("n_shadow").cast("long").alias("n_shadow"),
            F.sum("n_snow").cast("long").alias("n_snow"),
            F.sum("n_clear").cast("long").alias("n_clear"),
            F.sum("clear_sum").cast("long").alias("clear_sum"),
        )
        .orderBy(*group_cols)
    )
