"""Reference-golden merge parity: the reference's MergeDataset family
(internal/image/image_test.go:202-387) replayed against its GDAL-produced
expected rasters (internal/image/test_data/image_warp*.tif).

The golden inputs/outputs all share one pixel grid (EPSG:32632, identical
anisotropic resolution, origins offset by exact block multiples), so the
reference's NEAR warp is the identity on pixel indices and MergeDatasets
reduces to: cast each input to the output DataMapping (nodata remap
included) and paint in order, skipping nodata — exactly C1 + the A7
mosaic.  That lets the cases run through the REAL Spark operators
(cast_expr + mosaic_blocks) and compare pixel-for-pixel with the golden.

Covered contexts:
- "one dataset"                        warp0 -> warp0
- "two datasets with the same dataformat"   warp0+warp1 -> warp3
- "two datasets with different dataformat"  warp1+warp2 -> warp3
  (warp2 carries nodata=-1; the cast to the output mapping remaps it to 0
  before the merge — the nodata-convention unification MergeDatasets does)
- "one dataset with a subset of bands"      warp01.vrt band 1 -> warp0
  (through sources/vrt.py, the dependency-free VRT mosaic reader)
The JPEG-lossy context needs a JPEG golden chain and is exercised by the
jpeg_tile_roundtrip query instead.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dataformat import cast_numpy

TEST_DATA = "/root/reference/internal/image/test_data"
BLOCK = 64

needs_ref = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference test_data not available"
)

NAN = float("nan")


def M(nd):
    return {
        "dtype": "Float32", "no_data": float(nd), "min_value": 0.0,
        "max_value": 1.0, "real_min_value": 0.0, "real_max_value": 1.0,
        "exponent": 1.0,
    }


# imagesDFormat[8..11]: Float32[0,1] nodata 0, except warp2's nodata -1
DF_ND0 = M(0.0)
DF_ND1 = M(-1.0)


def _load(i):
    from geocube_spark.sources.gtiff import read_tiff

    return read_tiff(
        open(os.path.join(TEST_DATA, f"image_warp{i}.tif"), "rb").read()
    )[0]


def _rows(img, src_df, out_df, col_off_px, t, nodata):
    """Cast an input raster to the OUTPUT mapping, place it at its aligned
    offset on the output grid, slice into square blocks."""
    px = cast_numpy(img.bands[0].astype(np.float64), src_df, out_df)
    h, w = px.shape
    rows = []
    for by in range(0, (h + BLOCK - 1) // BLOCK):
        for bx in range(0, (w + col_off_px + BLOCK - 1) // BLOCK):
            blk = np.full((BLOCK, BLOCK), nodata)
            r0, c0 = by * BLOCK, bx * BLOCK - col_off_px
            rs, cs = slice(max(r0, 0), min(r0 + BLOCK, h)), slice(
                max(c0, 0), min(c0 + BLOCK, w)
            )
            if rs.start >= rs.stop or cs.start >= cs.stop:
                continue
            blk[
                rs.start - r0 : rs.stop - r0, cs.start - c0 : cs.stop - c0
            ] = px[rs, cs]
            rows.append(
                (1, 0, bx, by, blk.ravel().tolist(), f"rec-{t}",
                 datetime(2020, 1, 1 + t))
            )
    return rows


def _merge(spark, inputs, out_w, out_h, nodata=0.0):
    """inputs: list of (img, src_dformat, col_offset_px).  Output mapping is
    DF_ND0.  Paint order = list order (later = newer record = wins)."""
    from geocube_spark.operators.mosaic import mosaic_blocks

    rows = []
    for t, (img, sdf, off) in enumerate(inputs):
        rows += _rows(img, sdf, DF_ND0, off, t, nodata)
    df = spark.createDataFrame(
        rows,
        "band int, level int, block_x int, block_y int, px array<double>,"
        " record_id string, record_datetime timestamp",
    )
    out = mosaic_blocks(df, nodata=nodata).collect()
    canvas = np.full(
        (((out_h + BLOCK - 1) // BLOCK) * BLOCK,
         ((out_w + BLOCK - 1) // BLOCK) * BLOCK),
        nodata,
    )
    for r in out:
        canvas[
            r["block_y"] * BLOCK : (r["block_y"] + 1) * BLOCK,
            r["block_x"] * BLOCK : (r["block_x"] + 1) * BLOCK,
        ] = np.asarray(r["px"]).reshape(BLOCK, BLOCK)
    return canvas[:out_h, :out_w]


@needs_ref
def test_merge_one_dataset(spark):
    w0 = _load(0)
    got = _merge(spark, [(w0, DF_ND0, 0)], 256, 201)
    assert np.array_equal(got.astype(np.float32), w0.bands[0])


@needs_ref
def test_merge_two_same_dataformat(spark):
    w0, w1, w3 = _load(0), _load(1), _load(3)
    got = _merge(spark, [(w0, DF_ND0, 0), (w1, DF_ND0, 256)], 505, 201)
    assert np.array_equal(got.astype(np.float32), w3.bands[0])


@needs_ref
def test_merge_two_different_dataformat(spark):
    # warp2 is warp0 under a -1 nodata convention; the cast to the output
    # mapping remaps -1 -> 0 and the merged result must equal warp3
    w1, w2, w3 = _load(1), _load(2), _load(3)
    assert w2.nodata == -1.0
    got = _merge(spark, [(w2, DF_ND1, 0), (w1, DF_ND0, 256)], 505, 201)
    assert np.array_equal(got.astype(np.float32), w3.bands[0])


@needs_ref
def test_vrt_band_composition_matches_sources():
    """sources/vrt.py reads the reference's 2-band VRT fixtures: each band
    is the placement of its ComplexSource rasters on the VRT grid."""
    from geocube_spark.sources.vrt import read_vrt

    v = read_vrt(os.path.join(TEST_DATA, "image_warp01.vrt"))
    assert v.bands.shape == (2, 201, 505)
    assert v.epsg == 32632 and v.nodata == 0.0
    w0, w1 = _load(0), _load(1)
    assert np.array_equal(v.bands[0][:, :256], w0.bands[0])
    assert (v.bands[0][:, 256:] == 0).all()  # unfilled -> NoDataValue
    assert np.array_equal(v.bands[1][:, 256:], w1.bands[0])
    # GeoTransform reordered to the repo's (a,b,c,d,e,f) convention
    assert v.transform[0] == pytest.approx(200.19801980198008)
    assert v.transform[2] == pytest.approx(460943.9866)


@needs_ref
def test_merge_vrt_band_subset(spark):
    """Context 'one dataset with a subset of bands' (image_test.go:302-323):
    band 1 of image_warp01.vrt merged onto warp0's 256x201 grid equals
    image_warp0 — the VRT composition + band subset path."""
    from geocube_spark.sources.vrt import read_vrt

    v = read_vrt(os.path.join(TEST_DATA, "image_warp01.vrt"), [1])
    w0 = _load(0)

    class _Img:  # adapt the VRT band to _rows' TiffImage-like shape;
        # the 256-px output grid discards the VRT's out-of-grid columns
        # (what the reference's warp window does)
        bands = v.bands[:, :, :256]

    got = _merge(spark, [(_Img, DF_ND0, 0)], 256, 201)
    assert np.array_equal(got.astype(np.float32), w0.bands[0])


@needs_ref
def test_jpeg_lossy_golden_reads_and_approximates_cast():
    """Context 'one dataset with lossy compression' (image_test.go:275-301):
    image_warp6.tif is GDAL's JPEG-compressed UInt8 output (COMPRESS=JPEG
    adds the validity ALPHA band — the withAlphaBand=true assertion of the
    consolidation handler tests).  Our pure-numpy T.81 decoder must open
    the GDAL-produced bytes, and the content must be the DataMapping cast
    of warp0 up to JPEG loss:

    - band 2 (alpha) thresholded at 128 recovers warp0's validity mask for
      >= 99.5% of pixels (the mask band is itself JPEG-smeared),
    - band 1 correlates > 0.9 with the EXACT cast on valid pixels and the
      mean absolute deviation stays inside JPEG-quality-75 territory.
    """
    from geocube_spark.sources.gtiff import read_tiff

    w0 = _load(0).bands[0].astype(np.float64)
    w6 = read_tiff(
        open(os.path.join(TEST_DATA, "image_warp6.tif"), "rb").read()
    )[0]
    assert w6.bands.shape == (2, 201, 256) and w6.bands.dtype == np.uint8
    assert w6.epsg == 32632

    df15 = {
        "dtype": "UInt8", "no_data": 0.0, "min_value": 0.0, "max_value": 255.0,
        "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
    }
    want = cast_numpy(w0, DF_ND0, df15)
    valid = w0 != 0
    mask = w6.bands[1] >= 128
    assert (mask == valid).mean() >= 0.995
    sel = valid & mask
    got = w6.bands[0][sel].astype(np.float64)
    d = np.abs(got - want[sel])
    assert d.mean() < 10.0 and d.max() < 64.0
    assert np.corrcoef(got, want[sel])[0, 1] > 0.9
