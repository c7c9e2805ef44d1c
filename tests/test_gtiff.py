"""Byte-level (Geo)TIFF sink/source: write_tiff/read_tiff round-trips across
codecs (none/deflate/LZW ± horizontal predictor), the MuCOG consolidation
builder, the overview-transform scaling, and external-COG ingest e2e
through validate_datasets_against_tiles (S4/S5/S6 parity:
internal/image/image.go:260-450, internal/image/cog.go, mucog.go)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.sources.gtiff import (
    RasterImage,
    header_size,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    read_tiff,
    write_tiff,
)
from geocube_spark.sources.ingest import (
    ingest_tiff_files,
    tiff_bytes_to_tile_rows,
    validate_datasets_against_tiles,
)


def _img(seed=0, dtype="uint16", w=70, h=50, nodata=None, epsg=32631, lvl=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        arr = rng.random((h, w)).astype(dtype)
    else:
        arr = rng.integers(0, np.iinfo(dtype).max, (h, w)).astype(dtype)
    return RasterImage(
        bands=arr,
        transform=(10.0, 0.0, 500000.0, 0.0, -10.0, 4500000.0),
        epsg=epsg,
        nodata=nodata,
        subfile_type=0 if lvl == 0 else 1,
    )


class TestLZWCodec:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(7)
        for n in (0, 1, 5, 256, 4096, 70000):
            raw = rng.integers(0, 256, n).astype("uint8").tobytes()
            assert lzw_decode(lzw_encode(raw)) == raw

    def test_roundtrip_compressible(self):
        raw = b"abcabcabcabc" * 5000 + b"\x00" * 10000
        enc = lzw_encode(raw)
        assert lzw_decode(enc) == raw
        assert len(enc) < len(raw) // 3  # actually compresses

    def test_table_reset_path(self):
        # > 4094 distinct phrases forces the encoder's ClearCode reset;
        # random bytes mint a phrase roughly every other byte, so 48k
        # bytes still crosses the reset several times (was 300k / 36 s of
        # pure-Python codec time — the reset path needs crossings, not
        # volume)
        rng = np.random.default_rng(11)
        raw = rng.integers(0, 256, 48_000).astype("uint8").tobytes()
        assert lzw_decode(lzw_encode(raw)) == raw

    def test_missing_leading_clear_tolerated(self):
        # a stream that starts with a literal code instead of ClearCode
        # (some writers skip it): 9-bit code 65 then EOI
        import struct

        bits = (65 << (32 - 9)) | (257 << (32 - 18))
        data = struct.pack(">I", bits)
        assert lzw_decode(data) == b"A"


class TestTiffRoundTrip:
    @pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32", "float64"])
    def test_codec_dtype_roundtrip(self, compression, dtype):
        img = _img(dtype=dtype, nodata=0.0 if dtype == "float64" else None)
        data = write_tiff([img], tile_size=(32, 32), compression=compression)
        [out] = read_tiff(data)
        np.testing.assert_array_equal(out.bands, img.bands)
        assert out.transform == img.transform
        assert out.epsg == 32631

    @pytest.mark.parametrize("compression", ["deflate", "lzw"])
    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "uint32"])
    def test_predictor_roundtrip(self, compression, dtype):
        img = _img(dtype=dtype)
        data = write_tiff(
            [img], tile_size=(32, 32), compression=compression, predictor=2
        )
        [out] = read_tiff(data)
        np.testing.assert_array_equal(out.bands, img.bands)

    def test_predictor_helps_on_smooth_data(self):
        # a gradient is the predictor's home turf: LZW+pred2 beats plain LZW
        grad = np.add.outer(
            np.arange(256, dtype=np.uint16), np.arange(256, dtype=np.uint16)
        )
        img = RasterImage(bands=grad, transform=(1.0, 0, 0, 0, -1.0, 0))
        plain = write_tiff([img], compression="lzw")
        pred = write_tiff([img], compression="lzw", predictor=2)
        assert len(pred) < len(plain)

    def test_predictor_rejects_float(self):
        img = _img(dtype="float64")
        with pytest.raises(ValueError, match="integer"):
            write_tiff([img], compression="lzw", predictor=2)

    def test_multiband_planar(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (3, 40, 60)).astype("uint8")
        img = RasterImage(bands=arr, transform=(10.0, 0, 0, 0, -10.0, 0))
        data = write_tiff([img], tile_size=(32, 32), compression="lzw", predictor=2)
        [out] = read_tiff(data)
        np.testing.assert_array_equal(out.bands, arr)

    def test_cog_header_first(self):
        imgs = [_img(seed=i) for i in range(3)]
        data = write_tiff(imgs, tile_size=(32, 32), compression="lzw")
        hs = header_size(data)
        assert 0 < hs < len(data) // 4
        outs = read_tiff(data)
        assert len(outs) == 3


class TestOverviewTransformScale:
    def _tiles(self, spark, levels, n=8):
        """Tile rows carrying the LEVEL-0 pix_to_crs on every row, the way
        pyramid.build_level propagates it."""
        rows = []
        for lvl in levels:
            rows.append(
                {
                    "out_container_uri": "c.tif",
                    "band": 1,
                    "level": lvl,
                    "block_x": 0,
                    "block_y": 0,
                    "px": [float(i) for i in range(n * n)],
                    "pix_to_crs": {
                        "a": 10.0, "b": 0.0, "c": 100.0,
                        "d": 0.0, "e": -10.0, "f": 200.0,
                    },
                    "crs_srid": 32631,
                }
            )
        return spark.createDataFrame(rows)

    def test_full_pyramid_scales_by_2_pow_level(self, spark):
        from geocube_spark.operators.consolidation import consolidate_to_mucog

        out = consolidate_to_mucog(self._tiles(spark, [0, 1, 2])).collect()
        assert len(out) == 1
        images = read_tiff(bytes(out[0]["tiff"]))
        assert [im.subfile_type for im in images] == [0, 1, 1]
        assert [im.transform[0] for im in images] == [10.0, 20.0, 40.0]

    def test_overview_only_container_not_underscaled(self, spark):
        """Regression (r4 ADVICE): a container holding only levels >= 1 must
        still scale each transform by 2**lvl relative to the level-0 base —
        not by 2**(lvl - min_lvl)."""
        from geocube_spark.operators.consolidation import consolidate_to_mucog

        out = consolidate_to_mucog(self._tiles(spark, [1, 2])).collect()
        images = read_tiff(bytes(out[0]["tiff"]))
        assert sorted(im.transform[0] for im in images) == [20.0, 40.0]


class TestAlphaMaskBand:
    """Reference parity: consolidation writes an explicit alpha band for
    nodata masking (handler_consolidation_test.go:16-178, 'bands incl.
    alpha') — mask must equal the validity of the nodata semantics."""

    def test_writer_reader_extrasamples_roundtrip(self):
        arr = np.array(
            [[[5, 0], [7, 9]], [[255, 0], [255, 255]]], dtype="uint8"
        )
        img = RasterImage(
            bands=arr, transform=(10.0, 0, 0, 0, -10.0, 0), alpha=True
        )
        [out] = read_tiff(write_tiff([img], tile_size=(2, 2), compression="none"))
        assert out.alpha is True
        np.testing.assert_array_equal(out.bands, arr)
        # a plain image carries no ExtraSamples
        [plain] = read_tiff(
            write_tiff(
                [RasterImage(bands=arr, transform=(10.0, 0, 0, 0, -10.0, 0))],
                tile_size=(2, 2),
            )
        )
        assert plain.alpha is False

    def test_consolidated_alpha_equals_validity(self, spark):
        from geocube_spark.operators.consolidation import consolidate_to_mucog

        n = 8
        px = [float(i % 5) for i in range(n * n)]  # zeros = nodata holes
        tiles = spark.createDataFrame(
            [
                {
                    "out_container_uri": "c.tif",
                    "band": 1,
                    "level": 0,
                    "block_x": 0,
                    "block_y": 0,
                    "px": px,
                    "pix_to_crs": {
                        "a": 10.0, "b": 0.0, "c": 100.0,
                        "d": 0.0, "e": -10.0, "f": 200.0,
                    },
                    "crs_srid": 32631,
                }
            ]
        )
        out = consolidate_to_mucog(
            tiles, dtype="uint8", nodata=0.0, alpha_band=True
        ).collect()
        [img] = read_tiff(bytes(out[0]["tiff"]))
        assert img.alpha is True
        assert img.bands.shape[0] == 2  # data + alpha
        data, alpha = img.bands[0], img.bands[1]
        want = np.array(px, dtype="uint8").reshape(n, n)
        np.testing.assert_array_equal(data, want)
        # mask == validity of the nodata semantics, opaque = dtype max
        np.testing.assert_array_equal(alpha != 0, want != 0)
        assert set(np.unique(alpha)) <= {0, 255}

    def test_float_nan_nodata_alpha(self, spark):
        from geocube_spark.operators.consolidation import consolidate_to_mucog

        n = 4
        px = [float("nan") if i % 3 == 0 else float(i) for i in range(n * n)]
        tiles = spark.createDataFrame(
            [
                {
                    "out_container_uri": "f.tif",
                    "band": 1,
                    "level": 0,
                    "block_x": 0,
                    "block_y": 0,
                    "px": px,
                    "pix_to_crs": {
                        "a": 1.0, "b": 0.0, "c": 0.0,
                        "d": 0.0, "e": -1.0, "f": 0.0,
                    },
                    "crs_srid": 4326,
                }
            ]
        )
        out = consolidate_to_mucog(
            tiles, dtype="float64", nodata=float("nan"), alpha_band=True
        ).collect()
        [img] = read_tiff(bytes(out[0]["tiff"]))
        alpha = img.bands[1]
        valid = ~np.isnan(np.array(px).reshape(n, n))
        np.testing.assert_array_equal(alpha == 255.0, valid)


class TestExternalCOGIngest:
    def test_tile_rows_roundtrip(self):
        img = _img(dtype="uint16", w=64, h=64)
        data = write_tiff([img], tile_size=(32, 32), compression="lzw", predictor=2)
        rows = tiff_bytes_to_tile_rows(data, "ext://cog1.tif")
        assert len(rows) == 4  # 2×2 blocks, 1 band, level 0
        assert {r["level"] for r in rows} == {0}
        assert {r["crs_srid"] for r in rows} == {32631}
        blk = next(r for r in rows if (r["block_x"], r["block_y"]) == (1, 0))
        np.testing.assert_array_equal(
            np.array(blk["px"]).reshape(32, 32),
            img.bands[0][0:32, 32:64].astype("float64"),
        )
        assert blk["pix_to_crs"]["a"] == 10.0

    def test_overview_levels_assigned(self):
        full = _img(dtype="uint16", w=64, h=64)
        ovr = RasterImage(
            bands=full.bands[0][::2, ::2].copy(),
            transform=(20.0, 0.0, 500000.0, 0.0, -20.0, 4500000.0),
            epsg=32631,
            subfile_type=1,
        )
        data = write_tiff([full, ovr], tile_size=(32, 32), compression="deflate")
        rows = tiff_bytes_to_tile_rows(data, "ext://cog2.tif")
        assert {r["level"] for r in rows} == {0, 1}

    def test_ingest_e2e_validates_clean(self, spark, tmp_path):
        """External LZW+predictor COG → binaryFile → tile rows → S4
        validation against a matching dataset row: zero problems."""
        rng = np.random.default_rng(5)
        arr = rng.integers(1, 200, (64, 64)).astype("uint16")
        img = RasterImage(
            bands=arr,
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 640.0),
            epsg=32631,
            nodata=0.0,
        )
        p = tmp_path / "ext.tif"
        p.write_bytes(
            write_tiff([img], tile_size=(32, 32), compression="lzw", predictor=2)
        )
        binary = spark.read.format("binaryFile").load(str(p))
        tiles = ingest_tiff_files(binary)
        assert tiles.count() == 4
        uri = tiles.first()["container_uri"]
        datasets = spark.createDataFrame(
            [
                {
                    "id": "ds-ext-1",
                    "container_uri": uri,
                    "bands": [1],
                    "dmapping": {
                        "dtype": "UInt16",
                        "no_data": 0.0,
                        "min_value": 0.0,
                        "max_value": 65535.0,
                        "real_min_value": 0.0,
                        "real_max_value": 1.0,
                        "exponent": 1.0,
                    },
                }
            ]
        )
        problems = validate_datasets_against_tiles(datasets, tiles)
        assert problems.count() == 0

    def test_ingest_e2e_flags_missing_band(self, spark, tmp_path):
        img = _img(dtype="uint8", w=32, h=32)
        p = tmp_path / "one_band.tif"
        p.write_bytes(write_tiff([img], tile_size=(32, 32), compression="lzw"))
        binary = spark.read.format("binaryFile").load(str(p))
        tiles = ingest_tiff_files(binary)
        uri = tiles.first()["container_uri"]
        datasets = spark.createDataFrame(
            [
                {
                    "id": "ds-ext-2",
                    "container_uri": uri,
                    "bands": [1, 2],  # band 2 not in the file
                    "dmapping": {
                        "dtype": "UInt8",
                        "no_data": 0.0,
                        "min_value": 0.0,
                        "max_value": 255.0,
                        "real_min_value": 0.0,
                        "real_max_value": 1.0,
                        "exponent": 1.0,
                    },
                }
            ]
        )
        problems = validate_datasets_against_tiles(datasets, tiles).collect()
        assert [p["problem"] for p in problems] == ["missing_band"]


class TestChunkyMultiband:
    """GDAL's multiband default is PIXEL-interleaved (PlanarConfig=1);
    the writer can emit it and the ingest path derives the tile grid from
    the IFD tags, not from the per-plane offsets count."""

    @pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
    def test_chunky_roundtrip(self, compression):
        rng = np.random.default_rng(13)
        arr = rng.integers(0, 255, (3, 40, 60)).astype("uint8")
        img = RasterImage(bands=arr, transform=(10.0, 0, 0, 0, -10.0, 0))
        data = write_tiff(
            [img], tile_size=(32, 32), compression=compression, planar=1
        )
        [out] = read_tiff(data)
        assert out.planar == 1
        np.testing.assert_array_equal(out.bands, arr)

    def test_chunky_predictor_roundtrip(self):
        rng = np.random.default_rng(14)
        arr = rng.integers(0, 65535, (3, 40, 60)).astype("uint16")
        img = RasterImage(bands=arr, transform=(10.0, 0, 0, 0, -10.0, 0))
        data = write_tiff(
            [img], tile_size=(32, 32), compression="lzw", predictor=2, planar=1
        )
        [out] = read_tiff(data)
        np.testing.assert_array_equal(out.bands, arr)

    def test_chunky_multiband_ingest_grid(self):
        """Regression: a pixel-interleaved 3-band COG with a 2x2 tile grid
        has 4 tile offsets (NOT 12); the grid must come from the tile-size
        tags, and each band must land in its own tile rows."""
        rng = np.random.default_rng(15)
        arr = rng.integers(0, 255, (3, 64, 64)).astype("uint8")
        img = RasterImage(
            bands=arr, transform=(10.0, 0, 0, 0, -10.0, 640.0), epsg=32631
        )
        data = write_tiff([img], tile_size=(32, 32), planar=1)
        rows = tiff_bytes_to_tile_rows(data, "ext://chunky.tif")
        assert len(rows) == 12  # 3 bands x 2x2 blocks
        assert {r["band"] for r in rows} == {1, 2, 3}
        blk = next(
            r for r in rows if (r["band"], r["block_x"], r["block_y"]) == (2, 1, 1)
        )
        np.testing.assert_array_equal(
            np.array(blk["px"]).reshape(32, 32),
            arr[1, 32:64, 32:64].astype("float64"),
        )

    def test_single_tile_rgba_ingest(self):
        """Regression: a one-tile 4-band RGBA chunky file previously made
        the offsets-count grid inference divide 1 // 4 = 0 and raise."""
        rng = np.random.default_rng(16)
        arr = rng.integers(0, 255, (4, 16, 16)).astype("uint8")
        img = RasterImage(bands=arr, transform=(1.0, 0, 0, 0, -1.0, 16.0))
        data = write_tiff([img], tile_size=(16, 16), planar=1)
        rows = tiff_bytes_to_tile_rows(data, "ext://rgba.tif")
        assert len(rows) == 4 and {r["band"] for r in rows} == {1, 2, 3, 4}


class TestIngestOverviewTransformConvention:
    def test_overview_rows_carry_level0_transform(self):
        """Regression: the tile-table convention is that EVERY row carries
        the level-0 pix_to_crs (consolidate_to_mucog scales by 2^level on
        that assumption); the overview IFD's own pre-scaled transform must
        not leak onto ingested overview rows."""
        full = _img(dtype="uint16", w=64, h=64)
        ovr = RasterImage(
            bands=full.bands[0][::2, ::2].copy(),
            transform=(20.0, 0.0, 500000.0, 0.0, -20.0, 4500000.0),  # 2x
            epsg=32631,
            subfile_type=1,
        )
        data = write_tiff([full, ovr], tile_size=(32, 32))
        rows = tiff_bytes_to_tile_rows(data, "ext://ovr.tif")
        lvl1 = [r for r in rows if r["level"] == 1]
        assert lvl1
        for r in lvl1:
            assert r["pix_to_crs"]["a"] == 10.0  # level-0 scale, not 20
            assert r["pix_to_crs"]["e"] == -10.0


class TestPackBits:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(3)
        for n in (0, 1, 2, 127, 128, 129, 300, 70000):
            raw = rng.integers(0, 256, n).astype("uint8").tobytes()
            assert packbits_decode(packbits_encode(raw)) == raw

    def test_roundtrip_runs(self):
        raw = b"\x00" * 1000 + b"ab" * 300 + b"\xff" * 129 + b"xyz"
        enc = packbits_encode(raw)
        assert packbits_decode(enc) == raw
        assert len(enc) < len(raw) // 2

    def test_long_literal_boundary(self):
        # exactly 128 non-repeating bytes then a run
        raw = bytes(range(128)) + b"\x07" * 5
        assert packbits_decode(packbits_encode(raw)) == raw

    def test_noop_control_skipped(self):
        # 0x80 is a documented no-op between runs
        assert packbits_decode(b"\x80\x00A\x80\xfeB") == b"ABBB"


class TestStripLayout:
    """Strip-based TIFFs — what plain (non-COG) gdal_translate writes.

    The reference ingests them via GDAL (internal/image/image.go:260-286);
    here read_tiff handles StripOffsets/RowsPerStrip/StripByteCounts so the
    binaryFile ingest path accepts non-cloud-optimized external products."""

    @pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
    def test_singleband_roundtrip(self, compression):
        img = _img(seed=21, dtype="uint16", w=70, h=50)
        data = write_tiff(
            [img], compression=compression, layout="strip", rows_per_strip=16
        )
        out = read_tiff(data)[0]
        np.testing.assert_array_equal(out.bands, img.bands)
        assert out.transform == img.transform
        assert out.epsg == img.epsg

    def test_planar_multiband_roundtrip(self):
        rng = np.random.default_rng(5)
        img = RasterImage(
            bands=rng.integers(0, 255, (3, 33, 47)).astype("uint8"),
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
            epsg=4326,
        )
        data = write_tiff([img], compression="deflate", layout="strip",
                          rows_per_strip=8)
        out = read_tiff(data)[0]
        np.testing.assert_array_equal(out.bands, img.bands)

    def test_chunky_multiband_predictor_lzw(self):
        rng = np.random.default_rng(6)
        img = RasterImage(
            bands=rng.integers(0, 255, (3, 40, 31)).astype("uint8"),
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
            epsg=32631,
        )
        data = write_tiff([img], compression="lzw", predictor=2, planar=1,
                          layout="strip", rows_per_strip=13)
        out = read_tiff(data)[0]
        assert out.planar == 1
        np.testing.assert_array_equal(out.bands, img.bands)

    def test_last_strip_short(self):
        # h=50 rps=16 -> strips of 16,16,16,2: last strip is NOT padded
        img = _img(seed=22, w=20, h=50)
        data = write_tiff([img], compression="none", layout="strip",
                          rows_per_strip=16)
        out = read_tiff(data)[0]
        assert out.tile_byte_counts[-1] == 2 * 20 * 2  # 2 rows x 20 px x 2 B
        np.testing.assert_array_equal(out.bands, img.bands)

    def test_float_strip_roundtrip(self):
        img = _img(seed=23, dtype="float32", w=30, h=21)
        data = write_tiff([img], compression="deflate", layout="strip",
                          rows_per_strip=7)
        np.testing.assert_array_equal(read_tiff(data)[0].bands, img.bands)

    def test_strip_ingest_to_tile_rows(self):
        img = _img(seed=24, w=40, h=40, epsg=32631)
        data = write_tiff([img], compression="packbits", layout="strip",
                          rows_per_strip=16)
        rows = tiff_bytes_to_tile_rows(data, "ext://strips.tif")
        # grid is 1 across x ceil(40/16)=3 down
        assert {(r["block_x"], r["block_y"]) for r in rows} == {
            (0, 0), (0, 1), (0, 2)
        }
        assert all(len(r["px"]) == 16 * 40 for r in rows)
        # reassemble and compare (last strip padded with 0)
        got = np.zeros((48, 40))
        for r in rows:
            got[r["block_y"] * 16 : (r["block_y"] + 1) * 16] = np.array(
                r["px"]
            ).reshape(16, 40)
        np.testing.assert_array_equal(got[:40], img.bands[0].astype("float64"))

    def test_tiled_packbits_roundtrip(self):
        img = _img(seed=25, w=70, h=50)
        data = write_tiff([img], compression="packbits", tile_size=(32, 32))
        np.testing.assert_array_equal(read_tiff(data)[0].bands, img.bands)


class TestBigTIFF:
    """BigTIFF (version 43, 64-bit offsets): the layout every consolidated
    container needs past 4 GiB.  Same IFD semantics, LONG8 offset arrays,
    16-byte header; reader/writer/header_size all branch on the magic."""

    def test_roundtrip_tile_and_strip(self):
        img = _img(seed=31, dtype="uint16", w=70, h=50)
        for layout in ("tile", "strip"):
            data = write_tiff(
                [img], compression="deflate", layout=layout, bigtiff=True,
                tile_size=(32, 32), rows_per_strip=16,
            )
            assert data[:4] == b"II\x2b\x00"  # version 43
            out = read_tiff(data)[0]
            np.testing.assert_array_equal(out.bands, img.bands)
            assert out.transform == img.transform

    def test_header_structure(self):
        import struct

        data = write_tiff([_img(seed=32)], bigtiff=True)
        bytesize, zero = struct.unpack_from("<HH", data, 4)
        assert (bytesize, zero) == (8, 0)
        (first_ifd,) = struct.unpack_from("<Q", data, 8)
        assert first_ifd == 16  # IFD directly after the 16-byte header

    def test_multi_image_block_interlace(self):
        imgs = [_img(seed=40 + i, w=64, h=64) for i in range(3)]
        data = write_tiff(
            imgs, tile_size=(32, 32), tile_order="block", bigtiff=True
        )
        outs = read_tiff(data)
        assert len(outs) == 3
        for got, want in zip(outs, imgs):
            np.testing.assert_array_equal(got.bands, want.bands)
        # MuCOG contract: a block's payloads across images are contiguous
        offs = [im.tile_offsets for im in outs]
        for ti in range(4):
            for pi in range(2):
                assert offs[pi][ti] < offs[pi + 1][ti]
            if ti < 3:
                assert offs[2][ti] < offs[0][ti + 1]

    def test_header_size_works(self):
        data = write_tiff([_img(seed=33)], bigtiff=True)
        hs = header_size(data)
        assert 0 < hs < len(data)
        # every tile offset at/after the header boundary
        for im in read_tiff(data):
            assert min(im.tile_offsets) >= hs

    def test_auto_threshold_switches(self, monkeypatch):
        from geocube_spark.sources import gtiff as g

        img = _img(seed=34, w=40, h=40)
        monkeypatch.setattr(g, "_BIGTIFF_AUTO_THRESHOLD", 100)
        data = g.write_tiff([img], compression="none")
        assert data[:4] == b"II\x2b\x00"
        monkeypatch.setattr(g, "_BIGTIFF_AUTO_THRESHOLD", 2**32 - 2**26)
        data = g.write_tiff([img], compression="none")
        assert data[:4] == b"II\x2a\x00"

    def test_bigtiff_ingest_to_tile_rows(self):
        img = _img(seed=35, w=64, h=64, epsg=32631)
        data = write_tiff([img], tile_size=(32, 32), bigtiff=True)
        rows = tiff_bytes_to_tile_rows(data, "ext://big.tif")
        assert {(r["block_x"], r["block_y"]) for r in rows} == {
            (0, 0), (0, 1), (1, 0), (1, 1)
        }
