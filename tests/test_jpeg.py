"""Baseline JPEG codec: analytic vectors, round-trips, TIFF integration,
and the abbreviated-stream (JPEGTables) path external JPEG COGs use.

No image library exists in this container, so spec conformance is pinned
analytically: constant blocks are DC-only and must reconstruct exactly;
the DCT basis is checked orthonormal; marker structure is asserted
byte-level."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geocube_spark.sources.gtiff import RasterImage, read_tiff, write_tiff
from geocube_spark.sources.jpeg import (
    _C,
    decode_jpeg,
    encode_jpeg,
    parse_tables,
    rgb_to_ycbcr,
    scaled_quant,
    ycbcr_to_rgb,
    QUANT_LUM,
)


def _split_abbreviated(stream: bytes) -> tuple[bytes, bytes]:
    """Split a standalone JPEG into (tables stream, abbreviated image
    stream) — the layout TIFF JPEGTables (tag 347) prescribes."""
    pos = 2
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    while pos < len(stream):
        marker = stream[pos + 1]
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT -> tables stream
            tables += seg
        elif marker == 0xDA:  # SOS: rest of the stream is entropy data
            image += stream[pos:]
            break
        else:
            image += seg
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(image)


class TestCodecMath:
    def test_dct_basis_orthonormal(self):
        assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)

    def test_constant_blocks_exact_any_value(self):
        for v in (0, 1, 37, 128, 200, 255):
            img = np.full((16, 16), v, dtype=np.uint8)
            assert np.array_equal(decode_jpeg(encode_jpeg(img, 75)), img), v

    def test_quality_scaling_monotone(self):
        q10 = scaled_quant(QUANT_LUM, 10)
        q90 = scaled_quant(QUANT_LUM, 90)
        assert (q10 >= q90).all() and (q10 > q90).any()
        assert scaled_quant(QUANT_LUM, 50).tolist() == QUANT_LUM.tolist()

    def test_smooth_gradient_near_exact_high_quality(self):
        x = np.linspace(0, 255, 64)
        img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(img, 95))
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 2

    def test_noise_roundtrip_bounded_error(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (33, 41), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(img, 95))
        assert d.shape == img.shape
        rmse = np.sqrt(((d.astype(float) - img) ** 2).mean())
        assert rmse < 4.0

    def test_ycbcr_roundtrip_identity_within_rounding(self):
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (10, 10, 3), dtype=np.uint8)
        back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2

    def test_color_image_roundtrip(self):
        rng = np.random.RandomState(5)
        base = np.clip(
            np.round(np.add.outer(np.linspace(20, 230, 24), np.linspace(0, 20, 24))),
            0,
            255,
        ).astype(np.uint8)
        img = np.stack([base, base[::-1], np.full_like(base, 90)], axis=-1)
        dec = ycbcr_to_rgb(decode_jpeg(encode_jpeg(img, 95)))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


class TestStreamStructure:
    def test_markers_present_and_tables_precede_scan(self):
        s = encode_jpeg(np.zeros((8, 8), np.uint8))
        assert s[:2] == b"\xff\xd8" and s[-2:] == b"\xff\xd9"
        pos = {m: s.find(bytes([0xFF, m])) for m in (0xDB, 0xC0, 0xC4, 0xDA)}
        assert all(p > 0 for p in pos.values())
        # every table and the frame header precede the scan
        assert max(pos[0xDB], pos[0xC0], pos[0xC4]) < pos[0xDA]

    def test_abbreviated_stream_has_no_tables(self):
        s = encode_jpeg(np.zeros((8, 8), np.uint8), tables=False)
        assert s.find(b"\xff\xdb") == -1 and s.find(b"\xff\xc4") == -1
        assert s.find(b"\xff\xc0") > 0  # frame header still present

    def test_progressive_stream_raises(self):
        s = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        s[s.index(b"\xff\xc0") + 1] = 0xC2  # masquerade as progressive
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(s))

    def test_non_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"II\x2a\x00nope")

    def test_abbreviated_stream_with_jpeg_tables(self):
        img = np.clip(
            np.round(np.add.outer(np.linspace(5, 250, 32), np.zeros(32))), 0, 255
        ).astype(np.uint8)
        tables, abbrev = _split_abbreviated(encode_jpeg(img, 90))
        # abbreviated stream alone lacks tables
        with pytest.raises(Exception):
            decode_jpeg(abbrev)
        d = decode_jpeg(abbrev, parse_tables(tables))
        full = decode_jpeg(encode_jpeg(img, 90))
        assert np.array_equal(d, full)


class TestTiffIntegration:
    def _img(self, bands):
        return RasterImage(
            bands=bands,
            transform=(10.0, 0.0, 500.0, 0.0, -10.0, 600.0),
            epsg=32631,
            nodata=None,
        )

    def test_gray_tiled_roundtrip(self):
        x = np.linspace(10, 240, 100)
        smooth = np.clip(
            np.round(np.add.outer(x, np.linspace(0, 15, 130))), 0, 255
        ).astype(np.uint8)
        data = write_tiff(
            [self._img(smooth[None])],
            tile_size=(64, 64),
            compression="jpeg",
            jpeg_quality=95,
        )
        out = read_tiff(data)[0]
        assert out.bands.shape == (1, 100, 130)
        assert np.abs(out.bands.astype(int) - smooth.astype(int)).max() <= 4
        assert out.epsg == 32631 and out.transform[0] == 10.0

    def test_rgb_chunky_ycbcr_roundtrip(self):
        x = np.linspace(10, 240, 96)
        base = np.clip(np.round(np.add.outer(x, x * 0.1)), 0, 255).astype(np.uint8)
        rgb = np.stack([base, base[::-1], np.full_like(base, 77)])
        data = write_tiff(
            [self._img(rgb)], tile_size=(64, 64), compression="jpeg", jpeg_quality=95
        )
        out = read_tiff(data)[0]
        assert out.bands.shape == rgb.shape
        assert np.abs(out.bands.astype(int) - rgb.astype(int)).max() <= 16

    def test_strip_layout_roundtrip(self):
        g = np.tile(np.linspace(0, 250, 80).astype(np.uint8), (50, 1))
        data = write_tiff(
            [self._img(g[None])],
            compression="jpeg",
            layout="strip",
            rows_per_strip=16,
            jpeg_quality=95,
        )
        out = read_tiff(data)[0]
        assert np.abs(out.bands.astype(int) - g.astype(int)).max() <= 2

    def test_jpeg_rejects_nonuint8(self):
        with pytest.raises(ValueError, match="uint8"):
            write_tiff(
                [self._img(np.zeros((1, 16, 16), np.int16))], compression="jpeg"
            )

    def test_jpeg_rejects_predictor(self):
        with pytest.raises(ValueError, match="predictor"):
            write_tiff(
                [self._img(np.zeros((1, 16, 16), np.uint8))],
                compression="jpeg",
                predictor=2,
            )

    def test_jpeg_smaller_than_lossless_on_smooth_data(self):
        x = np.linspace(10, 240, 256)
        smooth = np.clip(np.round(np.add.outer(x, x * 0.05)), 0, 255).astype(np.uint8)
        imgs = [self._img(smooth[None])]
        jp = write_tiff(imgs, compression="jpeg", jpeg_quality=75)
        lz = write_tiff(imgs, compression="lzw")
        assert len(jp) < len(lz)


class TestJpegIngest:
    def test_jpeg_external_tiff_to_tile_rows(self):
        """An externally-shaped JPEG-compressed GeoTIFF flows through the
        same byte-level ingest as deflate/LZW/PackBits COGs."""
        from geocube_spark.sources.ingest import tiff_bytes_to_tile_rows

        x = np.linspace(20, 200, 64)
        smooth = np.clip(np.round(np.add.outer(x, x * 0.1)), 0, 255).astype(
            np.uint8
        )
        img = RasterImage(
            bands=smooth[None],
            transform=(10.0, 0.0, 100.0, 0.0, -10.0, 200.0),
            epsg=32631,
            nodata=None,
        )
        data = write_tiff([img], tile_size=(32, 32), compression="jpeg",
                          jpeg_quality=95)
        rows = tiff_bytes_to_tile_rows(data, "ext://jpeg.tif")
        assert {(r["block_x"], r["block_y"]) for r in rows} == {
            (0, 0), (0, 1), (1, 0), (1, 1)
        }
        got = np.zeros((64, 64))
        for r in rows:
            got[
                r["block_y"] * 32 : (r["block_y"] + 1) * 32,
                r["block_x"] * 32 : (r["block_x"] + 1) * 32,
            ] = np.array(r["px"]).reshape(32, 32)
        assert np.abs(got - smooth).max() <= 4  # lossy, bounded
        assert rows[0]["crs_srid"] == 32631


class TestRestartMarkers:
    def test_restart_interval_roundtrip_matches(self):
        """DRI/RSTn streams decode identically to marker-free streams —
        the decoder's restart resync + DC-predictor reset path."""
        x = np.linspace(0, 255, 48)
        img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
        ref = decode_jpeg(encode_jpeg(img, 95))
        for ri in (1, 2, 5):
            enc = encode_jpeg(img, 95, restart_interval=ri)
            assert b"\xff\xd0" in enc  # RST0 present
            assert b"\xff\xdd" in enc  # DRI segment present
            assert np.array_equal(decode_jpeg(enc), ref), ri

    def test_restart_interval_color(self):
        x = np.linspace(0, 255, 48)
        g = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
        img = np.stack([g, g[::-1], g], axis=-1)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, 90, restart_interval=2)),
            decode_jpeg(encode_jpeg(img, 90)),
        )


class TestSubsampling420:
    def _color(self, n=50):
        x = np.linspace(10, 240, n)
        base = np.clip(np.round(np.add.outer(x, x * 0.2)), 0, 255).astype(np.uint8)
        return np.stack([base, base[::-1], np.full_like(base, 90)], axis=-1)

    def test_420_roundtrip_bounded_error(self):
        img = self._color()
        d = ycbcr_to_rgb(decode_jpeg(encode_jpeg(img, 90, subsampling="420")))
        assert d.shape == img.shape
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 20

    def test_420_smaller_than_444(self):
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        assert len(encode_jpeg(img, 90, subsampling="420")) < len(
            encode_jpeg(img, 90)
        )

    def test_420_gray_content_luma_clean(self):
        # equal channels -> constant chroma: subsampling loses nothing
        x = np.linspace(10, 240, 50)
        base = np.clip(np.round(np.add.outer(x, x * 0.2)), 0, 255).astype(np.uint8)
        img = np.stack([base] * 3, axis=-1)
        d = ycbcr_to_rgb(decode_jpeg(encode_jpeg(img, 95, subsampling="420")))
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 2

    def test_420_with_restart_markers(self):
        img = self._color()
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, 90, subsampling="420", restart_interval=2)),
            decode_jpeg(encode_jpeg(img, 90, subsampling="420")),
        )

    def test_420_odd_dimensions(self):
        img = self._color(33)  # 33x33: odd vs both the MCU and chroma grids
        d = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
        assert d.shape == (33, 33, 3)

    def test_tiff_writer_420_passthrough(self):
        img = self._color(64)
        rast = RasterImage(
            bands=np.moveaxis(img, -1, 0),
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
            epsg=4326,
            nodata=None,
        )
        d444 = write_tiff([rast], compression="jpeg", jpeg_quality=90)
        d420 = write_tiff(
            [rast], compression="jpeg", jpeg_quality=90, jpeg_subsampling="420"
        )
        assert len(d420) < len(d444)
        out = read_tiff(d420)[0]
        assert np.abs(out.bands.astype(int) - rast.bands.astype(int)).max() <= 20


class TestJpegIngestE2E:
    def test_jpeg_cog_validates_clean(self, spark, tmp_path):
        """External JPEG COG -> binaryFile -> tile rows -> S4 validation
        against a matching dataset row: zero problems (the same e2e the
        LZW/deflate codecs have)."""
        from geocube_spark.sources.ingest import (
            ingest_tiff_files,
            validate_datasets_against_tiles,
        )

        x = np.linspace(20, 200, 64)
        arr = np.clip(np.round(np.add.outer(x, x * 0.1)), 0, 255).astype(np.uint8)
        img = RasterImage(
            bands=arr[None],
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 640.0),
            epsg=32631,
            nodata=None,
        )
        p = tmp_path / "ext_jpeg.tif"
        p.write_bytes(
            write_tiff([img], tile_size=(32, 32), compression="jpeg",
                       jpeg_quality=95)
        )
        binary = spark.read.format("binaryFile").load(str(p))
        tiles = ingest_tiff_files(binary)
        assert tiles.count() == 4
        uri = tiles.first()["container_uri"]
        datasets = spark.createDataFrame(
            [
                {
                    "id": "ds-jpeg-1",
                    "container_uri": uri,
                    "bands": [1],
                    "dmapping": {
                        "dtype": "UInt8",
                        "no_data": float("nan"),
                        "min_value": 0.0,
                        "max_value": 255.0,
                        "real_min_value": 0.0,
                        "real_max_value": 1.0,
                        "exponent": 1.0,
                    },
                }
            ]
        )
        problems = validate_datasets_against_tiles(datasets, tiles)
        assert problems.count() == 0


class TestFuzzRobustness:
    def test_mutated_streams_raise_cleanly(self):
        """Bit-flipped JPEG streams must fail with an exception (or decode
        to SOMETHING) — never hang; the decoder has no unbounded loops."""
        rng = np.random.RandomState(11)
        img = np.clip(
            np.round(np.add.outer(np.linspace(5, 250, 24), np.zeros(24))), 0, 255
        ).astype(np.uint8)
        base = bytearray(encode_jpeg(img, 85))
        for _ in range(60):
            s = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                s[rng.randint(2, len(s))] ^= 1 << rng.randint(8)
            try:
                out = decode_jpeg(bytes(s))
                assert out.shape[0] > 0
            except Exception:
                pass  # clean failure is acceptable; hanging is not

    def test_truncated_streams_raise(self):
        img = np.full((16, 16), 77, np.uint8)
        full = encode_jpeg(img, 85)
        for cut in (1, 4, len(full) // 2, len(full) - 3):
            with pytest.raises(Exception):
                decode_jpeg(full[:cut])


class TestNearLossless:
    def test_q100_noise_within_one_level(self):
        """quality=100 clips every quant step to 1: reconstruction error
        is pure DCT float roundoff, bounded by +/-1 level even on noise."""
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (24, 40), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(img, 100))
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 1


class TestWriterJpegTables:
    def test_tiff_carries_jpeg_tables_tag_once(self):
        x = np.linspace(20, 200, 96)
        img = np.clip(np.round(np.add.outer(x, x * 0.1)), 0, 255).astype(np.uint8)
        rast = RasterImage(
            bands=img[None],
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
            epsg=4326,
            nodata=None,
        )
        data = write_tiff([rast], tile_size=(32, 32), compression="jpeg",
                          jpeg_quality=90)
        # tables appear in the file exactly once (the tag), not per tile
        assert data.count(b"\xff\xdb") == 1
        out = read_tiff(data)[0]
        assert np.abs(out.bands.astype(int) - img.astype(int)).max() <= 6

    def test_tables_tag_saves_bytes_vs_standalone(self):
        x = np.linspace(20, 200, 128)
        img = np.clip(np.round(np.add.outer(x, x * 0.1)), 0, 255).astype(np.uint8)
        rast = RasterImage(
            bands=img[None],
            transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
            epsg=4326,
            nodata=None,
        )
        from geocube_spark.sources.jpeg import encode_jpeg as _e

        with_tag = write_tiff([rast], tile_size=(32, 32), compression="jpeg")
        # 16 tiles x ~285 B of per-tile tables saved minus one shared copy
        standalone_total = sum(
            len(_e(img[y : y + 32, x0 : x0 + 32], 90))
            for y in range(0, 128, 32)
            for x0 in range(0, 128, 32)
        )
        abbrev_total = sum(
            len(_e(img[y : y + 32, x0 : x0 + 32], 90, tables=False))
            for y in range(0, 128, 32)
            for x0 in range(0, 128, 32)
        )
        assert standalone_total - abbrev_total > 15 * 250
        assert len(with_tag) < standalone_total  # net win incl. the tag


class TestMalformedStreams:
    """Externally-produced JPEG-compressed TIFFs can carry corrupt tiles:
    the decoder must surface a clean ValueError, never an IndexError or
    an out-of-bounds numpy write."""

    def _valid_jpeg(self):
        import numpy as np

        from geocube_spark.sources.jpeg import encode_jpeg

        img = (np.arange(64 * 64) % 251).reshape(64, 64).astype(np.uint8)
        return encode_jpeg(img, quality=90), img

    def test_truncated_stream_raises_valueerror(self):
        # EVERY truncation point, header and entropy data alike, must
        # surface ValueError — never IndexError/struct.error/KeyError
        from geocube_spark.sources.jpeg import decode_jpeg

        data, _ = self._valid_jpeg()
        for cut in range(2, len(data), 3):
            try:
                decode_jpeg(data[:cut])
            except ValueError:
                pass  # clean decode error
            # any other exception type fails the test

    def _bitflip_sweep(self, step):
        # flipping ANY byte anywhere (markers, tables, entropy data) may
        # decode to garbage (acceptable) or raise ValueError (acceptable)
        # — but never IndexError/KeyError/OverflowError/ZeroDivisionError
        from geocube_spark.sources.jpeg import decode_jpeg

        data, _ = self._valid_jpeg()
        blob = bytearray(data)
        for i in range(2, len(blob), step):
            for bit in (0, 7):
                mutated = bytearray(blob)
                mutated[i] ^= 1 << bit
                try:
                    decode_jpeg(bytes(mutated))
                except ValueError:
                    pass  # clean decode error
                # any other exception type fails the test

    def test_bitflip_never_raises_indexerror_strided(self):
        # per-verify smoke: a prime stride still hits every stream region
        self._bitflip_sweep(13)

    @pytest.mark.weekly
    def test_bitflip_never_raises_indexerror(self):
        # the exhaustive every-byte sweep (weekly cadence)
        from geocube_spark.sources.jpeg import decode_jpeg

        data, _ = self._valid_jpeg()
        blob = bytearray(data)
        for i in range(2, len(blob)):
            for bit in (0, 7):
                mutated = bytearray(blob)
                mutated[i] ^= 1 << bit
                try:
                    decode_jpeg(bytes(mutated))
                except ValueError:
                    pass  # clean decode error
                # any other exception type fails the test

    def test_valid_stream_still_roundtrips(self):
        import numpy as np

        from geocube_spark.sources.jpeg import decode_jpeg

        data, img = self._valid_jpeg()
        out = decode_jpeg(data)
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 4.0
