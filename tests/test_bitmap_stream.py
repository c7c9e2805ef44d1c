"""Ported reference test family: utils/bitmap/bitmap_test.go — the
FIFOBuffer compaction contract (TestRotatingBuffer, verbatim including
the internal buffer/pos assertions) and the streamable-bitmap chunking
identity over the reference's own image_cast0.tif golden, read through
this repo's TIFF decoder instead of GDAL."""

from __future__ import annotations

import os

import numpy as np
import pytest

from geocube_spark.sources.ingest import FIFOBuffer, ImageChunkReader

GOLDEN = "/root/reference/internal/image/test_data/image_cast0.tif"


class TestRotatingBuffer:
    """bitmap_test.go:26-73, each (buffer, pos) checkpoint included."""

    def _check(self, rb, value, pos):
        assert bytes(rb.buffer) == bytes(value)
        assert len(rb) == len(value) - pos
        assert rb.pos == pos

    def test_push_pop_compaction_sequence(self):
        rb = FIFOBuffer()
        rb.push(5)[:] = bytes([1, 2, 3, 4, 5])
        self._check(rb, [1, 2, 3, 4, 5], 0)

        assert rb.pop(2) == bytes([1, 2])
        self._check(rb, [1, 2, 3, 4, 5], 2)

        rb.push(5)[:] = bytes([6, 7, 8, 9, 10])
        self._check(rb, [3, 4, 5, 6, 7, 8, 9, 10], 0)
        assert rb.pop(5) == bytes([3, 4, 5, 6, 7])
        self._check(rb, [3, 4, 5, 6, 7, 8, 9, 10], 5)

        rb.push(5)[:] = bytes([11, 12, 13, 14, 15])
        self._check(rb, [8, 9, 10, 11, 12, 13, 14, 15], 0)
        # an over-ask returns only what is buffered (Pop clamps)
        assert rb.pop(10) == bytes([8, 9, 10, 11, 12, 13, 14, 15])
        self._check(rb, [8, 9, 10, 11, 12, 13, 14, 15], 8)

        rb.push(4)[:] = bytes([16, 17, 18, 19])
        self._check(rb, [16, 17, 18, 19], 0)
        assert rb.pop(2) == bytes([16, 17])
        self._check(rb, [16, 17, 18, 19], 2)
        assert rb.pop(1) == bytes([18])
        self._check(rb, [16, 17, 18, 19], 3)
        assert rb.pop(3) == bytes([19])
        self._check(rb, [16, 17, 18, 19], 4)

    def test_reset(self):
        rb = FIFOBuffer()
        rb.push(3)[:] = b"abc"
        rb.pop(1)
        rb.reset()
        assert len(rb) == 0 and rb.pos == 0 and bytes(rb.buffer) == b""


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference goldens absent")
class TestStreamableBitmap:
    """bitmap_test.go:76-130 'Test Streamable Bitmap': chunked streaming
    of a dataset returns byte-for-byte the whole-image read, at chunk
    sizes far below, near, and far above the image size."""

    @pytest.fixture(scope="class")
    def golden_bands(self):
        from geocube_spark.sources.gtiff import read_tiff

        img = read_tiff(open(GOLDEN, "rb").read())[0]
        return np.asarray(img.bands)

    # chunkSize contexts from the reference test (5 / 10000 / 600000);
    # 600000 exceeds the whole image, exercising the one-chunk arm
    @pytest.mark.parametrize("chunk_size", [5, 10000, 600000])
    def test_chunked_stream_equals_whole_read(self, golden_bands, chunk_size):
        reader = ImageChunkReader(golden_bands)
        expected = reader.read_all()
        got = bytearray()
        for _ in range(0, len(reader), chunk_size):
            got.extend(reader.next(chunk_size))
        assert bytes(got) == expected

    def test_restart_and_eof(self, golden_bands):
        reader = ImageChunkReader(golden_bands)
        first = reader.next(1000)
        reader.restart()
        assert reader.next(1000) == first
        # drain fully, then one more next raises the io.EOF twin
        while True:
            try:
                b = reader.next(1 << 20)
            except EOFError:
                break
            assert b
