"""functions/zstd.py — pure-Python RFC 8878 decompression, differential-
tested against the system zstd CLI (an independent implementation) across
payload shapes and compression levels, plus structural edge frames."""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pytest

from geocube_spark.functions.zstd import ZstdError, decompress

ZSTD_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd" if shutil.which("/root/miniconda/bin/zstd") else None
)

needs_cli = pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI oracle")


def _compress(payload: bytes, tmp_path, *args) -> bytes:
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.zst"
    src.write_bytes(payload)
    subprocess.run(
        [ZSTD_CLI, "-f", *args, str(src), "-o", str(dst)],
        check=True, capture_output=True,
    )
    return dst.read_bytes()


def _payloads():
    rng = random.Random(7)
    return {
        "empty": b"",
        "tiny": b"hello",
        "rle": b"A" * 10000,  # RLE/raw block arms + a large-match sequence
        "text": b"the quick brown fox jumps over the lazy dog. " * 400,
        "random": bytes(rng.randrange(256) for _ in range(5000)),  # raw literals
        "mixed": b"".join(bytes([i % 7]) * (i % 50 + 1) for i in range(2000)),
        # ~70 KB of incompressible prefix drives literals lengths into the
        # LL codes 32+ range — the table's less-than-one-probability cells
        "longlit": bytes(rng.randrange(256) for _ in range(70000)) + b"B" * 20000,
    }


@needs_cli
@pytest.mark.parametrize("level", [1, 3, 9, 19])
@pytest.mark.parametrize("name", list(_payloads()))
def test_roundtrip_against_cli(name, level, tmp_path):
    payload = _payloads()[name]
    comp = _compress(payload, tmp_path, f"-{level}")
    assert decompress(comp) == payload


@needs_cli
def test_multi_frame_and_skippable(tmp_path):
    payload = _payloads()["text"]
    f1 = _compress(payload, tmp_path, "-3")
    f2 = _compress(payload[::-1], tmp_path, "-1")
    skippable = struct.pack("<II", 0x184D2A50, 5) + b"meta!"
    assert decompress(f1 + skippable + f2) == payload + payload[::-1]


@needs_cli
@pytest.mark.weekly
def test_huge_offset_ultra_long_mode(tmp_path):
    """Offsets past 2^24 exercise the offset-code tail (the OF table's
    less-than-one-probability cells): a 17 MB-apart duplicate found only
    by --long matching."""
    rng = random.Random(3)
    block = bytes(rng.randrange(256) for _ in range(100_000))
    filler = bytes(rng.randrange(256) for _ in range(17_000_000))
    payload = block + filler + block
    comp = _compress(payload, tmp_path, "--ultra", "-22", "--long=27")
    assert decompress(comp) == payload


def test_bad_magic_rejected():
    with pytest.raises(ZstdError, match="magic"):
        decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_trailing_bytes_rejected(tmp_path):
    """A truncated second frame (1-3 leftover bytes) must not decode
    'successfully' — the frame loop's len>=4 guard alone would silently
    drop the tail (ADVICE r10)."""
    comp = _compress(b"hello zstd", tmp_path)
    assert decompress(comp) == b"hello zstd"
    for n in (1, 2, 3):
        with pytest.raises(ZstdError, match="trailing"):
            decompress(comp + b"\x28" * n)


def test_reference_golden_strip_decodes():
    """The consumer that motivated the codec: one ZSTD strip of the
    reference's image_cast8.tif (GDAL-compressed, independent encoder)."""
    import os

    path = "/root/reference/internal/image/test_data/image_cast8.tif"
    if not os.path.exists(path):
        pytest.skip("reference goldens absent")
    from geocube_spark.sources.gtiff import read_tiff

    img = read_tiff(open(path, "rb").read())[0]
    assert img.bands[0].shape == (215, 496)
