"""PNG sink (S7) — pure-python encoder (stdlib zlib only; no PIL here).

Reference: internal/image/image.go:522-584 (slice -> 8-bit PNG with
optional palette).  The engine-side contract: a mosaicked block/slice plus
an optional palette LUT becomes PNG bytes at the edge (driver side, never
in the distributed plan).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from geocube_spark.functions.palette import ColorPoint, build_lut

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array as PNG: (H,W) grayscale, (H,W,3) RGB or
    (H,W,4) RGBA.  Filter type 0 per scanline; zlib-deflated IDAT."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 input (cast/clamp first)")
    if a.ndim == 2:
        color_type, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + a[row].tobytes() for row in range(h)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def slice_to_png(
    px: list[float],
    width: int,
    height: int,
    dmapping: dict,
    palette_points: list[ColorPoint] | None = None,
) -> bytes:
    """The reference's PNG path: map internal values to [0,1] external via
    the DataMapping, then either grayscale (scaled to 0-255) or a palette
    ramp to RGBA (image.go:522-584 + palette.go)."""
    a = np.asarray(px, dtype=np.float64).reshape(height, width)
    nd = dmapping["no_data"]
    mask = np.isnan(a) if (isinstance(nd, float) and np.isnan(nd)) else (a == nd)
    lo, hi = dmapping["min_value"], dmapping["max_value"]
    rlo, rhi = dmapping["real_min_value"], dmapping["real_max_value"]
    ext = rlo + (rhi - rlo) * ((a - lo) / (hi - lo)) ** dmapping["exponent"]
    norm = np.clip((ext - rlo) / (rhi - rlo), 0.0, 1.0)
    if palette_points is None:
        gray = np.round(norm * 255).astype(np.uint8)
        gray[mask] = 0
        return encode_png(gray)
    lut = np.asarray(build_lut(palette_points), dtype=np.uint8)  # 256×4
    idx = np.round(norm * 255).astype(np.int64)
    rgba = lut[idx]
    rgba[mask] = (0, 0, 0, 0)  # transparent nodata
    return encode_png(rgba)


def decode_png(data: bytes) -> np.ndarray:
    """Minimal decoder for THIS encoder's output (8-bit, filter 0 per
    scanline, color type 0/2/6, non-interlaced) — the read-back
    verification path of the S7 sink, like gtiff.read_tiff for S5."""
    if data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos = len(_SIGNATURE)
    w = h = color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc_want = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if (zlib.crc32(tag + payload) & 0xFFFFFFFF) != crc_want:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = 1 + w * channels
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        if line[0] != 0:
            raise ValueError("only filter type 0 is produced/read")
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    out = np.stack(rows).reshape(h, w, channels)
    return out[:, :, 0] if channels == 1 else out
