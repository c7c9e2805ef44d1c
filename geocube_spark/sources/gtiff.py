"""Real GeoTIFF / COG / MuCOG byte formats — pure Python (struct + zlib).

The reference produces tiled GeoTIFFs via GDAL (internal/image/image.go:
356-450 CastFile creation params), rewrites them cloud-optimized
(internal/image/cog.go:34-53,179-194: header-first IFDs, tiled, deflate) and
merges many COGs into one time-interlaced MuCOG (internal/image/mucog.go:
30-48; docs/architecture/mucog.md).  Until this module the repo restated
those sinks as a parquet layout; here the actual byte format is produced —
little-endian TIFF 6.0 + GeoTIFF 1.1 keys — with only the standard library,
so Spark executors need no native deps and a container file is assembled by
one bounded task.

Layout properties guaranteed (and tested):
- all IFDs + out-of-line values live in a header block BEFORE any tile
  bytes (the "cloud-optimized" contract: one small ranged read yields the
  full structure);
- ``tile_order='block'`` interlaces tile payloads across images so a
  time-series of one block is ONE contiguous byte range (the MuCOG 10-20×
  read win — same mechanism as the consolidated parquet layout);
- overview images are separate reduced-resolution IFDs
  (NewSubfileType=1), full-res first.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

# TIFF tag ids
_NEW_SUBFILE_TYPE = 254
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259  # 1 = none, 5 = LZW, 8 = deflate (zlib), 32773 = PackBits
_PHOTOMETRIC = 262  # 1 = BlackIsZero
_STRIP_OFFSETS = 273
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_SAMPLES_PER_PIXEL = 277
_PLANAR_CONFIG = 284  # 1 = chunky, 2 = planar (per-band planes)
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_PREDICTOR = 317  # 1 = none, 2 = horizontal differencing
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_EXTRA_SAMPLES = 338  # 2 = unassociated alpha (the GDAL alpha-band tag)
_SAMPLE_FORMAT = 339  # 1 = uint, 2 = int, 3 = ieeefp, 6 = complex ieeefp
_JPEG_TABLES = 347  # abbreviated DQT/DHT stream shared by all JPEG tiles
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

# TIFF field types
_T_ASCII = 2
_T_SHORT = 3
_T_LONG = 4
_T_UNDEFINED = 7  # opaque bytes (JPEGTables)
_T_DOUBLE = 12
_T_LONG8 = 16  # BigTIFF 64-bit unsigned
_TYPE_SIZE = {
    _T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_UNDEFINED: 1, _T_DOUBLE: 8,
    _T_LONG8: 8,
}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d", _T_LONG8: "Q"}

# auto-switch to BigTIFF when the classic 32-bit offset space would
# overflow (with slack for the header block): consolidated containers at
# production scale routinely exceed 4 GiB
_BIGTIFF_AUTO_THRESHOLD = 2**32 - 2**26

# numpy dtype -> (bits, sample_format)
_DTYPE_TIFF = {
    "uint8": (8, 1), "int8": (8, 2),
    "uint16": (16, 1), "int16": (16, 2),
    "uint32": (32, 1), "int32": (32, 2),
    "float32": (32, 3), "float64": (64, 3),
    "complex64": (64, 6),
}
_TIFF_DTYPE = {v: k for k, v in _DTYPE_TIFF.items()}

# GeoTIFF keys (GeoTIFF 1.1 / OGC 19-008r4 — public spec)
_GT_MODEL_TYPE = 1024  # 1 projected, 2 geographic
_GT_RASTER_TYPE = 1025  # 1 = PixelIsArea
_GEOGRAPHIC_TYPE = 2048
_PROJECTED_CS_TYPE = 3072


@dataclass
class RasterImage:
    """One image plane set: (n_bands, height, width) + georeferencing."""

    bands: np.ndarray
    transform: tuple[float, float, float, float, float, float]
    epsg: int = 0
    nodata: float | None = None
    subfile_type: int = 0  # 0 full-res, 1 reduced (overview)
    alpha: bool = False  # last band is an unassociated alpha/validity mask

    def __post_init__(self):
        if self.bands.ndim == 2:
            self.bands = self.bands[None, :, :]
        if self.bands.ndim != 3:
            raise ValueError("bands must be (n_bands, H, W)")
        if str(self.bands.dtype) not in _DTYPE_TIFF:
            raise ValueError(f"unsupported dtype {self.bands.dtype}")
        b, d = self.transform[1], self.transform[3]
        if b != 0.0 or d != 0.0:
            raise ValueError("rotated geotransforms are not supported")


def _tile_grid(w: int, h: int, tw: int, th: int) -> tuple[int, int]:
    return -(-w // tw), -(-h // th)


def _cut_tiles(img: RasterImage, tw: int, th: int, planar: int = 2) -> list[bytes]:
    """Tile payloads: planar (PC=2, per-band planes, plane-major) or chunky
    (PC=1, samples interleaved per pixel — what GDAL writes by default for
    multiband).  Edge tiles are padded to full tile size with nodata/0."""
    nb, h, w = img.bands.shape
    across, down = _tile_grid(w, h, tw, th)
    pad = img.nodata if img.nodata is not None else 0
    out: list[bytes] = []
    if planar == 1 and nb > 1:
        interleaved = np.moveaxis(img.bands, 0, -1)  # (h, w, nb)
        for ty in range(down):
            for tx in range(across):
                tile = interleaved[
                    ty * th : ty * th + th, tx * tw : tx * tw + tw, :
                ]
                if tile.shape[:2] != (th, tw):
                    full = np.full((th, tw, nb), pad, dtype=tile.dtype)
                    full[: tile.shape[0], : tile.shape[1], :] = tile
                    tile = full
                out.append(np.ascontiguousarray(tile).tobytes())
        return out
    for b in range(nb):
        plane = img.bands[b]
        for ty in range(down):
            for tx in range(across):
                tile = plane[ty * th : ty * th + th, tx * tw : tx * tw + tw]
                if tile.shape != (th, tw):
                    full = np.full((th, tw), pad, dtype=plane.dtype)
                    full[: tile.shape[0], : tile.shape[1]] = tile
                    tile = full
                out.append(np.ascontiguousarray(tile).tobytes())
    return out


def _geokeys(img: RasterImage) -> list[int]:
    keys: list[tuple[int, int]] = [(_GT_RASTER_TYPE, 1)]
    if img.epsg:
        if 4000 <= img.epsg < 5000:  # geographic 2D codes
            keys.append((_GT_MODEL_TYPE, 2))
            keys.append((_GEOGRAPHIC_TYPE, img.epsg))
        else:
            keys.append((_GT_MODEL_TYPE, 1))
            keys.append((_PROJECTED_CS_TYPE, img.epsg))
    keys.sort()
    flat = [1, 1, 0, len(keys)]
    for kid, val in keys:
        flat += [kid, 0, 1, val]
    return flat


def _pack_array(ftype: int, values) -> bytes:
    if ftype == _T_ASCII:
        return values.encode() + b"\x00"
    return struct.pack(f"<{len(values)}{_TYPE_FMT[ftype]}", *values)


# ---------------------------------------------------------------- LZW codec
#
# TIFF 6.0 §13 LZW: MSB-first bitstream, ClearCode=256, EOI=257, codes start
# at 9 bits and use "early change" (the code width bumps one entry BEFORE
# the table index reaches 2^width, i.e. at 510/1022/2046); the table resets
# at 4094 entries via an explicit ClearCode.  This is what GDAL writes by
# default (often with predictor 2), so externally-produced COGs ingest
# byte-level — reference reads them via GDAL (internal/image/image.go:
# 260-286); we read them with ~80 lines of stdlib.

_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\x00"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if not table:  # tolerate streams missing the leading ClearCode
                table = list(base)
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # early change: libtiff's decode rule is free_ent > MAXCODE(n)-1
        # with MAXCODE(n) = 2^n - 1, i.e. widen once the table reaches
        # 2^w - 1 entries (the decoder's table lags the encoder's by one:
        # the entry for the code just read is appended on the NEXT code).
        # Verified against GDAL-written strips (the reference's own
        # test_data/image_cast*.tif decode byte-exact); the previous
        # 2^w - 2 rule was one code early and only roundtripped against
        # this module's equally-early encoder.
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, curbits
        cur = (cur << width) | code
        curbits += width
        while curbits >= 8:
            curbits -= 8
            out.append((cur >> curbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w = w + c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change, libtiff encode side: widen when the next free code
        # exceeds MAXCODE(n) = 2^n - 1 (one later than the old 2^w - 1
        # rule, mirroring the corrected decoder); at 12 bits, emit a
        # ClearCode at 4094 like libtiff so early-change decoders never
        # see an out-of-table code
        if width < 12 and next_code == (1 << width):
            width += 1
        elif next_code == 4094:
            emit(_LZW_CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if curbits:
        out.append((cur << (8 - curbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- PackBits codec
#
# TIFF 6.0 §9 PackBits: byte-oriented run-length.  Control byte n in 0..127
# means copy the next n+1 literal bytes; n in -127..-1 (two's complement
# 129..255) means repeat the next byte 1-n times; -128 (128) is a no-op.
# Still common in scanned/archival GeoTIFFs; GDAL reads and writes it
# (reference ingests them via GDAL, internal/image/image.go:260-286).


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 128:  # literal run of ctrl+1 bytes
            out += data[i : i + ctrl + 1]
            i += ctrl + 1
        elif ctrl > 128:  # repeat next byte 257-ctrl times
            out += data[i : i + 1] * (257 - ctrl)
            i += 1
        # ctrl == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal stretch: until the next >=3 repeat (2-runs aren't worth
        # breaking a literal for) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _predict2_encode(tile: np.ndarray, axis: int = -1) -> np.ndarray:
    """Horizontal differencing (predictor=2) along the pixel-column axis;
    integer dtypes only, wraparound via the dtype's modular arithmetic."""
    if tile.dtype.kind not in "ui":
        raise ValueError("predictor=2 requires an integer dtype")
    out = tile.copy()
    sl_hi = [slice(None)] * tile.ndim
    sl_lo = [slice(None)] * tile.ndim
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    out[tuple(sl_hi)] = tile[tuple(sl_hi)] - tile[tuple(sl_lo)]
    return out


def _predict2_decode(tile: np.ndarray, axis: int = -1) -> np.ndarray:
    if tile.dtype.kind not in "ui":
        raise ValueError("predictor=2 requires an integer dtype")
    return np.cumsum(tile, axis=axis, dtype=tile.dtype)


@dataclass
class _PlannedIFD:
    entries: list  # (tag, ftype, count, payload bytes) sorted by tag
    tile_payloads: list[bytes]
    n_tiles: int
    offsets_entry_idx: int = -1
    ifd_offset: int = 0
    extra_offset: int = 0
    tile_offsets: list[int] = field(default_factory=list)


def _cut_strips(
    img: RasterImage, rps: int, planar: int
) -> list[bytes]:
    """Strip payloads (full-width row bands, NOT padded — TIFF 6.0 strips).
    planar=1: rows interleaved (h, w, nb); planar=2: per-band planes
    sequential (all strips of band 0, then band 1, ...)."""
    nb, h, w = img.bands.shape
    out: list[bytes] = []
    if planar == 1 and nb > 1:
        interleaved = np.moveaxis(img.bands, 0, -1)  # (h, w, nb)
        for y0 in range(0, h, rps):
            out.append(np.ascontiguousarray(interleaved[y0 : y0 + rps]).tobytes())
        return out
    for b in range(nb):
        for y0 in range(0, h, rps):
            out.append(np.ascontiguousarray(img.bands[b, y0 : y0 + rps]).tobytes())
    return out


_COMP_CODES = {"none": 1, "lzw": 5, "jpeg": 7, "deflate": 8, "packbits": 32773}


def write_tiff(
    images: list[RasterImage],
    tile_size: tuple[int, int] = (256, 256),
    compression: str = "deflate",
    tile_order: str = "image",
    predictor: int = 1,
    planar: int | None = None,
    layout: str = "tile",
    rows_per_strip: int = 64,
    bigtiff: bool | None = None,
    jpeg_quality: int = 90,
    jpeg_subsampling: str = "444",
    image_keys: list[dict] | None = None,
) -> bytes:
    """Serialize images into one tiled or stripped (Geo)TIFF.

    tile_order='image': tiles grouped per image (COG: full-res first, then
    overviews).  tile_order='block': MuCOG interlacing — tile payloads
    ordered (block, image) so one block across all images is contiguous;
    requires every image on the same grid.  Any OTHER string is parsed as
    a full MuCOG interlacing pattern (layouts.proto:41-66 — conditional
    per-level clauses, value/range selectors, e.g. ``Z=0>T>R>B;Z=1:>R>T>B``)
    applied to the tile data region; ``image_keys`` must then supply one
    ``{"Z": zoom_idx, "R": record_idx, "B": band_idx}`` dict per image
    (T is the row-major tile index within each image's own grid, so
    differently-sized overview grids interleave correctly).

    compression: 'none' | 'deflate' | 'lzw' (GDAL's default COG codec) |
    'packbits' (RLE, common in archival GeoTIFFs) | 'jpeg' (LOSSY, 8-bit
    1- or 3-band only; 3-band is stored YCbCr with PhotometricInterpretation
    6 — the GDAL JPEG-COG shape; per-tile standalone baseline streams,
    quality via ``jpeg_quality``).
    predictor=2 applies TIFF horizontal differencing before compression
    (integer dtypes only) — the LZW+predictor combination GDAL emits.
    planar: None = this writer's default (per-band planes for multiband),
    1 forces chunky pixel-interleaved tiles (GDAL's multiband default) —
    mainly to produce externally-shaped fixtures for the ingest path.
    layout='strip' writes StripOffsets/RowsPerStrip instead of tiles —
    what plain (non-COG) gdal_translate emits; fixture path for the
    external-GeoTIFF ingest tests.
    bigtiff: True forces the BigTIFF (version 43, 64-bit offsets) layout;
    None auto-switches when payloads approach the classic 4 GiB offset
    limit — the size every consolidated container reaches at production
    scale.  Offsets arrays are LONG8; everything else stays identical.
    """
    if not images:
        raise ValueError("no images")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if layout not in ("tile", "strip"):
        raise ValueError("layout must be 'tile' or 'strip'")
    if layout == "strip" and tile_order == "block":
        raise ValueError("tile_order='block' requires layout='tile'")
    tw, th = tile_size
    comp_code = _COMP_CODES[compression]
    if predictor == 2 and comp_code == 1:
        raise ValueError("predictor=2 requires a compression codec")

    planned: list[_PlannedIFD] = []
    for img in images:
        nb, h, w = img.bands.shape
        dt = img.bands.dtype
        pc = planar if planar is not None else (2 if nb > 1 else 1)
        if comp_code == 7:
            if dt != np.uint8:
                raise ValueError("JPEG compression requires uint8 bands")
            if nb not in (1, 3):
                raise ValueError("JPEG compression requires 1 or 3 bands")
            if predictor == 2:
                raise ValueError("predictor does not apply to JPEG")
            pc = 1  # chunky pixel-interleaved, the JPEG-in-TIFF shape
        if layout == "strip":
            payloads = _cut_strips(img, rows_per_strip, planar=pc)
        else:
            payloads = _cut_tiles(img, tw, th, planar=pc)
        if predictor == 2:
            chunky = pc == 1 and nb > 1
            row_bytes = (w if layout == "strip" else tw) * (nb if chunky else 1)
            payloads = [
                _predict2_encode(
                    np.frombuffer(p, dtype=dt).reshape(
                        (-1, row_bytes // (nb if chunky else 1), nb)
                        if chunky
                        else (-1, row_bytes)
                    ),
                    axis=1 if chunky else -1,
                ).tobytes()
                for p in payloads
            ]
        jpeg_tables_payload = None
        if comp_code == 7:
            from geocube_spark.sources.jpeg import (
                encode_jpeg,
                jpeg_tables_stream,
                rgb_to_ycbcr,
            )

            # the standard DQT/DHT travel ONCE in the JPEGTables tag;
            # per-tile streams are abbreviated (~600 B saved per tile)
            jpeg_tables_payload = jpeg_tables_stream(jpeg_quality, gray=nb == 1)
            cols = w if layout == "strip" else tw
            enc = []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                arr = arr.reshape((-1, cols, nb) if nb > 1 else (-1, cols))
                if nb == 3:
                    arr = rgb_to_ycbcr(arr)
                    enc.append(
                        encode_jpeg(
                            arr, jpeg_quality, ycbcr=True,
                            subsampling=jpeg_subsampling, tables=False,
                        )
                    )
                else:
                    enc.append(encode_jpeg(arr, jpeg_quality, tables=False))
            payloads = enc
        elif comp_code == 8:
            payloads = [zlib.compress(p, 6) for p in payloads]
        elif comp_code == 5:
            payloads = [lzw_encode(p) for p in payloads]
        elif comp_code == 32773:
            payloads = [packbits_encode(p) for p in payloads]
        bits, fmt = _DTYPE_TIFF[str(img.bands.dtype)]
        offsets_tag = _STRIP_OFFSETS if layout == "strip" else _TILE_OFFSETS
        counts_tag = (
            _STRIP_BYTE_COUNTS if layout == "strip" else _TILE_BYTE_COUNTS
        )
        entries = [
            (_NEW_SUBFILE_TYPE, _T_LONG, 1, _pack_array(_T_LONG, [img.subfile_type])),
            (_IMAGE_WIDTH, _T_LONG, 1, _pack_array(_T_LONG, [w])),
            (_IMAGE_LENGTH, _T_LONG, 1, _pack_array(_T_LONG, [h])),
            (_BITS_PER_SAMPLE, _T_SHORT, nb, _pack_array(_T_SHORT, [bits] * nb)),
            (_COMPRESSION, _T_SHORT, 1, _pack_array(_T_SHORT, [comp_code])),
            (
                _PHOTOMETRIC,
                _T_SHORT,
                1,
                _pack_array(_T_SHORT, [6 if comp_code == 7 and nb == 3 else 1]),
            ),
            (_SAMPLES_PER_PIXEL, _T_SHORT, 1, _pack_array(_T_SHORT, [nb])),
            (_PLANAR_CONFIG, _T_SHORT, 1, _pack_array(_T_SHORT, [pc])),
            (_PREDICTOR, _T_SHORT, 1, _pack_array(_T_SHORT, [predictor])),
            (offsets_tag, _T_LONG, len(payloads), b""),  # patched later
            (
                counts_tag,
                _T_LONG,
                len(payloads),
                _pack_array(_T_LONG, [len(p) for p in payloads]),
            ),
            (_SAMPLE_FORMAT, _T_SHORT, nb, _pack_array(_T_SHORT, [fmt] * nb)),
        ]
        if layout == "strip":
            entries.append(
                (_ROWS_PER_STRIP, _T_LONG, 1, _pack_array(_T_LONG, [rows_per_strip]))
            )
        else:
            entries.append((_TILE_WIDTH, _T_SHORT, 1, _pack_array(_T_SHORT, [tw])))
            entries.append((_TILE_LENGTH, _T_SHORT, 1, _pack_array(_T_SHORT, [th])))
        a, _b, c, _d, e, f = img.transform
        entries.append(
            (_MODEL_PIXEL_SCALE, _T_DOUBLE, 3, _pack_array(_T_DOUBLE, [abs(a), abs(e), 0.0]))
        )
        entries.append(
            (_MODEL_TIEPOINT, _T_DOUBLE, 6, _pack_array(_T_DOUBLE, [0, 0, 0, c, f, 0]))
        )
        gk = _geokeys(img)
        entries.append((_GEO_KEY_DIRECTORY, _T_SHORT, len(gk), _pack_array(_T_SHORT, gk)))
        if img.alpha:
            # ExtraSamples: the last sample is unassociated alpha — what
            # GDAL writes for an explicit nodata-mask band (the reference's
            # consolidation emits this band,
            # handler_consolidation_test.go:16-178 "bands incl. alpha")
            entries.append((_EXTRA_SAMPLES, _T_SHORT, 1, _pack_array(_T_SHORT, [2])))
        if img.nodata is not None:
            nd = _pack_array(_T_ASCII, repr(img.nodata))
            entries.append((_GDAL_NODATA, _T_ASCII, len(nd), nd))
        if jpeg_tables_payload is not None:
            entries.append(
                (
                    _JPEG_TABLES,
                    _T_UNDEFINED,
                    len(jpeg_tables_payload),
                    jpeg_tables_payload,
                )
            )
        entries.sort(key=lambda entry: entry[0])
        p = _PlannedIFD(entries, payloads, len(payloads))
        p.offsets_entry_idx = next(
            i
            for i, entry in enumerate(entries)
            if entry[0] in (_TILE_OFFSETS, _STRIP_OFFSETS)
        )
        planned.append(p)

    big = bigtiff
    if big is None:
        total_payload = sum(len(b) for p in planned for b in p.tile_payloads)
        big = total_payload > _BIGTIFF_AUTO_THRESHOLD
    if big:
        for p in planned:
            tag, _ft, cnt, payload = p.entries[p.offsets_entry_idx]
            p.entries[p.offsets_entry_idx] = (tag, _T_LONG8, cnt, payload)

    # ---- layout pass: header | IFD+values per image | tile data
    off_sz = 8 if big else 4  # per-element size of the offsets arrays
    inline_cap = 8 if big else 4  # value-fits-in-entry capacity
    entry_sz = 20 if big else 12
    pos = 16 if big else 8
    for p in planned:
        p.ifd_offset = pos
        pos += (8 + entry_sz * len(p.entries) + 8) if big else (
            2 + entry_sz * len(p.entries) + 4
        )
        p.extra_offset = pos
        for tag, _ft, _cnt, payload in p.entries:
            size = (
                off_sz * p.n_tiles
                if tag in (_TILE_OFFSETS, _STRIP_OFFSETS)
                else len(payload)
            )
            if size > inline_cap:
                pos += (size + 1) & ~1  # keep offsets even

    # tile data region
    if tile_order == "block":
        grids = {(p.n_tiles, len(p.tile_payloads)) for p in planned}
        if len({p.n_tiles for p in planned}) != 1:
            raise ValueError("tile_order='block' requires identical grids")
        _ = grids
        order = [
            (pi, ti)
            for ti in range(planned[0].n_tiles)
            for pi in range(len(planned))
        ]
    elif tile_order == "image":
        order = [
            (pi, ti) for pi, p in enumerate(planned) for ti in range(p.n_tiles)
        ]
    else:
        # full interlacing pattern (clauses + selectors)
        from geocube_spark.operators.interlace import interlace_order

        if image_keys is None or len(image_keys) != len(planned):
            raise ValueError(
                "a pattern tile_order requires image_keys (one "
                "{'Z','R','B'} dict per image)"
            )
        pairs = [
            (pi, ti) for pi, p in enumerate(planned) for ti in range(p.n_tiles)
        ]
        items = [
            {
                "Z": int(image_keys[pi].get("Z", 0)),
                "R": int(image_keys[pi].get("R", 0)),
                "B": int(image_keys[pi].get("B", 0)),
                "T": ti,
            }
            for pi, ti in pairs
        ]
        order = [pairs[j] for j in interlace_order(items, tile_order)]
    for p in planned:
        p.tile_offsets = [0] * p.n_tiles
    for pi, ti in order:
        p = planned[pi]
        p.tile_offsets[ti] = pos
        pos += len(p.tile_payloads[ti])

    # ---- emit
    out = bytearray()
    if big:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, planned[0].ifd_offset)
    else:
        out += struct.pack("<2sHI", b"II", 42, planned[0].ifd_offset)
    for idx, p in enumerate(planned):
        assert len(out) == p.ifd_offset
        next_ifd = planned[idx + 1].ifd_offset if idx + 1 < len(planned) else 0
        out += struct.pack("<Q" if big else "<H", len(p.entries))
        extra = bytearray()
        extra_pos = p.extra_offset
        for tag, ftype, count, payload in p.entries:
            if tag in (_TILE_OFFSETS, _STRIP_OFFSETS):
                payload = _pack_array(ftype, p.tile_offsets)
            if len(payload) <= inline_cap:
                if big:
                    out += struct.pack("<HHQ", tag, ftype, count)
                else:
                    out += struct.pack("<HHI", tag, ftype, count)
                out += payload.ljust(inline_cap, b"\x00")
            else:
                if big:
                    out += struct.pack("<HHQQ", tag, ftype, count, extra_pos)
                else:
                    out += struct.pack("<HHII", tag, ftype, count, extra_pos)
                padded = payload + (b"\x00" if len(payload) % 2 else b"")
                extra += padded
                extra_pos += len(padded)
        out += struct.pack("<Q" if big else "<I", next_ifd)
        out += extra
    for pi, ti in order:
        p = planned[pi]
        assert len(out) == p.tile_offsets[ti]
        out += p.tile_payloads[ti]
    return bytes(out)


# --------------------------------------------------------------------- read

@dataclass
class TiffImage:
    """One decoded IFD: arrays + georeferencing + physical tile layout."""

    bands: np.ndarray
    transform: tuple[float, float, float, float, float, float]
    epsg: int
    nodata: float | None
    subfile_type: int
    tile_offsets: list[int]
    tile_byte_counts: list[int]
    tile_width: int = 0
    tile_height: int = 0
    planar: int = 1  # TIFF PlanarConfiguration: 1 chunky, 2 per-band planes
    alpha: bool = False  # ExtraSamples marks the last band as alpha


def _tiff_version(data: bytes) -> bool:
    """True for BigTIFF (version 43), False for classic (42); raises on
    anything else."""
    if data[:4] == b"II\x2a\x00":
        return False
    if data[:4] == b"II\x2b\x00":
        bytesize, zero = struct.unpack_from("<HH", data, 4)
        if bytesize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        return True
    raise ValueError("not a little-endian TIFF/BigTIFF")


def read_tiff(data: bytes) -> list[TiffImage]:
    """Minimal tiled/strip (Big)TIFF reader (the writer's inverse; also
    reads GDAL planar/chunky single-band output).  Used by tests and the
    read-back verification path of the consolidation sink."""
    big = _tiff_version(data)
    if big:
        (ifd_off,) = struct.unpack_from("<Q", data, 8)
    else:
        (ifd_off,) = struct.unpack_from("<I", data, 4)
    entry_sz = 20 if big else 12
    images: list[TiffImage] = []
    while ifd_off:
        if big:
            (n_entries,) = struct.unpack_from("<Q", data, ifd_off)
            entries_base = ifd_off + 8
        else:
            (n_entries,) = struct.unpack_from("<H", data, ifd_off)
            entries_base = ifd_off + 2
        tags: dict[int, list] = {}
        for i in range(n_entries):
            if big:
                tag, ftype, count, raw = struct.unpack_from(
                    "<HHQ8s", data, entries_base + entry_sz * i
                )
            else:
                tag, ftype, count, raw = struct.unpack_from(
                    "<HHI4s", data, entries_base + entry_sz * i
                )
            size = _TYPE_SIZE[ftype] * count
            if size <= len(raw):
                buf = raw[:size]
            else:
                (off,) = struct.unpack("<Q" if big else "<I", raw)
                buf = data[off : off + size]
            if ftype == _T_ASCII:
                tags[tag] = [buf.rstrip(b"\x00").decode()]
            elif ftype == _T_UNDEFINED:
                tags[tag] = [bytes(buf)]
            else:
                tags[tag] = list(struct.unpack(f"<{count}{_TYPE_FMT[ftype]}", buf))
        (ifd_off,) = struct.unpack_from(
            "<Q" if big else "<I", data, entries_base + entry_sz * n_entries
        )

        w, h = tags[_IMAGE_WIDTH][0], tags[_IMAGE_LENGTH][0]
        nb = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
        comp = tags.get(_COMPRESSION, [1])[0]
        if comp not in (1, 5, 7, 8, 32773, 50000):
            raise ValueError(f"unsupported TIFF compression code {comp}")
        predictor = tags.get(_PREDICTOR, [1])[0]
        if predictor not in (1, 2):
            raise ValueError(f"unsupported TIFF predictor {predictor}")
        bits = tags[_BITS_PER_SAMPLE][0]
        fmt = tags.get(_SAMPLE_FORMAT, [1])[0]
        dtype = np.dtype(_TIFF_DTYPE[(bits, fmt)])
        planar = tags.get(_PLANAR_CONFIG, [1])[0]

        photometric = tags.get(_PHOTOMETRIC, [1])[0]
        jpeg_tables = None
        if comp == 7:
            from geocube_spark.sources import jpeg as _jpeg

            if dtype != np.uint8:
                raise ValueError("JPEG compression requires 8-bit samples")
            raw_tables = tags.get(_JPEG_TABLES)
            if raw_tables:
                jpeg_tables = _jpeg.parse_tables(raw_tables[0])

        def _payload(off: int, cnt: int) -> bytes:
            payload = data[off : off + cnt]
            if comp == 7:
                # decode to pixels, re-serialize in the layout the tile/strip
                # reshape below expects (chunky interleaved or single plane)
                arr = _jpeg.decode_jpeg(payload, jpeg_tables)
                if photometric == 6 and arr.ndim == 3:
                    arr = _jpeg.ycbcr_to_rgb(arr)
                return arr.astype(dtype).tobytes()
            if comp == 8:
                payload = zlib.decompress(payload)
            elif comp == 5:
                payload = lzw_decode(payload)
            elif comp == 32773:
                payload = packbits_decode(payload)
            elif comp == 50000:
                # GDAL ZSTD (RFC 8878) — decompression-only pure-Python codec
                from geocube_spark.functions.zstd import decompress as _zstd

                payload = _zstd(payload)
            return payload

        if _TILE_WIDTH not in tags:
            # strip-based layout — plain gdal_translate output (non-COG)
            rps = tags.get(_ROWS_PER_STRIP, [h])[0]
            offsets = tags[_STRIP_OFFSETS]
            counts = tags[_STRIP_BYTE_COUNTS]
            strips_per_plane = -(-h // rps)
            bands = np.zeros((nb, h, w), dtype=dtype)
            for idx, (off, cnt) in enumerate(zip(offsets, counts)):
                raw = _payload(off, cnt)
                if planar == 1 and nb > 1:
                    strip = np.frombuffer(raw, dtype=dtype).reshape(-1, w, nb)
                    if predictor == 2:
                        strip = _predict2_decode(strip, axis=1)
                    y0 = idx * rps
                    for b in range(nb):
                        bands[b, y0 : y0 + strip.shape[0]] = strip[:, :, b]
                else:
                    strip = np.frombuffer(raw, dtype=dtype).reshape(-1, w)
                    if predictor == 2:
                        strip = _predict2_decode(strip, axis=1)
                    b, si = divmod(idx, strips_per_plane)
                    y0 = si * rps
                    bands[b, y0 : y0 + strip.shape[0]] = strip
            images.append(
                TiffImage(
                    bands=bands,
                    transform=_geo_transform(tags),
                    epsg=_geo_epsg(tags),
                    nodata=_geo_nodata(tags),
                    subfile_type=tags.get(_NEW_SUBFILE_TYPE, [0])[0],
                    tile_offsets=offsets,
                    tile_byte_counts=counts,
                    tile_width=w,
                    tile_height=rps,
                    planar=planar,
                )
            )
            continue

        tw, th = tags[_TILE_WIDTH][0], tags[_TILE_LENGTH][0]
        offsets, counts = tags[_TILE_OFFSETS], tags[_TILE_BYTE_COUNTS]
        across, down = _tile_grid(w, h, tw, th)

        if planar == 2 or nb == 1:
            bands = np.zeros((nb, down * th, across * tw), dtype=dtype)
            for idx, (off, cnt) in enumerate(zip(offsets, counts)):
                tile = np.frombuffer(_payload(off, cnt), dtype=dtype).reshape(th, tw)
                if predictor == 2:
                    tile = _predict2_decode(tile, axis=1)
                b, rem = divmod(idx, across * down)
                ty, tx = divmod(rem, across)
                bands[b, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        else:  # chunky multiband
            bands = np.zeros((nb, down * th, across * tw), dtype=dtype)
            for idx, (off, cnt) in enumerate(zip(offsets, counts)):
                tile = np.frombuffer(_payload(off, cnt), dtype=dtype).reshape(th, tw, nb)
                if predictor == 2:
                    # chunky horizontal differencing is per-sample along the
                    # pixel-column axis (axis 1 of (rows, cols, samples))
                    tile = _predict2_decode(tile, axis=1)
                ty, tx = divmod(idx, across)
                for b in range(nb):
                    bands[b, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile[:, :, b]
        bands = bands[:, :h, :w]

        images.append(
            TiffImage(
                bands=bands,
                transform=_geo_transform(tags),
                epsg=_geo_epsg(tags),
                nodata=_geo_nodata(tags),
                subfile_type=tags.get(_NEW_SUBFILE_TYPE, [0])[0],
                tile_offsets=offsets,
                tile_byte_counts=counts,
                tile_width=tw,
                tile_height=th,
                planar=planar,
                alpha=any(
                    v in (1, 2) for v in tags.get(_EXTRA_SAMPLES, [])
                ),
            )
        )
    return images


def _geo_transform(tags: dict) -> tuple[float, float, float, float, float, float]:
    scale = tags.get(_MODEL_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(_MODEL_TIEPOINT, [0.0] * 6)
    return (scale[0], 0.0, tie[3], 0.0, -scale[1], tie[4])


def _geo_epsg(tags: dict) -> int:
    gk = tags.get(_GEO_KEY_DIRECTORY)
    if gk:
        for i in range(gk[3]):
            kid, loc, _cnt, val = gk[4 + 4 * i : 8 + 4 * i]
            if loc == 0 and kid in (_GEOGRAPHIC_TYPE, _PROJECTED_CS_TYPE):
                return val
    return 0


def _geo_nodata(tags: dict) -> float | None:
    if _GDAL_NODATA in tags:
        return float(tags[_GDAL_NODATA][0])
    return None


def header_size(data: bytes) -> int:
    """First tile byte — everything before it is IFD structure.  The COG
    contract is that this prefix is small and contiguous.

    Walks only the IFD chain and TileOffsets arrays; never touches (much
    less decompresses) tile payloads, so it is O(header) not O(container).
    """
    big = _tiff_version(data)
    if big:
        (ifd_off,) = struct.unpack_from("<Q", data, 8)
    else:
        (ifd_off,) = struct.unpack_from("<I", data, 4)
    entry_sz = 20 if big else 12
    first: int | None = None
    while ifd_off:
        if big:
            (n_entries,) = struct.unpack_from("<Q", data, ifd_off)
            entries_base = ifd_off + 8
        else:
            (n_entries,) = struct.unpack_from("<H", data, ifd_off)
            entries_base = ifd_off + 2
        for i in range(n_entries):
            if big:
                tag, ftype, count, raw = struct.unpack_from(
                    "<HHQ8s", data, entries_base + entry_sz * i
                )
            else:
                tag, ftype, count, raw = struct.unpack_from(
                    "<HHI4s", data, entries_base + entry_sz * i
                )
            if tag != _TILE_OFFSETS:
                continue
            size = _TYPE_SIZE[ftype] * count
            if size <= len(raw):
                buf = raw[:size]
            else:
                (off,) = struct.unpack("<Q" if big else "<I", raw)
                buf = data[off : off + size]
            offsets = struct.unpack(f"<{count}{_TYPE_FMT[ftype]}", buf)
            lo = min(offsets)
            first = lo if first is None else min(first, lo)
        (ifd_off,) = struct.unpack_from(
            "<Q" if big else "<I", data, entries_base + entry_sz * n_entries
        )
    if first is None:
        raise ValueError("no tiled IFDs")
    return first
