"""Baseline-sequential JPEG codec (ITU-T T.81), pure numpy/stdlib.

Closes the last TIFF-interop gap: externally-produced JPEG-compressed
GeoTIFFs (TIFF compression 7 — common for aerial/basemap COGs, where the
reference ingests them via GDAL: /root/reference/internal/image/image.go:260-286)
can now be decoded tile-by-tile on executors, and the consolidation sink
can emit JPEG tiles for visual products.

Scope (documented, honest):

* DECODE: baseline sequential DCT, 8-bit, Huffman; 1- or 3-component;
  arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0 — GDAL's
  PHOTOMETRIC=YCBCR default); restart markers; TIFF "abbreviated"
  streams whose DQT/DHT arrive separately via the JPEGTables tag (347).
  Progressive, arithmetic-coded, 12-bit and hierarchical streams raise.
* ENCODE: baseline sequential, quality-scaled Annex K quantization
  tables, standard Annex K Huffman tables, no subsampling (4:4:4),
  grayscale or YCbCr.  Each stream is standalone (tables included) —
  valid for TIFF tiles without a JPEGTables tag.
* Entropy coding is per-coefficient Python (inherently sequential);
  DCT/quantization are vectorized numpy.  This is the interop/correctness
  path — a production hot loop would bind a native codec via the same
  per-tile payload interface (see sources/gtiff.py `_payload`).

Validation: encoder/decoder round-trip at multiple qualities and shapes,
analytic vectors (constant blocks are DC-only and reconstruct exactly;
single-coefficient IDCT basis checks), and marker-level structure tests —
no image library exists in this container to cross-check against, so the
test suite pins the math down analytically instead (tests/test_jpeg.py).

All tables and equations below are from the public JPEG standard
(ITU-T T.81 Annex K) and the JFIF colour-space note.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16], huffval)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: block = C.T @ coefs @ C ; coefs = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K base table."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _tables_segments(quality: int, gray: bool) -> bytes:
    """The DQT + DHT marker segments for the standard tables at the given
    quality — either inlined into a standalone stream or carried once in
    a TIFF JPEGTables tag."""
    qlum = scaled_quant(QUANT_LUM, quality)
    qchr = scaled_quant(QUANT_CHROM, quality)
    out = bytearray()
    for tq, q in ([(0, qlum)] if gray else [(0, qlum), (1, qchr)]):
        zz = q.flat[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in zz
        )
    hts = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        hts += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tcth, (bits, vals) in hts:
        seg = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    return bytes(out)


def jpeg_tables_stream(quality: int = 75, gray: bool = True) -> bytes:
    """The abbreviated tables-only stream (SOI, DQT, DHT, EOI) a TIFF
    JPEGTables tag (347) carries, shared by every tile of the file."""
    return b"\xff\xd8" + _tables_segments(quality, gray) + b"\xff\xd9"


# --------------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 procedure."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over an entropy-coded segment; 0xFF00 stuffing is
    consumed; RSTn markers are surfaced via ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG stream: truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError(
                    "corrupt JPEG stream: truncated marker at end of data"
                )
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or another marker mid-stream: pad with 1s (T.81 F.2.2.5)
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align, consume the RSTn marker."""
        self.buf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError(
                "corrupt JPEG stream: expected RSTn marker before end of data"
            )
        self.pos += 2


class _RestartPending(Exception):
    pass


def _read_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(raw: int, t: int) -> int:
    if t == 0:
        return 0
    return raw if raw >= (1 << (t - 1)) else raw - (1 << t) + 1


# ---------------------------------------------------------------- decode


def parse_tables(data: bytes) -> dict:
    """Collect DQT/DHT from an abbreviated tables stream (the TIFF
    JPEGTables tag payload: SOI, tables, EOI)."""
    tables = {"qt": {}, "dc": {}, "ac": {}, "dri": 0}
    _scan_stream(data, tables, tables_only=True)
    return tables


def _scan_stream(data: bytes, tables: dict, tables_only: bool = False):
    """March the marker stream, filling `tables`; returns (sof, sos, pos)
    when a scan is reached (tables_only=False)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    sof = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals
                tables["qt"][tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                p += 17 + n
                tables["ac" if tc else "dc"][th] = _decode_table(bits, vals)
        elif marker == 0xDD:  # DRI
            (tables["dri"],) = struct.unpack_from(">H", seg, 0)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            sof = seg
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(only baseline sequential is implemented)"
            )
        elif marker == 0xDA:  # SOS
            if tables_only:
                raise ValueError("scan data in a tables-only stream")
            if sof is None:
                raise ValueError("SOS before SOF")
            return sof, seg, pos + seglen
        pos += seglen
    if tables_only:
        return None
    raise ValueError("no scan in stream")


def decode_jpeg(data: bytes, tables: dict | None = None) -> np.ndarray:
    """Decode a baseline JPEG stream to (h, w) or (h, w, ncomp) uint8.

    ``tables`` carries DQT/DHT from a TIFF JPEGTables tag for abbreviated
    per-tile streams; tables defined in the stream itself override.
    Components are returned in stream order WITHOUT colour conversion —
    callers decide (TIFF photometric 6 means YCbCr: apply
    :func:`ycbcr_to_rgb`).

    Malformed external input (truncated / bit-flipped streams) always
    raises ``ValueError('corrupt JPEG stream: ...')`` — the decode
    boundary converts every low-level slip (index/key/overflow/struct
    errors from garbage headers or entropy data) into the one documented
    error type, fuzz-asserted in tests/test_jpeg.py.
    """
    try:
        return _decode_jpeg_unguarded(data, tables)
    except ValueError:
        raise
    except (
        IndexError,
        KeyError,
        OverflowError,
        ZeroDivisionError,
        StopIteration,
        MemoryError,
        struct.error,
    ) as e:
        raise ValueError(
            f"corrupt JPEG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg_unguarded(data: bytes, tables: dict | None) -> np.ndarray:
    t = {
        "qt": dict((tables or {}).get("qt", {})),
        "dc": dict((tables or {}).get("dc", {})),
        "ac": dict((tables or {}).get("ac", {})),
        "dri": (tables or {}).get("dri", 0),
    }
    sof, sos, pos = _scan_stream(data, t)
    precision = sof[0]
    if precision != 8:
        raise ValueError(f"unsupported JPEG precision {precision}")
    h, w = struct.unpack_from(">HH", sof, 1)
    ncomp = sof[5]
    comps = []
    for i in range(ncomp):
        cid, hv, tq = sof[6 + 3 * i : 9 + 3 * i]
        comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
    ns = sos[0]
    order = []
    for i in range(ns):
        cs, td_ta = sos[1 + 2 * i : 3 + 2 * i]
        comp = next(c for c in comps if c["id"] == cs)
        comp["td"], comp["ta"] = td_ta >> 4, td_ta & 0xF
        order.append(comp)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    reader = _BitReader(data, pos)
    dri = t["dri"]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in order:
                qt = t["qt"][c["tq"]]
                dct = t["dc"][c["td"]]
                act = t["ac"][c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        try:
                            s = _read_huffman(reader, dct)
                            diff = _extend(reader.read_bits(s), s)
                        except _RestartPending:
                            reader.sync_restart()
                            pred = {cc["id"]: 0 for cc in comps}
                            s = _read_huffman(reader, dct)
                            diff = _extend(reader.read_bits(s), s)
                        pred[c["id"]] += diff
                        coefs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_huffman(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                # a corrupt AC run would write past the
                                # 64-coefficient block (T.81 F.2.2.2 bounds)
                                raise ValueError(
                                    "corrupt JPEG stream: AC coefficient "
                                    "index exceeds 63"
                                )
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros((8, 8))
                        block.flat[ZIGZAG] = coefs
                        block *= qt
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
    out = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    stacked = np.clip(np.round(np.stack(out, axis=-1)), 0, 255).astype(np.uint8)
    return stacked[..., 0] if ncomp == 1 else stacked


def ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[..., 0].astype(np.float64)
    cb = img[..., 1].astype(np.float64) - 128.0
    cr = img[..., 2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    ycc = np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )
    return np.clip(np.round(ycc), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, qt: np.ndarray, pad_to: int = 8) -> np.ndarray:
    """(n_by, n_bx, 8, 8) quantized coefficient blocks of a padded plane.
    ``pad_to=16`` pads the luma plane so a 4:2:0 MCU grid stays whole."""
    h, w = plane.shape
    ph, pw = -(-h // pad_to) * pad_to, -(-w // pad_to) * pad_to
    padded = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
    return np.round(coefs / qt).astype(np.int64)


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coefs.flat[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _box_downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean chroma downsampling (edge-padded to even dims)."""
    h, w = plane.shape
    p = np.pad(plane.astype(np.float64), ((0, h % 2), (0, w % 2)), mode="edge")
    return np.round(
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    ycbcr: bool | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
    tables: bool = True,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) colour uint8 to a standalone
    baseline JPEG (standard tables).  3-channel input is treated as RGB
    and converted to YCbCr unless ``ycbcr=True`` (already converted).
    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2 box —
    GDAL's PHOTOMETRIC=YCBCR default shape, ~half the payload).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs (what scanned/streamed encoders emit for error
    resilience — and what exercises the decoder's restart path).
    ``tables=False`` emits an ABBREVIATED stream (no DQT/DHT) for use
    with a TIFF JPEGTables tag — see :func:`jpeg_tables_stream`."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and img.shape[-1] != 3:
        raise ValueError("encode_jpeg wants (h,w) or (h,w,3)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = subsampling == "420" and not gray
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad JPEG dimensions")
    qlum = scaled_quant(QUANT_LUM, quality)
    qchr = scaled_quant(QUANT_CHROM, quality)
    planes = (
        [img]
        if gray
        else list(np.moveaxis(img if ycbcr else rgb_to_ycbcr(img), -1, 0))
    )
    if sub:
        planes = [planes[0], _box_downsample2(planes[1]), _box_downsample2(planes[2])]

    out = bytearray(b"\xff\xd8")
    if tables:
        out += _tables_segments(quality, gray)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hv = 0x22 if (sub and i == 0) else 0x11
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum_codes = _canonical_codes(*DC_LUM)
    ac_lum_codes = _canonical_codes(*AC_LUM)
    dc_chr_codes = _canonical_codes(*DC_CHROM)
    ac_chr_codes = _canonical_codes(*AC_CHROM)
    writer = _BitWriter()
    blocks = [
        _fdct_quant(p, qlum if i == 0 else qchr, pad_to=16 if (sub and i == 0) else 8)
        for i, p in enumerate(planes)
    ]
    preds = [0] * len(planes)
    mcu = 0
    rst = 0

    def _emit_rst_if_due():
        nonlocal rst, preds
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)

    if sub:
        # 4:2:0 MCU = 2x2 luma blocks + 1 Cb + 1 Cr
        mcus_y, mcus_x = blocks[1].shape[:2]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                _emit_rst_if_due()
                mcu += 1
                for by in (0, 1):
                    for bx in (0, 1):
                        preds[0] = _encode_block(
                            writer,
                            blocks[0][2 * my + by, 2 * mx + bx],
                            preds[0],
                            dc_lum_codes,
                            ac_lum_codes,
                        )
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        writer, blocks[ci][my, mx], preds[ci],
                        dc_chr_codes, ac_chr_codes,
                    )
    else:
        n_by, n_bx = blocks[0].shape[:2]
        for by in range(n_by):
            for bx in range(n_bx):
                _emit_rst_if_due()
                mcu += 1
                for ci in range(len(planes)):
                    dc_codes = dc_lum_codes if ci == 0 else dc_chr_codes
                    ac_codes = ac_lum_codes if ci == 0 else ac_chr_codes
                    preds[ci] = _encode_block(
                        writer, blocks[ci][by, bx], preds[ci], dc_codes, ac_codes
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
