"""Pure-Python Zstandard DECOMPRESSION (RFC 8878).

Public sources only: RFC 8878 ("Zstandard Compression and the
application/zstd Media Type") defines every structure below — frame and
block framing (§3.1), the literals section with Huffman coding (§3.1.1.3,
§4.2), the sequences section with FSE entropy coding (§3.1.1.4, §4.1),
repeat offsets (§3.1.1.5) — and the reference educational decoder
(facebook/zstd doc/educational_decoder, BSD) documents the header-parsing
corner cases in prose.  No code is vendored; this is a from-spec
implementation.

Decompression-only by design: the engine never needs to WRITE zstd (its
own sinks use deflate/LZW, both already implemented), but GDAL emits
ZSTD-compressed GeoTIFFs (TIFF compression code 50000) and the
reference's ``image_cast8.tif`` golden is one — ``sources/gtiff.py``
dispatches code 50000 here so that golden replays like the other eight.

Pure Python is fast enough for its one consumer (strip-sized payloads,
tens of KB); it is NOT a hot-path codec and never runs inside a query
plan.
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# §3.1.1.3.2.2 predefined FSE distributions (values are probabilities;
# -1 = "less-than-one" probability)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

# §3.1.1.4 code -> (baseline, extra bits) for literals lengths …
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
# … and match lengths
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# hard ceilings from §4.1.1 / §3.1.1.3.2.1 — a stream exceeding them is corrupt
_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9, "huf_weights": 6}


class ZstdError(ValueError):
    pass


class _BackBits:
    """Backwards bitstream (§4.1): bits are written forward but READ from
    the last byte toward the first; the highest set bit of the final byte
    is a sentinel marking where reading starts."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("corrupt bitstream: missing sentinel")
        self.val = int.from_bytes(data, "little")
        self.pos = self.val.bit_length() - 1  # consume the sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        # zero-fill past the start (legal only for final Huffman peeks)
        return (self.val << -self.pos) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        return (self.val << -p) & ((1 << n) - 1)


class _FwdBits:
    """Forward LSB-first bitstream — only the FSE table header uses it
    (§4.1.1)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.pos = 0

    def read(self, n: int) -> int:
        v = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


def _fse_read_ncount(fwd: _FwdBits, max_log: int) -> tuple[list[int], int]:
    """§4.1.1 FSE table description: accuracy log + variable-bit
    probabilities with the low-threshold trick and 2-bit zero repeats."""
    al = fwd.read(4) + 5
    if al > max_log:
        raise ZstdError(f"FSE accuracy {al} > max {max_log}")
    remaining = (1 << al) + 1
    counts: list[int] = []
    while remaining > 1 and len(counts) < 256:
        bits = remaining.bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fwd.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        counts.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            rep = fwd.read(2)
            while rep == 3:
                counts.extend((0, 0, 0))
                rep = fwd.read(2)
            counts.extend([0] * rep)
    if remaining != 1:
        raise ZstdError("FSE probabilities do not sum to table size")
    return counts, al


def _fse_build(counts: list[int], al: int):
    """§4.1.1 table construction: -1 symbols at the high end, positive
    probabilities spread with the (5/8·size + 3) step, then per-cell
    (symbol, nb_bits, baseline) transitions."""
    size = 1 << al
    sym = [0] * size
    high = size - 1
    for s, p in enumerate(counts):
        if p == -1:
            sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(counts):
        for _ in range(max(p, 0)):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE spread did not close")
    nxt = [p if p > 0 else 1 for p in counts]
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = sym[i]
        x = nxt[s]
        nxt[s] += 1
        nb = al - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return sym, nbits, base, al


def _fse_rle(symbol: int):
    """RLE mode (§3.1.1.3.2.1): a 1-cell table always emitting one symbol."""
    return [symbol], [0], [0], 0


# --------------------------------------------------------------- Huffman


def _huf_build(weights: list[int]):
    """§4.2.1: weights (last one implicit, reconstructed here) -> a flat
    max_bits-wide lookup of (symbol, code length)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("empty Huffman weights")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("Huffman weights do not leave a power-of-two gap")
    weights = weights + [left.bit_length()]
    size = 1 << max_bits
    table_sym = bytearray(size)
    table_nb = bytearray(size)
    # fill ascending by weight (longest codes first), symbol order within
    idx = 0
    for w in range(1, max_bits + 1):
        for s, ws in enumerate(weights):
            if ws == w:
                span = 1 << (w - 1)
                table_sym[idx : idx + span] = bytes([s]) * span
                table_nb[idx : idx + span] = bytes([max_bits + 1 - w]) * span
                idx += span
    if idx != size:
        raise ZstdError("Huffman table underfilled")
    return bytes(table_sym), bytes(table_nb), max_bits


def _huf_read_weights(data: bytes) -> tuple[list[int], int]:
    """§4.2.1.2/3: direct 4-bit weights or an FSE-compressed weight
    stream decoded with two interleaved states.  Returns (weights,
    header bytes consumed)."""
    hb = data[0]
    if hb >= 128:  # direct representation
        n = hb - 127
        nbytes = (n + 1) // 2
        ws = []
        for i in range(n):
            b = data[1 + i // 2]
            ws.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return ws, 1 + nbytes
    comp = data[1 : 1 + hb]
    fwd = _FwdBits(comp)
    counts, al = _fse_read_ncount(fwd, _MAX_ACCURACY["huf_weights"])
    sym, nbits, base, al = _fse_build(counts, al)
    stream = comp[fwd.bytes_consumed():]
    bs = _BackBits(stream)
    s1 = bs.read(al)
    s2 = bs.read(al)
    ws: list[int] = []
    while len(ws) < 255:
        ws.append(sym[s1])
        if bs.pos < nbits[s1]:
            ws.append(sym[s2])
            break
        s1 = base[s1] + bs.read(nbits[s1])
        ws.append(sym[s2])
        if bs.pos < nbits[s2]:
            ws.append(sym[s1])
            break
        s2 = base[s2] + bs.read(nbits[s2])
    return ws, 1 + hb


def _huf_decode(table, data: bytes, n_out: int) -> bytes:
    table_sym, table_nb, max_bits = table
    bs = _BackBits(data)
    out = bytearray(n_out)
    for i in range(n_out):
        idx = bs.peek(max_bits)
        out[i] = table_sym[idx]
        bs.pos -= table_nb[idx]
    return bytes(out)


# --------------------------------------------------------------- literals


def _decode_literals(block: bytes, ctx: dict) -> tuple[bytes, int]:
    """§3.1.1.3: returns (literals, bytes consumed from the block)."""
    b0 = block[0]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_format in (0, 2):
            rsize, hdr = b0 >> 3, 1
        elif size_format == 1:
            rsize, hdr = (b0 >> 4) | (block[1] << 4), 2
        else:
            rsize, hdr = (b0 >> 4) | (block[1] << 4) | (block[2] << 12), 3
        if ltype == 0:
            return bytes(block[hdr : hdr + rsize]), hdr + rsize
        return bytes([block[hdr]]) * rsize, hdr + 1
    # Compressed (2) / Treeless (3)
    if size_format == 0:
        streams, hdr = 1, 3
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12)
        rsize, csize = v & 0x3FF, v >> 10
    elif size_format == 1:
        streams, hdr = 4, 3
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12)
        rsize, csize = v & 0x3FF, v >> 10
    elif size_format == 2:
        streams, hdr = 4, 4
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12) | (block[3] << 20)
        rsize, csize = v & 0x3FFF, v >> 14
    else:
        streams, hdr = 4, 5
        v = (b0 >> 4 | (block[1] << 4) | (block[2] << 12)
             | (block[3] << 20) | (block[4] << 28))
        rsize, csize = v & 0x3FFFF, v >> 18
    payload = block[hdr : hdr + csize]
    if ltype == 2:
        ws, consumed = _huf_read_weights(payload)
        ctx["huf"] = _huf_build(ws)
        payload = payload[consumed:]
    elif "huf" not in ctx:
        raise ZstdError("treeless literals with no previous Huffman table")
    table = ctx["huf"]
    if streams == 1:
        return _huf_decode(table, payload, rsize), hdr + csize
    # 4-stream layout (§3.1.1.3.1.6): 6-byte jump table of the first
    # three compressed sizes; regenerated sizes are ceil(rsize/4) ×3 + rest
    if len(payload) < 6:
        raise ZstdError("4-stream literals too short")
    s1 = payload[0] | (payload[1] << 8)
    s2 = payload[2] | (payload[3] << 8)
    s3 = payload[4] | (payload[5] << 8)
    body = payload[6:]
    sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
    if sizes[3] < 0:
        raise ZstdError("4-stream jump table overruns payload")
    part = (rsize + 3) // 4
    outs = []
    off = 0
    for i, sz in enumerate(sizes):
        n = part if i < 3 else rsize - 3 * part
        outs.append(_huf_decode(table, body[off : off + sz], n))
        off += sz
    return b"".join(outs), hdr + csize


# -------------------------------------------------------------- sequences


def _seq_table(mode: int, fwd_data: bytes, ctx: dict, key: str, default):
    """§3.1.1.3.2.1 symbol compression modes: predefined / RLE /
    FSE-compressed / repeat.  Returns (table, bytes consumed)."""
    if mode == 0:
        counts, al = default
        tab = ctx.get(("pre", key))
        if tab is None:
            tab = _fse_build(list(counts), al)
            ctx[("pre", key)] = tab
        ctx[key] = tab
        return tab, 0
    if mode == 1:
        tab = _fse_rle(fwd_data[0])
        ctx[key] = tab
        return tab, 1
    if mode == 2:
        fwd = _FwdBits(fwd_data)
        counts, al = _fse_read_ncount(fwd, _MAX_ACCURACY[key])
        tab = _fse_build(counts, al)
        ctx[key] = tab
        return tab, fwd.bytes_consumed()
    if key not in ctx:
        raise ZstdError(f"repeat mode for {key} with no previous table")
    return ctx[key], 0


def _decode_sequences(block: bytes, literals: bytes, out: bytearray, ctx: dict) -> None:
    """§3.1.1.4: parse the sequences section and execute it against the
    sliding window (``out`` holds the whole frame so far)."""
    b0 = block[0]
    if b0 == 0:
        out.extend(literals)
        return
    if b0 < 128:
        n_seq, p = b0, 1
    elif b0 < 255:
        n_seq, p = ((b0 - 128) << 8) + block[1], 2
    else:
        n_seq, p = block[1] + (block[2] << 8) + 0x7F00, 3
    modes = block[p]
    p += 1
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    ll_tab, used = _seq_table(ll_mode, block[p:], ctx, "ll", _LL_DEFAULT)
    p += used
    of_tab, used = _seq_table(of_mode, block[p:], ctx, "of", _OF_DEFAULT)
    p += used
    ml_tab, used = _seq_table(ml_mode, block[p:], ctx, "ml", _ML_DEFAULT)
    p += used

    bs = _BackBits(block[p:])
    ll_sym, ll_nb, ll_base, ll_al = ll_tab
    of_sym, of_nb, of_base, of_al = of_tab
    ml_sym, ml_nb, ml_base, ml_al = ml_tab
    # state init order: literals, offsets, match (§3.1.1.4)
    ll_s = bs.read(ll_al)
    of_s = bs.read(of_al)
    ml_s = bs.read(ml_al)
    rep = ctx.setdefault("rep", [1, 4, 8])
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_sym[of_s]
        ml_code = ml_sym[ml_s]
        ll_code = ll_sym[ll_s]
        # extra-bit read order: offset, match, literals
        offset_value = (1 << of_code) + bs.read(of_code)
        match_len = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        lit_len = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        # repeat offsets (§3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        else:
            idx = offset_value + (1 if lit_len == 0 else 0)
            if idx == 1:
                offset = rep[0]
            elif idx == 2:
                offset = rep[1]
                rep[1], rep[0] = rep[0], offset
            elif idx == 3:
                offset = rep[2]
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        out.extend(literals[lit_pos : lit_pos + lit_len])
        lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("match offset beyond window")
        if offset >= match_len:
            start = len(out) - offset
            out.extend(out[start : start + match_len])
        else:  # overlapping copy, byte semantics
            for _ in range(match_len):
                out.append(out[-offset])
        if i < n_seq - 1:  # state update order: LL, ML, OF; skipped on last
            ll_s = ll_base[ll_s] + bs.read(ll_nb[ll_s])
            ml_s = ml_base[ml_s] + bs.read(ml_nb[ml_s])
            of_s = of_base[of_s] + bs.read(of_nb[of_s])
    if bs.pos != 0:
        raise ZstdError(f"sequence bitstream not fully consumed ({bs.pos} bits left)")
    out.extend(literals[lit_pos:])


# ----------------------------------------------------------------- frames


def decompress(data: bytes) -> bytes:
    """Decompress a (possibly multi-frame) zstd payload."""
    view = memoryview(data)
    out = bytearray()
    while len(view) >= 4:
        magic = int.from_bytes(view[:4], "little")
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = int.from_bytes(view[4:8], "little")
            view = view[8 + size:]
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad magic {magic:#x}")
        view = _frame(view[4:], out)
    if len(view):
        # a truncated payload must not decode "successfully"
        raise ZstdError(f"{len(view)} trailing byte(s) after the last frame")
    return bytes(out)


def _frame(view: memoryview, out: bytearray) -> memoryview:
    fhd = view[0]
    pos = 1
    single_segment = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_flag = fhd >> 6
    if not single_segment:
        pos += 1  # window descriptor: informational for a full-buffer decoder
    pos += did_size  # dictionaries unsupported; GDAL never uses them
    if did_size and int.from_bytes(view[pos - did_size : pos], "little"):
        raise ZstdError("dictionaries not supported")
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    pos += fcs_size
    frame_start = len(out)
    ctx: dict = {}
    while True:
        bh = int.from_bytes(view[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:  # raw
            out.extend(view[pos : pos + bsize])
            pos += bsize
        elif btype == 1:  # RLE
            out.extend(bytes([view[pos]]) * bsize)
            pos += 1
        elif btype == 2:  # compressed
            block = bytes(view[pos : pos + bsize])
            pos += bsize
            literals, used = _decode_literals(block, ctx)
            _decode_sequences(block[used:], literals, out, ctx)
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    del frame_start
    if checksum:
        pos += 4  # xxh64 low bytes — presence honored, value not verified
    return view[pos:]
