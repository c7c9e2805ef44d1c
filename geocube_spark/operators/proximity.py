"""Raster proximity: per-pixel distance to the nearest target pixel.

GDAL parity surface: ``gdal_proximity.py`` / ``GDALComputeProximity``
(-values + -maxdist semantics), the preprocessing step for
distance-to-cloud / distance-to-water masks the reference's GetCube
consumers run on exported rasters (`/root/reference/internal/image/
image.go` produces the tiles; proximity is computed client-side today —
here it is pushed into the engine as one declarative plan).

Plan shape (and why it scales):
- pass 1 (narrow, no shuffle): each block packs its target pixels into a
  BITMAP (``np.packbits`` — block_px/8 bytes, 512 B for a 64² block)
  inside one ``mapInPandas`` over the tile rows;
- each bitmap replicates to the blocks whose max-dist halo can see it
  (``ring = ceil(max_dist / block)`` — a 3x3 neighborhood for the
  common max_dist <= block case), then ONE hash shuffle groups bitmaps
  per block.  Shuffle volume is O(blocks * ring² * block_px/8) BYTES —
  independent of target density.  The previous design shuffled one
  (long, long) row per replicated target: ~160x more bytes on a dense
  mask (distance-to-water on a coastline), and O(pixels) rows at worst;
- per block, an exact squared-distance Euclidean distance transform
  (Felzenszwalb & Huttenlocher, "Distance Transforms of Sampled
  Functions", Theory of Computing 2012) runs over the assembled
  block+halo window: pass 1 is a vectorized two-sweep binary column
  transform, pass 2 the lower-envelope-of-parabolas scan per output
  row — O(window pixels) total, INDEPENDENT of how many targets the
  block sees;
- correctness of the halo: any target within Euclidean max_dist of a
  pixel differs by <= max_dist on each axis, so it lies inside the
  pixel block's ring — the window's target set is a superset of the
  Euclidean ball, and a superset min that lands <= max_dist^2 IS the
  true min.

Distances are reported as exact INTEGER squared distances (sum per
block), so the DuckDB oracle — a quadratic pixel x target join — must
match bit-for-bit with no float tolerance.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_BIG = np.int64(2**40)  # "no target" sentinel; (q-v)^2 + f stays < 2^63


_MASK_SCHEMA = StructType(
    [
        StructField("block_x", IntegerType()),
        StructField("block_y", IntegerType()),
        StructField("n_px", IntegerType()),
        StructField("mask", BinaryType()),
    ]
)


def _target_masks(
    tiles: DataFrame,
    target_value: float,
    block: int,
    extra_keys: tuple[str, ...] = (),
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (extra_keys, block): its target pixels as a packed
    bitmap (block²/8 bytes), plus the live pixel count.  Narrow
    mapInPandas — the pixel arrays never leave their scan task.
    ``carry`` columns ride along unmodified (e.g. the raw px plane when
    the EDT consumer needs the values back without a re-join)."""
    b = int(block)
    ek = list(extra_keys)
    cy = list(carry)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                arr = np.asarray(pdf["px"].iloc[i], dtype=np.float64)
                flat = np.zeros(b * b, dtype=bool)
                flat[: len(arr)] = arr == target_value
                rows.append(
                    tuple(pdf[k].iloc[i] for k in ek)
                    + tuple(pdf[c].iloc[i] for c in cy)
                    + (
                        int(pdf["block_x"].iloc[i]),
                        int(pdf["block_y"].iloc[i]),
                        len(arr),
                        np.packbits(flat).tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=ek + cy + ["block_x", "block_y", "n_px", "mask"]
            )

    schema = StructType(
        [tiles.schema[k] for k in ek + cy] + list(_MASK_SCHEMA.fields)
    )
    sel = ek + cy + ["block_x", "block_y"]
    if "px" not in sel:
        sel.append("px")
    return tiles.select(*sel).mapInPandas(pack, schema)


def _edt_1d_envelope(f: np.ndarray) -> np.ndarray:
    """Exact 1-D squared-distance transform of one scanline.

    Felzenszwalb-Huttenlocher lower envelope of the parabolas
    ``y = f[v] + (x - v)^2``: O(n) amortized — each parabola is pushed
    once and popped at most once.  ``f`` is int64 (squared distances or
    _BIG); the output is int64 and exact (the float intersection
    abscissae only order the envelope, the distances themselves are
    integer arithmetic).
    """
    n = f.shape[0]
    v = np.empty(n, dtype=np.int64)  # parabola apexes in the envelope
    z = np.empty(n + 1, dtype=np.float64)  # envelope breakpoints
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    k = 0
    ff = f.astype(np.float64)
    for q in range(1, n):
        s = (ff[q] + q * q - (ff[v[k]] + v[k] * v[k])) / (2.0 * (q - v[k]))
        while s <= z[k]:
            k -= 1
            s = (ff[q] + q * q - (ff[v[k]] + v[k] * v[k])) / (2.0 * (q - v[k]))
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf
    # evaluate the envelope left-to-right
    out = np.empty(n, dtype=np.int64)
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        dq = q - v[k]
        out[q] = np.int64(dq) * np.int64(dq) + f[v[k]]
    return out


def _edt_window(mask: np.ndarray, max_d2: int | None = None) -> np.ndarray:
    """Exact squared EDT of a boolean target mask, shape (H, W) -> int64.

    Pass 1 (columns, vectorized across all W columns at once): the 1-D
    distance to the nearest True in each column is a forward running
    minimum of ``d <- min(d_prev + 1, 0 if target)`` and the mirrored
    backward sweep — binary input makes the parabola machinery
    unnecessary along the first axis.  Pass 2 (rows): the general
    envelope scan over ``f = dy^2``.

    ``max_d2``: when the caller clips the result at a cap (both proximity
    consumers do), the row pass only needs offsets |dx| <= sqrt(max_d2) —
    any farther parabola contributes > max_d2 and clips away — so it
    becomes 2·sqrt(max_d2)+1 whole-plane ``minimum`` ops instead of a
    per-pixel Python envelope walk per row (measured ~50× on 192²
    windows: the envelope loop dominated the whole BAP query).  Values
    above ``max_d2`` are still returned > max_d2 (not exact), which is
    indistinguishable after the caller's clip.
    """
    h, w = mask.shape
    dy = np.full((h, w), _BIG, dtype=np.int64)
    run = np.full(w, _BIG, dtype=np.int64)
    for y in range(h):  # h iterations of width-w vector ops
        run = np.minimum(run + 1, np.where(mask[y], 0, _BIG))
        dy[y] = run
    run = np.full(w, _BIG, dtype=np.int64)
    for y in range(h - 1, -1, -1):
        run = np.minimum(run + 1, np.where(mask[y], 0, _BIG))
        dy[y] = np.minimum(dy[y], run)
    g = np.where(dy >= _BIG, _BIG, dy * dy)
    if max_d2 is not None:
        md = int(math.isqrt(int(max_d2)))
        out = g.copy()
        for dx in range(1, md + 1):
            d2 = np.int64(dx) * np.int64(dx)
            out[:, dx:] = np.minimum(out[:, dx:], g[:, :-dx] + d2)
            out[:, :-dx] = np.minimum(out[:, :-dx], g[:, dx:] + d2)
        return out
    out = np.empty((h, w), dtype=np.int64)
    for y in range(h):
        out[y] = _edt_1d_envelope(g[y])
    return out


_OUT_SCHEMA = StructType(
    [
        StructField("block_x", IntegerType()),
        StructField("block_y", IntegerType()),
        StructField("n_reached", LongType()),
        StructField("sum_min_d2", LongType()),
    ]
)


def _block_edt_fn(block: int, ring: int, cap: int):
    """applyInPandas kernel: one (block_x, block_y) group of neighbor
    bitmaps -> one summary row.  Unpacks each (di, dj)-offset bitmap into
    its window position, runs the exact EDT, crops to the inner block and
    reduces — O(window pixels) regardless of target density."""
    b = int(block)
    halo = ring * b
    win = b + 2 * halo

    def fn(key, pdf):
        bx, by = int(key[0]), int(key[1])
        mask = np.zeros((win, win), dtype=bool)
        n_px = 0
        for di, dj, npx, buf in zip(
            pdf["di"], pdf["dj"], pdf["n_px"], pdf["mask"]
        ):
            m = np.unpackbits(
                np.frombuffer(bytes(buf), dtype=np.uint8), count=b * b
            ).astype(bool).reshape(b, b)  # rows = j (y), cols = i (x)
            # source block = (bx - di, by - dj) -> window block slot
            c0 = (ring - int(di)) * b
            r0 = (ring - int(dj)) * b
            mask[r0 : r0 + b, c0 : c0 + b] = m
            if di == 0 and dj == 0:
                n_px = int(npx)
        d2 = _edt_window(mask, max_d2=cap)[halo : halo + b, halo : halo + b]
        # pixels exist at linear index k < n_px; k -> (i=k%b, j=k//b)
        flat = d2.reshape(-1)[:n_px]  # row-major (j, i) == linear k order
        reached = flat <= cap
        return pd.DataFrame(
            {
                "block_x": [bx],
                "block_y": [by],
                "n_reached": [int(reached.sum())],
                "sum_min_d2": [int(flat[reached].sum())],
            }
        )

    return fn


def proximity_summary(
    tiles: DataFrame,
    max_dist: int,
    target_value: float = 0.0,
    block: int = 64,
) -> DataFrame:
    """Per-block proximity census: n_reached / n_unreached pixels and the
    exact integer sum of min squared distances (targets themselves count
    as reached with distance 0).  A pixel is reached iff some target lies
    within Euclidean ``max_dist``."""
    ring = math.ceil(max_dist / block)
    offsets = [(di, dj) for di in range(-ring, ring + 1) for dj in range(-ring, ring + 1)]
    masks = _target_masks(tiles, target_value, block)
    off = F.array(
        *[F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj")) for di, dj in offsets]
    )
    # replicate each block's bitmap into every block whose halo sees it
    rep = masks.select(
        "block_x", "block_y", "n_px", "mask", F.explode(off).alias("o")
    ).select(
        (F.col("block_x") + F.col("o.di")).alias("tx"),
        (F.col("block_y") + F.col("o.dj")).alias("ty"),
        F.col("o.di").alias("di"),
        F.col("o.dj").alias("dj"),
        "n_px",
        "mask",
    )
    # one hash shuffle on the block keys; groups lacking a center row
    # (halo spill past the raster edge) emit nothing and are closed out
    # relationally below.  applyInPandas sees only rows whose TARGET
    # block exists — enforced by the semi-join against real blocks.
    real = masks.select(
        F.col("block_x").alias("tx"), F.col("block_y").alias("ty")
    )
    res = (
        rep.join(real, ["tx", "ty"], "left_semi")
        .groupBy("tx", "ty")
        .applyInPandas(
            _block_edt_fn(block, ring, int(max_dist) * int(max_dist)),
            _OUT_SCHEMA,
        )
    )
    nx = masks.select("block_x", "block_y", "n_px")
    out = nx.join(res, ["block_x", "block_y"], "left")
    return out.select(
        F.col("block_x").cast("int").alias("block_x"),
        F.col("block_y").cast("int").alias("block_y"),
        F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
        (F.col("n_px") - F.coalesce("n_reached", F.lit(0)))
        .cast("long")
        .alias("n_unreached"),
        F.coalesce("sum_min_d2", F.lit(0)).cast("long").alias("sum_min_d2"),
    ).orderBy("block_x", "block_y")


_MAP_SCHEMA = StructType(
    [
        StructField("block_x", IntegerType()),
        StructField("block_y", IntegerType()),
        StructField("d2", ArrayType(LongType())),
    ]
)


def _block_edt_map_fn(
    block: int,
    ring: int,
    cap: int,
    extra_keys: tuple[str, ...] = (),
    carry: tuple[str, ...] = (),
):
    """applyInPandas kernel emitting the PER-PIXEL clipped min squared
    distance (pixels beyond max_dist, or with no visible target, report
    cap) — the input plane for distance-weighted compositing.  The first
    ``len(extra_keys)`` key fields are pass-through layer keys (the
    batched multi-layer pass); the last two are always (block_x,
    block_y).  A group with no CENTER row (di==dj==0) is a halo spill
    past the raster edge: it emits nothing, which replaces the semi-join
    against real blocks (one shuffle fewer).  ``carry`` values are read
    off the center row and passed through."""
    b = int(block)
    halo = ring * b
    win = b + 2 * halo
    n_extra = len(extra_keys)
    out_cols = list(extra_keys) + list(carry) + ["block_x", "block_y", "d2"]

    def fn(key, pdf):
        out = {k: [v] for k, v in zip(extra_keys, key)}
        bx, by = int(key[n_extra]), int(key[n_extra + 1])
        mask = np.zeros((win, win), dtype=bool)
        n_px = -1
        center = -1
        for idx, (di, dj, npx, buf) in enumerate(
            zip(pdf["di"], pdf["dj"], pdf["n_px"], pdf["mask"])
        ):
            m = np.unpackbits(
                np.frombuffer(bytes(buf), dtype=np.uint8), count=b * b
            ).astype(bool).reshape(b, b)
            c0 = (ring - int(di)) * b
            r0 = (ring - int(dj)) * b
            mask[r0 : r0 + b, c0 : c0 + b] = m
            if di == 0 and dj == 0:
                n_px = int(npx)
                center = idx
        if center < 0:  # halo-only group: no real block here
            # dtype=object so Arrow casts the EMPTY columns to any target
            # type (a bare [] comes through float64 and list<> refuses it)
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in out_cols}
            )
        for c in carry:
            out[c] = [pdf[c].iloc[center]]
        d2 = _edt_window(mask, max_d2=cap)[halo : halo + b, halo : halo + b]
        flat = np.minimum(d2.reshape(-1)[:n_px], cap)
        out.update({"block_x": [bx], "block_y": [by], "d2": [flat.tolist()]})
        return pd.DataFrame(out, columns=out_cols)

    return fn


def proximity_map(
    tiles: DataFrame,
    max_dist: int,
    target_value: float = 0.0,
    block: int = 64,
    extra_keys: tuple[str, ...] = (),
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(extra_keys..., block_x, block_y, d2): per-pixel min squared
    distance to the nearest target, clipped at max_dist² (no-target
    pixels report the cap).  Same bitmap halo exchange + exact EDT as
    proximity_summary — the per-pixel output plane for distance-to-cloud
    compositing.

    ``extra_keys``: independent layer keys (e.g. acquisition ``t`` for
    multi-date compositing).  ALL layers ride ONE halo exchange and ONE
    applyInPandas pass keyed by (extra_keys, block) — N layers means N×
    the groups in the same two shuffles, not N sequential passes; halos
    never cross layers because the keys join exactly.

    ``carry`` columns (e.g. the raw ``px`` plane) ride the center copy of
    each block through the exchange and come back beside ``d2`` — a BAP
    consumer then needs NO re-join of the tile table against the map.
    The whole plan is scan -> mask pack -> ONE hash shuffle -> EDT:
    halo-only groups (spill past the raster edge) are closed out inside
    the kernel rather than by a semi-join against real blocks, which
    previously cost a second shuffle + sort of the mask exchange."""
    ring = math.ceil(max_dist / block)
    offsets = [(di, dj) for di in range(-ring, ring + 1) for dj in range(-ring, ring + 1)]
    ek = list(extra_keys)
    cy = list(carry)
    masks = _target_masks(tiles, target_value, block, tuple(ek), tuple(cy))
    off = F.array(
        *[F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj")) for di, dj in offsets]
    )
    center = (F.col("o.di") == 0) & (F.col("o.dj") == 0)
    rep = masks.select(
        *ek, *cy, "block_x", "block_y", "n_px", "mask", F.explode(off).alias("o")
    ).select(
        *ek,
        # carry values only on the center copy — halo copies ship nulls,
        # so the exchange volume stays bitmap-sized
        *[F.when(center, F.col(c)).alias(c) for c in cy],
        (F.col("block_x") + F.col("o.di")).alias("tx"),
        (F.col("block_y") + F.col("o.dj")).alias("ty"),
        F.col("o.di").alias("di"),
        F.col("o.dj").alias("dj"),
        "n_px",
        "mask",
    )
    out_schema = StructType(
        [tiles.schema[k] for k in ek + cy] + list(_MAP_SCHEMA.fields)
    )
    return rep.groupBy(*ek, "tx", "ty").applyInPandas(
        _block_edt_map_fn(
            block, ring, int(max_dist) * int(max_dist), tuple(ek), tuple(cy)
        ),
        out_schema,
    )
