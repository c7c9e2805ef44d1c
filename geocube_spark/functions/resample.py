"""Resampling kernels (R3) for the warp/regrid path.

Reference: the resampling enum of internal/geocube/variable.go:18-61 —
NEAR, BILINEAR, CUBIC, CUBICSPLINE, LANCZOS apply to the continuous remap
(this module); AVERAGE/MODE/MAX/MIN/MED/Q1/Q3 are the pooling aggregates of
``operators/regrid.POOL_KERNELS`` / ``operators/pyramid``.

All kernels are separable 1-D convolutions applied in x and y around each
(possibly non-separable, e.g. reprojected) sample position:

- NEAR          pixel containing the sample point (floor), exact
- BILINEAR      tent kernel, 2 taps/axis
- CUBIC         Keys cubic convolution, a = -0.5 (GDAL's CUBIC), 4 taps
- CUBICSPLINE   cubic B-spline (smoothing, non-interpolating), 4 taps
- LANCZOS       sinc·sinc window, radius 3, 6 taps, weights normalized

Properties frozen in tests: partition of unity (constant fields are
reproduced exactly by all kernels), linear reproduction (BILINEAR / CUBIC /
CUBICSPLINE), interpolation at integer sample positions (all but
CUBICSPLINE, which smooths by design), and the closed-form Keys half-pixel
weights (-1/16, 9/16, 9/16, -1/16).
"""

from __future__ import annotations

import numpy as np

INTERP_KERNELS = ("NEAR", "BILINEAR", "CUBIC", "CUBICSPLINE", "LANCZOS")


def _keys_cubic(d: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (the GDAL/OpenCV CUBIC, a=-0.5)."""
    d = np.abs(d)
    return np.where(
        d <= 1.0,
        (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0,
        np.where(d < 2.0, a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a, 0.0),
    )


def _bspline_cubic(d: np.ndarray) -> np.ndarray:
    """Cubic B-spline basis (smoothing CUBICSPLINE; partition of unity,
    reproduces constants and linears, does NOT interpolate samples)."""
    d = np.abs(d)
    return np.where(
        d <= 1.0,
        (4.0 - 6.0 * d**2 + 3.0 * d**3) / 6.0,
        np.where(d < 2.0, (2.0 - d) ** 3 / 6.0, 0.0),
    )


def _lanczos(d: np.ndarray, radius: int = 3) -> np.ndarray:
    return np.where(np.abs(d) < radius, np.sinc(d) * np.sinc(d / radius), 0.0)


_TAPS: dict[str, tuple[np.ndarray, object, bool]] = {
    # name -> (tap offsets relative to floor(center), weight fn of (t - off), renormalize)
    "BILINEAR": (np.arange(0, 2), lambda d: np.maximum(0.0, 1.0 - np.abs(d)), False),
    "CUBIC": (np.arange(-1, 3), _keys_cubic, False),
    "CUBICSPLINE": (np.arange(-1, 3), _bspline_cubic, False),
    "LANCZOS": (np.arange(-2, 4), _lanczos, True),
}


def kernel_weights_1d(t: np.ndarray, method: str) -> tuple[np.ndarray, np.ndarray]:
    """Weights for fractional offsets ``t`` in [0,1) from the base index.
    Returns (offsets (T,), weights (..., T))."""
    offs, fn, renorm = _TAPS[method]
    w = fn(t[..., None] - offs)
    if renorm:
        w = w / w.sum(axis=-1, keepdims=True)
    return offs, w


def sample_grid(
    src: np.ndarray,
    sx: np.ndarray,
    sy: np.ndarray,
    method: str = "NEAR",
    nodata: float = float("nan"),
    src_nodata: float | None = None,
) -> np.ndarray:
    """Sample ``src`` (H,W) at continuous pixel coordinates (sx, sy) — edge
    convention: integer k is the LEFT/TOP edge of pixel k, its center is
    k+0.5 (the affine-transform convention the warp uses).

    Samples whose containing pixel falls outside the grid return ``nodata``;
    neighborhoods of in-bounds samples clamp to the edge (edge-extend —
    the warp feeds this function the WHOLE container raster, so only true
    image borders extend; at cluster scale a halo-row shuffle per container
    boundary keeps the same contract).

    ``src_nodata``: when given, nodata source pixels are MASKED out of the
    convolution — their weights are zeroed and the remaining weights
    renormalized (GDAL's nodata-mask warp semantics); a sample whose whole
    neighborhood is nodata yields ``nodata``.  NEAR simply propagates the
    hit pixel's nodata.
    """
    h, w = src.shape
    sx = np.asarray(sx, dtype=np.float64)
    sy = np.asarray(sy, dtype=np.float64)
    ix = np.floor(sx).astype(np.int64)
    iy = np.floor(sy).astype(np.int64)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    if method == "NEAR":
        out = np.full(sx.shape, float(nodata))
        if valid.any():
            out[valid] = src[iy[valid], ix[valid]]
        return out
    if src_nodata is not None:
        if isinstance(src_nodata, float) and np.isnan(src_nodata):
            src_ok = ~np.isnan(src)
        else:
            src_ok = src != src_nodata
    else:
        src_ok = None
    # center-based fractional position
    px = sx - 0.5
    py = sy - 0.5
    bx = np.floor(px).astype(np.int64)
    by = np.floor(py).astype(np.int64)
    offs_x, wx = kernel_weights_1d(px - bx, method)
    offs_y, wy = kernel_weights_1d(py - by, method)
    acc = np.zeros(sx.shape, dtype=np.float64)
    wsum = np.zeros(sx.shape, dtype=np.float64)
    for a, oy in enumerate(offs_y):
        ry = (by + oy).clip(0, h - 1)
        for b, ox in enumerate(offs_x):
            rx = (bx + ox).clip(0, w - 1)
            wgt = wy[..., a] * wx[..., b]
            if src_ok is not None:
                wgt = wgt * src_ok[ry, rx]
                acc += wgt * np.where(src_ok[ry, rx], src[ry, rx], 0.0)
            else:
                acc += wgt * src[ry, rx]
            wsum += wgt
    if src_ok is not None:
        covered = np.abs(wsum) > 1e-12
        out = np.where(valid & covered, acc / np.where(covered, wsum, 1.0), float(nodata))
        return out
    return np.where(valid, acc, float(nodata))
