"""Reference-golden cast parity: the reference's own CastDataset test
family (internal/image/image_test.go:57-200 + the dformat table in
image_data_test.go), replayed against the GDAL-produced expected rasters
in internal/image/test_data/image_cast*.tif.

These are the strongest cast oracles in the repo: the expected pixels were
produced by the REFERENCE ENGINE (GDAL Translate -scale/-exponent through
CastDatasetOptions), not by any code in this repo — and all eight readable
cases match BIT-EXACTLY (integer targets) / to Float32 storage
quantization (float target).  They pin, against reference-blessed data:

- the mixed-exponent input clipping (cast0->cast4/cast5, cast4->cast0),
- the equal-exponent pure-linear fast path WITH different external maxima
  and the (Es/Ed)^(1/e) scale factor (cast5->cast7),
- casts between DIFFERENT external ranges (cast0->cast3, cast5->cast6),
- nodata remapping through the cast (every case: cast0 carries -10001
  nodata borders),
- GDAL's round-half-away integer write (cast0->cast2 et al.).

The golden files are read with this repo's own TIFF reader — which is
itself part of the verified surface (the GDAL files are LZW early-change
compressed; reading them exercises the S5 interop path end-to-end).

image_cast8.tif (the nodata-removal case) is ZSTD-compressed (TIFF code
50000), read through the repo's own RFC 8878 decoder
(functions/zstd.py) — all nine goldens now replay.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from geocube_spark.functions.dataformat import cast_numpy

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

TEST_DATA = "/root/reference/internal/image/test_data"

NAN = float("nan")


def M(dtype, nd, lo, hi, rlo, rhi, exp):
    return {
        "dtype": dtype, "no_data": nd,
        "min_value": float(lo), "max_value": float(hi),
        "real_min_value": float(rlo), "real_max_value": float(rhi),
        "exponent": float(exp),
    }


# imagesDFormat (image_data_test.go:39-146), index-for-index
DFORMATS = {
    0: M("Int16", -10001.0, -10000, 10000, -1, 1, 1),
    1: M("Float32", NAN, -1, 1, -1, 1, 1),
    2: M("UInt8", 255.0, 0, 254, -1, 1, 1),
    3: M("UInt8", 255.0, 0, 254, 0, 0.5, 1),
    4: M("UInt8", 255.0, 0, 254, -1, 1, 2),
    5: M("UInt8", 255.0, 0, 254, 0, 0.5, 2),
    6: M("UInt8", 255.0, 0, 254, 0, 1, 1),
    7: M("Int16", -10001.0, 0, 10000, 0, 1, 2),
    14: M("Int16", NAN, -10000, 10000, -1, 1, 1),
}

# (from image index, to image index) — the CastDataset Contexts in order
# (image_test.go:99-200); 0->14 is the ZSTD golden, covered synthetically
GOLDEN_CASES = [
    (0, 1),   # "to rangeExt (toDformat=Id)"
    (0, 2),   # "to another dataformat with same RangeExt"
    (0, 3),   # "to another dataformat with another RangeExt"
    (0, 4),   # "to another dataformat with an exponent"
    (0, 5),   # "... with another RangeExt and an exponent"
    (4, 0),   # "with an exponent to another dataformat"
    (5, 6),   # "with an exponent ... with another RangeExt"
    (5, 7),   # "with an exponent ... with the same exponent (same ExtMin)"
]

_NP_DTYPE = {"Int16": np.int16, "UInt8": np.uint8, "Float32": np.float32}


def _load(idx: int) -> np.ndarray:
    from geocube_spark.sources.gtiff import read_tiff

    path = os.path.join(TEST_DATA, f"image_cast{idx}.tif")
    img = read_tiff(open(path, "rb").read())[0]
    return img.bands[0]


needs_ref = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference test_data not available"
)


@needs_ref
@pytest.mark.parametrize("src_i,dst_i", GOLDEN_CASES)
def test_cast_matches_reference_golden(src_i, dst_i):
    src_px = _load(src_i).astype(np.float64)
    want = _load(dst_i)
    got = cast_numpy(src_px, DFORMATS[src_i], DFORMATS[dst_i])
    # storage quantization: the engine computes in float64; the golden is
    # stored at the target dtype (Float32 truncates the mantissa, the
    # integer targets are already exact after round+clamp)
    got_q = got.astype(_NP_DTYPE[DFORMATS[dst_i]["dtype"]])
    g, w = got_q.ravel(), want.ravel()
    if np.issubdtype(w.dtype, np.floating):
        eq = (g == w) | (np.isnan(g) & np.isnan(w))
    else:
        eq = g == w
    assert eq.all(), (
        f"cast{src_i}->cast{dst_i}: {int((~eq).sum())}/{g.size} pixels differ "
        f"(first: src={src_px.ravel()[np.argmin(eq)]} "
        f"got={g[np.argmin(eq)]} want={w[np.argmin(eq)]})"
    )


@needs_ref
def test_identity_cast_raises_no_cast_to_perform():
    # Context "to the same dataformat" (image_test.go:99-108): the engine's
    # is_identity short-circuit is the ErrNoCastToPerform twin
    from geocube_spark.functions.dataformat import is_identity

    assert is_identity(DFORMATS[0], dict(DFORMATS[0]))


def test_nodata_removal_synthetic():
    # Context "to the same dataformat removing nodata" (0 -> 14): same
    # mapping, nodata -10001 -> NaN — the value-domain semantics, pinned
    # independent of any golden file.
    arr = np.array([-10001.0, -10000.0, 0.0, 10000.0])
    out = cast_numpy(arr, DFORMATS[0], DFORMATS[14])
    assert math.isnan(out[0])
    assert out[1:].tolist() == [-10000.0, 0.0, 10000.0]


@needs_ref
def test_nodata_removal_matches_cast8_golden():
    """The formerly-skipped ninth golden: image_cast8.tif is
    ZSTD-compressed (TIFF code 50000), now read through the repo's own
    RFC 8878 decoder (functions/zstd.py).  The engine's float output
    carries NaN at the removed-nodata positions; the golden's Int16
    storage keeps the source value there (a GDAL storage artifact —
    Int16 has no NaN), so the replay asserts (a) every valid pixel
    passes through bit-exactly and (b) the NaN mask is exactly the
    golden's source-nodata set."""
    src = _load(0).astype(np.float64)
    want = _load(8)  # image_cast8.tif, decoded via the zstd codec
    assert want.dtype == np.int16 and want.shape == (215, 496)
    got = cast_numpy(src, DFORMATS[0], DFORMATS[14])
    nodata = src == -10001.0
    assert np.isnan(got[nodata]).all()
    assert not np.isnan(got[~nodata]).any()
    assert (got[~nodata] == want[~nodata]).all()
    # the golden's nodata cells hold the untouched source value
    assert (want[nodata] == -10001).all()


@needs_ref
def test_golden_tiffs_read_via_own_lzw_decoder():
    """The golden files are GDAL-written LZW (early change); reading them
    is the S5 interop proof for the corrected codec."""
    img = _load(0)
    assert img.shape == (215, 496)
    assert img.dtype == np.int16
    assert (img == -10001).any()  # the nodata border is present
