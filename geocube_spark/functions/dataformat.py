"""DataFormat / DataMapping cast — the engine's core scalar semantics.

Reference: internal/image/image.go:137-162 (castValue / castValueBF),
internal/geocube/dataformat.go:19-26, SURVEY.md C1.

A DataMapping maps internal pixel values to external ("real") values:

    ve = real_min + (real_max - real_min) * ((vi - min)/(max - min)) ** exponent

Casting from mapping A to mapping B goes internal_A -> external -> internal_B
— the full CastDatasetOptions algebra (image.go:166-219): external ranges may
DIFFER (the cast preserves external VALUES; out-of-range results clamp at
dtype bounds); castable iff one exponent is 1, or the exponents are equal
with equal external minima (then the powers cancel into a pure linear map
scaled by (Es/Ed)^(1/e)) — anything else is ErrUnableToCast
(``check_castable``).  The result clamps to the target dtype bounds and
remaps nodata.  NaN nodata is honoured (C14, bitmap.go:153-193):
comparisons are NaN-aware; non-nodata NaN propagates through all twins.
All eight readable cases of the reference's own CastDataset golden family
replay bit-exactly (tests/test_cast_golden.py).

Two implementations, same closed form:
- ``cast_expr``: pure Column expression over ``array<double>`` pixels — runs
  JVM-side inside whole-stage codegen via ``F.transform`` (no Python in the
  hot path).
- ``cast_numpy``: vectorized numpy kernel for pandas-UDF pipelines (mosaic).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from geocube_spark.schemas import DTYPE_BOUNDS, INT_DTYPES


class CastError(ValueError):
    """Equivalent of the reference's ErrUnableToCast (image.go:203-218)."""


def is_identity(src: dict, dst: dict) -> bool:
    """ErrNoCastToPerform short-circuit (image.go:167-169): identical
    mappings mean the cast is the identity."""
    keys = (
        "dtype",
        "no_data",
        "min_value",
        "max_value",
        "real_min_value",
        "real_max_value",
        "exponent",
    )

    def eq(a, b):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
        return a == b

    return all(eq(src[k], dst[k]) for k in keys)


def check_castable(src: dict, dst: dict) -> None:
    """Mirror CastDatasetOptions' equivalence algebra (image.go:166-219):
    the chained cast src->ext->dst collapses to a single GDAL-expressible
    -scale/-exponent transform exactly when

    - dst.exponent == 1   (compose src's power with a linear rescale), or
    - src.exponent == 1   (linear into dst's inverse power), or
    - equal exponents AND equal external MINIMA (the powers cancel into a
      pure linear map scaled by (Es/Ed)^(1/e)).

    Anything else is the reference's ErrUnableToCast.  External ranges may
    DIFFER (the cast preserves external values; out-of-range results clamp
    at dtype bounds), matching the reference's cast0->cast3 test family.
    The dtype lattice (datatype.go:43-58) is enforced first: complex is
    one-way (Complex64 casts only to Complex64, reals never to complex)."""
    from geocube_spark.schemas import can_cast_to

    if not can_cast_to(src["dtype"], dst["dtype"]):
        raise CastError(
            f"dtype lattice forbids cast {src['dtype']} -> {dst['dtype']} "
            "(datatype.go:43-58: complex is one-way)"
        )
    se, de = float(src["exponent"]), float(dst["exponent"])
    if de == 1.0 or se == 1.0:
        return
    if se == de and src["real_min_value"] == dst["real_min_value"]:
        return
    raise CastError(
        "unable to cast (image.go:203-218 ErrUnableToCast): exponents "
        f"{se} -> {de} with external ranges "
        f"[{src['real_min_value']},{src['real_max_value']}] -> "
        f"[{dst['real_min_value']},{dst['real_max_value']}]"
    )


def _linear_cast_params(src: dict, dst: dict) -> tuple[float, float] | None:
    """For the equal-exponent case, the composed map is PURE LINEAR
    vi' = b + a*vi (image.go:203-216: -scale with exponent 1, no input
    clipping): a = dstInterval/srcInterval * (Es/Ed)^(1/e).  Returns None
    when the general src->ext->dst chain applies instead."""
    se, de = float(src["exponent"]), float(dst["exponent"])
    if se != de or se == 1.0:
        return None
    es = float(src["real_max_value"]) - float(src["real_min_value"])
    ed = float(dst["real_max_value"]) - float(dst["real_min_value"])
    f = (es / ed) ** (1.0 / de)
    slo, shi = float(src["min_value"]), float(src["max_value"])
    dlo, dhi = float(dst["min_value"]), float(dst["max_value"])
    a = (dhi - dlo) * f / (shi - slo)
    return a, dlo - a * slo


def _nan_safe_eq(col: Column, value: float) -> Column:
    if isinstance(value, float) and math.isnan(value):
        return F.isnan(col)
    return col == F.lit(float(value))


def _to_external(col: Column, m: dict) -> Column:
    """ve = rmin + (rmax-rmin) * ((vi-min)/(max-min))^exp"""
    lo, hi = float(m["min_value"]), float(m["max_value"])
    rlo, rhi = float(m["real_min_value"]), float(m["real_max_value"])
    exp = float(m["exponent"])
    norm = (col - F.lit(lo)) / F.lit(hi - lo)
    if exp != 1.0:
        norm = F.pow(norm, F.lit(exp))
    return F.lit(rlo) + F.lit(rhi - rlo) * norm


def _from_external(col: Column, m: dict) -> Column:
    """Inverse of _to_external: vi = min + (max-min) * ((ve-rmin)/(rmax-rmin))^(1/exp)"""
    lo, hi = float(m["min_value"]), float(m["max_value"])
    rlo, rhi = float(m["real_min_value"]), float(m["real_max_value"])
    exp = float(m["exponent"])
    norm = (col - F.lit(rlo)) / F.lit(rhi - rlo)
    if exp != 1.0:
        norm = F.pow(norm, F.lit(1.0 / exp))
    return F.lit(lo) + F.lit(hi - lo) * norm


def cast_value_expr(col: Column, src: dict, dst: dict) -> Column:
    """Scalar cast of one value column from mapping ``src`` to ``dst``.

    nodata in src maps to dst.no_data; everything else goes through the
    power-law chain then clamps to the target dtype bounds; integer targets
    round half-away like GDAL's scale path.
    """
    check_castable(src, dst)
    lin = _linear_cast_params(src, dst)
    if lin is not None:
        # Equal exponents cancel into a pure linear -scale in the reference
        # (image.go:203-216: CastDatasetOptions emits exponent-1 options
        # with NO input clipping — out-of-range pixels extrapolate linearly
        # and only clamp at dtype bounds).
        a, b = lin
        v = F.lit(b) + F.lit(a) * col
    else:
        # With a genuinely mixed non-unit exponent, pre-clamp to the source
        # internal range BEFORE the power — GDAL's -scale/-exponent path
        # clips inputs to the source range (image.go:118-135
        # castDatasetOptions), and a negative base under a fractional
        # exponent would otherwise inject NaN.  The linear case keeps the
        # reference's extrapolate-then-dtype-clamp (castValueBF,
        # image.go:142-162: math.Pow(x, 1) == x).
        src_col = col
        if float(src["exponent"]) != 1.0:
            lo, hi = float(src["min_value"]), float(src["max_value"])
            src_col = F.greatest(F.lit(lo), F.least(F.lit(hi), col))
        ve = _to_external(src_col, src)
        if float(dst["exponent"]) != 1.0:
            drlo = float(dst["real_min_value"])
            drhi = float(dst["real_max_value"])
            ve = F.greatest(F.lit(drlo), F.least(F.lit(drhi), ve))
        v = _from_external(ve, dst)
    blo, bhi = DTYPE_BOUNDS[dst["dtype"]]
    v = F.greatest(F.lit(blo), F.least(F.lit(bhi), v))
    if dst["dtype"] in INT_DTYPES:
        v = F.round(v, 0)
    # NaN that is NOT nodata propagates as NaN (castValueBF: math.Pow(NaN,e)
    # = NaN; Go's math.Min/Max propagate NaN) — without this guard Spark's
    # least/greatest would clamp NaN to a finite bound.  cast_numpy already
    # propagates (np.clip/power keep NaN); cast_sql gets the same CASE arm.
    return (
        F.when(_nan_safe_eq(col, src["no_data"]), F.lit(float(dst["no_data"])))
        .when(F.isnan(col), F.lit(float("nan")))
        .otherwise(v)
    )


def cast_expr(px: Column, src: dict, dst: dict) -> Column:
    """Cast an ``array<double>`` pixel block — F.transform keeps this inside
    whole-stage codegen (no Python)."""
    if is_identity(src, dst):
        return px
    return F.transform(px, lambda v: cast_value_expr(v, src, dst))


def map_to_external_expr(px: Column, m: dict) -> Column:
    """Map a pixel block to external/physical values; nodata becomes NULL so
    downstream aggregations are nodata-safe by construction."""
    return F.transform(
        px,
        lambda v: F.when(_nan_safe_eq(v, m["no_data"]), F.lit(None)).otherwise(
            _to_external(v, m)
        ),
    )


# ---------------------------------------------------------------- numpy twin


def cast_numpy(arr: np.ndarray, src: dict, dst: dict) -> np.ndarray:
    """Vectorized numpy implementation with identical semantics, for use
    inside pandas UDFs (mosaic/regrid pipelines)."""
    if is_identity(src, dst):
        return arr
    check_castable(src, dst)
    a = arr.astype(np.float64, copy=True)
    nd = src["no_data"]
    mask = np.isnan(a) if (isinstance(nd, float) and math.isnan(nd)) else (a == nd)

    lin = _linear_cast_params(src, dst)
    if lin is not None:
        # equal exponents cancel into a pure linear -scale (image.go:
        # 203-216) with no input clipping — see cast_value_expr
        la, lb = lin
        vi = lb + la * a
    else:
        lo, hi = src["min_value"], src["max_value"]
        rlo, rhi = src["real_min_value"], src["real_max_value"]
        if src["exponent"] != 1.0:
            # pre-clamp to the source range before the fractional power
            # (GDAL -scale clips inputs; avoids NaN from a negative base) —
            # nodata is masked from the ORIGINAL values above, so clamping
            # can't alias it; the linear case extrapolates like the
            # reference.  NaN survives np.clip, so non-nodata NaN
            # propagates (twin parity with cast_value_expr's explicit
            # NaN arm).
            np.clip(a, lo, hi, out=a)
        ve = rlo + (rhi - rlo) * ((a - lo) / (hi - lo)) ** src["exponent"]

        dlo, dhi = dst["min_value"], dst["max_value"]
        drlo, drhi = dst["real_min_value"], dst["real_max_value"]
        if dst["exponent"] != 1.0:
            # the inverse power has the same negative-base hazard when the
            # source side extrapolated (linear src, fractional dst)
            np.clip(ve, drlo, drhi, out=ve)
        vi = dlo + (dhi - dlo) * ((ve - drlo) / (drhi - drlo)) ** (
            1.0 / dst["exponent"]
        )

    blo, bhi = DTYPE_BOUNDS[dst["dtype"]]
    np.clip(vi, blo, bhi, out=vi)
    if dst["dtype"] in INT_DTYPES:
        # round half away from zero, matching Spark's F.round
        vi = np.sign(vi) * np.floor(np.abs(vi) + 0.5)
    vi[mask] = dst["no_data"]
    return vi


def cast_sql(px_col: str, src: dict, dst: dict) -> str:
    """DuckDB list_transform twin of cast_expr, for oracle queries."""
    if is_identity(src, dst):
        return px_col
    check_castable(src, dst)
    blo, bhi = DTYPE_BOUNDS[dst["dtype"]]
    lin = _linear_cast_params(src, dst)
    if lin is not None:
        # equal exponents: pure linear -scale (image.go:203-216)
        la, lb = lin
        inv = f"({lb!r} + {la!r} * v)"
    else:
        lo, hi = src["min_value"], src["max_value"]
        rlo, rhi = src["real_min_value"], src["real_max_value"]
        e = src["exponent"]
        dlo, dhi = dst["min_value"], dst["max_value"]
        drlo, drhi = dst["real_min_value"], dst["real_max_value"]
        de = dst["exponent"]

        # same conditional pre-clamp as cast_value_expr/cast_numpy: source
        # range before a fractional power (nodata is CASE-guarded upstream)
        v_in = f"greatest({lo}, least({hi}, v))" if e != 1.0 else "v"
        ext = f"({rlo} + ({rhi} - {rlo}) * pow(({v_in} - {lo}) / ({hi} - {lo}), {e}))"
        ve_in = f"greatest({drlo}, least({drhi}, {ext}))" if de != 1.0 else ext
        inv = (
            f"({dlo} + ({dhi} - {dlo}) * "
            f"pow(({ve_in} - {drlo}) / ({drhi} - {drlo}), {1.0 / de}))"
        )
    clamped = f"greatest({blo}, least({bhi}, {inv}))"
    if dst["dtype"] in INT_DTYPES:
        clamped = f"round({clamped}, 0)"
    nd = src["no_data"]
    nd_pred = "isnan(v)" if (isinstance(nd, float) and math.isnan(nd)) else f"v = {nd}"
    # non-nodata NaN propagates (twin parity with cast_value_expr/cast_numpy)
    return (
        f"list_transform({px_col}, v -> CASE WHEN {nd_pred} "
        f"THEN {dst['no_data']} WHEN isnan(v) THEN 'NaN'::DOUBLE "
        f"ELSE {clamped} END)"
    )
