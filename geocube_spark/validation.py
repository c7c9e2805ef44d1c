"""Entity write-path validation — the reference's create/index rejection
rules, raised as typed ``ValidationError`` before anything lands in the
catalog.

Reference anchors (all in /root/reference/internal/geocube/):
- URN charset:              urn.go:31-38 (``Seg1/Seg2/...`` of [a-zA-Z0-9-:_])
- record + AOI + tags:      record.go:174-214
- variable / instance:      variable.go:286-328
- dataset-vs-variable:      dataset.go:191-220
- dataformat / datamapping: dataformat.go:53-93
- consolidation params:     consolidation_params.go:75-150 (+ its 121-LoC
                            ginkgo table, consolidation_params_test.go,
                            ported to tests/test_validation.py)
- layout:                   layout.go:116-132
- grid + cells:             grid.go:79-102, reserved names abstractgrid.go:24
- palette:                  palette.go:54-72

These are pure-Python precondition checks on the write path (driver-side,
O(payload) — they guard catalog appends, never scan tables), so there is
no Spark plan to optimize here.
"""

from __future__ import annotations

import math
import re

from geocube_spark import schemas


class ValidationError(ValueError):
    """Typed twin of the reference's geocube.ValidationError."""


#  fullmatch, not match+$: Python's '$' accepts a trailing newline that
#  Go's anchored regexp rejects
_URN_RE = re.compile(r"[a-zA-Z0-9\-:_]+(/[a-zA-Z0-9\-:_]+)*")
_NAME_RE = re.compile(r"[a-zA-Z0-9\-:_]+")  # single URN segment (no '/')


def is_valid_urn(s: str) -> bool:
    """urn.go:31-33."""
    return isinstance(s, str) and bool(_URN_RE.fullmatch(s))


# ------------------------------------------------------------------ records


def validate_record(name: str, tags: dict[str, str] | None = None) -> None:
    """record.go:174-199: URN name; tags may not contain '*' or '?'
    (they would collide with the glob syntax of F4 tag predicates)."""
    if not is_valid_urn(name):
        raise ValidationError(f"Invalid Name: {name}")
    for k, t in (tags or {}).items():
        if any(c in "*?" for c in k) or any(c in "*?" for c in t):
            raise ValidationError(
                f"Invalid Tag: {k}: {t}. Cannot contain neither ? or *."
            )


def validate_aoi_bounds(
    bounds: tuple[float, float, float, float], can_be_empty: bool = False
) -> None:
    """record.go:201-214: coordinates must be geographic."""
    xmin, ymin, xmax, ymax = bounds
    if not can_be_empty and (xmin > xmax or ymin > ymax):
        raise ValidationError("AOI must not be empty")
    if xmin < -180 or xmax > 180 or ymin < -90 or ymax > 90:
        raise ValidationError(
            "Coordinates must be geographic (lon in [-180,180], lat in [-90,90])"
        )


# -------------------------------------------------- dataformat / datamapping


def validate_dformat(df: dict) -> None:
    """dataformat.go:76-93: range within dtype bounds, min < max, nodata
    within dtype bounds unless NaN (= not defined)."""
    dtype = df.get("dtype")
    if dtype not in schemas.DTYPE_BOUNDS:
        raise ValidationError(f"unknown dtype {dtype!r}")
    lo, hi = schemas.DTYPE_BOUNDS[dtype]
    if not (df["min_value"] >= lo and df["max_value"] <= hi):
        raise ValidationError(f"min/max value are out of bounds [{lo}, {hi}]")
    if df["min_value"] >= df["max_value"]:
        raise ValidationError("min must be strictly lower than max")
    nd = df["no_data"]
    if not (isinstance(nd, float) and math.isnan(nd)) and not (lo <= nd <= hi):
        raise ValidationError(
            f"noData value ({nd}) is not supported by the data type ({dtype})."
            " If nodata is not defined, set it to NaN"
        )


def validate_dmapping(dm: dict) -> None:
    """dataformat.go:60-74: DataFormat valid + external range valid +
    exponent strictly positive."""
    validate_dformat(dm)
    if dm["real_min_value"] >= dm["real_max_value"]:
        raise ValidationError("min must be strictly lower than max")
    if dm["exponent"] <= 0:
        raise ValidationError("invalid exponent (must be strictly positive)")


# ---------------------------------------------------------------- variables


def validate_instance_name(name: str) -> None:
    """variable.go:286-293: single segment, no '/'."""
    if not (isinstance(name, str) and _NAME_RE.fullmatch(name)):
        raise ValidationError(f"Invalid Name: {name}")


def validate_variable(
    name: str,
    bands: list[str],
    dformat: dict,
    palette: str | None = None,
) -> None:
    """variable.go:296-328."""
    if not is_valid_urn(name):
        raise ValidationError(f"Incorrect name: {name}")
    if palette:
        if not is_valid_urn(palette):
            raise ValidationError(f"Incorrect palette name: {palette}")
        if len(bands) != 1:
            raise ValidationError("Cannot define a palette to a multi-bands variable")
    try:
        validate_dformat(dformat)
    except ValidationError as e:
        raise ValidationError(f"Incorrect data format: {e}") from e
    if not bands:
        raise ValidationError("Bands definition must have at least one band")
    if len(bands) > 1 and any(not b for b in bands):
        raise ValidationError("Band name cannot be empty")


# ----------------------------------------------------------------- datasets


def validate_dataset_with_variable(
    dataset_bands: list, dataset_dmapping: dict, variable: dict
) -> None:
    """dataset.go:191-206 ValidateWithVariable: band arity, cast lattice,
    and the dataset's EXTERNAL range must intersect the variable's range."""
    v_bands = variable["bands"]
    v_df = variable["dformat"]
    if len(dataset_bands) != len(v_bands):
        raise ValidationError("Wrong number of bands in dataset")
    if not schemas.can_cast_to(dataset_dmapping["dtype"], v_df["dtype"]):
        raise ValidationError(
            "Data format of dataset is incorrect as it cannot be cast to the"
            " data format of the variable"
        )
    if (
        dataset_dmapping["real_min_value"] >= v_df["max_value"]
        or dataset_dmapping["real_max_value"] <= v_df["min_value"]
    ):
        raise ValidationError(
            "Range of external values of the dataset"
            f" [{dataset_dmapping['real_min_value']},{dataset_dmapping['real_max_value']}]"
            " does not intersect the range of values of the variable"
            f" [{v_df['min_value']},{v_df['max_value']}]"
        )


# ----------------------------------------------------- consolidation params

SUPPORTED_CREATION_PARAMS = [
    "PHOTOMETRIC", "PHOTOMETRIC_OVERVIEW", "COMPRESS", "COMPRESS_OVERVIEW",
    "JPEG_QUALITY", "JPEG_QUALITY_OVERVIEW", "PREDICTOR", "PREDICTOR_OVERVIEW",
    "ZLEVEL", "ZLEVEL_OVERVIEW", "ZSTD_LEVEL", "ZSTD_LEVEL_OVERVIEW",
    "MAX_Z_ERROR", "MAX_Z_ERROR_OVERVIEW", "JPEGTABLESMODE",
]  # consolidation_params.go:32

_LOSSY_DEFAULTS = {
    "COMPRESS": "LERC", "COMPRESS_OVERVIEW": "LERC",
    "MAX_Z_ERROR": "0.01", "MAX_Z_ERROR_OVERVIEW": "0.01",
}
_LOSSY_F64_DEFAULTS = {
    "COMPRESS": "LERC_ZSTD", "COMPRESS_OVERVIEW": "LERC_ZSTD",
    "MAX_Z_ERROR": "0.01", "MAX_Z_ERROR_OVERVIEW": "0.01",
}
_LOSSLESS_DEFAULTS = {
    "COMPRESS": "ZSTD", "COMPRESS_OVERVIEW": "ZSTD",
    "PREDICTOR": "2", "PREDICTOR_OVERVIEW": "2",
    "ZSTD_LEVEL": "0.01", "ZSTD_LEVEL_OVERVIEW": "0.01",
}
_LOSSLESS_F64_DEFAULTS = {
    "COMPRESS": "LERC_ZSTD", "COMPRESS_OVERVIEW": "LERC_ZSTD",
    "MAX_Z_ERROR": "0", "MAX_Z_ERROR_OVERVIEW": "0",
}

_REAL_DTYPES = ("UInt8", "Int8", "Int16", "UInt16", "Int32", "UInt32", "Float32")


def validate_consolidation_params(
    dformat_dtype: str,
    compression: str,
    creation_params: dict[str, str] | None = None,
    resampling_alg: str | None = "NEAR",
) -> dict[str, str]:
    """consolidation_params.go:36-150: validates and returns the NORMALIZED
    creation params (the per-compression defaults merged in — overwriting
    user keys like addCreationParams does; consolidation_params_test.go
    pins the merged tables)."""
    if resampling_alg in (None, "", "UNDEFINED"):
        raise ValidationError("Resampling algorithm cannot be undefined")
    cp = dict(creation_params or {})
    for k in cp:
        if k not in SUPPORTED_CREATION_PARAMS:
            raise ValidationError(f"unknown creationParams {k}")

    def unsupported(opt: str):
        return ValidationError(
            f"compressionOption {opt} not supported for data type {dformat_dtype}"
        )

    if compression == "NO":
        return cp
    if compression == "LOSSY":
        if dformat_dtype in _REAL_DTYPES:
            cp.update(_LOSSY_DEFAULTS)
            return cp
        if dformat_dtype == "Float64":
            cp.update(_LOSSY_F64_DEFAULTS)
            return cp
        raise unsupported("LOSSY")
    if compression == "LOSSLESS":
        if dformat_dtype in _REAL_DTYPES:
            cp.update(_LOSSLESS_DEFAULTS)
            return cp
        if dformat_dtype == "Float64":
            cp.update(_LOSSLESS_F64_DEFAULTS)
            return cp
        raise unsupported("LOSSLESS")
    if compression == "CUSTOM":
        compress = cp.get("COMPRESS")
        if compress is None:
            raise ValidationError(
                "compression is CUSTOM, but creation_params COMPRESS is not defined"
            )
        if compress == "JPEG" and dformat_dtype in ("UInt8", "Int8"):
            return cp
        raise unsupported(compress)
    raise unsupported(compression)


# ------------------------------------------------------------------ layouts


def validate_layout(
    name: str,
    block_x_size: int,
    block_y_size: int,
    max_records: int,
    interlacing_pattern: str,
    ignore_name: bool = False,
) -> None:
    """layout.go:116-132: URN name, positive block sizes / max_records, and
    the MuCOG interlacing pattern must parse."""
    if not ignore_name and not is_valid_urn(name):
        raise ValidationError(f"invalid name: {name}")
    if block_x_size <= 0 or block_y_size <= 0:
        raise ValidationError("blocksize must be positive")
    if max_records <= 0:
        raise ValidationError("maxRecords must be positive")
    from geocube_spark.operators.interlace import parse_interlacing

    try:
        parse_interlacing(interlacing_pattern)
    except ValueError as e:
        raise ValidationError(f"InterlacingPattern is incorrect: {e}") from e


# -------------------------------------------------------------------- grids

RESERVED_GRID_NAMES = ("regular", "singlecell")  # abstractgrid.go:24


def validate_grid(name: str, cells: list[dict]) -> None:
    """grid.go:79-102: single-segment name, not reserved, cell ids are URNs
    and unique within the grid."""
    if not (isinstance(name, str) and _NAME_RE.fullmatch(name)):
        raise ValidationError(f"invalid name: {name}")
    if name.lower() in RESERVED_GRID_NAMES:
        raise ValidationError(f"reserved name: {name}")
    seen: set[str] = set()
    for cell in cells:
        cid = cell["id"]
        if not is_valid_urn(cid):
            raise ValidationError(f"invalid cell-id: {cid}")
        if cid in seen:
            raise ValidationError(f"Duplicate cell-id:{cid}")
        seen.add(cid)


# ----------------------------------------------------------------- palettes


def validate_named_palette(name: str, points) -> None:
    """palette.go:54-72: URN name + the C10 point rules (>= 2 points, values
    from exactly 0 to exactly 1, strictly increasing, uint8 channels —
    delegated to functions.palette.validate_palette)."""
    from geocube_spark.functions.palette import validate_palette

    if not is_valid_urn(name):
        raise ValidationError(f"Invalid Palette Name: {name}")
    try:
        validate_palette(points)
    except ValueError as e:
        raise ValidationError(f"Invalid Palette Points: {e}") from e
