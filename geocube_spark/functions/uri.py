"""URI / URN utilities (C13).

Reference: internal/geocube/dataset.go:252-261 (GDALURI — the
``SUBDIR:URI`` GDAL open syntax, e.g. ``GTIFF_DIR:2:file.tif``),
internal/geocube/urn.go:31-38 (URN charset),
interface/storage/gcs/utils.go Parse (bucket/object split).
"""

from __future__ import annotations

import re


def gdal_uri(container_uri: str, subdir: str = "") -> str:
    """Compose the GDAL open string: ``SUBDIR:URI`` when a subdir is set,
    else the plain URI (dataset.go:252-261)."""
    if subdir:
        return f"{subdir}:{container_uri}"
    return container_uri


def split_gdal_uri(uri: str) -> tuple[str, str]:
    """Inverse of gdal_uri: recognize the known driver-subdir prefixes."""
    m = re.match(r"^((?:GTIFF_DIR|GPKG|NETCDF|HDF5):[^:]*):(.*)$", uri)
    if m:
        return m.group(2), m.group(1)
    return uri, ""


def url_join(base: str, *parts: str) -> str:
    out = base.rstrip("/")
    for p in parts:
        out += "/" + str(p).strip("/")
    return out


def validate_urn(name: str) -> None:
    """Delegates to the write-path validator (urn.go:31-38: '/'-separated
    segments of [a-zA-Z0-9-:_] — the old local regex wrongly allowed '.'
    and rejected multi-segment names)."""
    from geocube_spark.validation import is_valid_urn

    if not is_valid_urn(name):
        raise ValueError(f"invalid URN: {name!r}")


def parse_storage_uri(uri: str) -> tuple[str, str]:
    """Split an object-storage URI into (bucket, object) — the reference's
    gcs.Parse (interface/storage/gcs/utils.go, vectors from utils_test.go):
    accepts ``scheme://bucket/object``, ``/bucket/object`` and
    ``bucket/object``; both parts must be non-empty.  The 'badly formatted
    storage uri' failure of the consolidation handler comes from here."""
    rest = uri
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(.*)$", uri)
    if m:
        rest = m.group(1)
    elif rest.startswith("/"):
        rest = rest[1:]
    bucket, sep, obj = rest.partition("/")
    if not bucket or not sep or not obj:
        raise ValueError(f"badly formatted storage uri: {uri!r}")
    return bucket, obj
