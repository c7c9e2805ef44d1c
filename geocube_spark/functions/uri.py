"""URI / URN utilities (C13).

Reference: internal/geocube/dataset.go:252-261 (GDALURI — the
``SUBDIR:URI`` GDAL open syntax, e.g. ``GTIFF_DIR:2:file.tif``),
internal/utils/urn.go:43 (URN name charset).
"""

from __future__ import annotations

import re

_URN = re.compile(r"^[a-zA-Z0-9_\-.:]+$")


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
    if not _URN.match(name):
        raise ValueError(f"invalid URN: {name!r}")
