"""Minimal GDAL VRT reader — the XML mosaic format GDAL uses to compose
rasters without copying pixels (the reference feeds .vrt inputs to
MergeDatasets in its own test family, image_data_test.go:23-25).

Supported surface (what GDAL's CreateCopy-style VRTs contain and what the
reference's fixtures use): VRTDataset rasterXSize/rasterYSize, SRS (EPSG
authority), GeoTransform, VRTRasterBand dataType/band/NoDataValue, and
ComplexSource/SimpleSource children with SourceFilename(relativeToVRT),
SourceBand, SrcRect, DstRect, NODATA.  Scaling/resampling sources are NOT
supported (SrcRect and DstRect must be the same size) — the composition
semantics are pure placement, which is all GDAL emits for aligned mosaics.

Referenced rasters are read with this repo's own TIFF reader (or
recursively as VRTs), so the whole chain stays dependency-free.  Scale
note: a VRT is metadata (KBs); composition assembles only the bands asked
for — at ingest time each executor opens its own referenced files, the
driver never holds pixels (same contract as sources/ingest).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

import numpy as np

_DTYPES = {
    "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "Float32": np.float32, "Float64": np.float64,
}


@dataclass
class VrtImage:
    bands: np.ndarray  # (n_bands, h, w)
    transform: tuple  # GDAL order (a, b, c, d, e, f) per-pixel affine
    epsg: int | None
    nodata: float | None


def _epsg_from_srs(text: str | None) -> int | None:
    if not text:
        return None
    # last AUTHORITY["EPSG","..."] in the WKT is the projected CRS code
    codes = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]', text)
    return int(codes[-1]) if codes else None


def read_vrt(path: str, band_indices: list[int] | None = None) -> VrtImage:
    """Assemble a VRT into a dense array.  ``band_indices`` (1-based, like
    GDAL) selects a subset without assembling the rest."""
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError(f"not a VRTDataset: {root.tag}")
    w = int(root.attrib["rasterXSize"])
    h = int(root.attrib["rasterYSize"])
    gt_text = root.findtext("GeoTransform")
    transform = tuple(float(x) for x in gt_text.split(",")) if gt_text else None
    # reorder GDAL GeoTransform (c, a, b, f, d, e) -> repo (a, b, c, d, e, f)
    if transform is not None:
        c, a, b, f, d, e = transform
        transform = (a, b, c, d, e, f)
    epsg = _epsg_from_srs(root.findtext("SRS"))
    base_dir = os.path.dirname(os.path.abspath(path))

    band_nodes = root.findall("VRTRasterBand")
    wanted = band_indices or [int(n.attrib.get("band", i + 1)) for i, n in enumerate(band_nodes)]
    by_number = {int(n.attrib.get("band", i + 1)): n for i, n in enumerate(band_nodes)}

    out = []
    nodata_out: float | None = None
    for bnum in wanted:
        node = by_number[bnum]
        dt = _DTYPES[node.attrib.get("dataType", "Float64")]
        nd_text = node.findtext("NoDataValue")
        nodata = float(nd_text) if nd_text is not None else None
        if nodata_out is None:
            nodata_out = nodata
        canvas = np.full((h, w), nodata if nodata is not None else 0, dtype=dt)
        for src in list(node.findall("ComplexSource")) + list(node.findall("SimpleSource")):
            fn_node = src.find("SourceFilename")
            fn = fn_node.text.strip()
            if fn_node.attrib.get("relativeToVRT", "0") == "1":
                fn = os.path.join(base_dir, fn)
            src_band = int(src.findtext("SourceBand", "1"))
            sr = src.find("SrcRect").attrib
            dr = src.find("DstRect").attrib
            sx, sy = int(float(sr["xOff"])), int(float(sr["yOff"]))
            sw, sh = int(float(sr["xSize"])), int(float(sr["ySize"]))
            dx, dy = int(float(dr["xOff"])), int(float(dr["yOff"]))
            dw, dh = int(float(dr["xSize"])), int(float(dr["ySize"]))
            if (sw, sh) != (dw, dh):
                raise ValueError(
                    "VRT source rescaling unsupported "
                    f"(SrcRect {sw}x{sh} != DstRect {dw}x{dh})"
                )
            if fn.lower().endswith(".vrt"):
                sub = read_vrt(fn, [src_band]).bands[0]
            else:
                from geocube_spark.sources.gtiff import read_tiff

                sub = read_tiff(open(fn, "rb").read())[0].bands[src_band - 1]
            canvas[dy : dy + dh, dx : dx + dw] = sub[sy : sy + sh, sx : sx + sw].astype(dt)
        out.append(canvas)
    return VrtImage(
        bands=np.stack(out), transform=transform, epsg=epsg, nodata=nodata_out
    )
