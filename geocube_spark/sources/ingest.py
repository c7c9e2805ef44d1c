"""Ingest-time dataset validation (S4).

Reference: internal/svc/service.go:270-332 — before indexing, the remote
file is opened and its band count / dtype / bounds checked against the
declared dataset row.  Our pixel plane is the tile table, so validation
cross-checks dataset rows against their tiles: declared bands exist, pixel
values fit the declared dmapping's internal range (nodata aside), tile
affine footprint agrees with the dataset bbox.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_datasets_against_tiles(
    datasets: DataFrame, tiles: DataFrame, tolerance: float = 1e-6
) -> DataFrame:
    """Returns one row per (dataset, problem): empty result = all valid.

    Checks (all JVM-side, one pass over tiles):
    - missing_band: a declared band has no level-0 tiles
    - value_out_of_range: pixels outside [min_value, max_value] that are
      not the nodata value
    """
    nd = F.col("dmapping.no_data")
    lo, hi = F.col("dmapping.min_value"), F.col("dmapping.max_value")

    declared = datasets.select(
        "id", "container_uri", F.explode("bands").alias("band"), "dmapping"
    )
    tile_bands = (
        tiles.filter(F.col("level") == 0)
        .groupBy("container_uri", "band")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
    )
    missing = (
        declared.join(tile_bands, ["container_uri", "band"], "left")
        .filter(F.col("n_blocks").isNull())
        .select("id", "container_uri", "band", F.lit("missing_band").alias("problem"))
    )

    joined = declared.join(tiles.filter(F.col("level") == 0), ["container_uri", "band"])
    bad_px = F.size(
        F.filter(
            "px",
            lambda v: (
                ~F.when(F.isnan(nd), F.isnan(v)).otherwise(v == nd)
            )
            & ((v < lo - tolerance) | (v > hi + tolerance)),
        )
    )
    out_of_range = (
        joined.withColumn("n_bad", bad_px)
        .filter(F.col("n_bad") > 0)
        .groupBy("id", "container_uri", "band")
        .agg(F.sum("n_bad").alias("n_bad"))
        .select("id", "container_uri", "band", F.lit("value_out_of_range").alias("problem"))
    )
    return missing.unionByName(out_of_range)


def tiff_bytes_to_tile_rows(data: bytes, container_uri: str) -> list[dict]:
    """Decode one externally-produced (Geo)TIFF (none/deflate/LZW, optional
    horizontal predictor — the GDAL default COG recipes) into tile-table
    rows, one per (band, level, block): the byte-level ingest twin of the
    reference's GDAL open at index time (internal/svc/service.go:270-332,
    internal/image/image.go:260-286).

    Levels: the full-res IFD (NewSubfileType=0) is level 0; each overview
    IFD gets level = round(log2(fullres_width / width)).  Pixels are cast
    to float64 to match the tile-table px column.  Every emitted row
    carries the LEVEL-0 pix_to_crs (the tile-table convention that
    pyramid.build_level establishes and consolidate_to_mucog's 2^level
    scaling assumes) — the overview IFD's own pre-scaled transform is
    dropped in favor of the full-res one.
    """
    import math

    from geocube_spark.sources.gtiff import _tile_grid, read_tiff

    images = read_tiff(data)
    full = [im for im in images if im.subfile_type == 0]
    if not full:
        raise ValueError("no full-resolution IFD in TIFF")
    full_w = full[0].bands.shape[2]
    rows: list[dict] = []
    for im in images:
        nb, h, w = im.bands.shape
        level = 0 if im.subfile_type == 0 else int(round(math.log2(full_w / w)))
        # the file's own physical tile grid, straight from the IFD tags
        # (works for planar AND chunky multiband — chunky holds all bands
        # per tile, so the grid is never derived from the offsets count)
        tw, th = im.tile_width, im.tile_height
        across, down = _tile_grid(w, h, tw, th)
        a, b, c, d, e, f = full[0].transform
        for band in range(nb):
            plane = im.bands[band]
            for ty in range(down):
                for tx in range(across):
                    tile = plane[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                    if tile.shape != (th, tw):
                        pad = im.nodata if im.nodata is not None else 0
                        fullb = np.full((th, tw), pad, dtype=plane.dtype)
                        fullb[: tile.shape[0], : tile.shape[1]] = tile
                        tile = fullb
                    rows.append(
                        {
                            "container_uri": container_uri,
                            "band": band + 1,
                            "level": level,
                            "block_x": tx,
                            "block_y": ty,
                            "px": tile.astype("float64").ravel().tolist(),
                            "crs_srid": im.epsg,
                            "pix_to_crs": {
                                "a": a, "b": b, "c": c,
                                "d": d, "e": e, "f": f,
                            },
                        }
                    )
    return rows


_TILE_ROW_SCHEMA = (
    "container_uri string, band int, level int, block_x int, block_y int, "
    "px array<double>, crs_srid int, "
    "pix_to_crs struct<a:double,b:double,c:double,d:double,e:double,f:double>"
)


def ingest_tiff_files(binary_df: DataFrame) -> DataFrame:
    """Distributed COG ingest: ``spark.read.format('binaryFile')`` rows
    (path, content) → tile-table rows.  One Arrow batch per executor task;
    each file decodes independently (no shuffle, no driver bytes)."""

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(tiff_bytes_to_tile_rows(bytes(content), path))
            yield pd.DataFrame(
                out,
                columns=[
                    "container_uri", "band", "level", "block_x", "block_y",
                    "px", "crs_srid", "pix_to_crs",
                ],
            )

    return binary_df.select("path", "content").mapInPandas(
        decode, _TILE_ROW_SCHEMA
    )


def chunk_bytes(data: bytes, chunk_size: int = 512 * 1024) -> list[bytes]:
    """S8/L2 parity: split a payload into ≤chunk_size pieces
    (grpc/service.go:876 — 512 KiB under the 4 MB message cap)."""
    return [data[i : i + chunk_size] for i in range(0, len(data), chunk_size)] or [b""]


class FIFOBuffer:
    """utils/bitmap/bitmap_reader.go FIFOBuffer: a byte queue that
    compacts the consumed prefix to the front on every push, so the
    allocation stays bounded by (unconsumed + pushed) bytes.  ``push(n)``
    returns a writable view of the n new bytes; ``pop(n)`` returns AT
    MOST n bytes and advances.  ``buffer``/``pos`` are exposed because
    the reference's own test (bitmap_test.go TestRotatingBuffer) asserts
    the compaction contract through them — ported verbatim in
    tests/test_bitmap_stream.py."""

    def __init__(self) -> None:
        self.buffer = bytearray()
        self.pos = 0

    def reset(self) -> None:
        self.buffer = bytearray()
        self.pos = 0

    def push(self, n: int) -> memoryview:
        if self.pos > 0:
            del self.buffer[: self.pos]
            self.pos = 0
        start = len(self.buffer)
        self.buffer.extend(b"\x00" * n)
        return memoryview(self.buffer)[start:]

    def pop(self, n: int) -> bytes:
        n = min(n, len(self))
        out = bytes(self.buffer[self.pos : self.pos + n])
        self.pos += n
        return out

    def __len__(self) -> int:
        return len(self.buffer) - self.pos


class ImageChunkReader:
    """ChunkReader over a decoded raster (bitmap.go:209-292 ImageReader):
    streams an image's native bytes in caller-sized chunks while reading
    the source LINE-GRANULAR through a FIFOBuffer — at no point does the
    whole image sit in memory beyond the unconsumed window.  This is the
    reference's streamable-bitmap path for shipping big GetCube slices
    over a message-size-capped channel (S8).

    ``bands`` is a (n_bands, h, w) numpy array; bytes stream
    band-interleaved-by-line in the array's native dtype, matching a
    whole-image ``tobytes()`` of the (h, bands, w) transpose for
    multiband (single-band: plain row-major)."""

    def __init__(self, bands) -> None:
        import numpy as np

        self._a = np.ascontiguousarray(bands)
        if self._a.ndim == 2:
            self._a = self._a[None]
        self._nb, self._h, self._w = self._a.shape
        self._stride = self._nb * self._w * self._a.dtype.itemsize
        self._buffer = FIFOBuffer()
        self._y = 0

    def __len__(self) -> int:
        return self._h * self._stride

    def restart(self) -> None:
        self._y = 0
        self._buffer.reset()

    def next(self, chunk_size: int) -> bytes:
        """The next <= chunk_size bytes; raises EOFError when drained
        (io.EOF twin).  Reads ceil((chunk - buffered)/stride) lines from
        the source, exactly ImageReader.Next (bitmap.go:259-281)."""
        import math as _math

        buffered = len(self._buffer)
        if self._y >= self._h:
            if buffered == 0:
                raise EOFError
            return self._buffer.pop(chunk_size)
        line_count = _math.ceil((chunk_size - buffered) / self._stride)
        line_count = min(line_count, self._h - self._y)
        if line_count > 0:
            view = self._buffer.push(line_count * self._stride)
            rows = self._a[:, self._y : self._y + line_count]  # (nb, lc, w)
            view[:] = rows.transpose(1, 0, 2).tobytes()  # line-interleaved
            self._y += line_count
        return self._buffer.pop(chunk_size)

    def read_all(self) -> bytes:
        """NewBitmapFromDataset.ReadAllBytes twin: one copy of the whole
        image in the same byte order the stream produces."""
        return self._a.transpose(1, 0, 2).tobytes()


def compress_chunks(chunks: list[bytes], level: int = 6) -> list[bytes]:
    """C12 deflate parity (utils/compress.go): per-chunk zlib at levels
    -3..9 — negative levels map to zlib defaults like the reference's
    'fast' presets."""
    import zlib

    lvl = level if level >= 0 else zlib.Z_DEFAULT_COMPRESSION
    return [zlib.compress(c, lvl) for c in chunks]


def decompress_chunks(chunks: list[bytes]) -> bytes:
    import zlib

    return b"".join(zlib.decompress(c) for c in chunks)


def run_ingest_stream(
    spark,
    landing_dir: str,
    catalog,
    table: str,
    checkpoint: str,
    glob: str = "*.tif",
):
    """LIVE landing-zone ingest: Structured Streaming over arriving
    GeoTIFF files -> per-file decode (the same ``ingest_tiff_files``
    kernel) -> exactly-once append into the commit-log catalog.

    The file source tracks processed files in the checkpoint (each TIFF is
    decoded once, ever); the catalog sink stamps each micro-batch's
    batchId inside the atomic commit record, so a crash-replay of a
    partially-committed epoch no-ops (streaming/sink.catalog_stream_sink).
    Decode stays embarrassingly parallel per file inside mapInPandas —
    identical plan to the batch ingest, just fed by readStream.
    """
    from geocube_spark.streaming.sink import catalog_stream_sink

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
        .option("pathGlobFilter", glob)
        .load(landing_dir)
    )
    tiles = ingest_tiff_files(stream)
    return (
        tiles.writeStream.foreachBatch(catalog_stream_sink(catalog, table))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
