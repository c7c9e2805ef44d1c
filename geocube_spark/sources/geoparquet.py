"""GeoParquet interop: read/write the "geo" footer metadata convention.

Beyond-reference source (S-class): GeoParquet (OGC spec 1.0) is plain
parquet whose footer key-value metadata carries a ``geo`` JSON document
describing which columns are WKB geometries and in which CRS — the
lingua franca for vector data exchange (GDAL/ogr2ogr, GeoPandas, BigQuery
all emit it).  The repo's AOI/record geometry columns are already WKB,
so interop is purely a metadata affair:

- :func:`read_geoparquet` opens the footer with pyarrow (metadata-only,
  no data I/O), returns the Spark DataFrame plus the parsed ``geo``
  document so callers know the geometry columns and CRS without
  guessing.
- :func:`write_geoparquet` stamps the ``geo`` document onto a
  DIM-SIZED frame (records / AOI tables — the things vector consumers
  want).  It funnels through one Arrow table on the driver, which is the
  honest trade: parquet footer metadata is file-level, and a distributed
  writer would need a post-pass rewriting every part footer.  Fact-scale
  tables stay plain parquet (their geometry semantics live in the
  catalog, not per-file metadata).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _part_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    parts = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not parts:
        raise ValueError(f"no parquet part files under {path!r}")
    return os.path.join(path, parts[0])


def read_geoparquet(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """(DataFrame, parsed "geo" metadata).  Raises if the footer carries
    no ``geo`` document — the caller asked for GeoParquet specifically."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(_part_file(path))
    meta = schema.metadata or {}
    raw = meta.get(b"geo")
    if raw is None:
        raise ValueError(f"{path!r} has no GeoParquet 'geo' footer metadata")
    geo = json.loads(raw.decode())
    return spark.read.parquet(path), geo


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_columns: dict[str, int],
    primary: str | None = None,
    max_rows: int = 1_000_000,
) -> dict:
    """Write ``df`` as a single GeoParquet file; ``geometry_columns``
    maps WKB column name -> EPSG code.  Returns the written ``geo``
    document.  Guarded by ``max_rows`` — this writer is for dim-sized
    vector tables (see module docstring)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not geometry_columns:
        raise ValueError("geometry_columns must name at least one column")
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_geoparquet is a dim-table writer ({n} rows > "
            f"max_rows={max_rows}); fact-scale tables stay plain parquet"
        )
    primary = primary or next(iter(geometry_columns))
    geo = {
        "version": "1.0.0",
        "primary_column": primary,
        "columns": {
            name: {
                "encoding": "WKB",
                "geometry_types": [],
                "crs": {
                    "type": "name",
                    "properties": {"name": f"EPSG:{epsg}"},
                },
            }
            for name, epsg in geometry_columns.items()
        },
    }
    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    existing = table.schema.metadata or {}
    table = table.replace_schema_metadata(
        {**existing, b"geo": json.dumps(geo).encode()}
    )
    pq.write_table(table, path)
    return geo
