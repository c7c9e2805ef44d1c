"""geocube_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of airbusgeo/geocube.

The reference (read-only at /root/reference) is a Go gRPC service over a
PostGIS catalog + GDAL pixel plane.  This package re-expresses the same
semantics Spark-first:

- catalog entities  -> Parquet/Delta tables (schemas.py)
- FindDatasets/FindRecords SQL builders -> DataFrame plan builders (plans/)
- PostGIS spatial predicates -> bbox pruning columns + exact numpy UDFs
- GDAL raster math (cast/mosaic/pyramid) -> columnar tile-table operators
- job/state machine -> idempotent batch jobs over ACID table swaps
- beyond-reference LLM-pipeline ops (dedup/similarity/text) -> operators/

Nothing here is a port: the reference tells us WHAT to compute (see
SURVEY.md), Catalyst decides HOW.
"""

__version__ = "0.1.0"

from geocube_spark.session import get_spark  # noqa: F401
