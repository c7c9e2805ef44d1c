"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship headers-only-cube query (R12 — the
reference's minimum end-to-end GetCube slice) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry
(geocube_spark/registry.py) — one entry per implemented operator from
SURVEY.md §2 plus the beyond-reference pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to any driver cwd: the package lives next to this file
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from geocube_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["cube_headers_by_record"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
