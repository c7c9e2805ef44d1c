"""Local literal DataFrames as pure-JVM LocalRelations.

``spark.createDataFrame(list)`` routes tiny driver-side lists through a
pickled Python RDD — every evaluation spawns a Python worker (hundreds of ms
per stage, seconds in sandboxed environments).  A ``VALUES`` SQL literal
becomes a Catalyst LocalRelation: no Python anywhere in the plan, foldable,
broadcastable for free.  Use this for small parameter tables (query rects,
record-group mappings); real data always comes from files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # plain decimal literals parse as DECIMAL in Spark SQL; E-notation
        # forces DOUBLE
        return f"{v!r}E0" if "e" not in repr(v) and "E" not in repr(v) else repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex().upper() + "'"
    raise TypeError(f"unsupported literal type {type(v)}")


def values_df(spark: SparkSession, rows: list[tuple], columns: list[str]) -> DataFrame:
    """Build a LocalRelation DataFrame from literal rows via VALUES SQL."""
    assert rows, "values_df needs at least one row"
    body = ", ".join("(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows)
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({cols})")
