"""Skew-mitigation utilities: salted aggregation and salted join.

AQE's skew-join handles most runtime skew; salting is the explicit tool for
known-hot keys (a viral document's shingle, a dominant LSH bucket, one cell
holding a whole constellation's revisit stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Two-stage count for heavily skewed keys: partial count per
    (key, salt) spreads a hot key over ``salt_buckets`` reducers, then a
    cheap second aggregation sums the partials."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(*key_cols).agg(F.sum("_n").cast("long").alias("n"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    salt_expr=None,
) -> DataFrame:
    """Skewed fact ⋈ small-ish dim equi-join: salt the fact side, EXPLODE
    the dim side across all buckets, join on (key, salt).  The hot key's
    rows land on ``salt_buckets`` different reducers instead of one.

    ``salt_expr`` (a Column in [0, salt_buckets)) overrides the default
    random salt when the caller needs a DETERMINISTIC spread — e.g.
    connected_components salts by hash of the neighbor column so retries
    and resumes shuffle identically."""
    if salt_expr is None:
        salt_expr = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
        )
    salted_fact = fact.withColumn("_salt", salt_expr)
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")
