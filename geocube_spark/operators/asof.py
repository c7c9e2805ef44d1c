"""As-of join and range join — temporal operators Spark's API lacks,
expressed as scalable compositions (SURVEY task list: custom operators as
(a) compositions of existing DataFrame ops).

- as_of_join: for each left row, the newest right row with right.ts <=
  left.ts per key.  NOT a per-row range scan: both sides are unioned,
  sorted once per key, and the right payload is carried forward with a
  running `last(ignorenulls)` window — O(n log n) with a single shuffle,
  the merge-sorted physical plan an ASOF join wants.
- range_join_buckets: pairs with right.ts in [left.ts+lower, left.ts+upper]
  per key.  The naive inequality join is a per-key cross product; bucketing
  time into interval-width bins turns it into an equi-join on (key, bucket)
  + a cheap residual filter — the standard interval-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the payload of the as-of-matching right row (or nulls).

    direction='backward': newest right with right_ts <= left_ts.
    direction='forward': oldest right with right_ts >= left_ts (the
    mirrored following-window; oracle = DuckDB ``ASOF JOIN ... >=``).

    The payload travels as ONE struct per right row and a single
    last/first(ignorenulls) carries that struct — so every asof_* output
    column comes from the SAME matched right row, and a genuinely-NULL
    field inside the matched row stays NULL (per-column carry would let an
    older row's value leak in).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"

    # left sorts AFTER right at equal ts for backward (match is <=), BEFORE
    # right for forward (match is >=)
    left_side = 1 if backward else 0
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1 - left_side).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(r_tag.schema["_p"].dataType).alias("_p"),
    )
    r_tag = r_tag.select(
        "_k",
        "_ts",
        "_side",
        F.lit(None).cast(l_tag.schema["_left"].dataType).alias("_left"),
        "_p",
    )
    unioned = l_tag.unionByName(r_tag)
    if backward:
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_p", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_p", ignorenulls=True).over(w)
    carried = unioned.select("_side", "_left", carry.alias("_c"))
    out = carried.filter(F.col("_side") == left_side).select(
        F.col("_left.*"),
        *[F.col("_c")[c].alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    payload_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with right_ts − left_ts ∈ [lower, upper] per
    key — equi-join on (key, time bucket) then exact residual filter.

    Bucket width = interval span, so each left row probes ≤2 buckets and
    the shuffle is equi-key (AQE-skew-safe), never an inequality join.
    """
    span = float(upper - lower)
    if span <= 0:
        raise ValueError("upper must be > lower")

    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_lts"),
        F.struct(*left.columns).alias("_left"),
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor((F.col("_lts") + F.lit(lower)) / span).cast("long"),
                F.floor((F.col("_lts") + F.lit(upper)) / span).cast("long"),
            )
        ),
    ).dropDuplicates(["_k", "_lts", "_left", "_bucket"])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.col(right_ts) / span).cast("long").alias("_bucket"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    joined = l.join(r, ["_k", "_bucket"]).filter(
        (F.col("_rts") >= F.col("_lts") + F.lit(lower))
        & (F.col("_rts") <= F.col("_lts") + F.lit(upper))
    )
    return joined.select(
        F.col("_left.*"),
        *[F.col(f"_p_{c}").alias(f"r_{c}") for c in payload_cols],
    ).dropDuplicates()
