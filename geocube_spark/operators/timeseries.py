"""Per-key time-series gap filling (EO dataflow: cloud-masked pixels
interpolated along the acquisition axis — reference users run this after
the temporal composite; see /root/reference/internal/image dataflow).

Linear interpolation between the nearest valid observations before and
after each gap, computed entirely with PARTITIONED window functions —
two ignore-nulls window passes per direction, no shuffle beyond the one
hash partition by series key, no UDF.  Leading/trailing gaps fall back to
the nearest valid value (backfill/forward-fill); an all-null series stays
null.  At 100 TB the partition key is (pixel/cell id), so the window
state per task is one series — the same layout the mosaic rank already
shuffles by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_gaps(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    order_cols: list[str] | None = None,
    out_col: str = "filled",
) -> DataFrame:
    """Append ``out_col``: ``v_col`` with nulls linearly interpolated in
    ``t_col`` (numeric, e.g. epoch micros) per ``key_cols`` series.
    ``order_cols`` breaks timestamp ties deterministically (defaults to
    [t_col])."""
    order = [F.col(c) for c in (order_cols or [t_col])]
    before = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    after = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(v_col)
    t = F.col(t_col).cast("double")
    prev_v = F.last(v, ignorenulls=True).over(before)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(before)
    next_v = F.first(v, ignorenulls=True).over(after)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(after)
    frac = (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col, filled)


def interpolate_gaps_sql(
    inner: str,
    key: str,
    t: str,
    v: str,
    order: str | None = None,
    out: str = "filled",
) -> str:
    """DuckDB twin over ``inner`` (must yield {key}, {t}, {v}, order cols):
    the same two ignore-nulls window passes and the same fill expression,
    so the arithmetic is structurally identical on both engines."""
    o = order or t
    wb = f"PARTITION BY {key} ORDER BY {o} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    wa = f"PARTITION BY {key} ORDER BY {o} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    return f"""
    SELECT *,
           CASE
             WHEN {v} IS NOT NULL THEN {v}
             WHEN last_value({v} IGNORE NULLS) OVER ({wb}) IS NULL
               THEN first_value({v} IGNORE NULLS) OVER ({wa})
             WHEN first_value({v} IGNORE NULLS) OVER ({wa}) IS NULL
               THEN last_value({v} IGNORE NULLS) OVER ({wb})
             ELSE last_value({v} IGNORE NULLS) OVER ({wb})
                  + (first_value({v} IGNORE NULLS) OVER ({wa})
                     - last_value({v} IGNORE NULLS) OVER ({wb}))
                  * (CAST({t} AS DOUBLE)
                     - last_value(CASE WHEN {v} IS NOT NULL THEN CAST({t} AS DOUBLE) END IGNORE NULLS) OVER ({wb}))
                  / (first_value(CASE WHEN {v} IS NOT NULL THEN CAST({t} AS DOUBLE) END IGNORE NULLS) OVER ({wa})
                     - last_value(CASE WHEN {v} IS NOT NULL THEN CAST({t} AS DOUBLE) END IGNORE NULLS) OVER ({wb}))
           END AS {out}
    FROM ({inner})
    """
