"""Point-to-raster interpolation: inverse-distance weighting (IDW).

Shepard interpolation with a finite search radius — the standard
point-observation gridding op (weather stations, ground-truth samples)
the reference's raster stack has no equivalent for.

    val(c) = sum_p w_p * v_p / sum_p w_p,   w_p = 1 / d(c,p)^power
    over stations with d <= radius; an exact station hit (d = 0) short-
    circuits to the station value; cells with no station in range drop
    from the output.

Scale shape: NOT an all-pairs cells x points pass.  Stations explode to
the 3x3 neighborhood of radius-sized buckets they can influence (a point
at distance <= R from a cell center is always in the cell's bucket +-1),
cells key to their own bucket, and the match is an EQUI-join on the
bucket pair — broadcastable when the station table is small, shuffle-
partitioned on bucket keys when it is not (station count never multiplies
the cell stream by more than the per-bucket density either way).  The
cutoff filter then recovers exactly the brute-force-with-radius result,
which is what the DuckDB oracle computes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def idw_grid(
    points: DataFrame,
    cells: DataFrame,
    radius: float,
    power: int = 2,
    x_col: str = "x",
    y_col: str = "y",
    val_col: str = "val",
) -> DataFrame:
    """``points``: (x, y, val) stations.  ``cells``: (ci, cj, cx, cy)
    target cell centers.  Returns (ci, cj, n_pts, idw) for cells with at
    least one station within ``radius``."""
    r = float(radius)
    neighbors = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    pts = (
        points.select(
            F.col(x_col).alias("px"),
            F.col(y_col).alias("py"),
            F.col(val_col).alias("pv"),
            F.floor(F.col(x_col) / r).alias("pbx"),
            F.floor(F.col(y_col) / r).alias("pby"),
        )
        .select("px", "py", "pv", "pbx", "pby", neighbors.alias("n"))
        .select(
            "px",
            "py",
            "pv",
            (F.col("pbx") + F.col("n.dx")).alias("bx"),
            (F.col("pby") + F.col("n.dy")).alias("by"),
        )
    )
    c = cells.select(
        "ci",
        "cj",
        "cx",
        "cy",
        F.floor(F.col("cx") / r).alias("bx"),
        F.floor(F.col("cy") / r).alias("by"),
    )
    d2: Column = (F.col("cx") - F.col("px")) ** 2 + (F.col("cy") - F.col("py")) ** 2
    w = F.lit(1.0) / F.col("d2") ** (power / 2.0)
    joined = (
        c.join(F.broadcast(pts), ["bx", "by"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= r * r)
    )
    return (
        joined.select(
            "ci",
            "cj",
            "pv",
            "d2",
            F.when(F.col("d2") > 0, w).otherwise(F.lit(0.0)).alias("w"),
        )
        .groupBy("ci", "cj")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.max(F.when(F.col("d2") == 0, F.col("pv"))).alias("exact"),
            F.sum(F.col("w") * F.col("pv")).alias("num"),
            F.sum("w").alias("den"),
        )
        .select(
            "ci",
            "cj",
            "n_pts",
            F.round(
                F.coalesce(F.col("exact"), F.col("num") / F.col("den")), 6
            ).alias("idw"),
        )
        .orderBy("ci", "cj")
    )


def idw_grid_sql(
    points_sql: str,
    cells_sql: str,
    radius: float,
    power: int = 2,
) -> str:
    """DuckDB twin: brute-force cells x stations with the radius cutoff —
    exactly the relation the bucketed equi-join reconstructs."""
    r2 = float(radius) * float(radius)
    return f"""
    WITH pts AS ({points_sql}), cells AS ({cells_sql}),
    pairs AS (
        SELECT c.ci, c.cj, p.val AS pv,
               (c.cx - p.x) * (c.cx - p.x) + (c.cy - p.y) * (c.cy - p.y) AS d2
        FROM cells c, pts p
        WHERE (c.cx - p.x) * (c.cx - p.x) + (c.cy - p.y) * (c.cy - p.y) <= {r2}
    )
    SELECT ci, cj, CAST(count(*) AS BIGINT) AS n_pts,
           round(coalesce(
               max(CASE WHEN d2 = 0 THEN pv END),
               sum(CASE WHEN d2 > 0 THEN pv / pow(d2, {power / 2.0}) ELSE 0 END)
               / sum(CASE WHEN d2 > 0 THEN 1.0 / pow(d2, {power / 2.0}) ELSE 0 END)
           ), 6) AS idw
    FROM pairs GROUP BY ci, cj ORDER BY ci, cj
    """
