"""Size-adaptive spatial bbox join (J4/J5 unification).

The repo's spatial θ-joins (zonal_statistics, valid_shape_per_cell,
cover_custom_cells — reference J5 shape, pg_grids.go:113-151) broadcast the
dim side and let the bbox predicate run as a BroadcastNestedLoopJoin.
That is the RIGHT plan while the dim side fits in a broadcast — and the
WRONG one the day a zones table outgrows ``autoBroadcastJoinThreshold``:
a non-broadcast BNLJ degenerates to an O(n·m) shuffle explosion.

``adaptive_bbox_join`` switches strategy on the dim side's measured size:

- **broadcast** (dim small): ``big ⋈ broadcast(boxes)`` on the exact bbox
  predicate — one pass over the big side, zero shuffle, the audited
  BNLJ-by-design plan.
- **bucketed** (dim large): the two-phase grid-bucket equi-join (the J4
  shape the dataset×AOI path already uses).  Both sides explode onto the
  coarse grid cells their boxes overlap, equi-join on (gx, gy) — a plain
  shuffled hash join that partitions by cell — and the exact predicate
  runs on bucket-collocated candidates only.  Duplicate candidate pairs
  are suppressed WITHOUT a distinct: a pair is emitted only in the cell
  that contains the intersection's min-corner (both boxes cover that cell
  by construction), so no second shuffle.

The bucket edge length defaults to the dim side's largest box extent
(measured in the same driver-side job as the row count), which bounds the
dim-side explode factor at 4 cells per box; big-side rows explode into
however many cells they span (tiles are usually comparable to or smaller
than zones).  At 100 TB the bucketed path shuffles O(big + boxes) rows by
cell id — never O(big · boxes) — and AQE's skew-join splitting handles a
pathological mega-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rough serialized bytes per dim row (4 doubles + id + struct overhead);
# only used to convert autoBroadcastJoinThreshold into a row threshold
_EST_BOX_ROW_BYTES = 96


def _box_cols(
    df: DataFrame, box: tuple[Column, Column, Column, Column], prefix: str
) -> DataFrame:
    xmin, ymin, xmax, ymax = box
    return (
        df.withColumn(f"{prefix}xmin", xmin.cast("double"))
        .withColumn(f"{prefix}ymin", ymin.cast("double"))
        .withColumn(f"{prefix}xmax", xmax.cast("double"))
        .withColumn(f"{prefix}ymax", ymax.cast("double"))
    )


def adaptive_bbox_join(
    big: DataFrame,
    boxes: DataFrame,
    big_box: tuple[Column, Column, Column, Column],
    q_box: tuple[Column, Column, Column, Column],
    closed: bool = True,
    strategy: str = "auto",
    bucket: float | None = None,
    threshold_rows: int | None = None,
) -> DataFrame:
    """Join ``big`` × ``boxes`` on bbox overlap, picking the plan by dim
    size.  ``big_box``/``q_box``: (xmin, ymin, xmax, ymax) column
    expressions over the respective frames.  ``closed=True`` joins on
    closed-box overlap (<=/>=), ``closed=False`` on half-open boxes
    (</>) — the zonal pixel-center contract.  Returns the joined frame
    with both sides' columns plus the materialized ``_b*``/``_q*`` bbox
    helper columns (callers may drop them).

    ``strategy``: ``"auto"`` measures the dim side (one count+max-extent
    aggregate over the SMALL side only) and picks; ``"broadcast"`` /
    ``"bucketed"`` force a path (useful in tests and when the caller
    already knows the cardinality).
    """
    b = _box_cols(big, big_box, "_b")
    q = _box_cols(boxes, q_box, "_q")
    if closed:
        cond = (
            (F.col("_qxmin") <= F.col("_bxmax"))
            & (F.col("_qxmax") >= F.col("_bxmin"))
            & (F.col("_qymin") <= F.col("_bymax"))
            & (F.col("_qymax") >= F.col("_bymin"))
        )
    else:
        cond = (
            (F.col("_qxmin") < F.col("_bxmax"))
            & (F.col("_qxmax") > F.col("_bxmin"))
            & (F.col("_qymin") < F.col("_bymax"))
            & (F.col("_qymax") > F.col("_bymin"))
        )

    if strategy == "auto":
        spark = boxes.sparkSession
        thr = threshold_rows
        if thr is None:
            conf = (
                spark.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold", "10485760"
                )
                .strip()
                .lower()
                .removesuffix("b")
            )
            mult = {"k": 1024, "m": 1024**2, "g": 1024**3}.get(conf[-1:], 1)
            thr_bytes = int(conf[:-1]) * mult if mult != 1 else int(conf)
            thr = max(1, thr_bytes // _EST_BOX_ROW_BYTES)
        stats = q.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("_qxmax") - F.col("_qxmin")).alias("w"),
            F.max(F.col("_qymax") - F.col("_qymin")).alias("h"),
        ).first()
        if stats["n"] <= thr:
            strategy = "broadcast"
        else:
            strategy = "bucketed"
            if bucket is None:
                bucket = max(float(stats["w"] or 0.0), float(stats["h"] or 0.0))

    if strategy == "broadcast":
        return b.join(F.broadcast(q), cond)
    if strategy != "bucketed":
        raise ValueError(f"unknown strategy {strategy!r}")

    if bucket is None:
        stats = q.agg(
            F.max(F.col("_qxmax") - F.col("_qxmin")).alias("w"),
            F.max(F.col("_qymax") - F.col("_qymin")).alias("h"),
        ).first()
        bucket = max(float(stats["w"] or 0.0), float(stats["h"] or 0.0))
    if not bucket or bucket <= 0.0:
        bucket = 1.0  # degenerate point boxes: any positive cell size works

    def gridded(df: DataFrame, pre: str) -> DataFrame:
        gx0 = F.floor(F.col(f"{pre}xmin") / bucket).cast("long")
        gx1 = F.floor(F.col(f"{pre}xmax") / bucket).cast("long")
        gy0 = F.floor(F.col(f"{pre}ymin") / bucket).cast("long")
        gy1 = F.floor(F.col(f"{pre}ymax") / bucket).cast("long")
        return df.withColumn(
            "_gx", F.explode(F.sequence(gx0, gx1))
        ).withColumn("_gy", F.explode(F.sequence(gy0, gy1)))

    bg = gridded(b, "_b")
    qg = gridded(q, "_q").withColumnRenamed("_gx", "_qgx").withColumnRenamed(
        "_gy", "_qgy"
    )
    # canonical-cell dedup: report the pair only in the cell holding the
    # intersection's min corner (covered by both boxes by construction)
    canon = (
        F.col("_gx")
        == F.floor(F.greatest("_bxmin", "_qxmin") / bucket).cast("long")
    ) & (
        F.col("_gy")
        == F.floor(F.greatest("_bymin", "_qymin") / bucket).cast("long")
    )
    out = bg.join(
        qg,
        (F.col("_gx") == F.col("_qgx")) & (F.col("_gy") == F.col("_qgy")),
    ).filter(cond & canon)
    return out.drop("_gx", "_gy", "_qgx", "_qgy")
