"""Consolidation (R9) — the reference's big batch rewrite, as one Spark job.

Reference: §3.2 of SURVEY.md — internal/svc/consolidater.go (planning),
internal/image/handler_consolidation.go (execution), job state machine
job.go:28-57.  The 15-state machine collapses to: a planning query, a
partitioned write with an interlacing sort order, and an atomic swap.

Pieces:
- plan_consolidation: steps 1-4 (records of job -> cells -> per-cell dataset
  lists, W2 sort, L4/L5 set ops, R13/L4 work-skipping)
- interlacing_sort_columns: MuCOG pattern grammar -> sortWithinPartitions
  spec (R7/O12): the physical layout IS the optimization
- consolidate_tiles: the rewrite job — repartition by cell, sorted write
- swap_datasets: the ACTIVE↔TODELETE swap as an idempotent overwrite
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocube_spark.operators.cover import RegularGridSpec, cover_regular

# MuCOG interlacing pattern grammar (layouts.proto:41-66): priorities among
# Z (zoom/overview level), T (time/record), R (record run), B (band).
_PATTERN_COLS = {
    "Z": "level",
    "T": "record_datetime",
    "R": "record_id",
    "B": "band",
}


def interlacing_sort_columns(pattern: str) -> list[str]:
    """Translate an interlacing pattern like ``Z=0>T>R>B`` into the ordered
    sort-column list for sortWithinPartitions.  Conditional clauses
    (``Z=1:>R>T>B``) refine the order per level; the dominant (first) clause
    drives the physical order — the analogue of MuCOG's primary interleave.
    """
    first_clause = pattern.split(";")[0]
    cols: list[str] = []
    for token in first_clause.split(">"):
        token = token.strip()
        key = token.split("=")[0].split(":")[0].strip()
        col = _PATTERN_COLS.get(key)
        if col and col not in cols:
            cols.append(col)
    # always finish with block coords so a time-series of one block is
    # contiguous (docs/architecture/mucog.md:8)
    for tail in ("block_y", "block_x"):
        if tail not in cols:
            cols.append(tail)
    return cols


def plan_consolidation(
    datasets: DataFrame,
    records: DataFrame,
    job_id: str,
    grid: RegularGridSpec,
    max_records: int = 1024,
) -> DataFrame:
    """Planning query (§3.2 steps 1-4): locked datasets -> covering cells ->
    per-(cell, container-chunk) task rows.

    Output: one row per consolidation task with its dataset list, mirroring
    ConsolidationEvent (consolidation_event.go) — but as a DataFrame the
    execution job joins back on, not a message queue.
    """
    locked = datasets.filter(F.col("locked_by_job_id") == job_id)  # F11
    with_rec = locked.join(
        F.broadcast(
            records.select(
                F.col("id").alias("record_id"),
                F.col("datetime").alias("record_datetime"),
            )
        ),
        "record_id",
    )
    # union-geometry extent of the job (A1, reduced to bbox for planning)
    ext = with_rec.agg(
        F.min("bbox.xmin").alias("xmin"),
        F.min("bbox.ymin").alias("ymin"),
        F.max("bbox.xmax").alias("xmax"),
        F.max("bbox.ymax").alias("ymax"),
    ).first()
    cells = cover_regular(
        datasets.sparkSession,
        [(ext["xmin"], ext["ymin"], ext["xmax"], ext["ymax"])],
        grid,
    )
    # per-cell dataset lists: bbox-intersect join (map-side via broadcast of
    # the cell list when small; both sides pre-pruned by bbox)
    joined = with_rec.join(
        F.broadcast(cells),
        (F.col("bbox.xmin") <= F.col("cell_xmax"))
        & (F.col("bbox.xmax") >= F.col("cell_xmin"))
        & (F.col("bbox.ymin") <= F.col("cell_ymax"))
        & (F.col("bbox.ymax") >= F.col("cell_ymin")),
    )
    # W2 in-group order + L5 dedup + max_records chunking (consolidater.go:371-388)
    per_cell = (
        joined.dropDuplicates(["cell_uri", "id"])
        .groupBy("cell_uri")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("record_datetime").alias("t"),
                        F.col("record_id").alias("rid"),
                        F.col("id").alias("dataset_id"),
                        F.col("container_uri"),
                    )
                )
            ).alias("members")
        )
    )
    chunked = per_cell.select(
        "cell_uri",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("members") - 1) / F.lit(max_records)).cast("int"),
                ),
                lambda i: F.slice("members", i * max_records + 1, max_records),
            )
        ).alias("chunk_idx", "datasets"),
    )
    return chunked.select(
        F.concat_ws("/", F.lit("consolidated"), "cell_uri", F.col("chunk_idx").cast("string")).alias(
            "out_container_uri"
        ),
        "cell_uri",
        "chunk_idx",
        "datasets",
        F.size("datasets").alias("n_datasets"),
    )


def valid_shape_per_cell(
    datasets_with_cells: DataFrame,
    cell_bounds_cols: tuple[str, str, str, str] = (
        "cell_xmin",
        "cell_ymin",
        "cell_xmax",
        "cell_ymax",
    ),
) -> DataFrame:
    """A2 (pg_containers.go:409-430): per (cell, record), the intersection
    of the union of dataset shapes with the cell ring.

    Rect fixtures make union-of-shapes == bbox envelope, so the operator is
    exact in the bbox domain: groupBy -> envelope -> clamp to cell bounds;
    empty intersections (zero area) are dropped like the reference's
    dimension filter (pg_grids.go:126).
    """
    cx0, cy0, cx1, cy1 = cell_bounds_cols
    env = datasets_with_cells.groupBy(
        "cell_uri", "record_id", cx0, cy0, cx1, cy1
    ).agg(
        F.min("bbox.xmin").alias("u_xmin"),
        F.min("bbox.ymin").alias("u_ymin"),
        F.max("bbox.xmax").alias("u_xmax"),
        F.max("bbox.ymax").alias("u_ymax"),
        F.count(F.lit(1)).alias("n_datasets"),
    )
    clamped = env.select(
        "cell_uri",
        "record_id",
        "n_datasets",
        F.greatest(F.col("u_xmin"), F.col(cx0)).alias("v_xmin"),
        F.greatest(F.col("u_ymin"), F.col(cy0)).alias("v_ymin"),
        F.least(F.col("u_xmax"), F.col(cx1)).alias("v_xmax"),
        F.least(F.col("u_ymax"), F.col(cy1)).alias("v_ymax"),
    )
    return clamped.filter(
        (F.col("v_xmin") < F.col("v_xmax")) & (F.col("v_ymin") < F.col("v_ymax"))
    )


def exclude_full_containers(
    per_cell_members: DataFrame,
    container_stats: DataFrame,
    max_records: int,
) -> DataFrame:
    """L4 (consolidater.go:436-456): drop dataset runs whose container is
    already full (holds max_records) and untouched by this job — no work to
    do for them.  ``container_stats``: (container_uri, n_records, dirty)."""
    full = container_stats.filter(
        (F.col("n_records") >= max_records) & (~F.col("dirty"))
    ).select("container_uri")
    return per_cell_members.join(full, "container_uri", "left_anti")


def cog_reuse_short_circuit(
    datasets: DataFrame,
    layout_block: int,
    layout_dtype: str,
    layout_overviews: bool,
) -> DataFrame:
    """R13 (handler_consolidation.go:400-484): a single-source container that
    already matches the target structure (block size, dtype, overviews flag)
    skips consolidation.  Returns datasets annotated with ``reuse`` —
    planning then filters reuse==false into the work queue."""
    per_container = datasets.groupBy("container_uri").agg(
        F.count(F.lit(1)).alias("n_in_container")
    )
    annotated = datasets.join(F.broadcast(per_container), "container_uri")
    reuse = (
        (F.col("n_in_container") == 1)
        & (F.col("dmapping.dtype") == layout_dtype)
        & (F.col("overviews") == F.lit(layout_overviews))
    )
    _ = layout_block  # block-size parity is a tile-table invariant here
    return annotated.withColumn("reuse", reuse)


def consolidate_tiles(
    tiles_with_time: DataFrame,
    interlacing_pattern: str,
    out_path: str,
    cell_col: str = "cell_uri",
) -> None:
    """The rewrite job (O12/R7): partition by cell, physically order rows by
    the interlacing pattern, write.  At 100 TB this is the operation that
    turns scattered small files into time-contiguous reads (the MuCOG 10-20×
    read win, docs/architecture/mucog.md:15)."""
    sort_cols = [c for c in interlacing_sort_columns(interlacing_pattern)]
    (
        tiles_with_time.repartition(F.col(cell_col))
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(cell_col)
        .parquet(out_path)
    )


def swap_datasets(datasets: DataFrame, job_id: str, new_datasets: DataFrame) -> DataFrame:
    """csldSwapDatasets (consolidater.go:559+): old ACTIVE rows of the job ->
    TODELETE; new rows -> ACTIVE.  As a pure transform over the datasets
    table — the write is an idempotent overwrite (Delta MERGE when
    available), re-runnable per the reference's retry arcs."""
    flipped = datasets.withColumn(
        "status",
        F.when(
            (F.col("locked_by_job_id") == job_id) & (F.col("status") == "ACTIVE"),
            F.lit("TODELETE"),
        ).otherwise(F.col("status")),
    )
    activated = new_datasets.withColumn("status", F.lit("ACTIVE"))
    return flipped.unionByName(activated, allowMissingColumns=True)
