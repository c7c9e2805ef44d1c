"""Streaming overview freshness: landing-zone ingest -> incremental
pyramid refresh.

The batch story (operators/pyramid.pyramid_delta) recomputes only the
ancestor path of changed level-0 blocks; this wires it under Structured
Streaming so the overview store tracks the landing zone without ever
running a full rebuild:

- the file source decodes arriving GeoTIFFs with the SAME kernel as
  batch ingest (sources/ingest.ingest_tiff_files);
- each micro-batch's blocks UPSERT into the level-0 table
  (key-replace — anti-join on the block key then union — so a crash
  replay is idempotent without relying on the epoch check);
- ``pyramid_delta`` recomputes the touched ancestor paths against the
  last committed pyramid and the refreshed pyramid commits with the
  batchId inside the atomic commit record (exactly-once: a replayed
  epoch is skipped before any write).

Convergence contract (tested): after any sequence of batches, the
pyramid table equals ``build_pyramid`` over the union of everything
ingested — stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["container_uri", "band", "block_x", "block_y"]


def refresh_batch_fn(catalog, l0_table: str, pyr_table: str, max_level: int,
                     block_w: int = 64, block_h: int = 64,
                     alg: str = "AVERAGE", nodata: float = 0.0):
    """foreachBatch callback: upsert level-0, incrementally refresh the
    pyramid, commit both (pyramid commit carries the epoch id)."""
    from geocube_spark.operators.pyramid import build_pyramid, pyramid_delta
    from geocube_spark.streaming.sink import last_committed_batch

    def write_batch(df: DataFrame, batch_id: int) -> None:
        if last_committed_batch(catalog, pyr_table) == batch_id:
            return  # replayed epoch — already fully applied
        # landing files may themselves carry overview IFDs — only their
        # full-res planes feed the store; overviews are THIS pipeline's job
        new0 = df.filter(F.col("level") == 0)
        touched = new0.select(*_KEY).distinct()
        if catalog.exists(l0_table):
            old0 = catalog.read(l0_table)
            l0 = old0.join(touched, _KEY, "left_anti").unionByName(
                new0.select(*old0.columns)
            )
        else:
            l0 = new0
        # key-replace upsert is replay-idempotent: re-applying the same
        # batch yields the same table, so a crash between the two commits
        # below heals on replay
        catalog.write(l0_table, l0, commit_meta={"stream_batch_id": batch_id})
        l0 = catalog.read(l0_table)
        if catalog.exists(pyr_table):
            prev = catalog.read(pyr_table)
            delta, updated = pyramid_delta(
                l0, prev, touched, max_level,
                block_w=block_w, block_h=block_h, alg=alg, nodata=nodata,
            )
        else:
            updated = build_pyramid(
                l0, max_level, block_w=block_w, block_h=block_h,
                alg=alg, nodata=nodata,
            )
        catalog.write(
            pyr_table, updated, commit_meta={"stream_batch_id": batch_id}
        )

    return write_batch


def run_pyramid_refresh_stream(
    spark,
    landing_dir: str,
    catalog,
    l0_table: str,
    pyr_table: str,
    checkpoint: str,
    max_level: int,
    glob: str = "*.tif",
    block_w: int = 64,
    block_h: int = 64,
    alg: str = "AVERAGE",
    nodata: float = 0.0,
):
    """Landing-zone GeoTIFFs -> fresh overviews, one availableNow pass."""
    from geocube_spark.sources.ingest import ingest_tiff_files

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
        .option("pathGlobFilter", glob)
        .load(landing_dir)
    )
    tiles = ingest_tiff_files(stream)
    return (
        tiles.writeStream.foreachBatch(
            refresh_batch_fn(
                catalog, l0_table, pyr_table, max_level,
                block_w=block_w, block_h=block_h, alg=alg, nodata=nodata,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
