"""Exactly-once streaming sink into the commit-log catalog.

Structured Streaming's foreachBatch gives at-least-once batch delivery:
after a crash between "sink wrote" and "checkpoint advanced", the SAME
epoch is replayed with the SAME batchId.  Idempotence therefore has to
live in the sink.  Here the catalog commit record carries the batchId
that produced it; a replayed epoch sees its own id already committed and
skips — turning the versioned catalog into an exactly-once sink without
any coordinator (the same dedup-by-txn-id trick Delta's idempotent
writes and the reference's consolidation-job swap protocol use,
job.go:350-641's ACTIVE<->TODELETE idempotence).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from geocube_spark.sources.catalog import Catalog


def last_committed_batch(catalog: Catalog, name: str) -> int | None:
    """The stream batchId recorded by the newest commit of ``name``, or
    None if the table doesn't exist / was last written by a batch job."""
    commits = catalog._commits(name)
    if not commits:
        return None
    with open(commits[-1][1]) as fh:
        rec = json.load(fh)
    return rec.get("stream_batch_id")


def catalog_stream_sink(catalog: Catalog, name: str, mode: str = "append"):
    """Build a foreachBatch function writing each micro-batch into the
    catalog as a new committed version, idempotent per batchId.

    mode='append': each epoch's rows are unioned onto the current table
    content (read from the catalog, so the union is against the LAST
    COMMITTED version — a replay after partial failure cannot double-
    apply).  mode='overwrite': each epoch replaces the table.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        if last_committed_batch(catalog, name) == batch_id:
            return  # replayed epoch — already committed, exactly-once skip
        if mode == "append" and catalog.exists(name):
            out = catalog.read(name).unionByName(df)
        else:
            out = df
        # the batchId rides INSIDE the atomic commit record — there is no
        # window where the data is committed but the id is not, so a
        # crash anywhere before the os.link publish replays cleanly and a
        # crash after it is caught by the id check above
        catalog.write(name, out, commit_meta={"stream_batch_id": batch_id})

    return write_batch
