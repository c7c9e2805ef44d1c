"""Incremental overview maintenance: pyramid_delta == full rebuild on the
ancestor path, untouched rows carried, delta minimal."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geocube_spark.operators.pyramid import build_pyramid, pyramid_delta


def _l0(spark, bump=None):
    """4x4 level-0 blocks of 4x4 px, closed-form values; ``bump`` adds a
    constant to one block to simulate an ingest update."""
    rows = []
    for bx in range(4):
        for by in range(4):
            base = float(bx * 10 + by)
            if bump and (bx, by) == bump[0]:
                base += bump[1]
            rows.append(
                {
                    "container_uri": "c1",
                    "band": 1,
                    "level": 0,
                    "block_x": bx,
                    "block_y": by,
                    "px": [base + k for k in range(16)],
                    "crs_srid": 32631,
                    "pix_to_crs": {
                        "a": 10.0, "b": 0.0, "c": 0.0,
                        "d": 0.0, "e": -10.0, "f": 0.0,
                    },
                }
            )
    return spark.createDataFrame(rows)


def _px_map(df):
    return {
        (r["level"], r["block_x"], r["block_y"]): np.asarray(r["px"])
        for r in df.collect()
    }


def test_delta_matches_full_rebuild_and_is_minimal(spark):
    old0 = _l0(spark)
    prev = build_pyramid(old0, max_level=2, block_w=4, block_h=4, nodata=-1.0)
    new0 = _l0(spark, bump=((2, 3), 100.0))
    touched = spark.createDataFrame(
        [("c1", 1, 2, 3)], "container_uri string, band int, block_x int, block_y int"
    )
    delta, updated = pyramid_delta(
        new0, prev, touched, max_level=2, block_w=4, block_h=4, nodata=-1.0
    )
    # minimal delta: exactly the ancestor path (1,1,1) and (2,0,0)
    dkeys = {(r["level"], r["block_x"], r["block_y"]) for r in delta.collect()}
    assert dkeys == {(1, 1, 1), (2, 0, 0)}
    # updated pyramid == full rebuild over the NEW level-0, bit for bit
    want = _px_map(build_pyramid(new0, max_level=2, block_w=4, block_h=4, nodata=-1.0))
    got = _px_map(updated)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_untouched_overviews_are_carried_not_recomputed(spark):
    old0 = _l0(spark)
    prev = build_pyramid(old0, max_level=1, block_w=4, block_h=4, nodata=-1.0)
    # poison an UNRELATED level-1 block in prev: if pyramid_delta carried
    # it (as it must), the poison survives; a full recompute would fix it
    poison = prev.withColumn(
        "px",
        F.when(
            (F.col("level") == 1) & (F.col("block_x") == 0) & (F.col("block_y") == 0),
            F.transform("px", lambda v: v * 0 + 999.0),
        ).otherwise(F.col("px")),
    )
    touched = spark.createDataFrame(
        [("c1", 1, 3, 3)], "container_uri string, band int, block_x int, block_y int"
    )
    _delta, updated = pyramid_delta(
        old0, poison, touched, max_level=1, block_w=4, block_h=4, nodata=-1.0
    )
    got = _px_map(updated)
    assert (got[(1, 0, 0)] == 999.0).all()  # carried verbatim
    assert not (got[(1, 1, 1)] == 999.0).any()  # rebuilt ancestor
