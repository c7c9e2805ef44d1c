"""O8 automatic overview-level selection (image.go:402 -ovr AUTO)."""

from __future__ import annotations

import pytest

from geocube_spark.plans.overview import auto_overview_level, scan_at_overview


@pytest.mark.parametrize(
    "base,out,maxl,want",
    [
        (10.0, 10.0, 4, 0),  # native read
        (10.0, 5.0, 4, 0),  # zoom-in: never upsample an overview
        (10.0, 19.9, 4, 0),  # not yet coarse enough for level 1
        (10.0, 20.0, 4, 1),  # exactly 2x -> level 1 (res == requested ok)
        (10.0, 39.9, 4, 1),
        (10.0, 40.0, 4, 2),
        (10.0, 1000.0, 3, 3),  # clamped to the pyramid's top
        (10.0, 25.0, 0, 0),  # no overviews materialized
    ],
)
def test_auto_overview_level(base, out, maxl, want):
    assert auto_overview_level(base, out, maxl) == want


def test_scan_at_overview_prunes_and_rescales_affine(spark):
    rows = [
        (0, 0, 0, [1.0], {"a": 10.0, "b": 0.0, "c": 5.0, "d": 0.0, "e": -10.0, "f": 7.0}),
        (1, 0, 0, [2.0], {"a": 10.0, "b": 0.0, "c": 5.0, "d": 0.0, "e": -10.0, "f": 7.0}),
    ]
    df = spark.createDataFrame(
        rows,
        "level int, block_x int, block_y int, px array<double>, "
        "pix_to_crs struct<a double, b double, c double, d double, e double, f double>",
    )
    pruned, lvl = scan_at_overview(df, base_res=10.0, out_res=25.0, max_level=1)
    assert lvl == 1
    got = pruned.collect()
    assert len(got) == 1
    gt = got[0]["pix_to_crs"]
    # linear part scaled by 2^1, origin unchanged
    assert (gt["a"], gt["e"]) == (20.0, -20.0)
    assert (gt["c"], gt["f"]) == (5.0, 7.0)


def test_scan_at_overview_native_keeps_affine(spark):
    df = spark.createDataFrame(
        [(0, [1.0], {"a": 10.0, "b": 0.0, "c": 0.0, "d": 0.0, "e": -10.0, "f": 0.0})],
        "level int, px array<double>, "
        "pix_to_crs struct<a double, b double, c double, d double, e double, f double>",
    )
    pruned, lvl = scan_at_overview(df, base_res=10.0, out_res=8.0, max_level=3)
    assert lvl == 0
    assert pruned.collect()[0]["pix_to_crs"]["a"] == 10.0


def test_xyz_tile_auto_selects_overview_level(spark):
    import re

    from pyspark.sql import functions as F

    from geocube_spark.operators.regrid import xyz_tile, xyz_tile_grid

    # a 2-level store centered on tile (1, 1, 2); base_res chosen so the
    # zoom's output resolution sits between level 1 and level 2
    (ox, oy), res = xyz_tile_grid(1, 1, 2)
    rows = []
    for lvl in (0, 1):
        rows.append(
            {
                "container_uri": "pyr://c1",
                "band": 1,
                "level": lvl,
                "block_x": 0,
                "block_y": 0,
                "px": [float(lvl + 1)] * 256,
                "crs_srid": 3857,
                "pix_to_crs": {
                    "a": res / 2.5, "b": 0.0, "c": ox,
                    "d": 0.0, "e": -res / 2.5, "f": oy,
                },
                "record_id": "r1",
            }
        )
    tiles = spark.createDataFrame(rows).withColumn(
        "record_datetime", F.lit("2024-01-01").cast("timestamp")
    )
    out = xyz_tile(tiles, 1, 1, 2, base_res=res / 2.5, max_level=1)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # floor(log2(2.5)) = 1 -> the level-0 rows are pruned at the filter
    assert re.search(r"level#\d+L? = 1", plan), plan
    # and the sampled pixels come from the level-1 content
    vals = {
        v
        for r in out.collect()
        for v in r["px"]
        if v is not None and v == v  # drop null/NaN gaps
    }
    assert vals == {2.0}


def test_get_cube_auto_overview_prunes_before_join(spark, fixture_dir):
    import re

    from pyspark.sql import functions as F

    from geocube_spark.plans.cube import get_cube
    from geocube_spark.plans.find_datasets import DatasetFilters

    datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
    records = spark.read.parquet(f"{fixture_dir}/records.parquet")
    tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet")
    cube = get_cube(
        datasets, records, tiles,
        DatasetFilters(status="ACTIVE", order=False),
        nodata=-32768.0,
        base_res=10.0, out_res=25.0, max_level=1,
    )
    plan = cube._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"level#\d+\w* = 1", plan), plan
