"""Exact-EDT proximity operator: the numpy kernel against quadratic truth,
and the Spark plan against edge cases (no targets, partial blocks, dense
masks).  Parity surface: gdal_proximity.py -values/-maxdist (squared-int
contract documented in operators/proximity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.proximity import (
    _BIG,
    _edt_window,
    proximity_summary,
)


def _brute_d2(mask: np.ndarray) -> np.ndarray:
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    out = np.full((h, w), int(_BIG), dtype=np.int64)
    if len(ys) == 0:
        return out
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for y, x in zip(ys, xs):
        out = np.minimum(out, (jj - y) ** 2 + (ii - x) ** 2)
    return out


@pytest.mark.parametrize("seed,density", [(0, 0.01), (1, 0.1), (2, 0.5), (3, 0.9)])
def test_edt_window_matches_brute_force(seed, density):
    rng = np.random.default_rng(seed)
    mask = rng.random((37, 53)) < density
    got = _edt_window(mask)
    want = _brute_d2(mask)
    # where a target exists anywhere, exact; where none, both are "far"
    if mask.any():
        np.testing.assert_array_equal(got, want)
    else:
        assert (got >= _BIG).all()


def test_edt_window_empty_and_full():
    assert (_edt_window(np.zeros((8, 8), dtype=bool)) >= _BIG).all()
    np.testing.assert_array_equal(
        _edt_window(np.ones((8, 8), dtype=bool)), np.zeros((8, 8), dtype=np.int64)
    )


def test_edt_single_target_corner():
    mask = np.zeros((16, 16), dtype=bool)
    mask[0, 0] = True
    d2 = _edt_window(mask)
    assert d2[0, 0] == 0
    assert d2[15, 15] == 15 * 15 + 15 * 15
    assert d2[3, 4] == 9 + 16


def _tiles(spark, blocks):
    """blocks: {(bx,by): flat list of pixel values}"""
    rows = [
        {"block_x": bx, "block_y": by, "px": [float(v) for v in px]}
        for (bx, by), px in blocks.items()
    ]
    return spark.createDataFrame(rows, "block_x int, block_y int, px array<double>")


def test_proximity_no_targets(spark):
    tiles = _tiles(spark, {(0, 0): [1.0] * 16})
    out = proximity_summary(tiles, max_dist=2, target_value=0.0, block=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_reached, r.n_unreached, r.sum_min_d2) == (0, 16, 0)


def test_proximity_cross_block_halo(spark):
    # single target in block (0,0); its distance field must reach into
    # the neighboring block through the halo exchange
    a = [1.0] * 16
    a[0] = 0.0  # target at global (0, 0)
    b = [1.0] * 16
    tiles = _tiles(spark, {(0, 0): a, (1, 0): b})
    out = {
        (r.block_x, r.block_y): r
        for r in proximity_summary(
            tiles, max_dist=5, target_value=0.0, block=4
        ).collect()
    }
    # block (1,0) pixels at global i in 4..7, j in 0..3; reached iff i²+j² <= 25
    reach = [(i, j) for i in range(4, 8) for j in range(4) if i * i + j * j <= 25]
    assert out[(1, 0)].n_reached == len(reach)
    assert out[(1, 0)].sum_min_d2 == sum(i * i + j * j for i, j in reach)


def test_proximity_partial_block(spark):
    # n_px < block² — trailing linear indices simply don't exist
    px = [0.0, 1.0, 1.0, 1.0, 1.0, 1.0]  # 6 of 16 pixels, target at k=0
    tiles = _tiles(spark, {(0, 0): px})
    r = proximity_summary(tiles, max_dist=3, target_value=0.0, block=4).collect()[0]
    # k -> (i=k%4, j=k//4): pixels (0..3,0) and (0..1,1); d² = i²+j²
    d2s = [0, 1, 4, 9, 1, 2]
    assert r.n_reached == len(d2s)
    assert r.n_unreached == 0
    assert r.sum_min_d2 == sum(d2s)


def test_proximity_dense_equals_sparse_contract(spark):
    # dense mask (~half of pixels are targets): identical plan, exact result
    n = 8
    vals = [(13 * (k % n) + 7 * (k // n)) % 2 for k in range(n * n)]
    tiles = _tiles(spark, {(0, 0): vals})
    r = proximity_summary(tiles, max_dist=2, target_value=0.0, block=n).collect()[0]
    mask = np.array(vals, dtype=float).reshape(n, n) == 0.0
    want = _brute_d2(mask)
    reached = want <= 4
    assert r.n_reached == int(reached.sum())
    assert r.sum_min_d2 == int(want[reached].sum())


def test_proximity_map_values(spark):
    # single target at global (0,0); map reports clipped exact d²
    a = [1.0] * 16
    a[0] = 0.0
    tiles = _tiles(spark, {(0, 0): a})
    from geocube_spark.operators.proximity import proximity_map

    row = proximity_map(tiles, max_dist=2, target_value=0.0, block=4).collect()[0]
    d2 = row["d2"]
    assert d2[0] == 0  # the target itself
    assert d2[1] == 1 and d2[5] == 2
    assert d2[15] == 4  # (3,3): d²=18 clipped at cap=4
    assert len(d2) == 16


def test_bap_composite_choice_and_ties(spark):
    from geocube_spark.operators.mosaic import bap_composite

    # 2x2 block, two layers; d2 arrays crafted directly
    rows = [
        # t=0: score 0.25 + d2/4
        (0, 0, 0, [10.0, 11.0, 12.0, 13.0], [4, 0, 2, 2], 0.25),
        # t=1: score 0.5 + d2/4
        (0, 0, 1, [20.0, 21.0, 22.0, 23.0], [2, 1, 0, 1], 0.5),
    ]
    layers = spark.createDataFrame(
        rows,
        "block_x int, block_y int, t int, px array<double>, d2 array<long>,"
        " layer_score double",
    )
    out = bap_composite(layers, d2_cap=4, block=2).collect()[0]
    # px0: t0 score 1.25 vs t1 1.0 -> t0; px1: t0 cloudy -> t1
    # px2: t1 cloudy -> t0; px3: t0 0.75 == t1 0.75 -> tie, latest wins
    assert out["px"] == [10.0, 21.0, 12.0, 23.0]
    assert out["chosen_t"] == [0.0, 1.0, 0.0, 1.0]


def test_bap_all_cloud_pixel_is_nodata(spark):
    from geocube_spark.operators.mosaic import bap_composite

    rows = [
        (0, 0, 0, [5.0], [0], 0.25),
        (0, 0, 1, [6.0], [0], 0.5),
    ]
    layers = spark.createDataFrame(
        rows,
        "block_x int, block_y int, t int, px array<double>, d2 array<long>,"
        " layer_score double",
    )
    out = bap_composite(layers, d2_cap=4, block=1).collect()[0]
    assert out["chosen_t"] == [-1.0]
    assert out["px"][0] != out["px"][0]  # NaN
