"""Zarr v2 source: round-trips, fill semantics, error surfaces."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from geocube_spark.sources.zarr import (
    write_zarr_array,
    zarr_tile_rows,
)


def _blocks(spark, path, **kw):
    return {
        (r.band, r.block_x, r.block_y): np.asarray(r.px)
        for r in zarr_tile_rows(spark, path, **kw).collect()
    }


def test_2d_roundtrip_zlib(spark, tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 50, (64, 96)).astype("<i4")
    p = str(tmp_path / "z2")
    write_zarr_array(p, arr, chunks=(32, 32), compressor="zlib")
    got = _blocks(spark, p)
    assert set(got) == {(1, gx, gy) for gx in range(3) for gy in range(2)}
    for (b, gx, gy), px in got.items():
        want = arr[gy * 32 : (gy + 1) * 32, gx * 32 : (gx + 1) * 32]
        np.testing.assert_array_equal(px.reshape(32, 32), want.astype(float))


def test_3d_bands_and_edge_fill(spark, tmp_path):
    arr = np.arange(2 * 10 * 10, dtype="<f8").reshape(2, 10, 10)
    p = str(tmp_path / "z3")
    write_zarr_array(p, arr, chunks=(1, 8, 8), compressor=None, fill_value=-9.0)
    got = _blocks(spark, p)
    assert set(got) == {(b, gx, gy) for b in (1, 2) for gx in (0, 1) for gy in (0, 1)}
    # edge chunk (1,1): only a 2x2 valid corner, rest is fill
    edge = got[(2, 1, 1)].reshape(8, 8)
    np.testing.assert_array_equal(edge[:2, :2], arr[1, 8:, 8:])
    assert (edge[2:, :] == -9.0).all() and (edge[:, 2:] == -9.0).all()


def test_missing_chunk_is_fill(spark, tmp_path):
    arr = np.ones((16, 16))
    p = str(tmp_path / "zm")
    write_zarr_array(p, arr, chunks=(8, 8), compressor=None, fill_value=3.5)
    os.remove(os.path.join(p, "1.1"))  # drop one chunk file
    got = _blocks(spark, p)
    assert (got[(1, 1, 1)] == 3.5).all()
    assert (got[(1, 0, 0)] == 1.0).all()


def test_dimension_separator_slash(spark, tmp_path):
    arr = np.arange(64, dtype=float).reshape(8, 8)
    p = str(tmp_path / "zs")
    write_zarr_array(p, arr, chunks=(4, 4), dimension_separator="/")
    assert os.path.exists(os.path.join(p, "1", "0"))
    got = _blocks(spark, p)
    np.testing.assert_array_equal(
        got[(1, 0, 1)].reshape(4, 4), arr[4:, :4]
    )


def test_unsupported_surfaces_raise(spark, tmp_path):
    arr = np.ones((8, 8))
    p = str(tmp_path / "zb")
    write_zarr_array(p, arr, chunks=(4, 4))
    meta = json.load(open(os.path.join(p, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "lz4"}
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="blosc"):
        zarr_tile_rows(spark, p)
    meta["compressor"] = None
    meta["order"] = "F"
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(ValueError, match="C-order"):
        zarr_tile_rows(spark, p)
    with pytest.raises(ValueError, match="band dimension"):
        write_zarr_array(str(tmp_path / "zc"), np.ones((2, 8, 8)), chunks=(2, 4, 4))
        zarr_tile_rows(spark, str(tmp_path / "zc"))
