"""MuCOG interlacing grammar (layouts.proto:41-66, mucog.go:30-97):
clauses, value/range selectors, byte-level write order, and the
consolidated-parquet sort twin."""

from __future__ import annotations

import numpy as np
import pytest

from geocube_spark.operators.interlace import (
    InterlacingError,
    interlace_order,
    parse_interlacing,
)


def _items(n_z=2, n_t=2, n_r=2, n_b=1):
    out = []
    for z in range(n_z):
        for t in range(n_t):
            for r in range(n_r):
                for b in range(n_b):
                    out.append({"Z": z, "T": t, "R": r, "B": b})
    return out


class TestParse:
    def test_simple(self):
        (c,) = parse_interlacing("Z>T>R>B")
        assert c.order == ("Z", "T", "R", "B")
        assert all(c.selectors[k].accepts(5) for k in "ZTRB")

    def test_values_and_ranges(self):
        (c1, c2) = parse_interlacing("Z=0>T>R>B;Z=1:>R>T>B")
        assert c1.selectors["Z"].accepts(0) and not c1.selectors["Z"].accepts(1)
        assert c2.selectors["Z"].accepts(1) and c2.selectors["Z"].accepts(9)
        assert not c2.selectors["Z"].accepts(0)

    def test_value_list(self):
        (c,) = parse_interlacing("B=0,2,3>Z>R>T")
        s = c.selectors["B"]
        assert s.accepts(0) and s.accepts(2) and s.accepts(3)
        assert not s.accepts(1)

    def test_open_ranges(self):
        (c,) = parse_interlacing("B=2:>Z>R>T")
        assert not c.selectors["B"].accepts(1) and c.selectors["B"].accepts(7)
        (c,) = parse_interlacing("B=:2>Z>R>T")
        assert c.selectors["B"].accepts(1) and not c.selectors["B"].accepts(2)

    def test_errors(self):
        with pytest.raises(InterlacingError):
            parse_interlacing("Z>T>R")  # missing B
        with pytest.raises(InterlacingError):
            parse_interlacing("Z>T>R>R")  # dup
        with pytest.raises(InterlacingError):
            parse_interlacing("Z>T=0>R>B")  # T selector forbidden
        with pytest.raises(InterlacingError):
            parse_interlacing("Z>T>R>X")  # unknown level
        with pytest.raises(InterlacingError):
            parse_interlacing("Z=3:3>T>R>B")  # empty range
        with pytest.raises(InterlacingError):
            parse_interlacing("")


class TestOrder:
    def test_nested_loop_semantics(self):
        items = _items(n_z=1, n_t=2, n_r=2)
        # Z>T>R>B: for a given tile, records contiguous (MUCOG)
        order = interlace_order(items, "Z>T>R>B")
        keys = [(items[i]["T"], items[i]["R"]) for i in order]
        assert keys == [(0, 0), (0, 1), (1, 0), (1, 1)]
        # Z>R>T>B: for a given record, tiles contiguous (COG / geographic)
        order = interlace_order(items, "Z>R>T>B")
        keys = [(items[i]["R"], items[i]["T"]) for i in order]
        assert keys == [(0, 0), (0, 1), (1, 0), (1, 1)]

    def test_mucog_published_pattern(self):
        # Z=0>T>R>B;Z=1:>R>T>B — timeseries for full-res, geographic for
        # overviews (the proto's own MUCOG example)
        items = _items(n_z=2, n_t=2, n_r=2)
        order = interlace_order(items, "Z=0>T>R>B;Z=1:>R>T>B")
        z0 = [i for i in order if items[i]["Z"] == 0]
        z1 = [i for i in order if items[i]["Z"] == 1]
        # clause 1 exhausts before clause 2 starts
        assert order[: len(z0)] == z0
        # full-res: (T, R) loop — records contiguous per tile
        assert [(items[i]["T"], items[i]["R"]) for i in z0] == [
            (0, 0), (0, 1), (1, 0), (1, 1)
        ]
        # overviews: (R, T) loop — tiles contiguous per record
        assert [(items[i]["R"], items[i]["T"]) for i in z1] == [
            (0, 0), (0, 1), (1, 0), (1, 1)
        ]

    def test_band_split_pattern(self):
        # Z>T>R>B=0:3;B=3:>Z>R>T — first three bands timeseries-interlaced,
        # the rest geographic (the proto's third example)
        items = _items(n_z=1, n_t=2, n_r=1, n_b=5)
        order = interlace_order(items, "Z>T>R>B=0:3;B=3:>Z>R>T")
        first = [i for i in order if items[i]["B"] < 3]
        assert order[: len(first)] == first
        rest = order[len(first):]
        # remaining bands: band-major, tiles inner
        assert [(items[i]["B"], items[i]["T"]) for i in rest] == [
            (3, 0), (3, 1), (4, 0), (4, 1)
        ]

    def test_first_matching_clause_wins(self):
        items = _items(n_z=2, n_t=1, n_r=1)
        # both clauses accept Z=0; the first must own it
        order = interlace_order(items, "Z=0:2>T>R>B;Z=0>R>T>B")
        assert len(order) == len(items) == len(set(order))

    def test_uncovered_blocks_fall_back(self):
        items = _items(n_z=3, n_t=2, n_r=1)
        order = interlace_order(items, "Z=0>T>R>B")  # Z=1,2 unselected
        assert sorted(order) == list(range(len(items)))
        tail = [i for i in order if items[i]["Z"] > 0]
        assert order[-len(tail):] == tail  # appended last, Z>T>R>B


class TestByteOrder:
    """The VERDICT's acceptance test: a Z=0>T>R>B;Z=1:>R>T>B mucog shows
    overview blocks clustered per record while full-res blocks cluster per
    tile — verified on the actual tile offsets of the written TIFF."""

    def _build(self, pattern):
        from geocube_spark.sources.gtiff import RasterImage, read_tiff, write_tiff

        n = 16
        images, keys = [], []
        for r in range(2):  # 2 records
            full = np.arange(32 * 32, dtype="float64").reshape(32, 32) + r
            images.append(
                RasterImage(bands=full, transform=(1, 0, 0, 0, -1, 32))
            )
            keys.append({"Z": 0, "R": r, "B": 0})
        for r in range(2):  # their 2x overview (16x16 -> single grid level)
            ov = np.arange(16 * 16, dtype="float64").reshape(16, 16) + r
            images.append(
                RasterImage(
                    bands=ov, transform=(2, 0, 0, 0, -2, 32), subfile_type=1
                )
            )
            keys.append({"Z": 1, "R": r, "B": 0})
        data = write_tiff(
            images,
            tile_size=(n, n),
            compression="none",
            tile_order=pattern,
            image_keys=keys,
        )
        return read_tiff(data)

    def test_full_res_timeseries_overviews_geographic(self):
        back = self._build("Z=0>T>R>B;Z=1:>R>T>B")
        full = [im for im in back if im.subfile_type == 0]
        ovs = [im for im in back if im.subfile_type == 1]
        assert len(full) == 2 and len(ovs) == 2
        # full-res (4 tiles each): for every tile index, the two records'
        # payloads are ADJACENT (record-run contiguity = timeseries read)
        for ti in range(4):
            o0, c0 = full[0].tile_offsets[ti], full[0].tile_byte_counts[ti]
            o1 = full[1].tile_offsets[ti]
            assert o0 + c0 == o1
        # overviews (1 tile each here, so check region ordering instead):
        # record 0's overview bytes come entirely before record 1's
        assert (
            ovs[0].tile_offsets[0] + ovs[0].tile_byte_counts[0]
            <= ovs[1].tile_offsets[0]
        )
        # and the full-res region precedes the overview region (clause 1
        # exhausts before clause 2 starts)
        assert max(
            f.tile_offsets[ti] for f in full for ti in range(4)
        ) < min(o.tile_offsets[0] for o in ovs)

    def test_overview_tiles_cluster_per_record(self):
        # 64x64 full-res -> 32x32 overview = 4 overview tiles per record:
        # Z=1: clause R>T>B means each record's overview tiles are one
        # contiguous run
        from geocube_spark.sources.gtiff import RasterImage, read_tiff, write_tiff

        images, keys = [], []
        for r in range(2):
            images.append(
                RasterImage(
                    bands=np.zeros((64, 64)), transform=(1, 0, 0, 0, -1, 64)
                )
            )
            keys.append({"Z": 0, "R": r, "B": 0})
        for r in range(2):
            images.append(
                RasterImage(
                    bands=np.full((32, 32), float(r)),
                    transform=(2, 0, 0, 0, -2, 64),
                    subfile_type=1,
                )
            )
            keys.append({"Z": 1, "R": r, "B": 0})
        back = read_tiff(
            write_tiff(
                images,
                tile_size=(16, 16),
                compression="none",
                tile_order="Z=0>T>R>B;Z=1:>R>T>B",
                image_keys=keys,
            )
        )
        ovs = [im for im in back if im.subfile_type == 1]
        for ov in ovs:
            offs = list(ov.tile_offsets)
            cnts = list(ov.tile_byte_counts)
            for i in range(len(offs) - 1):
                assert offs[i] + cnts[i] == offs[i + 1]  # contiguous run
        # record 0's run entirely before record 1's
        assert max(ovs[0].tile_offsets) < min(ovs[1].tile_offsets)


class TestParquetSortTwin:
    def test_multi_clause_sort(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from geocube_spark.operators.consolidation import consolidate_tiles

        rows = []
        for lvl in (0, 1):
            for t_idx, ts in enumerate(["2024-01-01", "2024-01-02"]):
                for by in (0, 1):
                    rows.append(
                        ("cell0", 1, lvl, 0, by, [0.0], f"r{t_idx}", ts)
                    )
        tiles = spark.createDataFrame(
            rows,
            "cell_uri string, band int, level int, block_x int, block_y int,"
            " px array<double>, record_id string, record_datetime string",
        ).withColumn(
            "record_datetime", F.col("record_datetime").cast("timestamp")
        )
        out = str(tmp_path / "multi")
        consolidate_tiles(tiles, "Z=0>T>R>B;Z=1:>R>T>B", out)
        import glob as g

        part = sorted(g.glob(f"{out}/cell_uri=*/*.parquet"))[0]
        pdf = spark.read.parquet(part).toPandas()
        assert list(pdf["_il_clause"]) == sorted(pdf["_il_clause"])
        z0 = pdf[pdf["level"] == 0]
        z1 = pdf[pdf["level"] == 1]
        # full-res first, tile-major (records inner)
        assert list(z0["_il_clause"].unique()) == [0]
        assert list(zip(z0["block_y"], z0["record_id"])) == [
            (0, "r0"), (0, "r1"), (1, "r0"), (1, "r1")
        ]
        # overviews second, record-major (tiles inner)
        assert list(z1["_il_clause"].unique()) == [1]
        assert list(zip(z1["record_id"], z1["block_y"])) == [
            ("r0", 0), ("r0", 1), ("r1", 0), ("r1", 1)
        ]

    def test_record_index_selector(self, spark, tmp_path):
        # R=0:1 selects only the chronologically-first record; the second
        # falls back and sorts last
        from pyspark.sql import functions as F

        from geocube_spark.operators.consolidation import consolidate_tiles

        rows = [
            ("cell0", 1, 0, 0, 0, [0.0], "rB", "2024-02-01"),
            ("cell0", 1, 0, 0, 1, [0.0], "rA", "2024-01-01"),
        ]
        tiles = spark.createDataFrame(
            rows,
            "cell_uri string, band int, level int, block_x int, block_y int,"
            " px array<double>, record_id string, record_datetime string",
        ).withColumn(
            "record_datetime", F.col("record_datetime").cast("timestamp")
        )
        out = str(tmp_path / "rsel")
        consolidate_tiles(tiles, "R=0:1>Z>T>B", out)
        import glob as g

        part = sorted(g.glob(f"{out}/cell_uri=*/*.parquet"))[0]
        pdf = spark.read.parquet(part).toPandas()
        assert list(pdf["record_id"]) == ["rA", "rB"]  # rA selected first
        assert list(pdf["_il_clause"]) == [0, 1]  # rB = fallback clause

    def test_selector_ranks_are_container_global_under_batching(
        self, spark, tmp_path
    ):
        # per-cell batching (batch_cells=1): a cell whose ONLY record is
        # the chronologically-second must still rank it R-index 1 (global
        # chronology) -> fallback clause, identical to the one-shot write
        from pyspark.sql import functions as F

        from geocube_spark.operators.consolidation import (
            consolidate_tiles,
            consolidate_tiles_cancellable,
        )

        rows = [
            # cellA holds both records; cellB holds ONLY the later record
            ("cellA", 1, 0, 0, 0, [0.0], "rA", "2024-01-01"),
            ("cellA", 1, 0, 0, 1, [0.0], "rB", "2024-02-01"),
            ("cellB", 1, 0, 0, 0, [0.0], "rB", "2024-02-01"),
        ]
        tiles = spark.createDataFrame(
            rows,
            "cell_uri string, band int, level int, block_x int, block_y int,"
            " px array<double>, record_id string, record_datetime string",
        ).withColumn(
            "record_datetime", F.col("record_datetime").cast("timestamp")
        )
        import glob as g

        one = str(tmp_path / "oneshot")
        consolidate_tiles(tiles, "R=0:1>Z>T>B", one)
        batched = str(tmp_path / "batched")
        status = consolidate_tiles_cancellable(
            tiles, "R=0:1>Z>T>B", batched, job_id="j1",
            cancel_dir=str(tmp_path / "cancel"), batch_cells=1,
        )
        assert status == "DONE"
        for out in (one, batched):
            part = sorted(g.glob(f"{out}/cell_uri=cellB/*.parquet"))[0]
            pdf = spark.read.parquet(part).toPandas()
            # rB is record index 1 GLOBALLY: not selected by R=0:1 even
            # though it is cellB's only (hence locally-first) record
            assert list(pdf["_il_clause"]) == [1]
