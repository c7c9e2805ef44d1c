"""STAC ingest mapping: items -> records, assets -> datasets."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from geocube_spark.sources.stac import (
    read_stac_items,
    stac_assets_to_datasets,
    stac_items_to_records,
    write_stac_fixture,
)


def _fixture(tmp_path):
    p = str(tmp_path / "items.jsonl")
    write_stac_fixture(p, n_items=10)
    return p


def test_records_mapping(spark, tmp_path):
    recs = stac_items_to_records(
        read_stac_items(spark, _fixture(tmp_path))
    ).collect()
    assert len(recs) == 10
    r0 = {r["id"]: r for r in recs}["item-0000"]
    assert r0["name"] == "demo/item-0000"
    assert r0["tags"]["platform"] == "sat-0"
    assert float(r0["tags"]["gsd"]) == 10.0
    assert (
        r0["bbox"]["xmin"], r0["bbox"]["ymin"], r0["bbox"]["xmax"], r0["bbox"]["ymax"]
    ) == (0.0, 0.0, 1.0, 0.5)
    # WKB footprint decodes back to the GeoJSON ring
    from geocube_spark.functions.geometry import decode_wkb_polygons

    ring = decode_wkb_polygons(bytes(r0["geom_wkb"]))[0][0]
    assert ring.shape == (5, 2)
    np.testing.assert_allclose(ring[0], [0.0, 0.0])


def test_assets_role_filter(spark, tmp_path):
    items = read_stac_items(spark, _fixture(tmp_path))
    all_ds = stac_assets_to_datasets(items)
    data_ds = stac_assets_to_datasets(items, roles=["data"])
    assert all_ds.count() == 20  # data + thumbnail per item
    assert data_ds.count() == 10
    row = data_ds.filter(F.col("record_id") == "item-0003").collect()[0]
    assert row["container_uri"] == "s3://demo/0003/B01.tif"
    assert row["crs_srid"] == 32631 and row["status"] == "ACTIVE"


def test_malformed_rows_surface_as_nulls_not_failures(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"id": "ok", "geometry": None, "properties": None,
                            "assets": None, "collection": None}) + "\n")
        f.write("{not json at all\n")
    items = read_stac_items(spark, p)
    rows = items.collect()
    assert len(rows) == 2  # PERMISSIVE: corrupt row -> all-null record
    recs = stac_items_to_records(items).collect()
    ok = {r["id"]: r for r in recs}.get("ok")
    assert ok is not None and ok["geom_wkb"] is None and ok["tags"] == {}
