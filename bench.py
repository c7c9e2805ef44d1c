"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is executed twice: a warm-up collect is NOT done (cold numbers
are what the driver records); timing covers plan + execution + collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geocube_spark import registry  # noqa: E402
from geocube_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # relational core (the FindDatasets/GetCube surface)
    "find_datasets_core",
    "find_datasets_tags",
    "cube_headers_by_record",
    "mosaic_rank_latest",
    "impact_count",
    "events_hourly_rollup",
    "events_latest_per_user",
    # TPC-H classics (scan/join/agg throughput)
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q12",
    "tpch_q18",
    # pipeline operators
    "dedup_exact_groups",
    "dedup_keep_first",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "embedding_topk",
    "embedding_near_dup_exact",
    "embedding_ivf_topk",
    "text_quality",
    "curation_pipeline",
    "stratified_sample",
    "text_langid",
    # raster plane (fixture tables)
    "cast_tiles_checksum",
    "timeseries_block_read",
    "mosaic_latest_first",
    "get_cube_pixels",
    "pyramid_level1",
    "valid_pixel_filter",
    "cover_regular_grid",
    "cover_custom_cells",
    "union_geometry_job",
    "datasets_records_aoi_join",
    # round-2 additions: temporal joins, general geometry, cross-CRS warp
    "asof_join_events",
    "asof_join_events_forward",
    "range_join_events",
    "spatial_concave_refine",
    "get_cube_pixels_webmercator",
    "warp_upsample_cubic",
    # retrieval / packing / sessionization
    "text_bm25_topk",
    "decontamination_overlap",
    "sequence_packing",
    "events_sessions",
    "document_chunking",
    "unigram_logprob",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("geocube-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.ensure_fixtures()

    # JVM warm-up (codegen compiler, parquet reader init, broadcast machinery)
    # so the first timed query doesn't carry one-time startup cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()

    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        # min of 2 runs: the first run carries per-query codegen compilation
        # and is noisy on shared machines; the min is the reproducible cost
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # collect (not count): count() would let Catalyst prune the
            # computed columns and skip the actual operator work
            n = len(df.collect())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "geocube_spark_headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
