"""Empirical scaling-exponent harness — the "plans you'd want at 100×"
evidence, measured instead of argued.

Runs the suite's heaviest sf-driven queries at three scale factors of the
self-consistent generated family (tools/gen_scale_data.py: gen-sf0.01 /
gen-sf0.1 / gen-sf1 — one decade per step, same seed and distribution
shape), takes min-of-N per (query, sf) as the noise-floor estimator (the
first rep absorbs one-time index builds and codegen), and fits

    exponent = log(t_sf1 / t_sf0.1) / log(10)

from the two LARGEST points (the 0.01 point is overhead-dominated: every
Spark query carries ~0.3-1 s of fixed job-submission cost that would
deflate a small-sf fit; it is still recorded for the curve).  A query with
exponent <= 1.2 scales near-linearly; anything above gets a fix or a
documented cause in SCALING.md.

Two fixture-sized raster queries (flow_accumulation, bap) don't read
sf_dir — the harness scales their synthetic inputs directly (grid cells
proportional to sf) so their kernels get the same treatment.

Usage:
    python tools/gen_scale_data.py 0.01 .bench/gen-sf0.01   # once each
    python tools/gen_scale_data.py 0.1  .bench/gen-sf0.1
    python tools/gen_scale_data.py 1    .bench/gen-sf1
    python tools/scaling_run.py [--reps 3] [--out SCALING_EXPONENTS.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geocube_spark import registry  # noqa: E402
from geocube_spark.session import get_spark  # noqa: E402

SFS = [0.01, 0.1, 1.0]

# the 15 heaviest sf-driven registry queries (BENCH_FULL.json ranking)
HEAVY = [
    "graph_pagerank",
    "graph_label_propagation",
    "embedding_ivfpq_topk",
    "embedding_pq_topk",
    "simhash_near_duplicates",
    "incremental_dedup",
    "dedup_canonical",
    "dedup_components_skew",
    "dedup_components",
    "minhash_lsh_skew",
    "minhash_lsh_candidates",
    "leakage_safe_split",
    "bloom_decontamination",
    "winnow_plagiarism_pairs",
    "quality_classifier_train",
]


def _flow_scaled(spark, sf: float):
    """flow_accumulation with the grid scaled so cells ∝ sf (the registry
    query is a fixed 64×64 grid; side grows by √10 per decade)."""
    from geocube_spark.operators.hydrology import flow_summary

    side = max(8, int(round(64 * math.sqrt(sf / 0.1))))
    cells = spark.range(side * side).select(
        (F.col("id") % side).cast("int").alias("i"),
        (F.col("id") / side).cast("int").alias("j"),
        ((F.col("id") % side) % 8 + F.floor(F.col("id") / side) % 8)
        .cast("double")
        .alias("z"),
    )
    return flow_summary(cells, tile=8, rounds=8)


def _bap_scaled(spark, sf: float):
    """bap_cloudfree_composite with the block grid scaled so blocks ∝ sf
    (the registry query is a fixed 2×2 grid × 3 acquisitions)."""
    from geocube_spark.operators.mosaic import bap_composite
    from geocube_spark.operators.proximity import proximity_map

    b = max(1, int(round(2 * math.sqrt(sf / 0.1))))
    scores = {0: 0.25, 1: 0.5, 2: 0.375}
    blocks = spark.createDataFrame(
        [(t, bx, by) for t in scores for bx in range(b) for by in range(b)],
        "t int, block_x int, block_y int",
    )

    def _v(k):
        gi = (F.col("block_x") * 64 + k % 64).cast("long")
        gj = (F.col("block_y") * 64 + F.floor(k / 64)).cast("long")
        return ((13 * gi + 7 * gj + 23 * F.col("t")) % 89).cast("double")

    tiles_all = blocks.select(
        "t", "block_x", "block_y",
        F.transform(F.sequence(F.lit(0), F.lit(4095)), _v).alias("px"),
    )
    pm = proximity_map(
        tiles_all, max_dist=8, target_value=0.0, extra_keys=("t",),
        carry=("px",),
    )
    score_map = F.create_map(
        *[x for t, sc in scores.items() for x in (F.lit(t), F.lit(sc))]
    )
    layers = pm.withColumn("layer_score", F.element_at(score_map, F.col("t")))
    out = bap_composite(layers, d2_cap=64)
    return out.select("block_x", "block_y", F.size("px").alias("n"))


SYNTHETIC = {"flow_accumulation": _flow_scaled, "bap_cloudfree_composite": _bap_scaled}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING_EXPONENTS.json")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--sfs", nargs="*", type=float, default=SFS)
    args = ap.parse_args()

    spark = get_spark("geocube-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry.ensure_fixtures()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = registry.queries()
    names = args.queries or (HEAVY + list(SYNTHETIC))
    results: dict[str, dict] = {}
    load0 = os.getloadavg()[0] if hasattr(os, "getloadavg") else -1.0

    for name in names:
        per_sf: dict[str, float] = {}
        rows: dict[str, int] = {}
        for sf in args.sfs:
            if name in SYNTHETIC:
                runner = lambda: SYNTHETIC[name](spark, sf)  # noqa: E731
            else:
                sf_dir = f".bench/gen-sf{sf:g}"
                if not os.path.isdir(sf_dir):
                    raise SystemExit(
                        f"missing {sf_dir}; run tools/gen_scale_data.py {sf:g} {sf_dir}"
                    )
                runner = lambda d=sf_dir: qs[name](spark, d)  # noqa: E731
            best, n = math.inf, 0
            for _ in range(args.reps):
                t0 = time.time()
                n = len(runner().collect())
                best = min(best, time.time() - t0)
            per_sf[f"{sf:g}"] = round(best, 3)
            rows[f"{sf:g}"] = n
            print(f"# {name} sf={sf:g}: {best:.2f}s ({n} rows)", file=sys.stderr)
        ks = sorted(per_sf, key=float)
        expo = None
        if len(ks) >= 2:
            t_hi, t_lo = per_sf[ks[-1]], per_sf[ks[-2]]
            ratio = float(ks[-1]) / float(ks[-2])
            if t_lo > 0:
                expo = round(math.log(t_hi / t_lo) / math.log(ratio), 2)
        results[name] = {"sec": per_sf, "rows": rows, "exponent": expo}

    out = {
        "family": "tools/gen_scale_data.py seed=42",
        "sfs": [f"{s:g}" for s in args.sfs],
        "reps": args.reps,
        "estimator": "min-of-reps; exponent fitted on the two largest sfs",
        "load1_at_start": round(load0, 2),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["exponent"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
