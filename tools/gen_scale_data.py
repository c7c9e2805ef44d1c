"""Deterministic synthetic-data generator for the SCALING-EXPONENT runs.

Reproduces the driver testdata's SCHEMAS and distribution shape (table
ratios, key ranges, category mixes, duplicate structure — surveyed from
/root/testdata/sf0.1) at ARBITRARY scale factor, so the heavy queries can
be timed at sf0.01 / 0.1 / 1 on one self-consistent data family and the
empirical scaling exponent fitted per query.  The driver's own generator
is unknown (seed-42 black box) — exponents are therefore measured WITHIN
this family only, never mixed with driver dirs.

Usage:
    python tools/gen_scale_data.py 1.0 [outdir]     # default .bench/gen-sf1

Numbers per sf=1: lineitem ~6.1M rows, orders 1.5M, customer 150k,
supplier 10k, part 200k, events 1M, documents 50k, embeddings 20k.
Writes plain parquet (one file per table — Spark re-splits by
maxPartitionBytes, matching how the driver dirs read).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# the driver documents' 31-word salad vocabulary (surveyed)
VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window join read write plan scale "
    "shuffle merge cache skew limit"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = max(10, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(10, int(200_000 * sf))
    n_ord = max(20, int(1_500_000 * sf))
    n_evt = max(20, int(1_000_000 * sf))
    n_doc = max(20, int(50_000 * sf))
    n_emb = max(20, int(20_000 * sf))
    n_user = max(10, int(15_000 * sf))

    # ---- dims
    _write(outdir, "region", pa.table({
        "r_regionkey": np.arange(5, dtype=np.int64),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": np.arange(25, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": np.arange(25, dtype=np.int64) % 5,
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"],
            n_cust),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    adjectives = ["large", "hot", "small", "cold", "round", "flat"]
    nouns = ["ring", "bolt", "screw", "plate", "washer", "rod"]
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{adjectives[i % 6]} {nouns[(i // 6) % 6]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
        "p_type": rng.choice(["LARGE", "ECONOMY", "STANDARD", "SMALL",
                              "MEDIUM", "PROMO"], n_part),
        "p_size": rng.integers(1, 51, n_part),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10, 2),
    }))

    # ---- orders: dates over 1995-01-01..2001-08-01 (driver range)
    day0 = np.datetime64("1995-01-01")
    odate = day0 + rng.integers(0, 2405, n_ord).astype("timedelta64[D]")
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord),
    }))

    # ---- lineitem: 1..7 lines/order (mean ~4, driver: 4.08)
    lines_per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = lkey.size
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per]) \
        if n_ord < 2_000_000 else None
    if lnum is None:  # vectorized variant for big runs
        offs = np.concatenate(([0], np.cumsum(lines_per)[:-1]))
        lnum = np.arange(n_li) - np.repeat(offs, lines_per) + 1
    ship = np.repeat(odate, lines_per) + rng.integers(
        1, 122, n_li).astype("timedelta64[D]")
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lnum.astype(np.int64),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": ship.astype("datetime64[us]"),
    }))

    # ---- events: 30 days, density scales with sf (driver shape)
    e0 = np.datetime64("2024-01-01T00:00:00.000000")
    ets = e0 + np.sort(rng.integers(0, 30 * 86400 * 10**6, n_evt)).astype(
        "timedelta64[us]")
    _write(outdir, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ets,
        "user_id": rng.integers(0, n_user, n_evt),
        "event_type": rng.choice(EVENT_TYPES, n_evt),
        "value": np.round(rng.uniform(0, 200, n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))

    # ---- documents: 31-word salads, ~60 words, planted exact + near dups
    n_words = rng.integers(8, 113, n_doc)  # chars 44..577, mean ~297
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)])
             for k in n_words]
    # ~0.2% exact duplicates + ~1% near-duplicates (mutate 10% of words),
    # mirroring the driver corpus's dedup-query-visible structure
    n_exact = max(1, n_doc // 600)
    n_near = max(2, n_doc // 100)
    for i in rng.choice(n_doc, n_exact, replace=False):
        texts[i] = texts[(i * 7 + 1) % n_doc]
    for i in rng.choice(n_doc, n_near, replace=False):
        src = texts[(i * 13 + 3) % n_doc].split()
        for j in rng.choice(len(src), max(1, len(src) // 10), replace=False):
            src[j] = vocab[rng.integers(0, len(vocab))]
        texts[i] = " ".join(src)
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # ---- embeddings: 10 gaussian clusters on the unit sphere, dim 64
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f".bench/gen-sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    gen(sf, out)
