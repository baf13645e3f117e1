#!/usr/bin/env python3
"""Deterministic synthetic-fixture generator for scale testing.

Reproduces the TESTDATA.md table shapes (schemas, physical parquet
types, FK ranges, vocabularies, value distributions profiled from the
driver-generated sf0.1 fixtures) at an arbitrary scale factor, so the
104-query catalog + oracle + bench can be exercised at sf1/sf5 without
touching the read-only /root/testdata.

Usage: python3 tools/datagen.py <sf> <outdir>     e.g. 1 /tmp/graft-sf1

Row counts scale like the driver's: lineitem 6M*sf, orders 1.5M*sf,
customer 150k*sf, part 200k*sf, supplier 10k*sf, events 1M*sf,
documents 50k*sf, embeddings 20k*sf (docs/emb floor at 500 like the
small fixtures). Seed 42, pure numpy -> pyarrow; events.ts is written
as timestamp[ns] (the nanosAsLong read path), order/ship dates as
timestamp[ms], embeddings as list<float32> — matching the originals.
"""
import sys
import json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPE = ["MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD", "ECONOMY"]
SEG = ["FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPE = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "zh", "es", "fr", "de"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

EPOCH_1995 = np.datetime64("1995-01-01")
EVENTS_START_NS = np.datetime64("2024-01-01", "ns").astype("int64")
EVENTS_SPAN_NS = 30 * 86400 * 10 ** 9  # 30 days


def write(outdir, name, table):
    pq.write_table(table, f"{outdir}/{name}.parquet", compression="snappy")
    print(f"[datagen] {name}: {table.num_rows} rows")


def main(sf, outdir):
    rng = np.random.RandomState(SEED)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_evt = int(1_000_000 * sf)
    # documents scale sub-linearly, mirroring the driver's own fixtures
    # (500 docs at BOTH sf0.001 and sf0.01): the block-quadratic DuckDB
    # oracles (n-gram jaccard, simhash chunk-join) are O(docs²/blocks)
    # on the ORACLE side and become the bottleneck long before the
    # engine does — graft.Verify itself runs 50k docs in seconds.
    n_doc = max(500, min(int(50_000 * sf), 15_000))
    n_emb = max(500, int(20_000 * sf))

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int64) % 5, type=pa.int32())}))

    write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.randint(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEG[i] for i in rng.randint(0, 5, n_cust)]}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.randint(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(0, 10000, n_supp), 2)}))

    names = [f"{a} {n}" for a in ADJ for n in NOUN]
    write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.array(names)[rng.randint(0, 64, n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(25)])[rng.randint(0, 25, n_part)],
        "p_type": np.array(PTYPE)[rng.randint(0, 6, n_part)],
        "p_size": rng.randint(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0}))

    odate = (EPOCH_1995 + rng.randint(0, 2405, n_ord).astype("timedelta64[D]"))
    write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[ms]")),
        "o_orderpriority": np.array(PRIO)[rng.randint(0, 5, n_ord)]}))

    sdate = (EPOCH_1995 + rng.randint(1, 2500, n_li).astype("timedelta64[D]"))
    write(outdir, "lineitem", pa.table({
        "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.randint(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.randint(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.randint(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        # vectorized vocab indexing: list comprehensions at sf25's 150M
        # rows cost minutes and gigabytes each; numpy fancy-indexing is
        # draw-order-identical (same rng calls, same values)
        "l_returnflag": np.array(["A", "N", "R"])[rng.randint(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.randint(0, 2, n_li)],
        "l_shipdate": pa.array(sdate.astype("datetime64[ms]"))}))

    n_users = max(15, int(round(n_evt * 0.015)))
    ts = np.sort(EVENTS_START_NS + (rng.uniform(0, 1, n_evt) * EVENTS_SPAN_NS)
                 .astype("int64"))
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": rng.randint(0, n_users, n_evt).astype(np.int64),
        "event_type": np.array(ETYPE)[rng.randint(0, 5, n_evt)],
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": np.array([json.dumps({"k": k}) for k in range(100)])[
            rng.randint(0, 100, n_evt)]}))

    # documents: word salad over the 31-word vocab; 40% en / 15% each other
    lens = rng.randint(10, 101, n_doc)
    widx = rng.randint(0, len(VOCAB), int(lens.sum()))
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[j] for j in widx[off:off + ln]))
        off += ln
    lang_p = rng.uniform(0, 1, n_doc)
    langs = np.where(lang_p < 0.4, "en",
                     np.array(LANGS)[1 + (lang_p * 1e6).astype(np.int64) % 4])
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    # embeddings: 10 unit-norm cluster centers + gaussian noise, renormalized
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32)}))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    import os
    os.makedirs(outdir, exist_ok=True)
    main(sf, outdir)
