#!/usr/bin/env python3
"""Chunked large-SF fixture generator (the sf100 ladder rung).

Same table shapes, schemas, physical parquet types, FK ranges,
vocabularies and value distributions as tools/datagen.py, with two
changes that matter only at sf >= 100:

  - PER-TABLE seeded RandomState (SEED ^ crc of the table name), so a
    subset of tables can be generated without shifting any other
    table's draws — at sf100 only the tables the fixed-work twins and
    the top steady-state entries read are needed, and generating
    600M-row lineitem just to reach embeddings would waste an hour.
  - CHUNKED row-group writes through pq.ParquetWriter for the big
    fact tables: datagen.py materializes every column of a table in
    RAM at once, which at sf100's 600M-row lineitem is ~90 GB with
    the arrow copy — beyond this box. Chunks of 50M rows cap peak
    memory at ~8 GB regardless of sf. Values are chunk-local draws
    from the table's own rng stream, so the DISTRIBUTIONS are
    identical to datagen.py's even though the draw sequence differs
    (each sf is its own dataset; nothing compares values across
    generators).

Usage: python3 tools/datagen_big.py <sf> <outdir> [table,table,...]
       default tables: region nation customer orders lineitem
                       documents embeddings
"""
import sys
import zlib
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CHUNK = 50_000_000

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
SEG = ["FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
LANGS = ["en", "zh", "es", "fr", "de"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EPOCH_1995 = np.datetime64("1995-01-01")


def rng_for(table):
    return np.random.RandomState(SEED ^ zlib.crc32(table.encode()))


def log(name, rows):
    print(f"[datagen_big] {name}: {rows} rows", flush=True)


def chunked(outdir, name, total, make_chunk):
    """Stream `total` rows in CHUNK-sized row groups via ParquetWriter."""
    writer = None
    done = 0
    while done < total:
        n = min(CHUNK, total - done)
        t = make_chunk(done, n)
        if writer is None:
            writer = pq.ParquetWriter(f"{outdir}/{name}.parquet", t.schema,
                                      compression="snappy")
        writer.write_table(t)
        done += n
        print(f"[datagen_big] {name}: {done}/{total}", flush=True)
    if writer is not None:
        writer.close()
    log(name, total)


def gen_region(outdir, sf):
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS}), f"{outdir}/region.parquet",
        compression="snappy")
    log("region", 5)


def gen_nation(outdir, sf):
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int64) % 5,
                                type=pa.int32())}),
        f"{outdir}/nation.parquet", compression="snappy")
    log("nation", 25)


def gen_customer(outdir, sf):
    rng = rng_for("customer")
    n = int(150_000 * sf)

    def mk(start, cnt):
        keys = np.arange(start, start + cnt, dtype=np.int64)
        return pa.table({
            "c_custkey": keys,
            "c_name": [f"Customer#{i:09d}" for i in keys],
            "c_nationkey": rng.randint(0, 25, cnt).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, cnt), 2),
            "c_mktsegment": np.array(SEG)[rng.randint(0, 5, cnt)]})
    chunked(outdir, "customer", n, mk)


def gen_orders(outdir, sf):
    rng = rng_for("orders")
    n = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)

    def mk(start, cnt):
        odate = (EPOCH_1995 +
                 rng.randint(0, 2405, cnt).astype("timedelta64[D]"))
        return pa.table({
            "o_orderkey": np.arange(start, start + cnt, dtype=np.int64),
            "o_custkey": rng.randint(0, n_cust, cnt).astype(np.int64),
            "o_orderstatus": np.array(["O", "P", "F"])[rng.randint(0, 3, cnt)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, cnt), 2),
            "o_orderdate": pa.array(odate.astype("datetime64[ms]")),
            "o_orderpriority": np.array(PRIO)[rng.randint(0, 5, cnt)]})
    chunked(outdir, "orders", n, mk)


def gen_lineitem(outdir, sf):
    rng = rng_for("lineitem")
    n = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)

    def mk(start, cnt):
        sdate = (EPOCH_1995 +
                 rng.randint(1, 2500, cnt).astype("timedelta64[D]"))
        return pa.table({
            "l_orderkey": rng.randint(0, n_ord, cnt).astype(np.int64),
            "l_partkey": rng.randint(0, n_part, cnt).astype(np.int64),
            "l_suppkey": rng.randint(0, n_supp, cnt).astype(np.int64),
            "l_linenumber": rng.randint(1, 8, cnt).astype(np.int32),
            "l_quantity": rng.randint(1, 51, cnt).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, cnt), 2),
            "l_discount": np.round(rng.randint(0, 11, cnt) / 100.0, 2),
            "l_tax": np.round(rng.randint(0, 9, cnt) / 100.0, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.randint(0, 3, cnt)],
            "l_linestatus": np.array(["O", "F"])[rng.randint(0, 2, cnt)],
            "l_shipdate": pa.array(sdate.astype("datetime64[ms]"))})
    chunked(outdir, "lineitem", n, mk)


def gen_documents(outdir, sf):
    rng = rng_for("documents")
    # same sub-linear cap as datagen.py (oracle-side block-quadratic)
    n = max(500, min(int(50_000 * sf), 15_000))
    lens = rng.randint(10, 101, n)
    widx = rng.randint(0, len(VOCAB), int(lens.sum()))
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[j] for j in widx[off:off + ln]))
        off += ln
    lang_p = rng.uniform(0, 1, n)
    langs = np.where(lang_p < 0.4, "en",
                     np.array(LANGS)[1 + (lang_p * 1e6).astype(np.int64) % 4])
    pq.write_table(pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.randint(0, 20, n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}),
        f"{outdir}/documents.parquet", compression="snappy")
    log("documents", n)


def gen_embeddings(outdir, sf):
    rng = rng_for("embeddings")
    n = max(500, int(20_000 * sf))
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def mk(start, cnt):
        labels = rng.randint(0, 10, cnt)
        vecs = centers[labels] + rng.normal(0, 0.35, (cnt, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        return pa.table({
            "vec_id": np.arange(start, start + cnt, dtype=np.int64),
            "embedding": pa.array(list(vecs.astype(np.float32)),
                                  type=pa.list_(pa.float32())),
            "label": labels.astype(np.int32)})
    # 64 f64 dims in flight: keep chunks to 2M rows (~1 GB each)
    writer = None
    done = 0
    while done < n:
        cnt = min(2_000_000, n - done)
        t = mk(done, cnt)
        if writer is None:
            writer = pq.ParquetWriter(f"{outdir}/embeddings.parquet",
                                      t.schema, compression="snappy")
        writer.write_table(t)
        done += cnt
    writer.close()
    log("embeddings", n)


GENERATORS = {
    "region": gen_region, "nation": gen_nation, "customer": gen_customer,
    "orders": gen_orders, "lineitem": gen_lineitem,
    "documents": gen_documents, "embeddings": gen_embeddings,
}

if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    tables = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ["region", "nation", "customer", "orders", "lineitem",
                    "documents", "embeddings"])
    import os
    os.makedirs(outdir, exist_ok=True)
    for t in tables:
        GENERATORS[t](outdir, sf)
