#!/usr/bin/env python3
"""Dev-only scale-step testdata generator.

Mirrors the driver's synthetic tables (TESTDATA.md) at a larger scale
factor so the engine's plans can be validated at 10x before trusting
them at 100 TB. Calibrates distributions (token frequencies, doc
lengths, vocab sets) from the driver's own sf0.1 parquet, then writes
schema-identical tables with 10x (or any --mult) row counts.

Every numeric column that the query surface compares exactly is kept
on its exact lattice (cents as ints/100, whole-degree-free doubles,
microsecond timestamps), matching ORACLE_NOTES.md's cross-engine
rules. Seeded; byte-deterministic across runs.

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import json
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src, out, mult = sys.argv[1], sys.argv[2], float(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260814)
    q = duckdb.connect()

    def n_of(table):
        return q.sql(f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]

    def write(name, table):
        pq.write_table(table, f"{out}/{name}.parquet")
        print(name, table.num_rows)

    # ---- region / nation: fixed dimension tables, copied verbatim ----
    for t in ("region", "nation"):
        q.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")

    # ---- customer ----
    nC = int(n_of("customer") * mult)
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(nC), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nC)],
        "c_nationkey": pa.array(rng.integers(0, 25, nC), pa.int32()),
        "c_acctbal": pa.array(rng.integers(-99999, 1000000, nC) / 100.0),
        "c_mktsegment": pa.array(
            np.array(["MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD",
                      "FURNITURE"])[rng.integers(0, 5, nC)]),
    }))

    # ---- supplier ----
    nS = int(n_of("supplier") * mult)
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(nS), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(nS)],
        "s_nationkey": pa.array(rng.integers(0, 25, nS), pa.int32()),
        "s_acctbal": pa.array(rng.integers(-99999, 1000000, nS) / 100.0),
    }))

    # ---- part ----
    nP = int(n_of("part") * mult)
    adjs = ["large", "hot", "blue", "small", "red", "green", "cold",
            "shiny", "dark", "light"]
    nouns = ["ring", "bolt", "screw", "plate", "gear", "wheel", "pin",
             "rod", "cap", "nut"]
    types = q.sql(f"SELECT DISTINCT p_type FROM '{src}/part.parquet' ORDER BY 1").df()["p_type"].tolist()
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(nP), pa.int64()),
        "p_name": [f"{adjs[i % 10]} {nouns[(i // 10) % 10]}" for i in range(nP)],
        "p_brand": [f"Brand#{1 + (i * 7) % 25}" for i in range(nP)],
        "p_type": pa.array(np.array(types)[rng.integers(0, len(types), nP)]),
        "p_size": pa.array(rng.integers(1, 51, nP), pa.int32()),
        "p_retailprice": pa.array((9000 + np.arange(nP) % 1000) / 10.0),
    }))

    # ---- orders ----
    nO = int(n_of("orders") * mult)
    day_us = 86400 * 10 ** 6
    base95 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    odates = base95 + rng.integers(0, 2404, nO) * day_us
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(nO), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nC, nO), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, nO)]),
        "o_totalprice": pa.array(rng.integers(100000, 50000000, nO) / 100.0),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, nO)]),
    }))

    # ---- lineitem: 1..7 lines per order ----
    lines_per = rng.integers(1, 8, nO)
    l_orderkey = np.repeat(np.arange(nO), lines_per)
    nL = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    write("lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, nP, nL), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, nS, nL), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, nL).astype(np.float64)),
        "l_extendedprice": pa.array(rng.integers(100000, 10000000, nL) / 100.0),
        "l_discount": pa.array(rng.integers(0, 11, nL) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, nL) / 100.0),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nL)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nL)]),
        "l_shipdate": pa.array(
            np.repeat(odates, lines_per) + rng.integers(1, 96, nL) * day_us,
            pa.timestamp("us")),
    }))

    # ---- events: ~66 per user over 30 days, cent-lattice values ----
    nE = int(n_of("events") * mult)
    nU = int(q.sql(f"SELECT count(DISTINCT user_id) FROM '{src}/events.parquet'").fetchone()[0] * mult)
    base24 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(base24 + rng.integers(0, 30 * day_us, nE))
    # exponential-ish value mix on the cent lattice (mean ~ $50)
    cents = np.minimum((rng.exponential(50.0, nE) * 100).astype(np.int64), 56021)
    write("events", pa.table({
        "event_id": pa.array(np.arange(nE), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, nU, nE), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "error", "purchase", "signup",
                      "view"])[rng.integers(0, 5, nE)]),
        "value": pa.array(cents / 100.0),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, nE)],
    }))

    # ---- documents: driver-vocab unigram sampling + planted dups ----
    vocab = q.sql(f"""
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM '{src}/documents.parquet') GROUP BY 1 ORDER BY c DESC
        """).df()
    toks = vocab["tok"].to_numpy()
    pweights = (vocab["c"] / vocab["c"].sum()).to_numpy()
    lens = q.sql(f"SELECT len(string_split(text,' ')) AS l FROM '{src}/documents.parquet'").df()["l"].to_numpy()
    langs = q.sql(f"SELECT lang, count(*) c FROM '{src}/documents.parquet' GROUP BY 1 ORDER BY 1").df()
    lnames = langs["lang"].to_numpy()
    lw = (langs["c"] / langs["c"].sum()).to_numpy()
    nD = int(n_of("documents") * mult)
    texts = []
    for i in range(nD):
        r = rng.random()
        if i > 10 and r < 0.002:          # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.015:        # near duplicate: ~10% token noise
            base = texts[rng.integers(0, i)].split(" ")
            for j in range(len(base)):
                if rng.random() < 0.1:
                    base[j] = str(rng.choice(toks, p=pweights))
            texts.append(" ".join(base))
        else:
            L = int(rng.choice(lens))
            texts.append(" ".join(rng.choice(toks, size=L, p=pweights)))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(nD), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(lnames)[rng.choice(len(lnames), nD, p=lw)]),
        "source": [f"src{i % 20}" for i in rng.integers(0, 10 ** 9, nD)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # ---- embeddings: unit-norm float32 random vectors, 10 labels ----
    nV = int(n_of("embeddings") * mult)
    dim = q.sql(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
    vecs = rng.standard_normal((nV, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(nV), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nV), pa.int32()),
    }))


if __name__ == "__main__":
    main()
