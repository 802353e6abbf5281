#!/usr/bin/env python
"""Seeded sf1 generator for the local scale soak (VERDICT r10 item 4).

Reproduces the driver generator's SCHEMA and measured distributions at
10× sf0.1 row counts (fixed seed — deterministic across runs).  Every
rule below was measured from /root/testdata/sf{0.01,0.1} (row-count
scaling, categorical frequencies, value ranges, unit-norm embeddings,
uniform 31-token document text, ~0.16% exact-dup injection, fixed
30-day event horizon with density growing in sf):

| table     | sf0.1   | sf1 (10×)  |
| lineitem  | 600,000 | 6,000,000  |
| orders    | 150,000 | 1,500,000  |
| customer  | 15,000  | 150,000    |
| part      | 20,000  | 200,000    |
| supplier  | 1,000   | 10,000     |
| events    | 100,000 | 1,000,000  |  (users = customers/10)
| documents | 5,000   | 50,000     |
| embeddings| 2,000   | 20,000     |
| nation/region fixed 25/5        |

Output: /root/repo/localdata/sf1/*.parquet (gitignored).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1")

N_CUST = 150_000
N_ORD = 1_500_000
N_LI = 6_000_000
N_PART = 200_000
N_SUPP = 10_000
N_EVENTS = 1_000_000
N_DOCS = 50_000
N_EMB = 20_000
N_USERS = N_CUST // 10
DUP_GROUPS = 80  # 0.16% of docs duplicated (8 groups @ sf0.1)

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def write(name: str, table: pa.Table):
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(name, table.num_rows)


def main():
    rng = np.random.default_rng(SEED)

    # region / nation — fixed dimensions
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write("supplier", pa.table({
        "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
    }))

    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    write("customer", pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
        "c_mktsegment": segs[rng.integers(0, 5, N_CUST)],
    }))

    adjs = ["large", "hot", "blue", "red", "small", "green", "cold", "dim"]
    nouns = ["ring", "bolt", "case", "drum", "plate", "wheel", "cap", "rod"]
    names = np.array([f"{a} {n}" for a in adjs for n in nouns])
    types = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
    keys = np.arange(N_PART)
    write("part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": names[rng.integers(0, len(names), N_PART)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)],
        "p_type": types[rng.integers(0, 6, N_PART)],
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": np.round(900.0 + (keys % 1000) * 0.1, 2),
    }))

    day_us = 86_400_000_000
    o_start = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    o_days = (np.datetime64("2001-08-01", "us").astype(np.int64) - o_start) // day_us
    odate = o_start + rng.integers(0, o_days + 1, N_ORD) * day_us
    stat = np.array(["O", "P", "F"])
    pri = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    write("orders", pa.table({
        "o_orderkey": pa.array(range(N_ORD), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
        "o_orderstatus": stat[rng.integers(0, 3, N_ORD)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pri[rng.integers(0, 5, N_ORD)],
    }))

    lok = rng.integers(0, N_ORD, N_LI)
    rf = np.array(["A", "N", "R"])
    ls = np.array(["F", "O"])
    ship = odate[lok] + rng.integers(1, 96, N_LI) * day_us
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
        "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
        "l_discount": rng.integers(0, 11, N_LI) / 100.0,
        "l_tax": rng.integers(0, 9, N_LI) / 100.0,
        "l_returnflag": rf[rng.integers(0, 3, N_LI)],
        "l_linestatus": ls[rng.integers(0, 2, N_LI)],
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    e_start = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    e_span = 30 * day_us
    ets = np.sort(e_start + rng.integers(0, e_span, N_EVENTS))
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    write("events", pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": etypes[rng.integers(0, 5, N_EVENTS)],
        "value": np.round(rng.exponential(50.0, N_EVENTS), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
    }))

    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, N_DOCS)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words
    ]
    # exact-dup injection: DUP_GROUPS pairs (copy i's text onto j)
    srcs = rng.choice(N_DOCS, 2 * DUP_GROUPS, replace=False)
    for i, j in zip(srcs[:DUP_GROUPS], srcs[DUP_GROUPS:]):
        texts[j] = texts[i]
    write("documents", pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, N_DOCS, p=lang_p)],
        "source": [f"src{i % 20}" for i in range(N_DOCS)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((N_EMB, 64))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array(list(emb.astype(np.float32))),
        "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
    }))


if __name__ == "__main__":
    main()
