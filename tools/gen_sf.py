#!/usr/bin/env python3
"""Deterministic (seed-42) synthetic-table generator for scale factors the
driver did not ship — schema- and distribution-faithful to
/root/testdata/sf0.1 (see TESTDATA.md). Used for the round-6 true-sf1
full-gate sweep: the correctness gate compares Spark vs DuckDB on the SAME
generated data, so gate validity needs schema + structural parity (planted
near-dup pairs, label-clustered embeddings, session-shaped events), not
bit-parity with the driver's own generator.

Usage: python3 tools/gen_sf.py <sf> <out_dir> [ts_unit]
  e.g. 1 /root/repo/data/sf1 us

ts_unit ('us' default, or 'ns') picks the parquet timestamp encoding for
events.ts — the driver's testdata has shipped as BOTH across generations
(TIMESTAMP(NANOS) through round 6, TIMESTAMP(MICROS) from round 7) and
Tables.readEvents branches on the footer, so either unit yields the same
timeline; default mirrors the driver's current files.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = Path(sys.argv[2])
OUT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(42)

N_CUST = int(150_000 * SF)
N_SUPP = int(10_000 * SF)
N_PART = int(200_000 * SF)
N_ORD = int(1_500_000 * SF)
N_EVT = int(1_000_000 * SF)
N_USERS = int(15_000 * SF)
N_DOC = int(50_000 * SF)
N_EMB = int(20_000 * SF)


def write(name, table):
    pq.write_table(table, OUT / f"{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


# region / nation — fixed small dims
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# customer / supplier
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                              "MACHINERY", "HOUSEHOLD"])[rng.integers(0, 5, N_CUST)]}))
write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

# part — name from small adjective/noun vocab, deterministic retail price
ADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "small", "green", "dim"]
NOUN = ["ring", "bolt", "plate", "gear", "rod", "pin", "cap", "disk"]
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJ[a]} {NOUN[n]}" for a, n in zip(
        rng.integers(0, len(ADJ), N_PART), rng.integers(0, len(NOUN), N_PART))],
    "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, N_PART)],
    "p_type": np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO",
                        "SMALL", "STANDARD"])[rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + (np.arange(N_PART) % 1000) * 0.1, 1)}))

# orders — uniform dates 1995-01-01 .. 2001-08-01 (day granularity)
day0 = np.datetime64("1995-01-01")
odays = rng.integers(0, 2405, N_ORD)
odate = day0 + odays.astype("timedelta64[D]")
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(odate.astype("datetime64[us]")),
    "o_orderpriority": np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                 "4-NOT SPECIFIED", "5-LOW"])[rng.integers(0, 5, N_ORD)]}))

# lineitem — 1..7 lines per order (avg ~4), shipdate = orderdate + 1..95d,
# rows shuffled like the driver's files
nlines = rng.integers(1, 8, N_ORD)
l_ord = np.repeat(np.arange(N_ORD), nlines)
l_num = np.concatenate([np.arange(1, n + 1) for n in nlines])
NL = len(l_ord)
ship = day0 + (np.repeat(odays, nlines)
               + rng.integers(1, 96, NL)).astype("timedelta64[D]")
perm = rng.permutation(NL)
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_ord[perm], pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL)[perm], pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL)[perm], pa.int64()),
    "l_linenumber": pa.array(l_num[perm], pa.int32()),
    "l_quantity": rng.integers(1, 51, NL)[perm].astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2)[perm],
    "l_discount": np.round(rng.integers(0, 11, NL) * 0.01, 2)[perm],
    "l_tax": np.round(rng.integers(0, 9, NL) * 0.01, 2)[perm],
    "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, NL)][perm],
    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, NL)][perm],
    "l_shipdate": pa.array(ship[perm].astype("datetime64[us]"))}))

# events — one January-2024 month, globally ts-ascending, exp(50) values.
# The instants are drawn at microsecond resolution either way; TS_UNIT
# only changes the parquet encoding (footer-branched by Tables.readEvents).
TS_UNIT = sys.argv[3] if len(sys.argv) > 3 else "us"
assert TS_UNIT in ("us", "ns"), TS_UNIT
span_us = 30 * 24 * 3600 * 1_000_000
off_us = np.sort(rng.integers(0, span_us, N_EVT))
if TS_UNIT == "ns":
    ts = (np.datetime64("2024-01-01T00:00:00.000000000")
          + (off_us * 1000).astype("timedelta64[ns]"))
else:
    ts = (np.datetime64("2024-01-01T00:00:00.000000", "us")
          + off_us.astype("timedelta64[us]"))
write("events", pa.table({
    "event_id": pa.array(range(N_EVT), pa.int64()),
    "ts": pa.array(ts),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EVT), pa.int64()),
    "event_type": np.array(["view", "click", "signup", "error",
                            "purchase"])[rng.integers(0, 5, N_EVT)],
    "value": np.round(np.maximum(rng.exponential(50, N_EVT), 0.01), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVT)]}))

# documents — word salad over the 31-word vocab, ~5% planted near-dup
# copies (1-2 word substitutions, some chains) + ~0.16% exact copies
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
texts = []
for i in range(N_DOC):
    n = rng.integers(10, 101)
    texts.append(" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)]))
n_near = N_DOC // 20
for _ in range(n_near):
    tgt = int(rng.integers(0, N_DOC))
    src = int(rng.integers(0, N_DOC))
    if src == tgt:
        continue
    w = texts[src].split(" ")
    for _ in range(int(rng.integers(1, 3))):
        w[int(rng.integers(0, len(w)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
    texts[tgt] = " ".join(w)
for _ in range(max(1, N_DOC // 600)):
    tgt, src = int(rng.integers(0, N_DOC)), int(rng.integers(0, N_DOC))
    if src != tgt:
        texts[tgt] = texts[src]
langs = np.array(["en", "fr", "es", "de", "zh"])[
    rng.choice(5, N_DOC, p=[0.42, 0.145, 0.145, 0.145, 0.145])]
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": langs,
    "source": [f"src{s}" for s in rng.integers(0, 20, N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# embeddings — 64-dim L2-normalized, 10 label clusters
DIM = 64
centers = rng.normal(0, 1, (10, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_EMB)
vecs = centers[labels] * 2.0 + rng.normal(0, 1, (N_EMB, DIM))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
vecs = vecs.astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array([v for v in vecs.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())}))
print("done", OUT)
