#!/usr/bin/env python3
"""10x scale sweep for the d/t/v query families (round-5 verdict item 5).

No sf1 testdata ships, so this derives one from sf0.1: documents and
embeddings are replicated 10x with offset ids; document copies k>=1 get a
' rep<k>' text suffix (n_chars updated in lockstep), which turns every
document into a 10-member NEAR-dup cluster — a harder, more realistic
workload for the dedup family than byte-identical copies. Embedding
copies stay exact (tie-breaks are deterministic on both engines). The
remaining tables are copied unscaled so the oracle's views resolve.

Usage:
  python3 tools/scale_sweep.py build [dir=/dev/shm/graft-sf1x] [copies=10]
  sbt -batch 'runMain graft.Verify /dev/shm/graft-sf1x /tmp/sweep_out <d/t/v queries>'
  python3 tools/check.py /tmp/sweep_out /dev/shm/graft-sf1x

`build` prints the d/t/v query list for the Verify invocation.
copies=100 derives an sf10-equivalent corpus (round-9 sf10 spot-runs).

  python3 tools/scale_sweep.py buildgraph [dir=/dev/shm/graft-g10x] [copies=10]

`buildgraph` additionally replicates orders+lineitem with key-offset
copies (order/cust/supp keys strided per replica, so the g1 trade graph
genuinely grows: copies x nodes, copies x edges as disjoint components)
— the g1/q-family scale derivation. Kept separate from `build` so the
standing d/t/v sf1 records stay reproducible against unscaled
relational tables.
"""
import json
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
COPIES = 10


def build_graph(dst: Path, copies: int = COPIES):
    """Replicate orders+lineitem with key-offset copies (disjoint graph
    components) and copy everything else unscaled: the g1 derivation.
    """
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    o_stride = con.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    c_stride = con.sql(
        f"SELECT max(o_custkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    s_stride = con.sql(
        f"SELECT max(l_suppkey) + 1 FROM '{SRC}/lineitem.parquet'").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT * REPLACE (o_orderkey + {o_stride} * k AS o_orderkey,
                            o_custkey + {c_stride} * k AS o_custkey)
          FROM '{SRC}/orders.parquet', generate_series(0, {copies - 1}) AS g(k)
          ORDER BY o_orderkey
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (l_orderkey + {o_stride} * k AS l_orderkey,
                            l_suppkey + {s_stride} * k AS l_suppkey)
          FROM '{SRC}/lineitem.parquet', generate_series(0, {copies - 1}) AS g(k)
          ORDER BY l_orderkey
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in ["region", "nation", "customer", "supplier", "part", "events",
              "documents", "embeddings"]:
        shutil.copyfile(SRC / f"{t}.parquet", dst / f"{t}.parquet")
    for t in ["orders", "lineitem"]:
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


def build(dst: Path, copies: int = COPIES):
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # id stride computed from the data, not hardcoded: a larger source
    # with a fixed 10000 stride would silently collide replica ids,
    # corrupting dedup clusters and knn tie-breaks (round-5 advice)
    doc_stride = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    vec_stride = con.sql(
        f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + {doc_stride} * k AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE text || ' rep' || CAST(k AS VARCHAR) END AS text,
                 lang, source,
                 n_chars + CASE WHEN k = 0 THEN 0
                                ELSE len(' rep' || CAST(k AS VARCHAR)) END AS n_chars
          FROM '{SRC}/documents.parquet', generate_series(0, {copies - 1}) AS g(k)
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)
    """)
    # small row groups keep per-scan-partition row counts far below
    # Ivf.build's reservoir capacity, preserving the v7/v9 oracle's
    # sample==corpus precondition at 20k rows
    con.execute(f"""
        COPY (
          SELECT vec_id + {vec_stride} * k AS vec_id, embedding, label
          FROM '{SRC}/embeddings.parquet', generate_series(0, {copies - 1}) AS g(k)
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 1000)
    """)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copyfile(SRC / f"{t}.parquet", dst / f"{t}.parquet")
    for t in ["documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


def dtv_queries():
    # names from the last Verify dump if present, else the static list
    for p in [Path("/tmp/verify_full/oracle_sql.json")]:
        if p.exists():
            return sorted(n for n in json.loads(p.read_text())
                          if n[0] in "dtv")
    return [
        "d1_exact_dedup", "d2_jaccard_near_dup", "d3_minhash_lsh_near_dup",
        "d4_simhash_near_dup", "d5_contamination", "d6_incremental_dedup",
        "d7_dedup_clusters",
        "t1_token_stats", "t2_quality_score", "t3_lang_guess",
        "t4_fingerprint", "t5_shingle_stats", "t6_bpe_tokens",
        "t7_strip_html", "t8_rolling_fp", "t9_html_to_markdown",
        "t10_token_chunks", "t11_redact_pii", "t12_repetition_ratio",
        "t13_stratified_sample", "t14_corpus_stats", "t15_top_shingles",
        "t16_mixture_sample", "t17_fuzzy_name_pairs",
        "v1_knn_top10", "v2_knn_page2", "v3_knn_join",
        "v3c_knn_join_chunked", "v4_embedding_near_dup",
        "v5_label_centroids", "v6_l2_knn", "v7_ivf_knn",
        "v7s_ivf_subsample_knn",
        "v8_lsh_near_dup", "v9_ivf_knn_join", "v10_quantized_knn"]


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "buildgraph":
        d = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/dev/shm/graft-g10x")
        copies = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
        build_graph(d, copies)
    else:
        d = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/dev/shm/graft-sf1x")
        copies = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
        build(d, copies)
        qs = dtv_queries()
        print("\nd/t/v queries:\n" + " ".join(qs))
