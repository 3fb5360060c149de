#!/usr/bin/env python3
"""Local DuckDB-oracle checker, mirroring the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

For each query in oracle_sql.json: run the SQL in DuckDB with views over
the sf_dir parquet tables, read the Spark parquet result, sort columns by
name, and compare values exactly (with a tiny float tolerance fallback
reported separately).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "tolist"):  # numpy arrays
        return tuple(v.tolist())
    if isinstance(v, list):
        return tuple(v)
    return v


def compare(spark_df, oracle_df):
    cols_s = sorted(spark_df.columns)
    cols_o = sorted(oracle_df.columns)
    if cols_s != cols_o:
        return f"SCHEMA MISMATCH spark={cols_s} oracle={cols_o}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}"
    # dtype drift is not a failure here (values are compared exactly),
    # but a stricter driver-side compare could flag it -> surface it
    for c in cols_s:
        ds, do = str(spark_df[c].dtype), str(oracle_df[c].dtype)
        if ds != do:
            print(f"  [dtype warning] {c}: spark={ds} oracle={do}")
    s = spark_df[cols_s]
    o = oracle_df[cols_o]
    exact = True
    close = True
    for c in cols_s:
        for a, b in zip(s[c], o[c]):
            a, b = norm_cell(a), norm_cell(b)
            if a is None and b is None:
                continue
            if (a is None) != (b is None):
                exact = close = False
                break
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    exact = False
                    if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                        close = False
                        break
            elif a != b:
                exact = close = False
                break
        if not close:
            # show first diff
            for i, (a, b) in enumerate(zip(s[c], o[c])):
                if norm_cell(a) != norm_cell(b):
                    return (f"VALUE MISMATCH col={c} row={i} "
                            f"spark={a!r} oracle={b!r}")
    if exact:
        return "OK"
    if close:
        return "CLOSE (float, within 1e-9 — may still fail a hash compare)"
    return "MISMATCH"


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    sqls = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for name, sql in sorted(sqls.items()):
        if only and name not in only:
            continue
        pdir = out_dir / name
        if not pdir.exists():
            print(f"{name}: NO SPARK OUTPUT")
            failed.append(name)
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(pdir.glob("*.parquet"))],
            ignore_index=True) if list(pdir.glob("*.parquet")) else pd.DataFrame()
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failed.append(name)
            continue
        r = compare(spark_df, oracle_df)
        print(f"{name}: {r}")
        if r != "OK":
            failed.append(name)
    print(f"\n{len(sqls) - len(failed)}/{len(sqls)} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
