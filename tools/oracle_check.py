#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, and
compares: schema (column names), row count, and a canonical value hash
(columns sorted by name, rows sorted, values stringified). Exit 1 on any
mismatch; prints a per-query diff summary for debugging.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = []
    for name in sorted(oracle):
        d = f"{out_dir}/{name}"
        if not glob.glob(f"{d}/*.parquet"):
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: no spark output"); continue
        got = pq.read_table(d).to_pandas()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}"); continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append((name, f"schema {sorted(got.columns)} vs {sorted(exp.columns)}"))
            print(f"FAIL {name}: schema {sorted(got.columns)} vs {sorted(exp.columns)}"); continue
        # dtype drift is a warning: the driver may or may not compare types
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"WARN {name}: dtype of '{c}' spark={got[c].dtype} duck={exp[c].dtype}")
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} vs {len(exp)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
        cg, ce = canon(got), canon(exp)
        if not cg.equals(ce):
            neq = (cg != ce)
            bad_cols = [c for c in cg.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            failures.append((name, f"values differ in {bad_cols}"))
            print(f"FAIL {name}: values differ in cols {bad_cols}; first row {i}:")
            print("  spark:", cg.iloc[i].to_dict())
            print("  duck :", ce.iloc[i].to_dict())
            continue
        print(f"PASS {name} ({len(got)} rows)")
    skipped = [d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
    for name in sorted(skipped):
        n = pq.read_table(os.path.join(out_dir, name)).num_rows
        print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{len(oracle)-len(failures)}/{len(oracle)} oracle-checked pass, "
          f"{len(skipped)} rows-only")
    sys.exit(1 if failures else 0)

main()
