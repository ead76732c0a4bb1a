#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>/<name>/, runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables =
parquet files in <sfDir>), then compares: column-name sets, row counts,
and cell values (columns sorted by name, rows sorted by all columns).
Exact equality for non-floats; exact bit equality for floats too (the
engine is designed so compared doubles are deterministic) with a
reported max-abs-diff fallback so drift is visible.
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    try:
        return a == b
    except Exception:
        return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_weak = 0
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"weak  {name}: no oracle, rows={len(got)} {status}")
            n_weak += 1
            if len(got) == 0:
                n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns differ spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        bad = []
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL  {name}: value mismatches (first {len(bad)}): {bad}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(got)}")
            n_pass += 1
    print(f"== pass={n_pass} weak={n_weak} fail={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
