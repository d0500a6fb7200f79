#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mimics the driver's t2 gate).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json entry in DuckDB over the same parquet tables,
compares against the Spark parquet dump written by graft.Verify:
columns sorted by name, rows sorted by all columns, exact value compare
(floats compared bit-ish with repr round-trip; report first diffs).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}"); n_bad += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_files])
        except Exception as e:
            print(f"READFAIL {name}: {e}"); n_bad += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLEFAIL {name}: {e}"); n_bad += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA {name}: spark={list(g.columns)} duck={list(e.columns)}")
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"ROWS {name}: spark={len(g)} duck={len(e)}"); n_bad += 1; continue
        diffs = []
        for c in g.columns:
            a, b = g[c].reset_index(drop=True), e[c].reset_index(drop=True)
            try:
                a2 = a.astype(str); b2 = b.astype(str)
            except Exception:
                a2, b2 = a, b
            neq = (a2 != b2)
            if neq.any():
                i = neq.idxmax()
                diffs.append((c, a.iloc[i], b.iloc[i], int(neq.sum())))
        if diffs:
            print(f"VALUES {name}: " + "; ".join(
                f"{c}: spark={x!r} duck={y!r} ({n} diffs)" for c, x, y, n in diffs))
            n_bad += 1
        else:
            print(f"OK {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
