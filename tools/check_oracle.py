#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
  - <outDir> holds Verify.scala's output: <name>/ parquet dirs + oracle_sql.json
  - registers each testdata parquet as a DuckDB view named after the table
  - runs each oracle SQL, sorts columns by name, sorts rows, compares to
    the Spark parquet output (exact value + dtype compare).
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # A missing parquet (e.g. embeddings at some sf) only matters for
        # queries that reference it — those fail per-query below.
        # Accept both layouts: a single file (the driver's testdata) and a
        # Spark-written directory of part files (the degenerate fixtures).
        import os
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception as e:
            print(f"WARN: no view for {t}: {e}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                eq = (sv.values == dv.values) | (sv.isna().values & dv.isna().values)
            except Exception:
                eq = sv.astype(str).values == dv.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                bad.append(f"{c}[row{i}]: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
        # dtype drift report (informational — exact value match is the gate)
        dt = [f"{c}: {s[c].dtype}!={d[c].dtype}" for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)]
        if bad:
            print(f"FAIL {name}: {len(bad)} col mismatches: {bad[:3]}")
            n_fail += 1
        else:
            suffix = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name} ({len(s)} rows){suffix}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__); sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
