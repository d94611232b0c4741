#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, and compares: column names (sorted), dtypes, and
exact values after sorting columns by name.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def fresh_con(sf_dir):
    # one connection PER QUERY: a runaway oracle (brute-force recall at a
    # big scale factor) that OOMs DuckDB otherwise poisons the shared
    # connection and fails every later query on phantom tiny allocations
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # spark-written table dir (e.g. the sf1 gate data)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main(sf_dir, out_dir, only=None, skip=None):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if skip and name in skip:
            print(f"SKIP {name} (per --skip)"); continue
        con = fresh_con(sf_dir)
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                if str(a.dtype) != str(b.dtype):
                    mismatch += f" (dtype {a.dtype} vs {b.dtype})"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            dt = ""
            dta = [str(t) for t in spark_df.dtypes]; dtb = [str(t) for t in duck_df.dtypes]
            if dta != dtb:
                dt = f"  [dtype warn: {list(zip(spark_df.columns, dta, dtb))}]"
            print(f"PASS {name} ({len(spark_df)} rows){dt}"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = skip = None
    args = sys.argv[1:]
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "--only": only = set(args[i+1].split(",")); i += 2
        elif args[i] == "--skip": skip = set(args[i+1].split(",")); i += 2
        else: rest.append(args[i]); i += 1
    sys.exit(main(rest[0], rest[1], only, skip))
