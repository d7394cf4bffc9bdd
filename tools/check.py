#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views on
<sfDir>/*.parquet, and compares: row count, column names/types (after
sorting columns by name), and cell values (exact; floats compared exactly
since both sides round explicitly).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    import glob
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    # concat every part file: Verify coalesces to 1 today, but the checker
    # must not silently compare a subset if that ever changes
    tables = [pq.read_table(f) for f in files]
    import pyarrow as pa
    return pa.concat_tables(tables).to_pandas()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for _, row in df.iterrows():
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                cells.append(v.isoformat())
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    try:
        errors = json.load(open(f"{outdir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in errors:
            print(f"ERR  {name}: {errors[name][:200]}"); n_fail += 1; continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            problems.append(f"cols spark={sc} duck={dc}")
        else:
            sv, dv = norm(spark_df), norm(duck_df)
            if sv != dv:
                for i, (a, b) in enumerate(zip(sv, dv)):
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} duck={b}")
                        break
                else:
                    problems.append("row set diff (length mismatch)")
            # dtype check (warn-level detail folded into fail)
            sd = [str(spark_df[c].dtype) for c in sc]
            dd = [str(duck_df[c].dtype) for c in dc]
            if sd != dd:
                problems.append(f"dtypes spark={sd} duck={dd}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)); n_fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracle)}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
