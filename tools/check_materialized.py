#!/usr/bin/env python3
"""check.py variant for the LSH-chain oracles at large SF.

Usage: python3 tools/check_materialized.py <sfDir> <outDir> [threads]

Identical comparison protocol to tools/check.py, with ONE
evaluation-only rewrite: every non-recursive CTE in the oracle SQL is
marked `AS MATERIALIZED`. Under DuckDB's default CTE inlining the
minhash chain (`t`/`h`/`bands`) is re-evaluated once per consumer,
which is intractable at sf1 (>35 min, 52 GB RSS); materialization
restores single evaluation — the same idea as the engine's
localCheckpoint of shared subtrees. The rewrite changes evaluation
strategy only, never results, so the gate it implements is the same
gate check.py implements.
"""
import json, re, sys
import duckdb

sys.path.insert(0, __import__("os").path.dirname(__file__))
from check import TABLES, load_spark, norm


# Only the MULTI-CONSUMER prefix CTEs: `t`/`h`/`bands` are each read
# 2-4 times under default inlining (the intractability), and `dup`
# feeds both directions of the closure's edge list. The single-consumer
# tail (`cand`/`sized`/`j`) must stay INLINED so the 10M+-pair rescore
# STREAMS — materializing `sized` stores two ~600-element lists per
# pair (~150 GB at sf1; the first attempt OOM-killed at 67 GB RSS).
MATERIALIZE = {"t", "h", "bands", "dup"}


def materialize_ctes(sql):
    return re.sub(r"\b(\w+) AS \(SELECT",
                  lambda m: f"{m.group(1)} AS MATERIALIZED (SELECT"
                  if m.group(1) in MATERIALIZE else m.group(0), sql)


def main(sfdir, outdir, threads=8):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    # spill instead of OOM: the box has 125 GB shared with the engine
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob, os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                   if os.path.isdir(p))
    for name in names:
        sql = materialize_ctes(oracle[name])
        spark_df = load_spark(outdir, name)
        import time
        t0 = time.monotonic()
        duck_df = con.execute(sql).fetchdf()
        dt = time.monotonic() - t0
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            problems.append(f"cols spark={sc} duck={dc}")
        elif norm(spark_df) != norm(duck_df):
            problems.append("value diff")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)); n_fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows, duckdb {dt:.1f}s "
                  f"materialized, {threads} threads)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 8))
