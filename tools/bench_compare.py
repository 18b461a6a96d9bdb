#!/usr/bin/env python3
"""Comparative benchmark: each registered oracle SQL in DuckDB (the
reference's query engine) vs Spark per-query wall times from a Bench JSON.
Usage: python3 tools/bench_compare.py <sfDir> <verifyOutDir> <benchJson>
"""
import sys, json, glob, os, time
import duckdb

sfdir, vout, benchjson = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(f)[:-8]} AS "
                f"SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f"{vout}/oracle_sql.json"))
bench = json.load(open(benchjson))["queries"]

rows = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        dt = time.time() - t0
    except Exception as e:
        dt = None
    rows.append((name, dt, bench.get(name)))

tot_d = sum(d for _, d, _ in rows if d is not None)
tot_s = sum(s for _, _, s in rows if s is not None and s >= 0)
print(f"{'query':28s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
for name, d, s in rows:
    ds = f"{d:8.2f}" if d is not None else "     ERR"
    ss = f"{s:8.2f}" if s is not None else "     n/a"
    r = f"{s/d:7.1f}" if d and s and s > 0 else "      -"
    print(f"{name:28s} {ds} {ss} {r}")
print(f"\nTOTAL duckdb={tot_d:.1f}s spark={tot_s:.1f}s ratio={tot_s/tot_d:.2f}x")
