#!/usr/bin/env python3
"""Comparative benchmark: each registered oracle SQL in DuckDB (the
reference's query engine) vs Spark per-query wall times from a Bench JSON.
Usage: python3 tools/bench_compare.py <sfDir> <verifyOutDir> <benchJson>
"""
import sys, json, glob, os, time, re
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

# family sub-aggregates (mirrors Bench.scala's split): the query family
# is the plan-quality number; the two e2e families are fixture/stream
# startup floors
def family(n):
    # anchored suffix (r16): _e2e plus optional twin digit at end of name
    # (mirrors Bench.scala family())
    if "stream" in n: return "streaming_e2e"
    if re.search(r"_e2e\d*$", n): return "fixture_e2e"
    return "query"
fams = {}
for name, d, s in rows:
    f = fams.setdefault(family(name), [0.0, 0.0])
    if d is not None: f[0] += d
    if s is not None and s >= 0: f[1] += s
print("\nfamily sub-aggregates:")
for fam in sorted(fams):
    d, s = fams[fam]
    r = f"{s/d:.2f}x" if d > 0 else "-"
    print(f"  {fam:14s} duckdb={d:6.1f}s spark={s:6.1f}s ratio={r}")
# real-work cut: queries where DuckDB has measurable work
rw = [(d, s) for _, d, s in rows
      if d is not None and d >= 0.1 and s is not None and s >= 0]
if rw:
    dsum = sum(d for d, _ in rw); ssum = sum(s for _, s in rw)
    print(f"  real-work ({len(rw)} queries with duckdb>=0.1s): "
          f"duckdb={dsum:.1f}s spark={ssum:.1f}s ratio={ssum/dsum:.2f}x")
