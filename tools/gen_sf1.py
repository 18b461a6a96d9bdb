#!/usr/bin/env python3
"""Build a sf1.0-equivalent dataset by key-offset replication of the
driver's sf0.1 tables (10 copies; region/nation stay fixed, as TPC-H
dimensions do). Copy k offsets every entity key by k*(max+1) so joins
fan exactly as at sf0.1 while row counts scale 10x. Value columns are
kept verbatim — duplicated documents/embeddings across copies are the
re-crawl-duplicate regime the dedup family exists for.

Usage: python3 tools/gen_sf1.py [outDir] [copies] [srcDir]
       (defaults: /tmp/graft_sf1 10 /root/testdata/sf0.1 — sf10 is
        `python3 tools/gen_sf1.py /tmp/graft_sf10 100`)
"""
import sys, os, duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def load(name):
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{src}/{name}.parquet')")

for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    load(t)

offs = {}
for table, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey"),
                   ("events", "event_id"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")):
    offs[key] = con.execute(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]
offs["user_id"] = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]

def emit(name, sql):
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' "
                f"(FORMAT PARQUET, COMPRESSION ZSTD)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
    print(f"{name:12s} {n:>10,} rows")

K = f"(SELECT unnest(generate_series(0, {copies - 1})) AS k)"

# dimensions: verbatim
emit("region", "SELECT * FROM region")
emit("nation", "SELECT * FROM nation")

emit("customer", f"""
  SELECT c_custkey + k * {offs['c_custkey']} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer CROSS JOIN {K}""")

emit("supplier", f"""
  SELECT s_suppkey + k * {offs['s_suppkey']} AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM supplier CROSS JOIN {K}""")

emit("part", f"""
  SELECT p_partkey + k * {offs['p_partkey']} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM part CROSS JOIN {K}""")

emit("orders", f"""
  SELECT o_orderkey + k * {offs['o_orderkey']} AS o_orderkey,
         o_custkey + k * {offs['c_custkey']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders CROSS JOIN {K}""")

emit("lineitem", f"""
  SELECT l_orderkey + k * {offs['o_orderkey']} AS l_orderkey,
         l_partkey + k * {offs['p_partkey']} AS l_partkey,
         l_suppkey + k * {offs['s_suppkey']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem CROSS JOIN {K}""")

emit("events", f"""
  SELECT event_id + k * {offs['event_id']} AS event_id,
         ts,
         user_id + k * {offs['user_id']} AS user_id,
         event_type, value, props
  FROM events CROSS JOIN {K}""")

emit("documents", f"""
  SELECT doc_id + k * {offs['doc_id']} AS doc_id,
         text, lang, source, n_chars
  FROM documents CROSS JOIN {K}""")

emit("embeddings", f"""
  SELECT vec_id + k * {offs['vec_id']} AS vec_id,
         embedding, label
  FROM embeddings CROSS JOIN {K}""")

print(f"done -> {out}")
