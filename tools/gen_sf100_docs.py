#!/usr/bin/env python3
"""Documents-only sf100 probe dataset: 1000 key-offset copies of the
sf0.1 documents table, with duplicate MULTIPLICITY HELD AT 100 (the
sf10 bomb regime) by salting the text once per super-group of 100
copies. Rows scale x10 over sf10 while each distinct text still has
exactly 100 doc-id copies — so an output-bound dedup row's cost law
(output ~ distinct-groups x multiplicity^2) predicts a LINEAR x10 over
its sf10 point, which is exactly the hypothesis the probe tests. A
verbatim 1000-copy replication would instead scale multiplicity to
1000 and grow the output x100 — a different (and uninteresting)
regime: every real corpus bounds per-document re-crawl multiplicity
long before 10^3.

The salt is appended as one extra trailing token (" g<k//100>"), so
shingle sets differ across super-groups and minhash/simhash signatures
separate them, while within a super-group all 100 copies stay exact
duplicates.

Usage: python3 tools/gen_sf100_docs.py [outDir] [srcDir]
       (defaults: /tmp/graft_sf100 /root/testdata/sf0.1; link the
        remaining tables from an sf10 dir for Bench's warm-up scans)
"""
import sys, os, duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{src}/documents.parquet')")
off = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
con.execute(f"""
  COPY (
    SELECT d.doc_id + k.k * {off} AS doc_id,
           d.text || ' g' || CAST(k.k // 100 AS VARCHAR) AS text,
           d.lang, d.source,
           length(d.text || ' g' || CAST(k.k // 100 AS VARCHAR)) AS n_chars
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(0, 999)) AS k) k
  ) TO '{out}/documents.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
""")
n = con.execute(f"SELECT count(*), count(DISTINCT md5(text)) "
                f"FROM read_parquet('{out}/documents.parquet')").fetchone()
print(f"documents {n[0]:,} rows, {n[1]:,} distinct texts "
      f"(multiplicity {n[0] // n[1]})")
