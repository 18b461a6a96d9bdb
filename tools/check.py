#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
compare the Verify parquet dump against the DuckDB oracle on the same tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, vout = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

ok = bad = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        spark_df = canon(pd.read_parquet(f"{vout}/{name}"))
        duck_df = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: exception {type(e).__name__}: {str(e)[:300]}")
        bad += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        bad += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        bad += 1
        continue
    mism = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            eq = (a.fillna(np.nan).values == b.fillna(np.nan).values) | (a.isna().values & b.isna().values)
        else:
            eq = (a.astype(str).fillna("") == b.astype(str).fillna("")).values
        if not eq.all():
            i = int(np.argmin(eq))
            mism.append(f"{c}[row{i}]: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
    if mism:
        print(f"FAIL {name}: values {mism[:3]}")
        bad += 1
    else:
        print(f"ok   {name} rows={len(spark_df)}")
        ok += 1
print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
