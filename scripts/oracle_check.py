#!/usr/bin/env python3
"""Driver-gate dry-run: compare Verify parquet outputs vs DuckDB oracle SQL.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
Mirrors the driver: run oracle_sql.json per query against the sf parquet
tables, sort columns by name, sort rows, exact match (rows/schema/hash).
"""
import sys, os, json, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
for f in os.listdir(sf):
    if f.endswith(".parquet"):
        name = f[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf}/{f}')")

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(
        (x is None, str(x)) for x in r))
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return len(rows), cols, h.hexdigest()

fails, oks, skips = [], 0, 0
names = sorted(n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n)))
for name in names:
    if only and name not in only:
        continue
    if name not in oracle:
        skips += 1
        print(f"{name}: no_oracle (by design)" )
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        ora_df = con.execute(oracle[name]).df()
        sr, sc, sh = canon(spark_df)
        orr, oc, oh = canon(ora_df)
        ok = (sr == orr) and (sc == oc) and (sh == oh)
        if ok:
            oks += 1
        else:
            fails.append(name)
            print(f"{name}: FAIL rows {sr}/{orr} cols_match={sc==oc} hash={sh==oh}")
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {e}")
print(f"\n{oks} ok, {len(fails)} fail, {skips} no-oracle")
sys.exit(1 if fails else 0)
