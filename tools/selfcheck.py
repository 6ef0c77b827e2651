#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each Spark result
parquet from Verify's outDir, run the corresponding DuckDB oracle SQL on
the same sf tables, and compare (columns sorted by name, rows sorted,
exact values). Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracles):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark result parquet"); fail += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"SCHEMA   {name}: spark={sc} oracle={oc}"); fail += 1; continue
    a = spark_df[sc].sort_values(by=sc).reset_index(drop=True)
    b = oracle_df[sc].sort_values(by=sc).reset_index(drop=True)
    if len(a) != len(b):
        print(f"ROWS     {name}: spark={len(a)} oracle={len(b)}"); fail += 1; continue
    if len(a) == 0:
        print(f"EMPTY    {name}: zero rows both sides"); fail += 1; continue
    mismatch = None
    for c in sc:
        av, bv = a[c], b[c]
        try:
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, i, av[i], bv[i],
                        int((~eq).sum()))
            break
    if mismatch:
        c, i, x, y, n = mismatch
        print(f"VALUE    {name}: col={c} row={i} spark={x!r} oracle={y!r} ({n} diffs)")
        fail += 1
    else:
        print(f"OK       {name}: {len(a)} rows")
        ok += 1

# rows-only queries: just report counts
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = d.split("/")[-1]
    if name in oracles:
        continue
    files = glob.glob(f"{d}/*.parquet")
    n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
    status = "ROWSONLY" if n > 0 else "ROWSZERO"
    print(f"{status} {name}: {n} rows")
    if n <= 0: fail += 1
    else: ok += 1

print(f"\n{ok} ok, {fail} failing")
sys.exit(1 if fail else 0)
