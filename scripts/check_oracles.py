#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against the DuckDB oracle from oracle_sql.json,
sorting columns by name and comparing row multisets."""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracles):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"{name}: COLUMN MISMATCH spark={gcols} duckdb={ecols}"); fails += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT spark={len(g)} duckdb={len(e)}"); fails += 1; continue
    # normalize dtypes for compare
    ok = True
    for c in gcols:
        gv, ev = g[c], e[c]
        if gv.dtype.kind in "fc" or ev.dtype.kind in "fc":
            import numpy as np
            if not np.allclose(gv.astype(float).fillna(-9e99), ev.astype(float).fillna(-9e99),
                               rtol=0, atol=1e-9):
                bad = (gv.astype(float).fillna(-9e99) - ev.astype(float).fillna(-9e99)).abs()
                print(f"{name}: VALUE MISMATCH col={c} maxdiff={bad.max()}")
                ok = False
        else:
            if not (gv.fillna("<N>").astype(str).values == ev.fillna("<N>").astype(str).values).all():
                diff = (gv.fillna('<N>').astype(str).values != ev.fillna('<N>').astype(str).values)
                idx = diff.argmax()
                print(f"{name}: VALUE MISMATCH col={c} first at row {idx}: "
                      f"spark={gv.iloc[idx]!r} duckdb={ev.iloc[idx]!r}")
                ok = False
    if ok:
        print(f"{name}: OK ({len(g)} rows)")
    else:
        fails += 1

no_oracle = [d.split('/')[-1] for d in glob.glob(f"{out_dir}/q*") if d.split('/')[-1] not in oracles]
for name in sorted(no_oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = pq.read_table(files[0]).num_rows if files else -1
    print(f"{name}: rows-only ({n} rows)")
sys.exit(1 if fails else 0)
