#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify parquet
dumps (column-name-sorted, row-sorted, exact value match)."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = pd.read_parquet(f"{out_dir}/{name}")
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"columns differ: {list(exp.columns)} vs {list(got.columns)}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rowcount {len(exp)} vs {len(got)}"))
            continue
        key = list(exp.columns)
        exp = exp.sort_values(key, na_position="last").reset_index(drop=True)
        got = got.sort_values(key, na_position="last").reset_index(drop=True)
        mismatch = None
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                import numpy as np
                ee, gg = e.astype(float), g.astype(float)
                bad = ~((ee.isna() & gg.isna()) | (np.isclose(ee, gg, rtol=0, atol=1e-9, equal_nan=True)))
            else:
                bad = ~((e.isna() & g.isna()) | (e.astype(str) == g.astype(str)))
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: oracle={e[i]!r} got={g[i]!r} ({int(bad.sum())} bad)"
                break
        if mismatch:
            fails.append((name, mismatch))
        else:
            passes.append(name)
    except Exception as ex:
        fails.append((name, f"EXCEPTION: {ex}"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
