#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json query in
DuckDB over the same sf dir and hash-compare against the Verify parquet dumps.
Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Type gate (round-17 postmortem): normalize() below erases dtype
# differences, but the DRIVER's hasher serializes raw representations —
# DuckDB widens sum(BIGINT) to HUGEINT (pandas: object), which hash-diverges
# from Spark's int64 even when every value agrees. DESCRIBE each oracle and
# fail on the types the driver serializes differently, so the local gate
# sees what the driver's gate sees. Convention: CAST integer aggregates to
# BIGINT and fractional literals to DOUBLE in the oracle SQL.
BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def bad_oracle_types(sql):
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(col, typ) for col, typ, *_ in desc
            if any(b in typ.upper() for b in BAD_TYPES)]

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype in (np.float32,):
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes = [], []
for name in sorted(oracle):
    res_path = f"{outdir}/{name}"
    if not os.path.isdir(res_path):
        fails.append((name, "no spark result written"))
        continue
    try:
        bad = bad_oracle_types(oracle[name])
        if bad:
            fails.append((name, f"oracle type (driver hash-diverges): " +
                ", ".join(f"{c} is {t}" for c, t in bad)))
            continue
        got = normalize(pd.read_parquet(res_path))
        want = normalize(con.execute(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"error: {e}"))
        continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"cols: spark={list(got.columns)} oracle={list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rows: spark={len(got)} oracle={len(want)}"))
        continue
    ok = True
    for c in got.columns:
        g, w = got[c].values, want[c].values
        if g.dtype == np.float64:
            both_nan = pd.isna(g) & pd.isna(w)
            # tiny rtol: Spark/DuckDB partial-agg order can differ by an ulp
            eq = np.isclose(g, w, rtol=1e-12, atol=0, equal_nan=True) | both_nan
        else:
            eq = (g == w) | (pd.isna(g) & pd.isna(w))
        if not eq.all():
            i = int(np.argmin(eq))
            fails.append((name, f"col {c} row {i}: spark={g[i]!r} oracle={w[i]!r}"))
            ok = False
            break
    if ok:
        passes.append(name)

for n in passes:
    print(f"PASS {n}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
print(f"\n{len(passes)}/{len(passes)+len(fails)} pass")
sys.exit(1 if fails else 0)
