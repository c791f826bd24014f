#!/usr/bin/env python3
"""Type gate for oracle SQL: DESCRIBE every oracle query in DuckDB and fail
on any output column whose type the driver's hasher serializes differently
than Spark's parquet writer — HUGEINT/UHUGEINT (DuckDB's sum(BIGINT)
widening) and DECIMAL. Values can agree while hashes diverge (round-17
postmortem: 15 entries red on representation only), so this must run
BEFORE commit, as part of the local gate.
Usage: python3 scripts/oracle_types.py <sfDir> <outDir-with-oracle_sql.json>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")
bad, err = [], []
for name in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        err.append((name, str(e).splitlines()[0]))
        continue
    for col, typ, *_ in desc:
        if any(b in typ.upper() for b in BAD):
            bad.append((name, col, typ))
for name, col, typ in bad:
    print(f"BADTYPE {name}: column {col} is {typ}")
for name, e in err:
    print(f"ERR {name}: {e}")
print(f"\n{len(oracle)-len({n for n,_,_ in bad})-len(err)}/{len(oracle)} type-clean")
sys.exit(1 if (bad or err) else 0)
