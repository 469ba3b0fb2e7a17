#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: run DuckDB on each
oracle_sql.json entry over the sfDir tables and compare against the engine's
parquet dumps (column-name-sorted, row-order-insensitive, exact values).

Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    try:
        eng = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: engine output unreadable: {e}")
        fails += 1
        continue
    try:
        ora = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
        fails += 1
        continue
    eng = eng.reindex(sorted(eng.columns), axis=1)
    ora = ora.reindex(sorted(ora.columns), axis=1)
    if list(eng.columns) != list(ora.columns):
        print(f"FAIL {name}: columns {list(eng.columns)} vs {list(ora.columns)}")
        fails += 1
        continue
    if len(eng) != len(ora):
        print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}")
        fails += 1
        continue
    def key(df):
        def norm(v):
            if isinstance(v, float):
                if math.isnan(v):
                    return "NaN"
                return v.hex()
            return str(v)
        return sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    ke, ko = key(eng), key(ora)
    if ke != ko:
        bad = next(i for i, (a, b) in enumerate(zip(ke, ko)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:")
        print(f"  engine: {ke[bad]}")
        print(f"  oracle: {ko[bad]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(eng)} rows")
print(("ALL OK" if fails == 0 else f"{fails} FAILURES"))
sys.exit(1 if fails else 0)
