#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
t2 correctness gate: run graft.Verify at a given SF, then replay each
oracle SQL in DuckDB over the same parquet tables and compare
(columns sorted by name, rows sorted, values hashed with rounding-free
equality for ints/strings and bitwise equality for doubles).

Usage: python3 tools/check.py [sfDir] [outDir]
(assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran)
"""
import json, math, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"sql error: {e}")); continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        fails.append((name, f"columns {list(g.columns)} != {list(w.columns)}")); continue
    if len(g) != len(w):
        fails.append((name, f"rows {len(g)} != {len(w)}")); continue
    if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
        fails.append((name, f"dtypes {list(zip(g.columns, g.dtypes, w.dtypes))}")); continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    bad = None
    for c in gs.columns:
        a, b = gs[c], ws[c]
        if str(a.dtype).startswith("float"):
            eq = [(x == y) or (isinstance(x, float) and isinstance(y, float)
                  and math.isnan(x) and math.isnan(y))
                  or (x is None and y is None) for x, y in zip(a, b)]
        else:
            eq = [(x == y) or (x is None and y is None)
                  or (x != x and y != y) for x, y in zip(a, b)]
        if not all(eq):
            i = eq.index(False)
            bad = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
            break
    if bad: fails.append((name, bad))
    else: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
