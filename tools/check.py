#!/usr/bin/env python3
"""Local pre-check that simulates the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script loads each <outDir>/<name> parquet and compares it
against SparkEntry's oracle SQL executed in DuckDB over the same
test tables. Columns sorted by name, rows sorted by all values —
mirrors the driver's hash compare. Dev tool only; not part of the
library runtime."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    t = pq.read_table(files[0])
    scols, srows = canon(t.column_names, [list(r.values()) for r in t.to_pylist()])
    try:
        res = con.execute(oracle[name])
        ocols_raw = [d[0] for d in res.description]
        orows_raw = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    ocols, orows = canon(ocols_raw, orows_raw)
    if scols != ocols:
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(srows, orows) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
        fails += 1; continue
    print(f"OK   {name} ({len(srows)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
