#!/usr/bin/env python3
"""Local pre-check that simulates the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script loads each <outDir>/<name> parquet and compares it
against SparkEntry's oracle SQL executed in DuckDB over the same
test tables.

IMPORTANT: the oracle side is fetched via DuckDB's pandas path
(`.df()`), NOT `fetchall()`, because that is what the driver does.
The distinction matters: a bare `sum(...)` in DuckDB yields HUGEINT,
which pandas materializes as float64 while Spark emits int64 — values
then hash as `123.0` vs `123` and the driver fails the row even
though `fetchall()` would have returned identical Python ints.
Dtype policy (mirrors the driver, established empirically in r11):
  - integer vs float dtype on the same column  -> FATAL
  - int32 vs int64                              -> tolerated
  - timestamp unit (ns vs us)                   -> tolerated
Columns sorted by name, rows sorted by all values — mirrors the
driver's hash compare. Dev tool only; not part of the library runtime."""
import sys, json, glob, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def dtype_class(dt):
    """Collapse a pandas dtype to the class the driver's hash sees."""
    k = dt.kind  # i/u int, f float, b bool, M datetime, O object, U str
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"  # unit (ns/us) tolerated
    if k == "b":
        return "bool"
    return "other"


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar -> python scalar
        return norm(v.item())
    return v


def canon_df(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows, {c: df[c].dtype for c in cols}


fails = 0
names = sorted(n for n in oracle if only is None or n in only)
for name in names:
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    # read EVERY part file: Verify coalesces to 1 today, but a
    # multi-part dump must not silently compare a subset of rows
    sdf = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    scols, srows, sdt = canon_df(sdf)
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    ocols, orows, odt = canon_df(odf)
    if scols != ocols:
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); fails += 1; continue
    # dtype gate: int-vs-float is exactly the class the driver's hash rejects
    dbad = [(c, sdt[c], odt[c]) for c in scols
            if dtype_class(sdt[c]) != dtype_class(odt[c])
            and "other" not in (dtype_class(sdt[c]), dtype_class(odt[c]))]
    if dbad:
        for c, sd, od in dbad:
            print(f"FAIL {name}: dtype mismatch on '{c}': spark={sd} oracle={od}"
                  f" (driver hashes these differently — CAST the oracle column)")
        fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(srows, orows) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
        fails += 1; continue
    print(f"OK   {name} ({len(srows)} rows)")
print(f"\n{len(names)-fails}/{len(names)} passed")
sys.exit(1 if fails else 0)
