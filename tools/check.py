#!/usr/bin/env python3
"""Dev harness mirroring the driver's DuckDB-oracle compare:
runs Verify output vs oracle_sql.json on the same parquet tables.
Usage: python3 tools/check.py <sf_dir> <verify_out_dir>"""
import duckdb, json, sys, glob, os, math

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata ships single files; the ScaleCorpus sf1 anchor ships
    # multi-file parquet DIRECTORIES under the same naming scheme
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# optional query-name filter (sf1 anchor checks the heavy subset only)
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

# Types whose python/pandas/arrow renderings diverge between a DuckDB query
# result and a Spark-written parquet file (int128 vs int64, decimal vs float,
# date32 vs timestamp). fetchall() coerces them identically so a str() compare
# passes locally while a typed hash (the driver's) fails — lint them out.
FRAGILE = ("HUGEINT", "DECIMAL", "DATE", "TIME", "UHUGEINT", "TINYINT", "SMALLINT")
def fragile(types):
    return [str(t) for t in types
            if any(str(t).upper().startswith(f) for f in FRAGILE)
            and not str(t).upper().startswith("TIMESTAMP")]

fails = 0
for name in sorted(oracle):
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
    s_rows, s_cols = norm(spark_rel.fetchall(), spark_rel.columns)
    try:
        d_rel = con.sql(oracle[name])
        d_rows, d_cols = norm(d_rel.fetchall(), d_rel.columns)
    except Exception as e:
        print(f"FAIL {name}: oracle error {str(e)[:200]}"); fails += 1; continue
    bad = fragile(d_rel.types) + fragile(spark_rel.types)
    if bad:
        print(f"FAIL {name}: hash-fragile result types {bad}"); fails += 1; continue
    if s_cols != d_cols:
        print(f"FAIL {name}: cols {s_cols} != {d_cols}"); fails += 1; continue
    if s_rows != d_rows:
        sset, dset = set(s_rows), set(d_rows)
        print(f"FAIL {name}: rows {len(s_rows)} vs {len(d_rows)}; "
              f"spark-only={list(sset-dset)[:3]} duck-only={list(dset-sset)[:3]}")
        fails += 1; continue
    print(f"OK   {name} ({len(s_rows)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
