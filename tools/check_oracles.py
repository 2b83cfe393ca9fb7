#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the raw testdata parquet and compare with the Verify dump
(columns sorted by name, rows sorted, exact values)."""
import sys, json, glob, duckdb, math

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-out"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(d.split('/')[-1] for d in glob.glob(f"{out_dir}/q_*")):
    spark = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
    if name not in oracle:
        results[name] = f"NO-ORACLE rows={spark.num_rows}"
        continue
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        results[name] = f"ORACLE-ERROR {e}"
        continue
    s_cols, d_cols = sorted(spark.column_names), sorted(duck.column_names)
    if s_cols != d_cols:
        results[name] = f"COLS-MISMATCH spark={s_cols} duck={d_cols}"
        continue
    s_types = {c: str(spark.schema.field(c).type) for c in s_cols}
    d_types = {c: str(duck.schema.field(c).type) for c in d_cols}
    sp = spark.select(s_cols).to_pylist()
    dp = duck.select(d_cols).to_pylist()
    key = lambda r: tuple((str(type(v)), str(v)) for v in (r[c] for c in s_cols))
    sp.sort(key=key); dp.sort(key=key)
    if len(sp) != len(dp):
        results[name] = f"ROWS-MISMATCH spark={len(sp)} duck={len(dp)}"
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sp, dp)):
        for c in s_cols:
            va, vb = a[c], b[c]
            if isinstance(va, float) and isinstance(vb, float):
                ok = (va == vb) or (math.isnan(va) and math.isnan(vb))
            else:
                ok = va == vb
            if not ok:
                bad = (i, c, va, vb); break
        if bad: break
    if bad:
        results[name] = f"VALUE-MISMATCH row{bad[0]} col={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"
    elif s_types != d_types:
        diff = {c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]}
        results[name] = f"OK-VALUES TYPE-DIFF {diff} rows={len(sp)}"
    else:
        results[name] = f"OK rows={len(sp)}"

for k, v in results.items():
    print(f"{k:22s} {v}")
n_ok = sum(1 for v in results.values() if v.startswith("OK"))
print(f"== {n_ok}/{len(results)} ok")
