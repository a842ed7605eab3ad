#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB against views named after the tables in
<sfDir>, and compares: schema (column names), row count, and values
(columns sorted by name, rows sorted, exact equality; doubles compared
bit-exactly first, then with 1e-9 rel tolerance reported separately).
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
spark_dirs = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))

n_pass = n_fail = 0
no_oracle = []
for q in spark_dirs:
    spath = os.path.join(out_dir, q)
    try:
        sdf = con.execute(
            f"SELECT * FROM '{spath}/*.parquet'").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {q}: cannot read spark output: {e}")
        n_fail += 1
        continue
    if q not in oracle:
        no_oracle.append((q, sdf.num_rows))
        continue
    try:
        odf = con.execute(oracle[q]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {q}: oracle SQL error: {e}")
        n_fail += 1
        continue
    scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
    if scols != ocols:
        print(f"FAIL {q}: columns spark={scols} oracle={ocols}")
        n_fail += 1
        continue
    if sdf.num_rows != odf.num_rows:
        print(f"FAIL {q}: rows spark={sdf.num_rows} oracle={odf.num_rows}")
        n_fail += 1
        continue
    import pandas as pd
    import numpy as np
    def normalize(df):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, (np.ndarray, list))).any():
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (np.ndarray, list)) else v)
        return df
    sp = normalize(sdf.select(scols).to_pandas()).sort_values(scols).reset_index(drop=True)
    op = normalize(odf.select(ocols).to_pandas()).sort_values(ocols).reset_index(drop=True)
    ok = True
    for c in scols:
        a, b = sp[c], op[c]
        try:
            same_type = str(a.dtype) == str(b.dtype)
        except Exception:
            same_type = True
        eq = a.equals(b)
        if not eq:
            # report first diff
            import numpy as np
            mism = ~((a == b) | (a.isna() & b.isna()))
            idx = mism[mism].index[:3].tolist()
            print(f"FAIL {q}: col {c} dtype s={a.dtype} o={b.dtype} "
                  f"first diffs at {idx}: "
                  f"spark={[a[i] for i in idx]} oracle={[b[i] for i in idx]}")
            ok = False
            break
        if not same_type:
            print(f"WARN {q}: col {c} dtype mismatch s={a.dtype} o={b.dtype} (values equal)")
    if ok:
        print(f"PASS {q} ({sdf.num_rows} rows)")
        n_pass += 1
    else:
        n_fail += 1

print(f"\n== {n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only ==")
for q, n in no_oracle:
    tag = "OK" if n > 0 else "EMPTY!"
    print(f"  rows-only {q}: {n} rows {tag}")
