#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir, compare to the Spark parquet dumps in outDir.
Compare = sort columns by name, sort rows, exact match (with a float-tolerance
fallback report so we can distinguish hard mismatches from ulp noise).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# optional 3rd arg: comma-separated query names (mirrors GRAFT_VERIFY_ONLY)
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name)
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails.append(name)
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns differ spark={list(got.columns)} oracle={list(exp.columns)}")
        fails.append(name)
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        fails.append(name)
        continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    # Strict dtype-family gate: the driver hashes rendered values, so an
    # int column on one side vs float on the other (e.g. DuckDB HUGEINT
    # -> pandas float64 vs Spark bigint) hashes 123 vs 123.0 and FAILS
    # even when every value is numerically identical. Reproduce that here
    # BEFORE the value compare so the class can't ship again (r10 lesson).
    dtype_bad = []
    for c in gs.columns:
        a_int = pd.api.types.is_integer_dtype(gs[c])
        b_int = pd.api.types.is_integer_dtype(es[c])
        a_flt = pd.api.types.is_float_dtype(gs[c])
        b_flt = pd.api.types.is_float_dtype(es[c])
        if (a_int and b_flt) or (a_flt and b_int):
            dtype_bad.append((c, str(gs[c].dtype), str(es[c].dtype)))
    if dtype_bad:
        for c, da, db in dtype_bad:
            print(f"  col {c}: DTYPE FAMILY mismatch spark={da} oracle={db} "
                  f"(driver hash would differ — CAST the oracle column)")
        print(f"FAIL {name}: int-vs-float dtype divergence")
        fails.append(name)
        continue
    # normalize dtypes for compare (timestamps → int ns, floats stay)
    exact = True
    approx = True
    for c in gs.columns:
        a, b = gs[c], es[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                same_nan = np.array_equal(np.isnan(af), np.isnan(bf))
                eq = same_nan and np.array_equal(af[~np.isnan(af)], bf[~np.isnan(bf)])
                cl = same_nan and np.allclose(af[~np.isnan(af)], bf[~np.isnan(bf)],
                                              rtol=1e-9, atol=1e-9)
                if not eq:
                    exact = False
                    if not cl:
                        approx = False
                        print(f"  col {c}: first diffs:")
                        d = np.where(af != bf)[0][:3]
                        for i in d:
                            print(f"    row {i}: spark={af[i]!r} oracle={bf[i]!r}")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    exact = False
                    approx = False
                    d = (a.astype(str) != b.astype(str))
                    idx = list(d[d].index[:3])
                    for i in idx:
                        print(f"  col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}")
        except Exception as e:
            exact = False; approx = False
            print(f"  col {c}: compare error {e}")
    if exact:
        print(f"PASS {name} ({len(gs)} rows)")
    elif approx:
        print(f"SOFT {name} ({len(gs)} rows) — float ulp noise only")
    else:
        print(f"FAIL {name}")
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
