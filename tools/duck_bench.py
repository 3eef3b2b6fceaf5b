#!/usr/bin/env python3
"""Per-query DuckDB timings over the same parquet tables, same convention as
the Spark bench (threads=32, warm pass, min-of-N). Feeds the SCALE.md
per-query ratio table so a config regression on either side is visible
immediately.

Failure convention mirrors graft.Bench: a query that errors during the timed
loop is reported on stderr, lands in an "errors" object instead of the
timings (so it cannot silently shrink the DuckDB total and skew ratios), and
the script exits nonzero.

Usage: python3 tools/duck_bench.py <sf_dir> <oracle_sql.json> [runs]
Prints one JSON line: {"total": s, "queries": {...}, "errors": {...}}
"""
import sys, json, time, os
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
errors = {}
# warm pass: page cache + any DuckDB-internal state
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        print(f"[duck_bench] {name} failed (warm): {e}", file=sys.stderr)
        errors.setdefault(name, f"warm: {e}")

out = {}
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"[duck_bench] {name} failed (timed): {e}", file=sys.stderr)
            errors.setdefault(name, f"timed: {e}")
            break
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    if best is not None:
        out[name] = round(best, 4)

print(json.dumps({"total": round(sum(out.values()), 3), "queries": out,
                  "errors": errors}))
if errors:
    sys.exit(1)
