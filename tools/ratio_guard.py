#!/usr/bin/env python3
"""Guard the Spark/DuckDB bench ratio: join a graft.Bench JSON line with a
duck_bench.py JSON line, print the per-query ratio table (markdown-ready for
SCALE.md), and exit nonzero when the TOTAL ratio exceeds the bar (default
2.0) — so a config regression is caught locally before the driver's graded
run.

Usage: python3 tools/ratio_guard.py <spark_bench.json> <duck_bench.json> [bar]
Each argument is a file holding the one-line JSON the respective bench
prints. Queries missing on either side are listed but excluded from totals.
"""
import sys, json

spark_path, duck_path = sys.argv[1], sys.argv[2]
bar = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

spark = json.load(open(spark_path))["queries"]
duck = json.load(open(duck_path))["queries"]

common = sorted(set(spark) & set(duck))
missing = sorted(set(spark) ^ set(duck))
if missing:
    print(f"[ratio_guard] excluded (present on one side only): {missing}",
          file=sys.stderr)

print("| query | spark s | duckdb s | ratio |")
print("|---|---|---|---|")
rows = []
for name in common:
    s, d = spark[name], duck[name]
    ratio = s / d if d > 0 else float("inf")
    rows.append((ratio, name, s, d))
for ratio, name, s, d in rows:
    flag = " ⚠" if ratio > bar and s >= 0.3 else ""
    print(f"| {name} | {s:.3f} | {d:.3f} | {ratio:.2f}×{flag} |")
ts, td = sum(spark[n] for n in common), sum(duck[n] for n in common)
total_ratio = ts / td if td > 0 else float("inf")
print(f"| **total** | **{ts:.3f}** | **{td:.3f}** | **{total_ratio:.2f}×** |")

if total_ratio > bar:
    print(f"[ratio_guard] FAIL: total ratio {total_ratio:.2f}x > bar {bar}x",
          file=sys.stderr)
    sys.exit(1)
print(f"[ratio_guard] OK: total ratio {total_ratio:.2f}x <= bar {bar}x",
      file=sys.stderr)
