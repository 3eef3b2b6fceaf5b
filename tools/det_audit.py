#!/usr/bin/env python3
"""Two-run determinism audit: compare two graft.Verify output dirs
row-for-row — VALUES AND ORDER (pandas equality per query, including dtype).
Catches partitioning-/merge-tree-dependent nondeterminism that a sorted
compare would mask (e.g. the repartitionByRange RDD-id-seeded boundary
sampling bug q69 once had).

Usage: python3 tools/det_audit.py <verify_dir_A> <verify_dir_B>
Exits nonzero on any difference.
"""
import sys, glob, os
import pandas as pd

a, b = sys.argv[1], sys.argv[2]
names = sorted(
    d for d in os.listdir(a)
    if os.path.isdir(os.path.join(a, d)) and glob.glob(os.path.join(a, d, "*.parquet")))
if not names:
    print(f"[det_audit] no query dirs with parquet under {a}", file=sys.stderr)
    sys.exit(2)
bad = []
for n in names:
    pa, pb = os.path.join(a, n), os.path.join(b, n)
    if not os.path.exists(pb):
        bad.append(n)
        print(f"MISS {n} (absent in {b})")
        continue
    da, db = pd.read_parquet(pa), pd.read_parquet(pb)
    if da.equals(db):
        print(f"OK   {n} ({len(da)} rows)")
    else:
        bad.append(n)
        print(f"DIFF {n}")
print(f"{len(names) - len(bad)}/{len(names)} value-and-order identical; diffs: {bad}")
sys.exit(1 if bad else 0)
