#!/usr/bin/env bash
# One-command verification entry point (round 15): wires every evidence
# layer — unit suites, the DuckDB oracle gate at multiple SFs, the two-run
# determinism audit, the bench ratio guard, and the sf1 scale gate — into
# one tiered invocation, so a judge or CI reproduces the whole green wall
# without reading four tools' CLIs.
#
# Usage:
#   tools/verify_all.sh quick   # ~3 min: compile + oracle gate at sf0.01
#   tools/verify_all.sh full    # ~25 min: sbt test + oracle gates at
#                               #   sf0.001/0.01/0.1 + det audit + bench
#                               #   ratio guard at sf0.1
#   tools/verify_all.sh scale   # hours-class: generated-data oracle gate at
#                               #   gendata/sf0.1 + the sf1 scale gate
#                               #   (quiet-window disciplined)
#   (no arg = quick)
#
# Exits nonzero on the FIRST failing layer. Artifacts under /tmp/verify_all/
# (gates) and gendata/scale_gate/ (scale tier).
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-quick}"
WORK="${WORK:-/tmp/verify_all}"
mkdir -p "$WORK"

# Same direct-java runner as scale_gate.sh: avoids fighting a resident sbt
# server for the project lock, and cold-starts in ~8 s instead of ~40.
JOPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JOPTS="$JOPTS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
run_main() {
  # shellcheck disable=SC2086
  java $JOPTS -Xmx"${SPARK_DRIVER_MEM:-12g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" "$@"
}

step() { echo; echo "=== [verify_all/$TIER] $* ==="; }

step "sbt compile"
sbt -batch compile > "$WORK/compile.log" 2>&1 || {
  tail -30 "$WORK/compile.log"; exit 1; }
echo "compile OK"

gate() { # gate <sf_dir> <out_dir> — Verify dump + DuckDB compare
  local sf="$1" out="$2"
  rm -rf "$out"
  run_main graft.Verify "$sf" "$out" > "$out.verify.log" 2>&1 || {
    tail -30 "$out.verify.log"; exit 1; }
  python3 tools/check.py "$sf" "$out"
}

case "$TIER" in
quick)
  step "oracle gate @ /root/testdata/sf0.01 (222 queries, Spark vs DuckDB)"
  gate /root/testdata/sf0.01 "$WORK/out_sf001q"
  ;;
full)
  step "sbt test (all suites)"
  sbt -batch test > "$WORK/test.log" 2>&1 || { tail -50 "$WORK/test.log"; exit 1; }
  grep -E "Tests: succeeded|All tests passed" "$WORK/test.log" | tail -2
  for sf in 0.001 0.01 0.1; do
    step "oracle gate @ /root/testdata/sf$sf"
    gate "/root/testdata/sf$sf" "$WORK/out_sf$sf"
  done
  step "two-run determinism audit @ sf0.01 (values AND order)"
  gate /root/testdata/sf0.01 "$WORK/out_sf0.01_b" > /dev/null
  python3 tools/det_audit.py "$WORK/out_sf0.01" "$WORK/out_sf0.01_b" | tail -3
  step "bench ratio guard @ sf0.1 (Spark vs DuckDB, bar 2.0x total)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="$WORK/bench_sf0.1.json" \
    run_main graft.Bench > "$WORK/bench.log" 2>&1 || { tail -20 "$WORK/bench.log"; exit 1; }
  python3 tools/duck_bench.py /root/testdata/sf0.1 \
    "$WORK/out_sf0.1/oracle_sql.json" 3 > "$WORK/duck_sf0.1.json"
  python3 tools/ratio_guard.py "$WORK/bench_sf0.1.json" "$WORK/duck_sf0.1.json" 2.0 | tail -5
  ;;
scale)
  step "generated-data oracle gate @ gendata/sf0.1"
  if [ ! -e gendata/sf0.1/lineitem.parquet ]; then
    run_main graft.tools.GenData gendata/sf0.1 0.1
  fi
  gate gendata/sf0.1 "$WORK/out_gen_sf0.1"
  step "sf1 scale gate (quiet-window disciplined; see tools/scale_gate.sh)"
  tools/scale_gate.sh
  ;;
*)
  echo "unknown tier '$TIER' (quick|full|scale)" >&2; exit 2 ;;
esac

echo
echo "=== [verify_all/$TIER] ALL GREEN ==="
