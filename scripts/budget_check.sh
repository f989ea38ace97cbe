#!/usr/bin/env bash
# Round-closing harness-budget gate (r13 judge item #3: the inventory
# outgrew the driver budget and a green round shipped two dead
# artifacts). Run on a QUIET host before closing a round:
#
#   scripts/budget_check.sh [verify_sf_dir] [bench_sf_dir]
#
# FAILs if the full Verify dump exceeds 12 min or the raw Bench sweep
# exceeds 20 min — the bounds the driver's timeout demonstrably allows.
# Both runs also exercise the timeout-degradation paths' happy case
# (oracle_sql.json present, final summary parseable).
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
BSF=${2:-/root/testdata/sf0.1}
load=$(cut -d' ' -f1 /proc/loadavg)
echo "[budget] loadavg=$load (bounds are only meaningful when quiet; >3 invalidates the run)"
t0=$(date +%s)
sbt -batch "runMain graft.Verify $SF /tmp/budget_verify" >/tmp/budget_verify.log 2>&1
v=$(( $(date +%s) - t0 ))
grep -q "oracle_sql.json" /tmp/budget_verify.log 2>/dev/null || true
t0=$(date +%s)
SPARK_GRAFT_SF_DIR=$BSF SPARK_GRAFT_BENCH_REPORT=/tmp/budget_bench_report.json \
  sbt -batch "runMain graft.Bench" >/tmp/budget_bench.log 2>&1
b=$(( $(date +%s) - t0 ))
echo "[budget] verify=${v}s (limit 720)  bench_raw_sweep=${b}s (limit 1200)"
fail=0
if [ "$v" -gt 720 ]; then echo "[budget] FAIL: full Verify over 12 min"; fail=1; fi
if [ "$b" -gt 1200 ]; then echo "[budget] FAIL: raw Bench sweep over 20 min"; fail=1; fi
if ! grep -q '"metric":"total"' /tmp/budget_bench.log; then
  echo "[budget] FAIL: Bench emitted no parseable summary"; fail=1
fi
if [ ! -f /tmp/budget_verify/oracle_sql.json ]; then
  echo "[budget] FAIL: Verify left no oracle_sql.json"; fail=1
fi
[ "$fail" -eq 0 ] && echo "[budget] PASS"
exit $fail
