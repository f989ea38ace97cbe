#!/usr/bin/env bash
# Round-closing harness-budget gate — HARD (r14 judge item #1a: a red
# budget blocks the round from closing; no new gates land while red).
# Run on a QUIET host before closing a round:
#
#   scripts/budget_check.sh [verify_sf_dir] [bench_sf_dir]
#
# FAILs if:
#   - either sbt run exits non-zero (r14 ADVICE: exit codes were never
#     checked, so a crashed run could still "pass" on stale greps)
#   - the full Verify dump exceeds 12 min or the raw Bench sweep
#     exceeds 20 min — the bounds the driver's timeout allows
#   - Bench's FINAL summary ("partial":false) is missing (r14 ADVICE:
#     the old '"metric":"total"' grep also matched interim partials)
#   - Bench reported any failed gate reps ("fail_n" != 0)
#   - Verify left no oracle_sql.json
# All scratch outputs are wiped first (r14 ADVICE: stale files from a
# previous run could satisfy the existence checks).
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
BSF=${2:-/root/testdata/sf0.1}
rm -rf /tmp/budget_verify /tmp/budget_verify.tmp /tmp/budget_verify.log \
       /tmp/budget_bench.log /tmp/budget_bench_report.json
load=$(cut -d' ' -f1 /proc/loadavg)
echo "[budget] loadavg=$load (bounds are only meaningful when quiet; >3 invalidates the run)"
fail=0
t0=$(date +%s)
sbt -batch "runMain graft.Verify $SF /tmp/budget_verify" >/tmp/budget_verify.log 2>&1
rc=$?
v=$(( $(date +%s) - t0 ))
if [ "$rc" -ne 0 ]; then echo "[budget] FAIL: Verify exited rc=$rc"; fail=1; fi
t0=$(date +%s)
SPARK_GRAFT_SF_DIR=$BSF SPARK_GRAFT_BENCH_REPORT=/tmp/budget_bench_report.json \
  sbt -batch "runMain graft.Bench" >/tmp/budget_bench.log 2>&1
rc=$?
b=$(( $(date +%s) - t0 ))
if [ "$rc" -ne 0 ]; then echo "[budget] FAIL: Bench exited rc=$rc"; fail=1; fi
echo "[budget] verify=${v}s (limit 720)  bench_raw_sweep=${b}s (limit 1200)"
if [ "$v" -gt 720 ]; then echo "[budget] FAIL: full Verify over 12 min"; fail=1; fi
if [ "$b" -gt 1200 ]; then echo "[budget] FAIL: raw Bench sweep over 20 min"; fail=1; fi
if ! grep -q '"partial":false' /tmp/budget_bench.log; then
  echo "[budget] FAIL: Bench emitted no FINAL (partial:false) summary"; fail=1
fi
if grep -q '"partial":false' /tmp/budget_bench.log && \
   ! grep '"partial":false' /tmp/budget_bench.log | tail -1 | grep -q '"fail_n":0'; then
  echo "[budget] FAIL: Bench final summary reports failed gate reps"; fail=1
fi
if [ ! -f /tmp/budget_verify/oracle_sql.json ]; then
  echo "[budget] FAIL: Verify left no oracle_sql.json"; fail=1
fi
vd=$(find /tmp/budget_verify -mindepth 1 -maxdepth 1 -type d | wc -l)
echo "[budget] verify dirs=$vd"
[ "$fail" -eq 0 ] && echo "[budget] PASS"
exit $fail
