#!/usr/bin/env python3
"""Fold round-13 bench sweeps into the per-query minimum composite and
emit the BASELINE.md closing-table rows (markdown) on stdout.

Usage: python3 scripts/fold_bench_r13.py bench_report_r13_run*.json
"""
import json, sys

runs = {}
for path in sys.argv[1:]:
    d = json.load(open(path))
    tag = path.rsplit('run', 1)[1].split('.')[0]
    runs[tag] = d

comp = {}
for d in runs.values():
    for k, v in d['queries'].items():
        comp[k] = min(comp.get(k, float('inf')), v)

print("| run | total (s) | n | loadavg start/timed/end | quiet-wait (s) | requeried |")
print("|---|---|---|---|---|---|")
for tag in sorted(runs):
    d = runs[tag]
    print("| %s | %.1f | %d | %s / %s / %s | %s | %d |" % (
        tag, d['value'], len(d['queries']),
        d.get('loadavg_start'), d.get('loadavg_timed'), d.get('loadavg_end'),
        d.get('quiet_wait_sec'), len(d.get('requeried') or {})))
print()
print("Composite (per-query minima): %.1f s over %d gates" %
      (sum(comp.values()), len(comp)))
print()
print("| query | sec |")
print("|---|---|")
for k in sorted(comp):
    print("| %s | %.3f |" % (k, comp[k]))
