#!/usr/bin/env python3
"""Fold the round-14 sweeps into the BASELINE closing-table rows:
per-query MINIMUM across the given bench_report JSONs, emitted as
`| name | sec |` rows (the baselineMedians format)."""
import json, sys
files = sys.argv[1:]
mins = {}
for f in files:
    for k, v in json.load(open(f))["queries"].items():
        mins[k] = min(mins.get(k, 9e9), v)
print(f"# {len(mins)} gates, composite {sum(mins.values()):.1f} s")
for k in sorted(mins):
    print(f"| {k} | {mins[k]:.3f} |")
