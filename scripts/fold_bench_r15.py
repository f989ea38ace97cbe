#!/usr/bin/env python3
"""Fold the round-15 sf0.1 sweeps into the closing BASELINE table:
per-gate MINIMUM across the round's full sweeps (the r14 discipline —
external host steal inflates individual sweeps by 1.5-2x with flat
gc_ms, so the min across sweeps is the honest uncontended estimate).

Usage: fold_bench_r15.py report1.json report2.json ... > table.md
"""
import json
import sys

reports = [json.load(open(p)) for p in sys.argv[1:]]
queries = {}
for r in reports:
    for k, v in r["queries"].items():
        if k not in queries or v < queries[k]:
            queries[k] = v
total = sum(queries.values())
print(f"<!-- min-fold of {len(reports)} sweeps; composite {total:.1f} s"
      f" over {len(queries)} gates -->")
for k in sorted(queries):
    print(f"| {k} | {queries[k]:.3f} |")
print(f"<!-- TOTAL {total:.3f} -->", file=sys.stderr)
