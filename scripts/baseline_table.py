#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from a graft.Bench full JSON.

Usage: python3 scripts/baseline_table.py /tmp/graft_bench_full.json
Prints the markdown rows (sorted by query name) plus the total line.
"""
import sys, json

doc = json.load(open(sys.argv[1]))
qs = doc["queries"]
print("| Query | sf | sec | Config | Status |")
print("|---|---|---|---|---|")
for name in sorted(qs):
    print(f"| {name} | 0.1 | {qs[name]:.2f} | local[32], shuffle=32, UTC | green |")
print(f"\ntotal: {doc['value']:.2f} s over {len(qs)} queries "
      f"(median of {doc['runs']} runs), errors: {doc['errors']}")
