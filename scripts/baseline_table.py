#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from a graft.Bench full JSON.

Usage: python3 scripts/baseline_table.py /tmp/graft_bench_full.json
Prints the markdown rows (sorted by query name) plus the total line.
sf and config come from the bench JSON itself; a query's status is
"green" only when it produced a timing and no error was recorded.
"""
import sys, json

doc = json.load(open(sys.argv[1]))
qs = doc["queries"]
errors = doc.get("errors", {})
sf = doc.get("sf", "?")
if isinstance(sf, str) and "sf" in sf:
    sf = sf.rstrip("/").split("sf")[-1]
config = doc.get("config", "local[32], shuffle=32, UTC")
print("| Query | sf | sec | Config | Status |")
print("|---|---|---|---|---|")
for name in sorted(set(qs) | set(errors)):
    if name in errors:
        print(f"| {name} | {sf} | — | {config} | ERROR: {errors[name][:60]} |")
    else:
        print(f"| {name} | {sf} | {qs[name]:.2f} | {config} | green |")
total_status = "errors: none" if not errors else f"errors: {errors}"
cal = doc.get("calibration_sec")
cal_txt = f", calibration {cal:.2f} s" if cal is not None else ""
samples = doc.get("calibration_samples")
if samples:
    cal_txt += " (samples [" + ",".join(f"{s:.2f}" for s in samples) + "])"
norm = doc.get("value_canary_norm")
norm_txt = f", canary-normalized {norm:.2f} s" if norm is not None else ""
print(f"\ntotal: {doc['value']:.2f} s over {len(qs)} queries "
      f"(median of {doc['runs']} runs){cal_txt}{norm_txt}, {total_status}")
