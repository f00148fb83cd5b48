#!/usr/bin/env python3
"""Render a BASELINE.md-ready decade anchor table from Verify timings.

Usage: python3 scripts/decade_table.py <verifyOutDir> [topN]

Reads <verifyOutDir>/timings.json (written by graft.Verify since r14)
and prints a markdown table of per-query Spark wall seconds, sorted
descending. With topN, prints only the N most expensive (the sf10
spot-sweep candidate list); otherwise all queries.
"""
import sys, json

def main(out_dir, top_n=None):
    t = json.load(open(f"{out_dir}/timings.json"))
    rows = sorted(t.items(), key=lambda kv: -kv[1])
    if top_n:
        rows = rows[:top_n]
    total = sum(t.values())
    print(f"| query | spark_s |")
    print(f"|---|---|")
    for name, sec in rows:
        print(f"| {name} | {sec:.2f} |")
    print(f"\n{len(t)} queries, total {total:.1f} s "
          f"(shown: {len(rows)})")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else None)
