#!/usr/bin/env python3
"""Render the per-query sf10 census status table (VERDICT r15 #1).

Inputs: the Verify output dir (timings.json) and a captured check.py
log. Emits a markdown table: one row per registered query with its
status — exact-green / sampled-green (pred) / rows-only / FAIL /
missing — Spark seconds and oracle seconds.

Usage: census_table.py <verify_out_dir> <check_log> [preds.json]
"""
import json, re, sys, os

def main(out_dir, check_log, preds_path=None):
    preds = json.load(open(preds_path)) if preds_path else {}
    timings = {}
    tp = os.path.join(out_dir, "timings.json")
    if os.path.exists(tp):
        timings = json.load(open(tp))
    rows = {}
    pat = re.compile(
        r"^(PASS|FAIL|\[rows-only\])\s+(\S+?):?\s+"
        r"(?:\((\d+) rows(?:, oracle ([\d.]+)s)?\))?")
    for line in open(check_log):
        line = line.rstrip()
        m = re.match(r"^PASS (\S+) \((\d+) rows, oracle ([\d.]+)s"
                     r"(, sampled[^)]*)?\)", line)
        if m:
            kind = "sampled" if m.group(4) else "exact"
            rows[m.group(1)] = (kind, int(m.group(2)), float(m.group(3)))
            continue
        m = re.match(r"^\[rows-only\] (\S+): (\d+) rows", line)
        if m:
            rows[m.group(1)] = ("rows-only", int(m.group(2)), None)
            continue
        # name must stop at the first colon (no \S+? backtracking past
        # it): "FAIL name: why" AND "FAIL name:why" both key as "name"
        # (a trailing colon breaks the verify-dir join; r17's pattern
        # required a space after the colon and dropped bare name:reason)
        m = re.match(r"^FAIL ([^:\s]+):?\s*(.*)", line)
        if m:
            rows[m.group(1)] = ("FAIL", None, m.group(2)[:80])
    names = sorted(set(list(rows.keys()) + [d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d))]))
    n_exact = n_samp = n_rows = n_fail = n_miss = 0
    print("| query | sf10 status | spark s | oracle s |")
    print("|---|---|---|---|")
    for name in names:
        spark_s = timings.get(name)
        ss = f"{spark_s:.1f}" if isinstance(spark_s, (int, float)) else "—"
        st = rows.get(name)
        if st is None:
            n_miss += 1
            print(f"| {name} | MISSING (no verify output row) | {ss} | — |")
            continue
        kind, nrows, extra = st
        if kind == "sampled" or (kind == "exact" and name in preds):
            n_samp += 1
            print(f"| {name} | sampled-green ({preds.get(name, 'sampled')};"
                  f" {nrows} rows) | {ss} | {extra} |")
        elif kind == "exact":
            n_exact += 1
            print(f"| {name} | exact-green ({nrows} rows) | {ss} | {extra} |")
        elif kind == "rows-only":
            n_rows += 1
            print(f"| {name} | rows-only ({nrows} rows) | {ss} | — |")
        else:
            n_fail += 1
            print(f"| {name} | FAIL: {extra} | {ss} | — |")
    total = n_exact + n_samp + n_rows + n_fail + n_miss
    print(f"\nTotals: {total} queries — {n_exact} exact-green, "
          f"{n_samp} sampled-green, {n_rows} rows-only, {n_fail} FAIL, "
          f"{n_miss} missing.")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
