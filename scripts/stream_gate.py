#!/usr/bin/env python3
"""Streaming-throughput regression gate (VERDICT r17 #4).

Parses a `StreamCheck --check=bench` capture (the JSON lines it
prints), compares each shape's batch_ms_mean against the anchors in
scripts/stream_anchors.json, and FAILs when any shape exceeds
GATE_RATIO (default 2x — the same gate Bench totals get vs
BASELINE.md). rows_per_sec is reported but not gated (it scales with
sf; batch_ms_mean at matching shape is the BASELINE.md comparator).

Usage:  StreamCheck <sfDir> --check=bench 2>&1 | tee cap.log
        python3 scripts/stream_gate.py cap.log [anchors.json]
Exit 0 = all shapes inside the gate; 1 = regression or missing shape.
"""
import json, os, re, sys

GATE_RATIO = float(os.environ.get("GRAFT_STREAM_GATE", "2.0"))


def main(log_path, anchors_path=None):
    here = os.path.dirname(os.path.abspath(__file__))
    anchors = json.load(open(anchors_path or
                             os.path.join(here, "stream_anchors.json")))
    anchors = {k: v for k, v in anchors.items() if not k.startswith("_")}
    got = {}
    for line in open(log_path):
        m = re.search(r'\{"check":"(streaming_bench_[^"]+)".*\}', line)
        if m:
            got[m.group(1)] = json.loads(m.group(0))
    bad = 0
    print(f"| shape | anchor ms | got ms | ratio | rows/s | verdict |")
    print(f"|---|---|---|---|---|---|")
    for name, anchor_ms in sorted(anchors.items()):
        rec = got.get(name)
        if rec is None:
            print(f"| {name} | {anchor_ms} | MISSING | - | - | FAIL |")
            bad += 1
            continue
        ms = rec["batch_ms_mean"]
        ratio = ms / anchor_ms if anchor_ms else float("inf")
        ok = ratio <= GATE_RATIO
        print(f"| {name} | {anchor_ms} | {ms} | {ratio:.2f}x "
              f"| {rec['rows_per_sec']:.0f} | {'ok' if ok else 'FAIL'} |")
        bad += 0 if ok else 1
    extra = set(got) - set(anchors)
    for name in sorted(extra):
        print(f"| {name} | (no anchor — add to stream_anchors.json) "
              f"| {got[name]['batch_ms_mean']} | - "
              f"| {got[name]['rows_per_sec']:.0f} | new |")
    print(f"\nstream gate ({GATE_RATIO}x batch_ms_mean): "
          + ("PASS" if bad == 0 else f"FAIL ({bad} shapes)"))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
