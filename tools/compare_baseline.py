#!/usr/bin/env python3
"""Compare a Bench JSON line against the per-query table in BASELINE.md.

Usage: python3 tools/compare_baseline.py <bench.json or log containing it>

Prints per-query engine/baseline ratios (worst first) and the totals —
the tuning worklist for a bench round.
"""
import json, re, signal, sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`

def main(path):
    # Bench prints two JSON lines: {"metric":"per_query",...} with the
    # per-query map, then the compact {"metric":"total",...} headline
    total_line = detail_line = None
    for l in open(path):
        m = re.search(r'\{"metric":"total".*\}', l)
        if m:
            total_line = m.group(0)
        m = re.search(r'\{"metric":"per_query".*\}', l)
        if m:
            detail_line = m.group(0)
    if not total_line or not detail_line:
        sys.exit(f"no bench JSON lines found in {path}")
    bench = json.loads(total_line)
    bench["queries"] = json.loads(detail_line)["queries"]
    base = {}
    for l in open("BASELINE.md"):
        m = re.match(r"\| `(\w+)` \| ([0-9.]+) \|", l)
        if m:
            base[m.group(1)] = float(m.group(2))
    rows = []
    uncovered = []
    for q, t in bench["queries"].items():
        b = base.get(q)
        if b is None:
            uncovered.append(q)
        else:
            rows.append((t / b, q, t, b))
    rows.sort(reverse=True)
    print(f"{'ratio':>8} {'engine_s':>9} {'baseline_s':>10}  query")
    for r, q, t, b in rows:
        print(f"{r:8.1f} {t:9.3f} {b:10.3f}  {q}")
    if not rows:
        sys.exit("no queries overlap with the BASELINE.md table")
    # totals over the covered set only — an uncovered query must not
    # inflate the headline ratio
    total_engine = sum(t for _, _, t, _ in rows)
    total_base = sum(b for _, _, _, b in rows)
    print(f"\ncovered total engine {total_engine:.2f}s vs baseline {total_base:.2f}s "
          f"(ratio {total_engine/total_base:.1f}x); failed={bench.get('failed', [])}"
          + (f"; uncovered={uncovered}" if uncovered else ""))

if __name__ == "__main__":
    main(sys.argv[1])
