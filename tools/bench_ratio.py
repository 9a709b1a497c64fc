#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
ratios sorted descending — the superlinear-plan screen PERF.md's
round-8/9 passes use. Usage:
  python3 tools/bench_ratio.py BENCH_small.json BENCH_big.json [min_big_sec]
Queries whose big-SF time is below min_big_sec (default 0.5 s) are
suppressed: ratios of two sub-noise timings are host jitter, not plans.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if "queries" in doc:
            return doc["queries"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise SystemExit(f"no bench line in {path} (the driver's BENCH_r*.json "
                     "wrapper truncates timings — use bench_metrics.json)")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    rows = []
    for q, tb in big.items():
        ts = small.get(q)
        if ts and tb >= floor:
            rows.append((tb / ts, ts, tb, q))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'small':>8} {'big':>8}  query")
    for r, ts, tb, q in rows:
        flag = " <-- superlinear" if r > 9 else ""
        print(f"{r:7.2f} {ts:8.3f} {tb:8.3f}  {q}{flag}")
    only_big = sorted(set(big) - set(small))
    if only_big:
        print("only in big:", ", ".join(only_big))


if __name__ == "__main__":
    main()
