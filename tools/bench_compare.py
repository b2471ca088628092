#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: python3 tools/bench_compare.py BENCH_old.json BENCH_new.json [threshold]

Compares per-query times (medians in round 2+) and exits nonzero if
any query regressed past the threshold (default 1.5x) — small
absolute times (<0.3s) are exempt, they're job-overhead noise.
"""
import json
import sys


def main(old_path, new_path, threshold=1.5):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    rows = []
    failed = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((name, o, n, None, "new" if o is None else "REMOVED"))
            continue
        ratio = n / o if o > 0 else float("inf")
        flag = ""
        if ratio > threshold and n > 0.3:
            flag = "REGRESSED"
            failed.append(name)
        rows.append((name, o, n, ratio, flag))
    w = max(len(r[0]) for r in rows)
    for name, o, n, ratio, flag in rows:
        os = f"{o:7.3f}" if o is not None else "      -"
        ns = f"{n:7.3f}" if n is not None else "      -"
        rs = f"{ratio:5.2f}x" if ratio is not None else "     -"
        print(f"  {name:{w}s} {os} -> {ns}  {rs}  {flag}")
    tot_o = sum(v for v in old.values() if v > 0)
    tot_n = sum(v for v in new.values() if v > 0)
    print(f"\n  total: {tot_o:.1f}s -> {tot_n:.1f}s ({tot_n/tot_o:.2f}x)")
    if failed:
        print("REGRESSED:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    main(sys.argv[1], sys.argv[2], t)
