#!/usr/bin/env python3
"""Cross-round bench trend: accumulate every round's driver medians
into one file so regressions are visible across rounds, not just
pairwise.

Reads BENCH_r*.json from the repo root (the driver's wrapper format:
{n, rc, cpus, sf, tail, parsed}), extracts each round's bench JSON
line (the `parsed` field when the driver managed to parse it, else
the last parseable line of `tail`), and writes bench/TREND.json:

    {"rounds": {"r01": {"total": ..., "queries": {...}}, ...}}

Medians are preferred over min-of-n when present (rounds >= 2 emit
both) — medians are the driver's own comparison stat.

Prints a per-query table across rounds and flags queries whose
LATEST round exceeds 1.5x their best earlier round (>0.3s absolute,
same noise exemption as bench_compare.py). Exit code 1 on flags.

Usage: python3 tools/bench_trend.py [repo_root]
"""
import glob
import json
import os
import re
import sys


def extract(path, root):
    """Best-available per-query stats for one round, in preference
    order: the driver's `parsed` bench line (rounds with the
    last-line fix), a parseable line in `tail`, a COMPLETE medians/
    queries dict regex-recovered from the (2000-char-truncated)
    tail, this repo's own bench/BENCH_r{N}_local.json snapshot."""
    raw = json.load(open(path))
    if isinstance(raw, dict) and "queries" in raw:
        return raw.get("medians") or raw["queries"]
    parsed = raw.get("parsed")
    if parsed and "queries" in parsed:
        return parsed.get("medians") or parsed["queries"]
    tail = raw.get("tail", "")
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
                if "queries" in cand:
                    return cand.get("medians") or cand["queries"]
            except json.JSONDecodeError:
                continue
    for field in ("medians", "queries"):
        m = re.search(r'"%s":\{([^}]*)\}' % field, tail)
        if m:
            return {k: float(v) for k, v in
                    re.findall(r'"([A-Za-z0-9_]+)":([0-9.eE+-]+)', m.group(1))}
    m = re.search(r"BENCH_r0*(\d+)\.json$", path)
    if m:
        local = os.path.join(root, "bench", f"BENCH_r{m.group(1)}_local.json")
        if os.path.exists(local):
            raw = json.load(open(local))
            return raw.get("medians") or raw.get("queries")
    return None


def main(root="."):
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_(r\d+)\.json$", path)
        if not m:
            continue
        qs = extract(path, root)
        if not qs:
            print(f"  {path}: no parseable bench line, skipped")
            continue
        rounds[m.group(1)] = {
            "total": sum(v for v in qs.values() if v > 0),
            "queries": qs,
        }
    if not rounds:
        print("no BENCH_r*.json found")
        return 1
    os.makedirs(os.path.join(root, "bench"), exist_ok=True)
    out = os.path.join(root, "bench", "TREND.json")
    json.dump({"rounds": rounds}, open(out, "w"), indent=1, sort_keys=True)

    names = sorted(set(q for r in rounds.values() for q in r["queries"]))
    tags = sorted(rounds)
    latest = tags[-1]
    w = max(len(n) for n in names)
    print(f"  {'query':{w}s} " + " ".join(f"{t:>8s}" for t in tags))
    flagged = []
    for name in names:
        vals = [rounds[t]["queries"].get(name) for t in tags]
        cells = " ".join(f"{v:8.3f}" if v is not None else f"{'-':>8s}"
                         for v in vals)
        flag = ""
        cur = rounds[latest]["queries"].get(name)
        prior = [rounds[t]["queries"][name] for t in tags[:-1]
                 if name in rounds[t]["queries"]]
        if cur is not None and prior and cur > 1.5 * min(prior) and cur > 0.3:
            flag = "REGRESSED"
            flagged.append(name)
        print(f"  {name:{w}s} {cells}  {flag}")
    print(f"\n  {'total':{w}s} " +
          " ".join(f"{rounds[t]['total']:8.1f}" for t in tags))
    print(f"  wrote {out}")
    if flagged:
        print("REGRESSED vs best prior round:", ", ".join(flagged))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
