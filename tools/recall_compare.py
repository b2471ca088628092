#!/usr/bin/env python3
"""ANN quality regression gate — the recall twin of bench_compare.py.

Usage: python3 tools/recall_compare.py RECALL_old.json RECALL_new.json

Every config's recall and candidate count are deterministic
(md5-derived planes, seeded centroids), so ANY change is a code
change: the gate is exact, no noise threshold. Exit 1 on any recall
drop or candidate-count growth at unchanged recall.
"""
import json
import sys


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    failed = []
    for family in ("lsh", "ivf", "ivf_trained", "ivf_converged", "pq", "pq_trained", "ivfpq"):
        for cfg in sorted(set(old.get(family, {})) | set(new.get(family, {}))):
            o = old.get(family, {}).get(cfg)
            n = new.get(family, {}).get(cfg)
            if o is None or n is None:
                print(f"  {family}:{cfg:6s} "
                      f"{'new config' if o is None else 'REMOVED'}")
                if n is None:
                    failed.append(f"{family}:{cfg}")
                continue
            flag = ""
            if n["recall"] < o["recall"]:
                flag = "RECALL DROPPED"
                failed.append(f"{family}:{cfg}")
            elif n["recall"] == o["recall"] and n["candidates"] > o["candidates"]:
                flag = "CANDIDATES GREW"
                failed.append(f"{family}:{cfg}")
            print(f"  {family}:{cfg:6s} recall {o['recall']:.4f} -> {n['recall']:.4f}"
                  f"  cands {o['candidates']:7d} -> {n['candidates']:7d}  {flag}")
    if failed:
        print("QUALITY REGRESSED:", ", ".join(failed))
        return 1
    print("quality gate clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
