#!/usr/bin/env python3
"""Cross-round ANN quality trend — the recall twin of bench_trend.py
(r4 verdict #5).

Reads every bench/RECALL_r*_local.json (plus RECALL_LAST.json if
present as the in-flight round), accumulates them into
bench/RECALL_TREND.json:

    {"rounds": {"r4": {"lsh": {...}, "ivf": {...}, ...}, ...}}

and prints one table per family: recall (and candidate count) per
config per round. Because every number is deterministic (md5-derived
planes, seeded centroids), the gate is exact: a config whose LATEST
recall is below its best earlier round is a regression, full stop —
no noise threshold. Candidate growth at unchanged recall is also
flagged (paying more for the same quality). New configs and higher
recalls are reported, not flagged. Exit 1 on any flag, so a driver
round fails loudly on recall drops.

Usage: python3 tools/recall_trend.py [repo_root]
"""
import glob
import json
import os
import re
import sys

FAMILIES = ("lsh", "ivf", "ivf_trained", "ivf_converged", "pq", "pq_trained",
            "ivfpq", "ivfpq_res", "neardup", "ivf_scaled_ladder",
            "minhash_bands", "graph_ann", "bq", "ivf_bq")


def load_rounds(root):
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "bench", "RECALL_r*_local.json"))):
        m = re.search(r"RECALL_r(\d+)_local", path)
        if m:
            rounds[f"r{int(m.group(1))}"] = json.load(open(path))
    last = os.path.join(root, "RECALL_LAST.json")
    if os.path.exists(last):
        data = json.load(open(last))
        # only treat RECALL_LAST as a newer round if it isn't already
        # snapshotted (identical content to the latest r* file)
        if not rounds or data != rounds[max(rounds, key=lambda k: int(k[1:]))]:
            rounds["latest"] = data
    return rounds


def main(root="."):
    rounds = load_rounds(root)
    if not rounds:
        print("no RECALL files found under", root)
        return 1
    # chronological: r4, r5, ..., then the in-flight "latest" if any
    order = sorted(rounds, key=lambda k: int(k[1:]) if k != "latest" else 10**6)
    latest = order[-1]
    out = {"rounds": {k: {f: rounds[k].get(f, {}) for f in FAMILIES} for k in order}}
    os.makedirs(os.path.join(root, "bench"), exist_ok=True)
    with open(os.path.join(root, "bench", "RECALL_TREND.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    flagged = []
    for fam in FAMILIES:
        cfgs = sorted({c for r in order for c in rounds[r].get(fam, {})})
        if not cfgs:
            continue
        print(f"\n{fam}  ({' '.join(order)}; latest = {latest})")
        for cfg in cfgs:
            cells = []
            best_prior, best_prior_cands = None, None
            for r in order:
                pt = rounds[r].get(fam, {}).get(cfg)
                if pt is None:
                    cells.append("      -      ")
                    continue
                cells.append(f"{pt['recall']:.3f}/{pt['candidates']:>7d}")
                if r != latest and (best_prior is None or pt["recall"] > best_prior):
                    best_prior, best_prior_cands = pt["recall"], pt["candidates"]
            now = rounds[latest].get(fam, {}).get(cfg)
            flag = ""
            if now is None and best_prior is not None:
                flag = "REMOVED"
                flagged.append(f"{fam}:{cfg} removed")
            elif now is not None and best_prior is not None:
                if now["recall"] < best_prior:
                    flag = f"RECALL DROPPED (best prior {best_prior:.3f})"
                    flagged.append(f"{fam}:{cfg} recall {best_prior:.3f}->{now['recall']:.3f}")
                elif now["recall"] == best_prior and now["candidates"] > best_prior_cands:
                    flag = "CANDIDATES GREW at equal recall"
                    flagged.append(f"{fam}:{cfg} candidates {best_prior_cands}->{now['candidates']}")
            elif now is not None and best_prior is None:
                flag = "new config"
            print(f"  {cfg:8s} " + " ".join(cells) + f"  {flag}")
    auto = {r: rounds[r].get("autoconfig_lsh_0.8") for r in order}
    print("\nautoconfig_lsh(0.8):",
          " ".join(f"{r}={auto[r]}" for r in order))
    auto_ivf = {r: rounds[r].get("autoconfig_ivf_scaled_0.8") for r in order}
    print("autoconfig_ivf_scaled(0.8):",
          " ".join(f"{r}={auto_ivf[r]}" for r in order))
    auto_mh = {r: rounds[r].get("autoconfig_minhash_0.8") for r in order}
    print("autoconfig_minhash(0.8):",
          " ".join(f"{r}={auto_mh[r]}" for r in order))
    if flagged:
        print("\nQUALITY REGRESSED:", "; ".join(flagged))
        return 1
    print("\nrecall trend clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
