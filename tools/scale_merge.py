#!/usr/bin/env python3
"""Merge scale-rehearsal epochs pointwise (the Bench min protocol):
per query, take the MIN base and MIN big across epochs — the
least-interfered observation on each side — and recompute the ratio.

Usage: python3 tools/scale_merge.py out.json epoch1.json epoch2.json ...
"""
import json
import sys


def main(out, *epochs):
    merged = {}
    meta = {}
    for path in epochs:
        raw = json.load(open(path))
        meta = {k: raw[k] for k in ("base", "big", "rows_ratio") if k in raw}
        for name, v in raw["queries"].items():
            m = merged.setdefault(name, {"base_sec": 1e18, "big_sec": 1e18})
            if v["base_sec"] > 0:
                m["base_sec"] = min(m["base_sec"], v["base_sec"])
            if v["big_sec"] > 0:
                m["big_sec"] = min(m["big_sec"], v["big_sec"])
    for name, m in merged.items():
        ok = m["base_sec"] < 1e17 and m["big_sec"] < 1e17
        m["ratio"] = round(m["big_sec"] / m["base_sec"], 3) if ok else -1.0
        m["base_sec"] = round(m["base_sec"], 3) if m["base_sec"] < 1e17 else -1.0
        m["big_sec"] = round(m["big_sec"], 3) if m["big_sec"] < 1e17 else -1.0
    payload = {**meta, "epochs": len(epochs), "queries": merged}
    json.dump(payload, open(out, "w"), indent=1, sort_keys=True)
    w = max(len(n) for n in merged)
    for name in sorted(merged, key=lambda n: -merged[n]["ratio"]):
        m = merged[name]
        print(f"  {name:{w}s} base={m['base_sec']:8.2f}s "
              f"big={m['big_sec']:8.2f}s ratio={m['ratio']:7.2f}x")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
