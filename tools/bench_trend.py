#!/usr/bin/env python3
"""Cross-round bench trend GATE: accumulate every round's bench
numbers into one file and exit nonzero on a real regression.

Interference protocol (this box has 2-5x ambient swings, so a single
epoch's number is not evidence):
  * per round, take the POINTWISE MIN across every available epoch —
    the driver's BENCH_r{N}.json (medians preferred within an epoch)
    AND this repo's own bench/BENCH_r{N}_local.json min-of-n
    snapshot. The min is the least-interfered observation; a query
    is only as slow as its best measurement.
  * a fresh BENCH_LAST.json (newer than the newest driver round
    file) joins as the `latest` epoch, mirroring recall_trend's
    RECALL_LAST.json.
  * flag a query only when its latest round exceeds 1.5x its best
    earlier round (>0.3s absolute — below that is job-overhead
    noise) AND its implementing code changed since the last round
    boundary (the driver's `round N: ...` commit). A slowdown in a
    query whose code did not change is the noise floor by
    definition — printed as `noise?`, never an exit-1.

Touched = any changed src/main file names the query literally (the
registry entry and the oracle both live in the implementing file),
or a shared-core file (functions/, core/, Tables) changed — the
conservative direction: core edits make every query gateable.

Writes bench/TREND.json. Exit 1 only on touched regressions.

Usage: python3 tools/bench_trend.py [repo_root]
"""
import glob
import json
import os
import re
import subprocess
import sys


def extract(path, root):
    """Best-available per-query stats for one driver round file, in
    preference order: the driver's `parsed` bench line (rounds with
    the last-line fix), a parseable line in `tail`, a COMPLETE
    medians/queries dict regex-recovered from the (2000-char-
    truncated) tail."""
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
    return None


def extract_env(path):
    """Per-epoch environment fingerprint (loadavg/cpus/spin1s), written
    by Bench since r7 — lets a uniformly-inflated epoch be machine-
    attributed instead of inferred from untouched-query drift."""
    try:
        raw = json.load(open(path))
    except Exception:
        return None
    for cand in (raw, raw.get("parsed") if isinstance(raw, dict) else None):
        if isinstance(cand, dict) and isinstance(cand.get("env"), dict):
            return cand["env"]
    tail = raw.get("tail", "") if isinstance(raw, dict) else ""
    m = re.search(r'"env":\{([^}]*)\}', tail)
    if m:
        try:
            return json.loads("{" + m.group(1) + "}")
        except json.JSONDecodeError:
            return None
    return None


def pointwise_min(*epochs):
    """Per-query min across epochs; a query missing from one epoch
    keeps its value from the others (absence is not a measurement)."""
    out = {}
    for qs in epochs:
        if not qs:
            continue
        for name, v in qs.items():
            if name not in out or v < out[name]:
                out[name] = v
    return out or None


def git_lines(root, *args):
    try:
        r = subprocess.run(["git", "-C", root] + list(args),
                           capture_output=True, text=True, timeout=30)
        if r.returncode == 0:
            return r.stdout.splitlines()
    except Exception:
        pass
    return None


def round_boundary(root):
    """Diff base for the 'touched this round' window. The naive answer
    (the most recent `round N:` commit) has a blind spot (r8 verdict
    #3): the driver snapshots the round's work INTO that boundary
    commit and then runs the gate, so diffing against it reports zero
    touched queries for code that changed THIS round. Walk the
    boundary commits newest-first and take the newest one whose round
    NUMBER is below the maximum — i.e. the PREVIOUS round's last
    boundary — unless real src/main work landed after the newest
    boundary (the in-flight mid-round case, where the newest boundary
    is the correct base)."""
    lines = git_lines(root, "log", "--grep", r"^round [0-9]*:",
                      "--format=%H %s")
    if not lines:
        return None
    bounds = []  # newest first: (sha, round_number)
    for ln in lines:
        sha, _, subj = ln.partition(" ")
        m = re.match(r"round (\d+):", subj)
        if sha and m:
            bounds.append((sha, int(m.group(1))))
    if not bounds:
        return None
    newest_sha, newest_n = bounds[0]
    since_newest = git_lines(root, "diff", "--name-only", newest_sha)
    if since_newest and any(f.startswith("src/main/") for f in since_newest):
        return newest_sha  # mid-round: this round's edits sit on top
    for sha, n in bounds:
        if n < newest_n:
            return sha  # end-of-round state: diff across the snapshot
    return newest_sha


def touched_queries(root, names):
    """Queries whose implementing code changed during the current
    round window (see round_boundary). None (= gate everything) when
    git state is unreadable — fail strict, not silent."""
    boundary = round_boundary(root)
    if not boundary:
        return None
    changed = git_lines(root, "diff", "--name-only", boundary)
    if changed is None:
        return None
    main = [f for f in changed if f.startswith("src/main/")]
    core = any("/functions/" in f or "/core/" in f or
               f.endswith("Tables.scala") or f.endswith("GraftSession.scala")
               for f in main)
    if core:
        return set(names)
    touched = set()
    for f in main:
        p = os.path.join(root, f)
        if not os.path.exists(p):
            continue
        body = open(p, errors="replace").read()
        touched.update(n for n in names if '"%s"' % n in body)
    return touched


def main(root="."):
    # pass 1: collect every epoch as (queries, env) so per-epoch spin
    # calibration can normalize BEFORE the pointwise-min merge (r13
    # verdict #6: the median-drift factor tracked whichever box ran
    # last; spin1s is a recorded per-epoch hardware measurement, so
    # normalizing times to a reference box makes the gate
    # machine-independent instead of threshold-scaled)
    collected = {}  # tag -> {"epochs": [(qs, env)], "envs": {...}}
    newest_driver_mtime = 0.0
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r0*(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        epochs = [(extract(path, root), extract_env(path))]
        # committed per-round epochs: the builder's min-of-n snapshot
        # and the driver's own per-query file (Bench writes the full
        # map to BENCH_LAST.json; the wrapper keeps only the summary
        # line, so each round's driver map is snapshotted here)
        for suffix in ("local", "driver"):
            snap = os.path.join(root, "bench", f"BENCH_r{n}_{suffix}.json")
            if os.path.exists(snap):
                raw = json.load(open(snap))
                e = extract_env(snap)
                epochs.append((raw.get("queries"), e))
                epochs.append((raw.get("medians"), e))
        if not any(qs for qs, _ in epochs):
            print(f"  {path}: no parseable bench line in any epoch, skipped")
            continue
        newest_driver_mtime = max(newest_driver_mtime, os.path.getmtime(path))
        envs = {}
        for tag, p in [("driver_round", path)] + [
                (s, os.path.join(root, "bench", f"BENCH_r{n}_{s}.json"))
                for s in ("local", "driver")]:
            if os.path.exists(p):
                e = extract_env(p)
                if e:
                    envs[tag] = e
        collected[f"r{n:02d}"] = {"epochs": epochs, "envs": envs}
    last = os.path.join(root, "BENCH_LAST.json")
    if os.path.exists(last) and os.path.getmtime(last) > newest_driver_mtime:
        raw = json.load(open(last))
        env = extract_env(last)
        if raw.get("queries") or raw.get("medians"):
            collected["latest"] = {
                "epochs": [(raw.get("queries"), env), (raw.get("medians"), env)],
                "envs": {"local": env} if env else {},
            }
    if not collected:
        print("no BENCH_r*.json found")
        return 1
    # reference box = the fastest spin observed across all epochs;
    # each spin-carrying epoch's times are scaled by spin/ref (a
    # slower box's seconds shrink to their ref-box equivalent).
    # Epochs without a fingerprint (pre-r7 rounds) stay raw.
    spins = [env["spin1s"] for c in collected.values()
             for _, env in c["epochs"]
             if isinstance(env, dict)
             and isinstance(env.get("spin1s"), (int, float))
             and env["spin1s"] > 0]
    spin_ref = max(spins) if spins else None

    def norm(qs, env):
        if not qs:
            return None
        if (spin_ref and isinstance(env, dict)
                and isinstance(env.get("spin1s"), (int, float))
                and env["spin1s"] > 0):
            f = env["spin1s"] / spin_ref
            return {k: v * f for k, v in qs.items()}
        return qs

    rounds = {}
    for tag, c in collected.items():
        qs = pointwise_min(*[norm(q, e) for q, e in c["epochs"]])
        if not qs:
            continue
        rounds[tag] = {
            "total": sum(v for v in qs.values() if v > 0),
            "queries": qs,
            **({"env": c["envs"]} if c["envs"] else {}),
        }
    if not rounds:
        print("no parseable bench epochs found")
        return 1
    os.makedirs(os.path.join(root, "bench"), exist_ok=True)
    out = os.path.join(root, "bench", "TREND.json")

    names = sorted(set(q for r in rounds.values() for q in r["queries"]))
    # chronological: r01..rNN, then the fresh latest epoch
    tags = sorted(rounds, key=lambda t: (t == "latest", t))
    latest = tags[-1]
    touched = touched_queries(root, names)

    # ROUND-BOUNDARY epoch (the driver run snapshotted at round start,
    # i.e. PRE-change code): the gate's own protocol says a flagged
    # query should be cross-checked against the driver's medians —
    # automate it. If the boundary epoch ALREADY exceeded the 1.25x
    # bar vs best prior, the elevation predates this round's code
    # (machine or regenerated-testdata drift) and the flag demotes to
    # env-attributed noise. Normalized like every other epoch.
    boundary = {}
    snaps = glob.glob(os.path.join(root, "bench", "BENCH_r*_driver.json"))
    nums = [(int(m.group(1)), p) for p in snaps
            for m in [re.search(r"BENCH_r0*(\d+)_driver\.json$", p)] if m]
    if nums:
        _, bpath = max(nums)
        try:
            braw = json.load(open(bpath))
            # SAME basis as every other epoch: pointwise min of the
            # snapshot's sweeps/medians (r14 ADVICE — medians sit
            # systematically above mins, so a medians-based boundary
            # could exceed 1.25x best-prior from ordinary sweep
            # spread and demote a genuine code regression to 'env?')
            bq = braw.get("queries") or {}
            bm = braw.get("medians") or {}
            bqs = {k: min(v for v in (bq.get(k), bm.get(k))
                          if isinstance(v, (int, float)))
                   for k in set(bq) | set(bm)}
            boundary = norm(bqs, braw.get("env")) or {}
        except Exception:
            boundary = {}

    # MACHINE-DRIFT normalization: sessions land on different boxes
    # (the env fingerprint records it going forward, but prior rounds
    # carry none), so compare the latest epoch's MEDIAN per-query
    # ratio against best-prior across the whole suite. A real
    # regression is one query — it cannot move the median; a slower
    # box moves every query together. When the median exceeds 1.25,
    # scale the flagging thresholds UP by it; when it drops below
    # 0.8 (a FASTER box), scale them DOWN — otherwise a genuine
    # regression can hide inside the machine speedup (r7 advice).
    def min_prior(name):
        vals = [rounds[t]["queries"][name] for t in tags[:-1]
                if name in rounds[t]["queries"]]
        return min(vals) if vals else None
    ratios = sorted(
        rounds[latest]["queries"][n] / min_prior(n)
        for n in names
        if n in rounds[latest]["queries"] and min_prior(n)
        and min_prior(n) > 0.05)
    drift = ratios[len(ratios) // 2] if len(ratios) >= 20 else 1.0
    drift = drift if (drift > 1.25 or drift < 0.8) else 1.0
    # persist BEFORE the flagging/report loop: an exception while
    # reporting must not leave a stale TREND.json (r7 advice)
    json.dump({"rounds": rounds, "machine_drift": drift,
               "spin_ref": spin_ref},
              open(out, "w"), indent=1, sort_keys=True)
    w = max(len(n) for n in names)
    print(f"  {'query':{w}s} " + " ".join(f"{t:>8s}" for t in tags))
    flagged, noise = [], []
    for name in names:
        vals = [rounds[t]["queries"].get(name) for t in tags]
        cells = " ".join(f"{v:8.3f}" if v is not None else f"{'-':>8s}"
                         for v in vals)
        flag = ""
        cur = rounds[latest]["queries"].get(name)
        prior = [rounds[t]["queries"][name] for t in tags[:-1]
                 if name in rounds[t]["queries"]]
        # two bars: >1.5x the all-time best AND >1.25x the most
        # recent prior round — a 6-round-old lucky minimum alone is
        # not evidence of a regression introduced THIS round
        if (cur is not None and prior
                and cur > 1.5 * drift * min(prior)
                and cur > 1.25 * drift * prior[-1]
                and cur > 0.3 * drift):
            bval = boundary.get(name)
            # demote ONLY when the pre-change epoch was already
            # elevated AND the current value sits inside the normal
            # band RELATIVE to that epoch — a query regressed further
            # on top of an environmental shift still flags
            if (bval is not None and bval > 1.25 * drift * min(prior)
                    and cur <= 1.5 * drift * bval):
                flag = (f"env? (pre-change boundary epoch already "
                        f"{bval / min(prior):.2f}x best prior)")
                noise.append(name)
            elif touched is None or name in touched:
                flag = "REGRESSED"
                flagged.append(name)
            else:
                flag = "noise? (code untouched)"
                noise.append(name)
        print(f"  {name:{w}s} {cells}  {flag}")
    print(f"\n  {'total':{w}s} " +
          " ".join(f"{rounds[t]['total']:8.1f}" for t in tags))
    if spin_ref:
        print(f"  spin-normalized to the fastest observed box "
              f"(spin1s={spin_ref:.0f}); fingerprintless epochs stay raw")
    if drift != 1.0:
        print(f"  residual machine drift after spin normalization: latest "
              f"epoch's median per-query ratio vs best prior = {drift:.2f}x "
              f"- thresholds scaled accordingly")
    if touched is not None:
        print(f"  touched since last round boundary: {len(touched)} queries")
    else:
        print("  git state unreadable - gating ALL queries (strict)")
    print(f"  wrote {out}")
    if noise:
        print("noise-floor (>1.5x but code untouched):", ", ".join(noise))
    if flagged:
        print("REGRESSED (code-touched, >1.5x best prior):",
              ", ".join(flagged))
        return 1
    print("bench trend clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
