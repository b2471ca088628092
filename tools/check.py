#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB with views over the same sf dir, and does a
STRICT comparison (sorted rows, exact values — stricter than any
plausible driver hash compare, so green here implies green there).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = sorted(got_rel.columns)
        got = [tuple(canon(v) for v in row) for row in
               got_rel.select(', '.join(f'"{c}"' for c in got_cols)).fetchall()]
        if name not in oracle:
            print(f"  {name:22s} rows-only: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failed.append(name)
            continue
        try:
            want_rel = con.sql(oracle[name])
            want_cols = sorted(want_rel.columns)
            want = [tuple(canon(v) for v in row) for row in
                    want_rel.select(', '.join(f'"{c}"' for c in want_cols)).fetchall()]
        except Exception as e:
            print(f"  {name:22s} ORACLE ERROR: {str(e).splitlines()[0][:120]}")
            failed.append(name)
            continue
        if got_cols != want_cols:
            print(f"  {name:22s} SCHEMA MISMATCH spark={got_cols} duck={want_cols}")
            failed.append(name)
            continue
        # The driver hashes typed values, so a DuckDB HUGEINT vs Spark
        # BIGINT mismatch fails there even when Python values compare
        # equal here (bit us in r1 with window SUM -> HUGEINT).
        # Int widths <=64 bits hash identically driver-side (r1: rnk
        # INTEGER vs BIGINT was hash-green); HUGEINT/DECIMAL do not.
        def norm_type(t):
            s = str(t)
            return "INT" if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else s
        got_types = {c: norm_type(t) for c, t in zip(got_rel.columns, got_rel.types)}
        want_types = {c: norm_type(t) for c, t in zip(want_rel.columns, want_rel.types)}
        type_diff = {c: (got_types[c], want_types[c]) for c in got_types
                     if got_types[c] != want_types.get(c)}
        if type_diff:
            print(f"  {name:22s} TYPE MISMATCH {type_diff}")
            failed.append(name)
            continue
        if sorted(got, key=repr) != sorted(want, key=repr):
            sg, sw = sorted(got, key=repr), sorted(want, key=repr)
            diff = next((i for i in range(min(len(sg), len(sw)))
                         if sg[i] != sw[i]), None)
            print(f"  {name:22s} VALUE MISMATCH rows {len(got)} vs {len(want)}"
                  + (f"; first diff row {diff}:\n    spark={sg[diff]}\n    duck ={sw[diff]}"
                     if diff is not None else ""))
            failed.append(name)
            continue
        print(f"  {name:22s} OK ({len(got)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
