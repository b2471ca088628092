#!/usr/bin/env python3
"""Generate an sf1 rehearsal dataset (10x sf0.1) for the one-off
scale rehearsal (r7 verdict #7): documents (50k rows) and embeddings
(20k rows) shaped like the driver's sf0.1 fixtures — same schema,
empirical vocab/length/lang/source distributions, a similar exact-dup
rate, and 10 unit-norm embedding clusters seeded from the sf0.1 label
centroids. Deterministic (seed 42). The data itself is NOT committed;
regenerate with:

    python3 tools/gen_sf1.py /root/testdata/sf0.1 /tmp/sf1

The rehearsal only needs workload VOLUME with the same distributional
shape — it measures how each operator family's runtime scales, not
oracle parity (that is the sf0.01 correctness gate's job).
"""
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOCS_N = 50000
EMB_N = 20000
DUP_RATE = 0.002
SEED = 42


def main(src, out):
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    con = duckdb.connect()

    # --- documents ---
    toks = con.sql(
        f"SELECT unnest(string_split(text, ' ')) AS t FROM '{src}/documents.parquet'"
    ).df()["t"].values
    vocab, counts = np.unique(toks, return_counts=True)
    p = counts / counts.sum()
    lens = con.sql(
        f"SELECT len(string_split(text, ' ')) AS l FROM '{src}/documents.parquet'"
    ).df()["l"].values
    langs, lcnt = np.unique(con.sql(
        f"SELECT lang FROM '{src}/documents.parquet'").df()["lang"].values,
        return_counts=True)
    sources, scnt = np.unique(con.sql(
        f"SELECT source FROM '{src}/documents.parquet'").df()["source"].values,
        return_counts=True)

    doc_lens = rng.choice(lens, size=DOCS_N)
    all_words = rng.choice(vocab, size=int(doc_lens.sum()), p=p)
    texts, off = [], 0
    for i in range(DOCS_N):
        L = int(doc_lens[i])
        if i > 0 and rng.random() < DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(all_words[off:off + L]))
        off += L
    docs = pa.table({
        "doc_id": pa.array(np.arange(DOCS_N), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(langs, size=DOCS_N, p=lcnt / lcnt.sum())),
        "source": pa.array(rng.choice(sources, size=DOCS_N, p=scnt / scnt.sum())),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, f"{out}/documents.parquet")

    # --- embeddings ---
    emb = con.sql(
        f"SELECT label, embedding FROM '{src}/embeddings.parquet'").df()
    mats = {lab: np.stack(g["embedding"].values)
            for lab, g in emb.groupby("label")}
    centers = {lab: m.mean(axis=0) for lab, m in mats.items()}
    sigmas = {lab: (m - centers[lab]).std() for lab, m in mats.items()}
    n_lab = len(centers)
    labels = rng.integers(0, n_lab, size=EMB_N)
    vecs = np.empty((EMB_N, 64), dtype=np.float64)
    for i in range(EMB_N):
        lab = int(labels[i])
        v = centers[lab] + rng.normal(0.0, sigmas[lab], size=64)
        vecs[i] = v / np.linalg.norm(v)
    embt = pa.table({
        "vec_id": pa.array(np.arange(EMB_N), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(embt, f"{out}/embeddings.parquet")
    print(f"wrote {out}: documents={DOCS_N} embeddings={EMB_N}")


if __name__ == "__main__":
    main(*sys.argv[1:])
