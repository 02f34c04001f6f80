"""Generate the emulated-sf1.0 inputs used by OPTIMIZATION_r06.md.

10 disjoint-vocabulary copies of the sf0.1 documents (replica k
prefixes every word with ``r{k}``), preserving the planted
near-dup/pair structure per copy instead of fabricating 10x duplicate
families, plus 10 dimension-permuted copies of the embeddings
(seed 42).  Output: OUTDIR/documents.parquet, OUTDIR/embeddings.parquet.

Usage: python tools/gen_scaled_docs.py [SRC_SF_DIR] [OUTDIR] [COPIES]
Defaults: /root/testdata/sf0.1  /tmp/sf_emul10  10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_emul10"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    d = pq.read_table(f"{src}/documents.parquet")
    texts = d.column("text").to_pylist()
    ids = d.column("doc_id").to_pylist()
    lang = d.column("lang").to_pylist()
    srcs = d.column("source").to_pylist()
    nch = d.column("n_chars").to_pylist()
    n_base = len(texts)
    T, I, L, S, N = [], [], [], [], []
    for k in range(copies):
        for t, i, lg, s, n in zip(texts, ids, lang, srcs, nch):
            if t is None:
                tt = None
            elif k == 0:
                tt = t
            else:
                tt = " ".join(f"r{k}{w}" for w in t.split())
            T.append(tt)
            I.append(i + n_base * k)
            L.append(lg)
            S.append(s)
            N.append(len(tt) if tt is not None else n)
    pq.write_table(
        pa.table({"doc_id": pa.array(I, pa.int64()), "text": T,
                  "lang": L, "source": S,
                  "n_chars": pa.array(N, pa.int32())}),
        f"{out}/documents.parquet")

    e = pq.read_table(f"{src}/embeddings.parquet")
    emb = np.array(e.column("embedding").to_pylist(), dtype=np.float32)
    vid = np.array(e.column("vec_id").to_pylist())
    lab = e.column("label").to_pylist()
    rng = np.random.default_rng(42)
    E, V, B = [], [], []
    for k in range(copies):
        perm = np.arange(emb.shape[1]) if k == 0 \
            else rng.permutation(emb.shape[1])
        E.append(emb[:, perm])
        V.append(vid + len(vid) * k)
        B.extend(lab)
    E = np.concatenate(E)
    V = np.concatenate(V)
    pq.write_table(
        pa.table({"vec_id": pa.array(V, pa.int64()),
                  "embedding": pa.array([r for r in E.tolist()],
                                        pa.list_(pa.float32())),
                  "label": B}),
        f"{out}/embeddings.parquet")
    print(f"wrote {len(T)} docs, {E.shape} embeddings under {out}")


if __name__ == "__main__":
    main()
