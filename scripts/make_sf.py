"""Synthesize an sf-style testdata dir at arbitrary scale (deterministic).

The driver's correctness gate runs at sf0.01 and our local full gate at
sf0.1; the round-3 scale-robustness sweep showed planted-oracle bugs only
appear when natural-duplicate density rises with corpus size. This script
builds a larger `documents` + `embeddings` pair in the exact testdata
schema (other tables symlink to a base sf dir) so the dedup/ANN planted
family can be gated at ~sf1 locally each round (VERDICT r3 next-step #9).

Usage: python scripts/make_sf.py OUT_DIR [--docs 50000] [--embs 20000]
       [--base /root/testdata/sf0.1] [--seed 4]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events".split()
)


def gen_documents(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(
        [f"w{i:04d}" for i in range(4000)]
        + ["the", "and", "of", "to", "data", "stream", "model"],
        dtype=object,
    )
    p = 1.0 / (np.arange(len(vocab)) + 8.0)
    p /= p.sum()
    lengths = rng.integers(12, 80, size=n)
    flat = rng.choice(vocab, size=int(lengths.sum()), p=p)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts = [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n)]
    # natural exact duplicates (~0.5%): the density that broke naive
    # planted predictions at sf0.1 in round 3 — keep them in the gate input
    nd = n // 200
    for j, s in enumerate(rng.integers(0, n - nd, size=nd)):
        texts[n - nd + j] = texts[int(s)]
    langs = rng.choice(
        np.array(["en", "de", "es", "fr"], dtype=object), size=n,
        p=[0.55, 0.15, 0.15, 0.15],
    )
    sources = np.array(
        [f"src_{int(i)}" for i in rng.integers(0, 97, size=n)], dtype=object
    )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(
                np.fromiter((len(t) for t in texts), np.int64, n)
            ),
        }
    )


def gen_embeddings(n: int, seed: int, dim: int = 64, k: int = 10) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    centers = rng.normal(0, 1, size=(k, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n).astype(np.int32)
    vecs = centers[labels] + rng.normal(0, 0.25, size=(n, dim)).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--embs", type=int, default=20_000)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--seed", type=int, default=4)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(gen_documents(args.docs, args.seed), out / "documents.parquet")
    pq.write_table(gen_embeddings(args.embs, args.seed), out / "embeddings.parquet")
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"{args.base}/{t}.parquet", dst)
    print(f"wrote {args.out}: documents={args.docs} embeddings={args.embs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
