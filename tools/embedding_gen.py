"""Generate random embedding snapshot tables for load-path testing.

Analog of the reference's ``tools/model_generation/embedding_gen.py``
(reference: tools/model_generation/embedding_gen.py:30-78), which writes a
random sparse-model file (key + slot + uniform(-sqrt(1/n), sqrt(1/n))
vector records) sized by a dash-separated per-table vocabulary list.

Here the output is this framework's snapshot layout — one
``sparse_<name>/emb_vector.npy`` per table — directly loadable via
``Model.load_params_from_files`` / ``Model.embedding_load``.

Usage:
    python tools/embedding_gen.py \
        --embedding-size 39884406-39043-17289 --dim 128 --output ./snap \
        [--names table0,table1,...] [--seed 0]
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def generate(embedding_sizes, dim, output, names=None, seed=0, chunk=1 << 20):
    os.makedirs(output, exist_ok=True)
    rng = np.random.default_rng(seed)
    if names is None:
        names = [f"table{i}" for i in range(len(embedding_sizes))]
    if len(names) != len(embedding_sizes):
        raise ValueError("--names count must match --embedding-size count")
    for name, n in zip(names, embedding_sizes):
        tdir = os.path.join(output, f"sparse_{name}")
        os.makedirs(tdir, exist_ok=True)
        bound = math.sqrt(1.0 / n)
        # chunked fill keeps peak memory bounded for 100M+-row tables
        arr = np.empty((n, dim), dtype=np.float32)
        for start in range(0, n, chunk):
            stop = min(n, start + chunk)
            arr[start:stop] = rng.uniform(
                -bound, bound, size=(stop - start, dim)
            ).astype(np.float32)
        np.save(os.path.join(tdir, "emb_vector.npy"), arr)
        print(f"wrote {tdir}/emb_vector.npy  [{n} x {dim}]")


def main():
    p = argparse.ArgumentParser(description="Generate random embedding snapshot")
    p.add_argument(
        "--embedding-size",
        type=str,
        default="39884406-39043-17289-7420-20263-3-7120-1543-63",
        help="dash-separated per-table vocabulary sizes",
    )
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--names", type=str, default=None, help="comma-separated table names")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    sizes = [int(s) for s in args.embedding_size.split("-") if s]
    names = args.names.split(",") if args.names else None
    generate(sizes, args.dim, args.output, names=names, seed=args.seed)


if __name__ == "__main__":
    main()
