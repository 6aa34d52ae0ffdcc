#!/usr/bin/env python
"""Criteo TSV -> Parquet preprocessing.

Analog of the reference tools/criteo_script: reads Criteo click-log TSV
(label + 13 int + 26 hex-categorical columns), applies log(x+3) to dense
features and mod-vocabulary hashing to categoricals, and writes the Parquet
layout our ParquetReader consumes (file_list.txt + _metadata.json).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser("criteo_preprocess")
    p.add_argument("--input", required=True, help="criteo .tsv / .txt (optionally .gz)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--vocab_cap", type=int, default=40_000_000)
    p.add_argument("--rows_per_file", type=int, default=2_000_000)
    p.add_argument("--max_rows", type=int, default=0)
    p.add_argument(
        "--frequency-remap",
        action="store_true",
        help="second pass that renumbers each categorical vocabulary by "
        "descending frequency (id 0 = most frequent). Enables the "
        "frequent/infrequent hot/cold embedding split "
        "(HCTR_TPU_HOT_ROWS / Solver.hot_rows) to capture most key "
        "instances in the replicated hot prefix — affects only speed, "
        "never results (analog of HybridEmbedding's frequency-ordered "
        "category mapping).",
    )
    a = p.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    os.makedirs(a.out_dir, exist_ok=True)
    data_dir = os.path.join(a.out_dir, "file_list.txt.d")
    os.makedirs(data_dir, exist_ok=True)

    dense_cols = [f"I{i}" for i in range(1, 14)]
    cat_cols = [f"C{i}" for i in range(1, 27)]
    names = ["label"] + dense_cols + cat_cols

    reader = pd.read_csv(
        a.input,
        sep="\t",
        names=names,
        header=None,
        chunksize=a.rows_per_file,
        dtype={c: "string" for c in cat_cols},
    )
    file_stats, paths = [], []
    total = 0
    for fi, chunk in enumerate(reader):
        if a.max_rows and total >= a.max_rows:
            break
        lab = chunk["label"].fillna(0).to_numpy(np.float32)
        dense = np.stack(
            [
                np.log(chunk[c].fillna(0).to_numpy(np.float64).clip(min=-2) + 3.0)
                for c in dense_cols
            ],
            axis=1,
        ).astype(np.float32)
        cats = np.stack(
            [
                (
                    chunk[c]
                    .fillna("0")
                    .apply(lambda s: int(s, 16) if s else 0)
                    .to_numpy(np.int64)
                    % a.vocab_cap
                )
                for c in cat_cols
            ],
            axis=1,
        )
        cols = [pa.array(lab)]
        colnames = ["label0"]
        for i in range(13):
            cols.append(pa.array(dense[:, i]))
            colnames.append(f"C{i}")
        for i in range(26):
            cols.append(pa.array(cats[:, i].astype(np.int32)))
            colnames.append(f"CAT{i}")
        fname = f"part_{fi}.parquet"
        pq.write_table(pa.table(cols, names=colnames), os.path.join(data_dir, fname))
        n = len(chunk)
        file_stats.append({"file_name": fname, "num_rows": n})
        paths.append(os.path.join(data_dir, fname))
        total += n
        print(f"wrote {fname} rows={n} total={total}")

    meta = {
        "file_stats": file_stats,
        "labels": [{"col_name": "label0", "index": 0}],
        "conts": [{"col_name": f"C{i}", "index": 1 + i} for i in range(13)],
        "cats": [{"col_name": f"CAT{i}", "index": 14 + i} for i in range(26)],
    }
    with open(os.path.join(data_dir, "_metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(a.out_dir, "file_list.txt"), "w") as f:
        f.write(f"{len(paths)}\n")
        f.writelines(p_ + "\n" for p_ in paths)
    print(f"done: {total} rows, {len(paths)} files")

    if a.frequency_remap:
        _frequency_remap(paths)


def _frequency_remap(paths):
    """Renumber categorical ids by descending frequency (two passes over
    the written Parquet files; columns CAT0..CAT25)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    print("frequency remap: counting ...")
    counts = {}
    for path in paths:
        tbl = pq.read_table(path)
        for name in tbl.column_names:
            if not name.startswith("CAT"):
                continue
            col = tbl[name].to_numpy(zero_copy_only=False)
            u, c = np.unique(col, return_counts=True)
            acc = counts.setdefault(name, {})
            for k, n in zip(u, c):
                acc[int(k)] = acc.get(int(k), 0) + int(n)
    remap = {}
    for name, acc in counts.items():
        order = sorted(acc.items(), key=lambda kv: -kv[1])
        remap[name] = {k: i for i, (k, _) in enumerate(order)}
    print("frequency remap: rewriting ...")
    for path in paths:
        tbl = pq.read_table(path)
        cols, names = [], []
        for name in tbl.column_names:
            if name.startswith("CAT"):
                col = tbl[name].to_numpy(zero_copy_only=False)
                m = remap[name]
                cols.append(
                    pa.array(
                        np.vectorize(m.__getitem__, otypes=[np.int32])(col)
                    )
                )
            else:
                cols.append(tbl[name])
            names.append(name)
        pq.write_table(pa.table(cols, names=names), path, row_group_size=65536)
    print("frequency remap: done")


if __name__ == "__main__":
    main()
