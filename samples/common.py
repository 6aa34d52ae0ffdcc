"""Shared scaffolding for sample training scripts.

Each sample mirrors its reference counterpart (reference: samples/<name>/) but
runs out-of-the-box: if no dataset path is given, a synthetic Parquet dataset
with the sample's slot sizes is generated on first use.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t


def sample_args(name: str, extra=None) -> argparse.Namespace:
    """`extra`: optional callback adding sample-specific flags, e.g.
    lambda p: p.add_argument("--variant", ...)."""
    p = argparse.ArgumentParser(name)
    if extra is not None:
        extra(p)
    p.add_argument("--data_dir", default="", help="dataset dir (empty = synthetic)")
    p.add_argument("--batchsize", type=int, default=2048)
    p.add_argument("--max_iter", type=int, default=300)
    p.add_argument("--display", type=int, default=100)
    p.add_argument("--eval_interval", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--num_devices", type=int, default=0)
    p.add_argument(
        "--use_dynamic_hash_table", action="store_true",
        help="max_vocabulary_size=-1 dynamic tables (where the sample "
        "supports them; reference: samples/ftrl/dlrm_train_ftrl.py:187)",
    )
    return p.parse_args()


def make_reader(
    args,
    slot_size_array,
    nnz_array=None,
    label_dim=1,
    dense_dim=13,
    num_samples_per_file=16384,
    num_files=4,
):
    """Parquet reader over args.data_dir, generating synthetic data there
    (or in ./_sample_data/<name>) when absent."""
    data_dir = args.data_dir or "./_sample_data"
    train_list = os.path.join(data_dir, "file_list.txt")
    eval_list = os.path.join(data_dir, "file_list_test.txt")
    if not os.path.exists(train_list):
        os.makedirs(data_dir, exist_ok=True)
        hugectr.DataGenerator(
            hugectr.DataGeneratorParams(
                format=DataReaderType_t.Parquet,
                label_dim=label_dim,
                dense_dim=dense_dim,
                num_slot=len(slot_size_array),
                source=train_list,
                eval_source=eval_list,
                slot_size_array=list(slot_size_array),
                nnz_array=list(nnz_array or [1] * len(slot_size_array)),
                num_files=num_files,
                eval_num_files=max(num_files // 2, 1),
                num_samples_per_file=num_samples_per_file,
            )
        ).generate()
    return hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Parquet,
        source=[train_list],
        eval_source=eval_list,
        slot_size_array=list(slot_size_array),
    )
