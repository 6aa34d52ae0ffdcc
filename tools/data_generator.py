#!/usr/bin/env python
"""Synthetic dataset generator CLI.

Analog of the reference data generator tool
(tools/data_generator/dcn_parquet_generate_train.py and the
hugectr.tools.DataGenerator pybind): writes Parquet or Raw datasets with
uniform or power-law keys.

Example (DCN quickstart parity, README.md:59-152 of the reference):
  python tools/data_generator.py --format parquet \
      --source ./dcn_data/file_list.txt --eval_source ./dcn_data/file_list_test.txt \
      --slot_size_array 39884,39043,17289,7420,20263,3,7120,1543,63,38532 \
      --num_files 8 --num_samples_per_file 40960
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hugectr_tpu import DataGenerator, DataGeneratorParams
from hugectr_tpu.core.types import DataReaderType_t, PowerLaw_t


def main():
    p = argparse.ArgumentParser("data_generator")
    p.add_argument("--format", default="parquet", choices=["parquet", "raw", "raw_async"])
    p.add_argument("--source", required=True)
    p.add_argument("--eval_source", required=True)
    p.add_argument("--slot_size_array", required=True)
    p.add_argument("--nnz_array", default="")
    p.add_argument("--label_dim", type=int, default=1)
    p.add_argument("--dense_dim", type=int, default=13)
    p.add_argument("--num_files", type=int, default=8)
    p.add_argument("--eval_num_files", type=int, default=2)
    p.add_argument("--num_samples_per_file", type=int, default=40960)
    p.add_argument("--num_samples", type=int, default=0, help="raw: total rows")
    p.add_argument("--eval_num_samples", type=int, default=0)
    p.add_argument("--dist", default="powerlaw", choices=["powerlaw", "uniform"])
    p.add_argument(
        "--power_law_type",
        default="specific",
        choices=["long", "medium", "short", "specific"],
    )
    p.add_argument("--alpha", type=float, default=1.2)
    p.add_argument("--float_label_dense", action="store_true")
    p.add_argument("--i64_input_key", action="store_true")
    a = p.parse_args()

    slots = [int(x) for x in a.slot_size_array.split(",")]
    nnz = [int(x) for x in a.nnz_array.split(",")] if a.nnz_array else [1] * len(slots)
    params = DataGeneratorParams(
        format=DataReaderType_t(a.format),
        label_dim=a.label_dim,
        dense_dim=a.dense_dim,
        num_slot=len(slots),
        i64_input_key=a.i64_input_key,
        source=a.source,
        eval_source=a.eval_source,
        slot_size_array=slots,
        nnz_array=nnz,
        dist_type=a.dist,
        power_law_type=PowerLaw_t(a.power_law_type),
        alpha=a.alpha,
        num_files=a.num_files,
        eval_num_files=a.eval_num_files,
        num_samples_per_file=a.num_samples_per_file,
        num_samples=a.num_samples,
        eval_num_samples=a.eval_num_samples,
        float_label_dense=a.float_label_dense,
    )
    DataGenerator(params).generate()
    print(f"wrote train={a.source} eval={a.eval_source}")


if __name__ == "__main__":
    main()
