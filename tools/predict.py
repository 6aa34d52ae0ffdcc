"""Batch inference CLI: graph JSON + snapshot -> predictions file.

Analog of the reference's `tools/criteo_predict/criteo2predict.py`, which
packages batches into inference requests for the (since-removed) inference
server. Here the trained model itself runs the forward pass: rebuild from
`Model.graph_to_json` output, load a `download_params_to_files` snapshot,
sweep the dataset, and write the prediction array.

Usage:
    python tools/predict.py --graph graph.json --snapshot snap_iter1000 \
        --data-reader-type parquet --source ./data/file_list_test.txt \
        --output preds.npy [--max-batches N]

Multi-task models write one array per label into a single .npz.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import hugectr_tpu as hugectr  # noqa: E402
from hugectr_tpu.core.types import DataReaderType_t  # noqa: E402


def predict(
    graph_path: str,
    snapshot_dir: str,
    reader_params: "hugectr.DataReaderParams",
    max_batches: int = 0,
    model: "hugectr.Model" = None,
    resource_manager=None,
):
    """Returns {label_name: np.ndarray[N, dim]} of predictions."""
    if model is None:
        model = hugectr.Model.construct_from_json(
            graph_path,
            reader_params=reader_params,
            resource_manager=resource_manager,
        )
        model.load_params_from_files(snapshot_dir)
    outs = {spec.label_name: [] for spec in model.network.loss_specs}
    source, feeder = model._eval_batches()
    n = 0
    for batch in source:
        if max_batches and n >= max_batches:
            break
        _loss, preds, _labels = model._eval_step(model.state, batch)
        for name in outs:
            outs[name].append(np.asarray(preds[name]))
        n += 1
    if feeder is not None:
        feeder.stop()
    return {k: np.concatenate(v, axis=0) for k, v in outs.items() if v}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--graph", required=True, help="graph_to_json output")
    ap.add_argument(
        "--snapshot", required=True, help="download_params_to_files directory"
    )
    ap.add_argument(
        "--data-reader-type",
        default="parquet",
        choices=[t.value for t in DataReaderType_t],
    )
    ap.add_argument("--source", required=True, help="eval file list / file")
    ap.add_argument(
        "--slot-size-array", default="", help="comma-separated per-slot vocabs"
    )
    ap.add_argument("--num-samples", type=int, default=0, help="raw formats")
    ap.add_argument("--max-batches", type=int, default=0, help="0 = all")
    ap.add_argument("--output", default="preds.npy")
    args = ap.parse_args(argv)

    rp = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t(args.data_reader_type),
        source=[],
        eval_source=args.source,
        eval_num_samples=args.num_samples,
        slot_size_array=(
            [int(x) for x in args.slot_size_array.split(",")]
            if args.slot_size_array
            else []
        ),
    )
    preds = predict(args.graph, args.snapshot, rp, max_batches=args.max_batches)
    if len(preds) == 1:
        (arr,) = preds.values()
        np.save(args.output, arr)
    else:
        np.savez(args.output, **preds)
    total = sum(a.shape[0] for a in preds.values())
    print(f"wrote {args.output}: {total} rows across {len(preds)} head(s)")


if __name__ == "__main__":
    main()
