"""DLRM-DCNv2 MLPerf flagship (reference: samples/dlrm/train.py): embedding
collection (26 multi-hot tables, ev 128) + bottom MLP + DCNv2 low-rank cross
+ top MLP, AdaGrad, AUC 0.80275 early stop. Runs on synthetic power-law data
(for real Criteo, preprocess with tools/criteo_preprocess.py and build the
model via hugectr_tpu.tools.flagship with a Raw/Parquet DataReaderParams)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import hugectr_tpu as hugectr
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

p = argparse.ArgumentParser("dlrm_dcnv2")
p.add_argument("--batchsize", type=int, default=8192)
p.add_argument("--max_iter", type=int, default=1000)
p.add_argument("--display", type=int, default=100)
p.add_argument("--eval_interval", type=int, default=1000)
p.add_argument("--lr", type=float, default=0.005)
p.add_argument("--vocab_cap", type=int, default=2_000_000)
p.add_argument("--num_devices", type=int, default=0)
p.add_argument("--use_mixed_precision", action="store_true")
# multi-node analog (reference: samples/dcn/dcn_2node_*.py, DLRM multi-node
# configs): >1 slices build a hierarchical ("dcn","ici") mesh; Hierarchical
# comm does the pooled reduce-scatter intra-slice first so the slow DCN
# link carries 1/ici of the volume
p.add_argument("--num_slices", type=int, default=1)
p.add_argument(
    "--comm_strategy", default="uniform", choices=["uniform", "hierarchical"]
)
args = p.parse_args()

rm = ResourceManager.create(
    num_devices=args.num_devices, num_slices=args.num_slices
)
model = build_dlrm_dcnv2(
    rm,
    batchsize=args.batchsize,
    vocab_cap=args.vocab_cap,
    lr=args.lr,
    use_mixed_precision=args.use_mixed_precision,
    comm_strategy=args.comm_strategy,
)
if __name__ == "__main__":
    model.summary()
    model.fit(
        max_iter=args.max_iter,
        display=args.display,
        eval_interval=args.eval_interval,
    )
