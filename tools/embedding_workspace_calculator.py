#!/usr/bin/env python
"""Embedding memory sizing helper.

Analog of the reference tools/embedding_workspace_calculator: given table
vocab sizes, embedding dims and the optimizer, prints per-device HBM usage
for a mesh size (weights + optimizer state + step working set).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hugectr_tpu.core.types import Optimizer_t

STATE_SLOTS = {
    Optimizer_t.SGD: 0,
    Optimizer_t.MomentumSGD: 1,
    Optimizer_t.Nesterov: 1,
    Optimizer_t.AdaGrad: 1,
    Optimizer_t.RMSProp: 1,
    Optimizer_t.Adam: 2,
    Optimizer_t.FTRL: 2,
}


def main():
    p = argparse.ArgumentParser("embedding_workspace_calculator")
    p.add_argument("--vocab", type=str, required=True, help="comma list of vocab sizes")
    p.add_argument("--ev", type=str, required=True, help="comma list (or one) of ev sizes")
    p.add_argument("--hotness", type=str, default="", help="comma list of hotness")
    p.add_argument("--optimizer", default="adagrad")
    p.add_argument("--num_devices", type=int, default=1)
    p.add_argument("--batchsize", type=int, default=8192)
    p.add_argument("--dtype_bytes", type=int, default=4)
    a = p.parse_args()

    vocabs = [int(x) for x in a.vocab.split(",")]
    evs = [int(x) for x in a.ev.split(",")]
    if len(evs) == 1:
        evs = evs * len(vocabs)
    hot = [int(x) for x in a.hotness.split(",")] if a.hotness else [1] * len(vocabs)
    n_state = STATE_SLOTS[Optimizer_t(a.optimizer)]
    P = a.num_devices
    B = a.batchsize

    rows_total = sum(-(-v // P) for v in vocabs)
    weights = sum(-(-v // P) * e for v, e in zip(vocabs, evs)) * a.dtype_bytes
    state = weights * n_state
    k = B * sum(hot)
    # step working set: fwd gather + bwd sorted grads + update gathers
    ws = (3 * k * max(evs) + 2 * k) * a.dtype_bytes

    gb = 1 << 30
    print(f"devices={P} tables={len(vocabs)} local rows={rows_total:,}")
    print(f"  weights / device       : {weights / gb:8.2f} GiB")
    print(f"  optimizer state        : {state / gb:8.2f} GiB ({a.optimizer})")
    print(f"  step working set (~)   : {ws / gb:8.2f} GiB (batch {B}, K={k:,})")
    print(f"  TOTAL                  : {(weights + state + ws) / gb:8.2f} GiB")


if __name__ == "__main__":
    main()
