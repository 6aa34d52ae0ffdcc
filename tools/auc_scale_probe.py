"""AUC finalize at MLPerf eval-set scale: time the exact tie-aware rank-sum
AUC over buffers up to the Criteo 89,137,319-sample eval set size.

The reference's AUC runs a multi-GPU partitioned sort + trapezoid
(metrics.cu:118-366); here one jitted sort-based pass (metrics.auc_score).
Usage: PYTHONPATH=/root/repo python tools/auc_scale_probe.py
"""
import time

import jax
import numpy as np

from hugectr_tpu.metrics.metrics import auc_score, auc_score_large

SIZES = [5_242_880, 16_777_216, 89_137_319]  # bench sweep, 16M, full MLPerf


def main():
    print(f"platform: {jax.devices()[0].platform}")
    for n in SIZES:
        rng = np.random.default_rng(0)
        labels = jax.device_put((rng.random(n) > 0.5).astype(np.float32))
        preds = jax.device_put(
            (np.asarray(labels) * 0.3 + rng.random(n)).astype(np.float32)
        )
        for name, fn in (("sort-exact", auc_score), ("binned", auc_score_large)):
            if name == "sort-exact" and n > 20_000_000:
                print(f"n={n:>11,}  {name}: skipped (device fault at 89M)")
                continue
            a = fn(preds, labels)  # compile
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            a = fn(preds, labels)
            jax.block_until_ready(a)
            dt = time.perf_counter() - t0
            print(
                f"n={n:>11,}  {name:10s} auc={float(a):.5f} "
                f"finalize={dt*1e3:9.1f} ms"
            )


if __name__ == "__main__":
    main()
