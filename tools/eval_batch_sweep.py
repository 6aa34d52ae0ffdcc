"""Eval-batch sweep: does a larger batchsize_eval amortize the eval
forward's fixed costs (sorts, counts build, dispatch)?

Usage: PYTHONPATH=/root/repo python tools/eval_batch_sweep.py
"""
import os
import time

os.environ.setdefault("HCTR_TPU_EMB_DTYPE", "bfloat16")
os.environ.setdefault("HCTR_TPU_EMB_STATE_DTYPE", "bfloat16")
os.environ.setdefault("HCTR_TPU_SEGSUM", "xla")
os.environ.setdefault("HCTR_TPU_UCAP_FACTOR", "auto")
os.environ.setdefault("HCTR_TPU_UCAP_HEADROOM", "1.05")
os.environ.setdefault("HCTR_BENCH_OPT", "rowwise_adagrad")
os.environ.setdefault("HCTR_TPU_HOT_ROWS", "131072")
os.environ.setdefault("HCTR_TPU_SPLIT_VOCAB", "16384")
os.environ.setdefault("HCTR_TPU_SUPERHOT_ROWS", "1024")
os.environ.setdefault("HCTR_TPU_AUC_EXACT_MAX", "1048576")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/hugectr_tpu_jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import hugectr_tpu as hugectr  # noqa: F401
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2


def main():
    rm = ResourceManager.create(num_devices=len(jax.devices()))
    for eval_batch in (16384, 32768, 65536):
        # same train batch; eval sweep sized to ~5.2M samples per pass
        sweep = 5_242_880 // eval_batch
        model = build_dlrm_dcnv2(
            rm, batchsize=16384, vocab_cap=2_000_000, synthetic_batches=16,
            use_mixed_precision=True, ev_size=128, max_eval_batches=sweep,
        )
        model.solver.batchsize_eval = eval_batch
        # rebuild eval plumbing at the new eval batch
        model.eval_batch_spec = None
        import dataclasses

        model.eval_batch_spec = dataclasses.replace(
            model.batch_spec, batch_size=eval_batch
        )
        model.eval_reader = model._make_reader(train=False)
        from hugectr_tpu.metrics.metrics import MetricAccumulator

        model.metrics = MetricAccumulator(
            model.solver.metrics_spec, batch_size=eval_batch,
            max_batches=sweep, label_dim=1,
        )
        model._eval_cache = None
        model._eval_cache_stacked = (None, 0)
        for _ in range(2):
            model.train()
        model.eval()  # compile + cache
        t0 = time.perf_counter()
        model.eval()
        dt = time.perf_counter() - t0
        n = sweep * eval_batch
        print(f"eval_batch {eval_batch:6d}: {n/dt:,.0f} ex/s "
              f"({dt:.2f}s for {sweep} batches)")
        del model
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
