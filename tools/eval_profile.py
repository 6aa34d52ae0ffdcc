"""Round-5 eval-step attribution: isolate fwd / metric-write / finalize cost.

Usage: python tools/eval_profile.py  (real chip; bench operating point)
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

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/hugectr_tpu_jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

batch = 16384
rm = ResourceManager.create(num_devices=len(jax.devices()))
model = build_dlrm_dcnv2(
    rm, batchsize=batch, vocab_cap=2_000_000, synthetic_batches=32,
    use_mixed_precision=True, ev_size=128, max_eval_batches=64,
)
for _ in range(3):
    model.train()

source, _ = model._eval_batches()
batches = list(source)
print(f"{len(batches)} eval batches cached")

# 1. pure eval_step (fwd only), discard outputs
loss = None
for b in batches[:4]:
    loss, _, _ = model._eval_step(model.state, b)  # compile
jax.block_until_ready(loss)
t0 = time.perf_counter()
for _ in range(2):
    for b in batches:
        loss, preds, labels = model._eval_step(model.state, b)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / (2 * len(batches))
print(f"eval_step alone: {dt*1e3:.2f} ms/batch = {batch/dt:,.0f} ex/s")

# 2. eval_step + metric write
model.metrics.reset()
spec = model.network.loss_specs[0]
for b in batches[:2]:
    loss, preds, labels = model._eval_step(model.state, b)
    model.metrics.update(preds[spec.label_name], labels[spec.label_name], loss=loss)
jax.block_until_ready(model.metrics._preds)
model.metrics.reset()
t0 = time.perf_counter()
for _ in range(2):
    model.metrics._nb = 0
    for b in batches:
        loss, preds, labels = model._eval_step(model.state, b)
        model.metrics.update(
            preds[spec.label_name], labels[spec.label_name], loss=loss
        )
jax.block_until_ready(model.metrics._preds)
dt = (time.perf_counter() - t0) / (2 * len(batches))
print(f"eval_step+write: {dt*1e3:.2f} ms/batch = {batch/dt:,.0f} ex/s")

# 3. finalize cost at this buffer size
t0 = time.perf_counter()
vals = model.metrics.finalize()
dt = time.perf_counter() - t0
print(f"finalize({model.metrics.capacity:,} buf): {dt*1e3:.1f} ms  {vals}")

# 4. full eval() (includes reset + finalize + task metrics)
model.eval()
t0 = time.perf_counter()
model.eval()
dt = time.perf_counter() - t0
n = model.solver.max_eval_batches
print(f"model.eval(): {dt:.3f}s for {n} batches = {n*batch/dt:,.0f} ex/s")
