"""Full-scale dryrun (VERDICT r3 real-vocab regime): UNCAPPED MLPerf DLRM-DCNv2 (4x40M-row tables, 87.8M rows total)
on an 8-way virtual CPU mesh — the real-vocabulary operating regime the
vocab-capped bench cannot reach on one chip."""
import os, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
for k, v in (("HCTR_TPU_EMB_DTYPE", "bfloat16"), ("HCTR_TPU_EMB_STATE_DTYPE", "bfloat16"),
             ("HCTR_TPU_UCAP_FACTOR", "auto"), ("HCTR_TPU_HOT_ROWS", "131072"),
             ("HCTR_TPU_SPLIT_VOCAB", "16384"), ("HCTR_TPU_SUPERHOT_ROWS", "1024"),
             ("HCTR_BENCH_OPT", "rowwise_adagrad")):
    os.environ.setdefault(k, v)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/hugectr_tpu_jaxcache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2, MLPERF_TABLE_SIZES

t0 = time.time()
rm = ResourceManager.create(num_devices=8)
model = build_dlrm_dcnv2(rm, batchsize=64, vocab_cap=40_000_000,
                         synthetic_batches=2, ev_size=128)
print(f"build+init {time.time()-t0:.0f}s; rows total {sum(min(v,40_000_000) for v in MLPERF_TABLE_SIZES):,}", flush=True)
t1 = time.time()
loss = model.train()
print(f"first step (compile+run) {time.time()-t1:.0f}s loss {loss}", flush=True)
assert np.isfinite(loss)
t2 = time.time()
loss2 = model.train()
print(f"second step {time.time()-t2:.0f}s loss {loss2}", flush=True)
assert np.isfinite(loss2)
print("FULL-SCALE 40M-ROW 8-WAY STEP OK", flush=True)
