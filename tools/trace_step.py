"""Trace one train or eval step at the bench operating point; print top leaf
ops (device-side) with fusion metadata mapping.

Usage: PYTHONPATH=/root/repo python tools/trace_step.py [train|eval]
"""
import glob
import gzip
import json
import os
import sys
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
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/hugectr_tpu_jaxcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

mode = sys.argv[1] if len(sys.argv) > 1 else "eval"
batch = 16384
rm = ResourceManager.create(num_devices=len(jax.devices()))
model = build_dlrm_dcnv2(
    rm, batchsize=batch, vocab_cap=2_000_000, synthetic_batches=8,
    use_mixed_precision=True, ev_size=128, max_eval_batches=8,
)
for _ in range(3):
    model.train()

source, _ = model._eval_batches()
batches = list(source)
loss = None
if mode == "eval":
    for b in batches[:2]:
        loss, _, _ = model._eval_step(model.state, b)
jax.block_until_ready(loss if loss is not None else model.state["dense_params"])

tdir = "/tmp/hctr_trace_" + mode
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    if mode == "eval":
        for b in batches:
            loss, _, _ = model._eval_step(model.state, b)
        jax.block_until_ready(loss)
    else:
        for _ in range(8):
            loss = model.train_async()
        jax.block_until_ready(loss)

# fusion-name mapping from compiled HLO metadata
fn = model._eval_step if mode == "eval" else model._train_step
# parse trace
files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    with gzip.open(f, "rt") as fh:
        ev.extend(json.load(fh).get("traceEvents", []))
# device-side complete events
durs = {}
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        pid = e.get("pid", 0)
        name = e.get("name", "")
        # TPU device lanes have 'XLA Op' style names; accumulate by name
        args = e.get("args", {})
        hlo = args.get("long_name") or args.get("hlo_op") or name
        key = name
        durs.setdefault(key, [0, 0])
        durs[key][0] += e["dur"]
        durs[key][1] += 1
total = sorted(durs.items(), key=lambda kv: -kv[1][0])
n_steps = 8
print(f"top leaves ({mode}, {n_steps} steps, us total / per-step ms):")
for name, (d, c) in total[:40]:
    if d < 3000:
        break
    print(f"  {d/1000/n_steps:8.2f} ms  x{c:<4d} {name[:110]}")
