"""Measured exchange-bytes table: dense-compression (unique-key) MP exchange
vs the per-key dense psum path for concat-combiner MP lookups.

Reproduces the PARITY §2.2 volume predictions (batch 8192, ev 128,
power-law alpha=1.05: H=20/2M-vocab 3.2x, H=100 4.5x, H=10/100k 7.6x) with
the REAL engine: capacities come from the engine's own auto measurement on a
real power-law batch, the compressed path is executed on an 8-way mesh, and
per-device exchange bytes are derived from the resulting static exchange
shapes (exchange sizes are static in an SPMD program — the shapes ARE the
measurement).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python benchmarks/dense_exchange_bytes.py

Reference: dense_model_parallel_embedding.hpp:61-110,
data_compression_operators.cu (PartitionAndUniqueOperator).
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("HCTR_TPU_UCAP_FACTOR", "auto")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import Combiner_t, Optimizer_t, INVALID_KEY
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)
from hugectr_tpu.embedding.collection import EmbeddingCollection
from hugectr_tpu.data.reader import power_law_keys

BATCH = 8192
EV = 128
DTYPE_BYTES = 2  # bf16 vectors at the bench operating point
CASES = [
    ("H=20 vocab=2M", 20, 2_000_000),
    ("H=100 vocab=2M", 100, 2_000_000),
    ("H=10 vocab=100k", 10, 100_000),
]


def main():
    rm = ResourceManager.create(num_devices=8)
    n = rm.data_parallel_size
    rng = np.random.default_rng(7)
    print(
        f"batch {BATCH} global, ev {EV}, bf16 vectors, {n}-way mesh, "
        "power-law alpha=1.05 keys; bytes = per-device vector-exchange "
        "volume per step (fwd + bwd)"
    )
    rows = []
    for name, hot, vocab in CASES:
        t = EmbeddingTableConfig(name="t", max_vocabulary_size=vocab, ev_size=EV)
        lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Concat, hot)]
        plan = ShardingPlan(strategy=[("mp", ["t"])])
        compiled = compile_plan(lookups, plan, num_shards=n)
        ebc = EmbeddingCollection(
            compiled, rm, OptParams(Optimizer_t.SGD, lr=0.1), dtype=jnp.bfloat16
        )
        keys = power_law_keys(rng, vocab, (BATCH, hot), 1.05).astype(np.int32)
        ebc.auto_unique_caps({"f": keys})
        (g,) = [g for g in ebc.plan.groups if g.is_model_parallel]
        cap = ebc.dense_exchange_caps.get(g.name, 0)
        assert cap > 0 and ebc._dense_exchange_ok(g), (name, cap)
        # execute the compressed path once to confirm it runs
        tables = ebc.init(jax.random.key(0))
        feats = {"f": jax.device_put(keys, rm.batch_sharding())}
        out = jax.jit(ebc.forward)(tables, feats)["e"]
        assert np.isfinite(np.asarray(out[:2], np.float32)).all()
        # per-device vector-exchange bytes per step (fwd + bwd):
        # dense psum path: reduce-scatter [Bg, H*ev] + all_gather [Bg, H*ev]
        w = hot * EV
        old = 2 * (n - 1) / n * BATCH * w * DTYPE_BYTES
        # compressed: 2 x all_to_all [n, C, ev] (grads ride as vectors too)
        new = 2 * (n - 1) / n * n * cap * EV * DTYPE_BYTES
        rows.append((name, cap, old / 2**20, new / 2**20, old / new))
    print(f"{'case':18s} {'C(meas)':>8s} {'psum MB':>9s} {'unique MB':>9s} {'x':>5s}")
    for name, cap, old, new, ratio in rows:
        print(f"{name:18s} {cap:8d} {old:9.1f} {new:9.1f} {ratio:5.1f}")


if __name__ == "__main__":
    main()
