"""Measured weighted-lookup bench case (VERDICT-r4 #6 'Done' bar): a big
weighted Sum table with and without the fast-engine tiers that round 5
opened to weighted lookups (hot/cold split + superhot one-hot tier).

Run: PYTHONPATH=/root/repo python benchmarks/weighted_bench.py
Reference: weighted_model_forward/backward.cu, weighted_mp_index_calculation.cu.
"""
import os
import time

os.environ.setdefault("HCTR_TPU_EMB_DTYPE", "bfloat16")
os.environ.setdefault("HCTR_TPU_UCAP_FACTOR", "auto")
os.environ.setdefault("HCTR_TPU_UCAP_HEADROOM", "1.05")

import jax
import jax.numpy as jnp
import numpy as np

from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import Combiner_t, Optimizer_t
from hugectr_tpu.data.generator import power_law_keys
from hugectr_tpu.embedding.collection import EmbeddingCollection
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)

BATCH = 16384
VOCAB = 2_000_000
HOT = 20
EV = 128
STEPS = 20
HOT_ROWS = 131072
SPLIT_VOCAB = 16384
SUPERHOT = 1024


def run_case(tiers: bool) -> float:
    env = {
        "HCTR_TPU_HOT_ROWS": str(HOT_ROWS) if tiers else "0",
        "HCTR_TPU_SPLIT_VOCAB": str(SPLIT_VOCAB) if tiers else "0",
        "HCTR_TPU_SUPERHOT_ROWS": str(SUPERHOT) if tiers else "0",
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        rm = ResourceManager.create(num_devices=len(jax.devices()))
        t = EmbeddingTableConfig(
            name="t", max_vocabulary_size=VOCAB, ev_size=EV
        )
        lks = [
            LookupConfig(
                0, t, "f", "e", Combiner_t.Sum, HOT, sp_weight_name="w"
            )
        ]
        compiled = compile_plan(
            lks, ShardingPlan(strategy=[("mp", ["t"])]),
            num_shards=rm.data_parallel_size,
        )
        ebc = EmbeddingCollection(
            compiled, rm,
            OptParams(Optimizer_t.RowWiseAdaGrad, lr=0.01),
            dtype=jnp.bfloat16,
        )
        if tiers:
            assert compiled.merges, "tiers did not engage for weighted table"
        rng = np.random.default_rng(0)
        keys_np = power_law_keys(rng, VOCAB, BATCH * HOT, alpha=1.05).reshape(
            BATCH, HOT
        ).astype(np.int32)
        ebc.auto_unique_caps({"f": keys_np})
        tables = ebc.init(jax.random.key(0))
        state = ebc.init_optimizer(tables)
        feats = {"f": jax.device_put(keys_np, rm.batch_sharding())}
        w = {
            "w": jax.device_put(
                rng.random((BATCH, HOT)).astype(np.float32),
                rm.batch_sharding(),
            )
        }
        d = {"e": jax.device_put(
            rng.normal(size=(BATCH, EV)).astype(np.float32),
            rm.batch_sharding(),
        )}

        @jax.jit
        def step(tables, state):
            outs = ebc.forward(tables, feats, feature_weights=w)
            g = {"e": outs["e"] * 0 + d["e"]}  # keep fwd live
            return ebc.backward_and_update(
                tables, state, feats, g, jnp.asarray(0.01), jnp.asarray(1),
                feature_weights=w,
            )

        for _ in range(3):
            tables, state = step(tables, state)
        jax.block_until_ready(tables)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            tables, state = step(tables, state)
        jax.block_until_ready(tables)
        return STEPS * BATCH / (time.perf_counter() - t0)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    flat = run_case(tiers=False)
    print(f"weighted 2M-row table, untiered rowop: {flat:,.0f} ex/s")
    tiered = run_case(tiers=True)
    print(
        f"weighted with hot/cold/superhot tiers:  {tiered:,.0f} ex/s "
        f"({tiered / flat:.2f}x)"
    )


if __name__ == "__main__":
    main()
