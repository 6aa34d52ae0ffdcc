"""Randomized cross-engine equivalence sweep.

Property test for knob interactions: the SAME randomly-drawn model (tables,
hotness, combiners, optimizers, dp/mp placement, occasional dynamic table)
trained on the SAME batches must produce the same forward outputs and final
tables under ANY engine configuration — one-hot MXU engine on/off, hot/cold/
superhot tiers, unique-cap windows (fixed + auto-measured), segsum backend,
scatter lowering, dense-update threshold, partial placement, 1-way vs 8-way
mesh, the unique-key (dense-compression) MP exchange with caps small enough
to force its overflow cond-fallback, weighted (sp_weight) lookups. Every
knob is individually oracle-tested elsewhere; this sweep covers
their combinations (reference analog: utest embedding_collection configs
sweep, test/utest/embedding_collection/test_embedding_collection_v2.cu).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugectr_tpu.core.types import Combiner_t, Optimizer_t, INVALID_KEY
from hugectr_tpu.embedding.collection import EmbeddingCollection
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)

BASE_ENV = {
    "HCTR_TPU_ONEHOT_KERNEL": "xla",
    "HCTR_TPU_HOT_ROWS": "0",
    "HCTR_TPU_SUPERHOT_ROWS": "0",
    "HCTR_TPU_ONEHOT_VOCAB": "0",
    "HCTR_TPU_UCAP_FACTOR": "0",
    "HCTR_TPU_SEGSUM": "xla",
    "HCTR_TPU_SCATTER_AUTO": "1",
    "HCTR_TPU_DENSE_UPDATE_ROWS": "0",
    "HCTR_TPU_SPLIT_VOCAB": "0",
    "HCTR_TPU_GROUP_ROWS": "0",
    "HCTR_TPU_DENSE_EXCHANGE": "0",
    "HCTR_TPU_DENSE_EXCHANGE_CAP": "0",
}


def _draw_model(rng):
    n_tables = int(rng.integers(1, 4))
    tables, lookups = [], []
    for i in range(n_tables):
        dynamic = bool(rng.random() < 0.2)
        vocab = int(rng.integers(50, 4000))
        ev = int(rng.choice([4, 8]))
        # dynamic tables: zero init. A fresh key's value is the init at its
        # claimed store slot, and slot assignment is layout-dependent
        # (hash % per-shard rows) — random init would make mesh1 vs mesh8
        # legitimately differ on fresh rows (the reference's on-demand
        # curand initializer is layout-dependent too). Zero init keeps every
        # engine comparison exact while exercising all training math.
        t = EmbeddingTableConfig(
            name=f"t{i}",
            max_vocabulary_size=-1 if dynamic else vocab,
            ev_size=ev,
            dynamic_capacity=4096,
            init_scale=0.0 if dynamic else None,
        )
        tables.append((t, vocab))
        comb = Combiner_t(rng.choice(["sum", "mean", "concat"]))
        hot = int(rng.integers(1, 6))
        weighted = bool(rng.random() < 0.35)
        lookups.append(
            LookupConfig(
                i, t, f"f{i}", f"e{i}", comb, hot,
                sp_weight_name=f"w{i}" if weighted else "",
            )
        )
    opt_kind = Optimizer_t(
        rng.choice(["sgd", "adagrad", "rowwise_adagrad", "adam", "ftrl"])
    )
    opt = OptParams(opt_kind, lr=0.1, initial_accu_value=0.0, epsilon=1e-7)
    # placement: each table dp or mp (dynamic tables stay mp-or-dp too)
    strategy = []
    for t, _v in tables:
        kind = "dp" if rng.random() < 0.3 else "mp"
        strategy.append((kind, [t.name]))
    return tables, lookups, strategy, opt


def _draw_env(rng):
    env = dict(BASE_ENV)
    env["HCTR_TPU_ONEHOT_VOCAB"] = str(int(rng.choice([0, 1024])))
    env["HCTR_TPU_ONEHOT_KERNEL"] = str(rng.choice(["xla", "pallas"]))
    hot = int(rng.choice([0, 256]))
    env["HCTR_TPU_HOT_ROWS"] = str(hot)
    if hot:
        env["HCTR_TPU_SUPERHOT_ROWS"] = str(int(rng.choice([0, 64])))
        env["HCTR_TPU_SPLIT_VOCAB"] = str(int(rng.choice([0, 512])))
    env["HCTR_TPU_UCAP_FACTOR"] = str(rng.choice(["0", "0.5", "auto"]))
    env["HCTR_TPU_SEGSUM"] = str(rng.choice(["xla", "scan"]))
    env["HCTR_TPU_SCATTER_AUTO"] = str(rng.choice(["0", "1"]))
    env["HCTR_TPU_DENSE_UPDATE_ROWS"] = str(int(rng.choice([0, 1 << 20])))
    env["HCTR_TPU_GROUP_ROWS"] = str(int(rng.choice([0, 1000])))
    env["HCTR_TPU_DENSE_EXCHANGE"] = str(rng.choice(["0", "1"]))
    if env["HCTR_TPU_DENSE_EXCHANGE"] == "1":
        # 8 is small enough to overflow real batches -> exercises the
        # psummed-overflow cond fallback to the dense psum path
        env["HCTR_TPU_DENSE_EXCHANGE_CAP"] = str(int(rng.choice([0, 8, 4096])))
    return env


def _run(rm, tables, lookups, strategy, opt, env, batches, shard_counts=None):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        compiled = compile_plan(
            lookups,
            ShardingPlan(strategy=strategy),
            num_shards=rm.data_parallel_size,
            shard_counts=shard_counts,
        )
        ec = EmbeddingCollection(compiled, rm, opt)
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
    st = ec.init(jax.random.key(7))
    # identical initial weights across engines: import a fixed dense array
    vr = np.random.default_rng(123)
    for t, vocab in tables:
        rows = t.dynamic_capacity if t.is_dynamic else vocab
        if not t.is_dynamic:
            st = ec.import_table(
                st, t.name, vr.normal(size=(rows, t.ev_size)).astype(np.float32)
            )
    opt_state = ec.init_optimizer(st)
    if ec.knob_ucap_auto:
        ec.auto_unique_caps(batches[0][0])
    fwd_fn = jax.jit(ec.forward)
    bwd_fn = jax.jit(ec.backward_and_update)
    fwd_outs = []
    for step, (keys, d_outs, weights) in enumerate(batches, start=1):
        kd = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in keys.items()
        }
        dd = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in d_outs.items()
        }
        wd = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in weights.items()
        } or None
        fwd_outs.append(
            {k: np.asarray(v) for k, v in fwd_fn(st, kd, wd).items()}
        )
        st, opt_state = bwd_fn(
            st, opt_state, kd, dd, jnp.asarray(0.1), jnp.asarray(step),
            feature_weights=wd,
        )
    exports = {}
    for t, vocab in tables:
        if not t.is_dynamic:
            exports[t.name] = ec.export_table(st, t.name)
    return fwd_outs, exports


def _batches(rng, lookups, tables, n_steps=3, batch=32):
    vocab_of = {t.name: v for t, v in tables}
    out = []
    for _ in range(n_steps):
        keys, d_outs, weights = {}, {}, {}
        for lm in lookups:
            v = vocab_of[lm.table.name]
            k = rng.integers(0, v, (batch, lm.max_hotness)).astype(np.int32)
            k[rng.random(k.shape) < 0.1] = INVALID_KEY
            k[:, 0] = np.abs(k[:, 0]) % v  # at least one valid key per row
            keys[lm.bottom_name] = k
            w = (
                lm.max_hotness * lm.table.ev_size
                if lm.combiner == Combiner_t.Concat
                else lm.table.ev_size
            )
            d_outs[lm.top_name] = rng.normal(size=(batch, w)).astype(np.float32)
            if lm.sp_weight_name:
                # positive weights: mean divides by raw sum(w) — signed
                # cancellation has its own dedicated test
                weights[lm.sp_weight_name] = rng.uniform(
                    0.25, 2.0, size=k.shape
                ).astype(np.float32)
        out.append((keys, d_outs, weights))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_random_config_engines_agree(mesh1, mesh8, seed):
    rng = np.random.default_rng(100 + seed)
    tables, lookups, strategy, opt = _draw_model(rng)
    batches = _batches(rng, lookups, tables)

    ref_fwd, ref_tables = _run(
        mesh1, tables, lookups, strategy, opt, BASE_ENV, batches
    )

    for trial in range(2):
        env = _draw_env(rng)
        rm = mesh8 if rng.random() < 0.5 else mesh1
        shard_counts = None
        if rm.data_parallel_size > 1 and rng.random() < 0.5:
            shard_counts = {
                t.name: int(rng.choice([2, 4]))
                for t, _v in tables
                if dict(
                    (n, k) for k, ns in strategy for n in ns
                )[t.name] == "mp"
            }
        got_fwd, got_tables = _run(
            rm, tables, lookups, strategy, opt, env, batches,
            shard_counts=shard_counts,
        )
        label = f"seed={seed} trial={trial} env={env} mesh={rm.data_parallel_size} sc={shard_counts}"
        for s in range(len(batches)):
            for top in ref_fwd[s]:
                np.testing.assert_allclose(
                    got_fwd[s][top], ref_fwd[s][top],
                    rtol=2e-4, atol=2e-5, err_msg=f"{label} fwd step {s} {top}",
                )
        for name in ref_tables:
            np.testing.assert_allclose(
                got_tables[name], ref_tables[name],
                rtol=2e-4, atol=2e-5, err_msg=f"{label} table {name}",
            )
