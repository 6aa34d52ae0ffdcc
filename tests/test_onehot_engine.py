"""One-hot MXU embedding engine vs oracle + vs the row-op engine.

The engine (collection.py::_onehot_fwd/_onehot_bwd_local) replaces
row-granular gathers with counts-matrix matmuls for small static tables
(reference behavior: generic_lookup.cuh lookups + optimizers.cuh per-row
updates; the MXU formulation is numerically identical).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hugectr_tpu.core.types import Combiner_t, Optimizer_t, INVALID_KEY
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)
from hugectr_tpu.embedding.collection import EmbeddingCollection

from test_embedding_collection import NumpyEBC, make_lookups, random_keys


@pytest.fixture(autouse=True)
def enable_onehot(monkeypatch):
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "32768")


def _feats(rng, batch):
    return {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }


def test_group_classification():
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    compiled = compile_plan(lookups, plan, num_shards=8)
    kinds = {t.name: g.compute_kind for g in compiled.groups for t in g.tables}
    # t2 has a concat lookup with hotness 2 -> must stay rowop
    assert kinds == {"t0": "onehot", "t1": "onehot", "t2": "rowop"}
    onehot_groups = [g for g in compiled.groups if g.compute_kind == "onehot"]
    assert all(not g.is_model_parallel for g in onehot_groups)


def test_onehot_forward_matches_oracle(mesh8):
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    ebc = EmbeddingCollection(compiled, mesh8, OptParams(Optimizer_t.SGD, lr=0.1))
    tables = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    feats = _feats(rng, 32)
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    outs = jax.jit(ebc.forward)(tables, feats_dev)
    dense = {n: ebc.export_table(tables, n) for n in ("t0", "t1", "t2")}
    ref = NumpyEBC(lookups, dense).forward(feats)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5, err_msg=lk.top_name,
        )


def test_onehot_sgd_backward_matches_oracle(mesh8):
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    lr = 0.1
    ebc = EmbeddingCollection(compiled, mesh8, OptParams(Optimizer_t.SGD, lr=lr))
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    rng = np.random.default_rng(2)
    batch = 32
    feats = _feats(rng, batch)
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 16)).astype(np.float32),
        "e3": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = {n: ebc.export_table(tables, n) for n in ("t0", "t1", "t2")}
    oracle = NumpyEBC(lookups, dense)
    oracle.sgd_update(feats, d_outs, lr)
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    d_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()
    }
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, feats_dev, d_dev, jnp.asarray(lr), jnp.asarray(1)
    )
    for n in ("t0", "t1", "t2"):
        np.testing.assert_allclose(
            ebc.export_table(tables, n), oracle.tables[n],
            rtol=1e-4, atol=1e-5, err_msg=n,
        )


def test_onehot_adagrad_dedup_and_lazy_state(mesh1):
    """Duplicate keys -> ONE summed-gradient update; untouched rows keep
    table AND optimizer state bit-identical (lazy semantics)."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=10, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    assert compiled.groups[0].compute_kind == "onehot"
    opt = OptParams(
        Optimizer_t.AdaGrad, lr=0.5, initial_accu_value=0.0, epsilon=1e-7
    )
    ebc = EmbeddingCollection(compiled, mesh1, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    keys = np.array([[3, 3, 5, INVALID_KEY]], dtype=np.int32)
    d = np.ones((1, 8), dtype=np.float32)
    before = ebc.export_table(tables, "t")
    gname = compiled.groups[0].name
    accum_before = np.asarray(state[gname]["accum"])
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )
    after = ebc.export_table(tables, "t")
    np.testing.assert_allclose(after[3] - before[3], -0.5, rtol=1e-5)
    np.testing.assert_allclose(after[5] - before[5], -0.5, rtol=1e-5)
    np.testing.assert_array_equal(after[0], before[0])
    accum_after = np.asarray(state[gname]["accum"])
    np.testing.assert_array_equal(accum_after[0], accum_before[0])
    np.testing.assert_allclose(accum_after[3], 4.0, rtol=1e-6)


def test_onehot_momentum_untouched_rows_not_decayed(mesh1):
    """MomentumSGD via the dense sweep must NOT decay momentum of rows the
    batch never touched (reference per-touched-row kernel semantics)."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=8, ev_size=4)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 2)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.MomentumSGD, lr=0.1, momentum_factor=0.9)
    ebc = EmbeddingCollection(compiled, mesh1, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    gname = compiled.groups[0].name
    # seed nonzero momentum everywhere
    state[gname]["m"] = jnp.ones_like(state[gname]["m"])
    keys = np.array([[2, INVALID_KEY]], dtype=np.int32)
    d = np.ones((1, 4), dtype=np.float32)
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.1), jnp.asarray(1)
    )
    m = np.asarray(state[gname]["m"])
    np.testing.assert_array_equal(m[0], 1.0)  # untouched: NOT decayed
    np.testing.assert_allclose(m[2], 0.9 * 1.0 - 0.1 * 1.0, rtol=1e-6)


def test_onehot_matches_rowop_engine(mesh8, monkeypatch):
    """Same tables + same batch through both engines -> same results."""
    rng = np.random.default_rng(7)
    batch = 32
    feats = _feats(rng, batch)
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 16)).astype(np.float32),
        "e3": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = {
        n: np.random.default_rng(11).normal(size=(v, 8)).astype(np.float32)
        for n, v in (("t0", 100), ("t1", 57), ("t2", 31))
    }
    results = {}
    for thr in ("32768", "0"):
        monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", thr)
        lookups = make_lookups()
        plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
        compiled = compile_plan(
            lookups, plan, num_shards=mesh8.data_parallel_size
        )
        opt = OptParams(
            Optimizer_t.AdaGrad, lr=0.3, initial_accu_value=0.0, epsilon=1e-7
        )
        ebc = EmbeddingCollection(compiled, mesh8, opt)
        tables = ebc.init(jax.random.key(3))
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        feats_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in feats.items()
        }
        d_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in d_outs.items()
        }
        fwd = jax.jit(ebc.forward)(tables, feats_dev)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, feats_dev, d_dev, jnp.asarray(0.3), jnp.asarray(1)
        )
        results[thr] = (
            {k: np.asarray(v) for k, v in fwd.items()},
            {n: ebc.export_table(tables, n) for n in dense},
        )
    for k in results["32768"][0]:
        np.testing.assert_allclose(
            results["32768"][0][k], results["0"][0][k],
            rtol=1e-5, atol=1e-5, err_msg=f"fwd {k}",
        )
    for n in dense:
        np.testing.assert_allclose(
            results["32768"][1][n], results["0"][1][n],
            rtol=1e-4, atol=1e-5, err_msg=f"table {n}",
        )


def test_onehot_freeze_table(mesh1):
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=10, ev_size=4)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 2)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    ebc = EmbeddingCollection(compiled, mesh1, OptParams(Optimizer_t.SGD, lr=0.5))
    ebc.frozen_tables.add("t")
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    before = ebc.export_table(tables, "t")
    keys = np.array([[2, 3]], dtype=np.int32)
    d = np.ones((1, 4), dtype=np.float32)
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )
    np.testing.assert_array_equal(ebc.export_table(tables, "t"), before)


def test_pallas_onehot_kernel_matches_xla(mesh1, monkeypatch):
    """Fused Pallas one-hot kernels == materialized-counts XLA path."""
    rng = np.random.default_rng(9)
    batch = 32
    feats = _feats(rng, batch)
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 16)).astype(np.float32),
        "e3": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = {
        n: np.random.default_rng(12).normal(size=(v, 8)).astype(np.float32)
        for n, v in (("t0", 100), ("t1", 57), ("t2", 31))
    }
    results = {}
    for backend in ("xla", "pallas"):
        monkeypatch.setenv("HCTR_TPU_ONEHOT_KERNEL", backend)
        lookups = make_lookups()
        plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
        compiled = compile_plan(lookups, plan, num_shards=1)
        opt = OptParams(
            Optimizer_t.AdaGrad, lr=0.3, initial_accu_value=0.0, epsilon=1e-7
        )
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        tables = ebc.init(jax.random.key(3))
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        fwd = jax.jit(ebc.forward)(tables, feats)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, feats, d_outs, jnp.asarray(0.3), jnp.asarray(1)
        )
        results[backend] = (
            {k: np.asarray(v) for k, v in fwd.items()},
            {n: ebc.export_table(tables, n) for n in dense},
        )
    for k in results["pallas"][0]:
        np.testing.assert_allclose(
            results["pallas"][0][k], results["xla"][0][k],
            rtol=1e-4, atol=1e-5, err_msg=f"fwd {k}",
        )
    for n in dense:
        np.testing.assert_allclose(
            results["pallas"][1][n], results["xla"][1][n],
            rtol=1e-4, atol=1e-5, err_msg=f"table {n}",
        )


def test_scatter_counts_classification(monkeypatch):
    """High-hotness big-vocab tables go one-hot via the scatter-counts rule
    (plan.onehot_scatter_ratio); low-hotness big-vocab tables stay rowop;
    ONEHOT_VOCAB=0 disables both."""
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "256")
    monkeypatch.setenv("HCTR_TPU_ONEHOT_SCATTER_RATIO", "2000")
    th = EmbeddingTableConfig(name="hi", max_vocabulary_size=1024, ev_size=8)
    tl = EmbeddingTableConfig(name="lo", max_vocabulary_size=100000, ev_size=8)
    lookups = [
        LookupConfig(0, th, "fh", "eh", Combiner_t.Sum, 8),  # 8*2000 >= 1024
        LookupConfig(1, tl, "fl", "el", Combiner_t.Sum, 8),  # 16000 < 100000
    ]
    plan = ShardingPlan(strategy=[("mp", ["hi", "lo"])])
    compiled = compile_plan(lookups, plan, num_shards=8)
    kinds = {t.name: g.compute_kind for g in compiled.groups for t in g.tables}
    assert kinds == {"hi": "onehot", "lo": "rowop"}
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "0")
    compiled0 = compile_plan(lookups, plan, num_shards=8)
    kinds0 = {
        t.name: g.compute_kind for g in compiled0.groups for t in g.tables
    }
    assert kinds0 == {"hi": "rowop", "lo": "rowop"}


def test_scatter_counts_matches_rowop(mesh8, monkeypatch):
    """Scatter-built counts (vocab > compare threshold) == rowop engine for
    forward AND RowWiseAdaGrad update, with duplicate keys and padding."""
    monkeypatch.setenv("HCTR_TPU_ONEHOT_SCATTER_RATIO", "2000")
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=1024, ev_size=8)
    lookups = [
        LookupConfig(0, t, "fs", "es", Combiner_t.Sum, 8),
        LookupConfig(1, t, "fm", "em", Combiner_t.Mean, 4),
    ]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    rng = np.random.default_rng(11)
    batch = 32
    feats = {
        "fs": random_keys(rng, batch, 8, 1024),
        "fm": random_keys(rng, batch, 4, 1024),
    }
    feats["fs"][:, 1] = feats["fs"][:, 0]  # guaranteed in-sample duplicates
    d_outs = {
        "es": rng.normal(size=(batch, 8)).astype(np.float32),
        "em": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    lr = 0.2
    opt = OptParams(
        Optimizer_t.RowWiseAdaGrad, lr=lr, initial_accu_value=0.0,
        epsilon=1e-7,
    )
    results = {}
    for mode, env in (("onehot", "256"), ("rowop", "0")):
        monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", env)
        compiled = compile_plan(
            lookups, plan, num_shards=mesh8.data_parallel_size
        )
        kinds = {g.compute_kind for g in compiled.groups}
        assert kinds == {mode}, (mode, kinds)
        ebc = EmbeddingCollection(compiled, mesh8, opt)
        tables = ebc.init(jax.random.key(5))
        tables = ebc.import_table(
            tables, "t",
            np.random.default_rng(13).normal(size=(1024, 8)).astype(
                np.float32
            ),
        )
        state = ebc.init_optimizer(tables)
        feats_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in feats.items()
        }
        d_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in d_outs.items()
        }
        outs = jax.jit(ebc.forward)(tables, feats_dev)
        tables2, _ = jax.jit(ebc.backward_and_update)(
            tables, state, feats_dev, d_dev, jnp.asarray(lr), jnp.asarray(1)
        )
        results[mode] = (
            {k: np.asarray(v) for k, v in outs.items()},
            ebc.export_table(tables2, "t"),
        )
    for top in ("es", "em"):
        np.testing.assert_allclose(
            results["onehot"][0][top], results["rowop"][0][top],
            rtol=1e-5, atol=1e-5, err_msg=top,
        )
    np.testing.assert_allclose(
        results["onehot"][1], results["rowop"][1], rtol=1e-4, atol=1e-5
    )
