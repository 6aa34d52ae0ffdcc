"""Unique-key (dense-compression) MP exchange vs the NumPy oracle and the
dense-psum engine path.

Reference: DenseModelParallelEmbedding
(HugeCTR/embedding/dense_model_parallel_embedding.hpp:61-110) +
PartitionAndUniqueOperator (data_compression_operators.cu): concat-combiner
MP lookups exchange deduped unique vectors instead of the per-key dense
psum. Exactness claims cover BOTH cond branches (compressed and the
overflow fallback), per the repo test convention.
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


def make_concat_lookups(weighted=False):
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=96, ev_size=8)
    t1 = EmbeddingTableConfig(name="t1", max_vocabulary_size=64, ev_size=8)
    kw = {}
    return [
        LookupConfig(
            0, t0, "f0", "e0", Combiner_t.Concat, 4,
            **({"sp_weight_name": "w0"} if weighted else {}),
        ),
        LookupConfig(
            1, t1, "f1", "e1", Combiner_t.Concat, 3,
            **({"sp_weight_name": "w1"} if weighted else {}),
        ),
        # second lookup into t0 (shared-table dedup across lookups)
        LookupConfig(
            2, t0, "f2", "e2", Combiner_t.Concat, 2,
            **({"sp_weight_name": "w2"} if weighted else {}),
        ),
    ]


def random_keys(rng, batch, hotness, vocab, pad_prob=0.3):
    keys = rng.integers(0, vocab, size=(batch, hotness)).astype(np.int32)
    mask = rng.random((batch, hotness)) < pad_prob
    mask[:, 0] = False
    keys[mask] = INVALID_KEY
    return keys


def concat_oracle_fwd(lookups, tables, feats, weights=None):
    outs = {}
    for lk in lookups:
        keys = feats[lk.bottom_name]
        tab = tables[lk.table.name]
        valid = keys != INVALID_KEY
        safe = np.where(valid, keys, 0)
        rows = tab[safe] * valid[..., None]
        if weights is not None and lk.sp_weight_name:
            rows = rows * (weights[lk.sp_weight_name] * valid)[..., None]
        outs[lk.top_name] = rows.reshape(keys.shape[0], -1)
    return outs


def concat_oracle_sgd(lookups, tables, feats, d_outs, lr, weights=None):
    for lk in lookups:
        keys = feats[lk.bottom_name]
        tab = tables[lk.table.name]
        valid = keys != INVALID_KEY
        b, h = keys.shape
        e = tab.shape[1]
        d_rows = d_outs[lk.top_name].reshape(b, h, e)
        if weights is not None and lk.sp_weight_name:
            d_rows = d_rows * weights[lk.sp_weight_name][..., None]
        for bi in range(b):
            for hi in range(h):
                if valid[bi, hi]:
                    tab[keys[bi, hi]] -= lr * d_rows[bi, hi]


def build(mesh8, monkeypatch, cap, weighted=False, enabled=True):
    monkeypatch.setenv("HCTR_TPU_DENSE_EXCHANGE", "1" if enabled else "0")
    if cap:
        monkeypatch.setenv("HCTR_TPU_DENSE_EXCHANGE_CAP", str(cap))
    lookups = make_concat_lookups(weighted)
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    ebc = EmbeddingCollection(
        compiled, mesh8, OptParams(Optimizer_t.SGD, lr=0.1)
    )
    return lookups, ebc


def make_batch(rng, batch=32, weighted=False):
    feats = {
        "f0": random_keys(rng, batch, 4, 96),
        "f1": random_keys(rng, batch, 3, 64),
        "f2": random_keys(rng, batch, 2, 96, pad_prob=0.0),
    }
    weights = None
    if weighted:
        weights = {
            "w0": rng.random((batch, 4)).astype(np.float32),
            "w1": rng.random((batch, 3)).astype(np.float32),
            "w2": rng.random((batch, 2)).astype(np.float32),
        }
    return feats, weights


@pytest.mark.parametrize("cap", [64, 2])  # 2 overflows -> cond fallback
def test_dense_exchange_forward_matches_oracle(mesh8, monkeypatch, cap):
    lookups, ebc = build(mesh8, monkeypatch, cap)
    assert all(
        ebc._dense_exchange_ok(g)
        for g in ebc.plan.groups
        if g.is_model_parallel
    ), "dense exchange must engage on the concat MP group"
    tables = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    feats, _ = make_batch(rng)
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    outs = jax.jit(ebc.forward)(tables, feats_dev)
    dense = {n: np.array(ebc.export_table(tables, n)) for n in ("t0", "t1")}
    ref = concat_oracle_fwd(lookups, dense, feats)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("cap", [64, 2])
def test_dense_exchange_backward_matches_oracle(mesh8, monkeypatch, cap):
    lookups, ebc = build(mesh8, monkeypatch, cap)
    lr = 0.1
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)
    rng = np.random.default_rng(2)
    feats, _ = make_batch(rng)
    d_outs = {
        "e0": rng.normal(size=(32, 32)).astype(np.float32),
        "e1": rng.normal(size=(32, 24)).astype(np.float32),
        "e2": rng.normal(size=(32, 16)).astype(np.float32),
    }
    dense = {n: np.array(ebc.export_table(tables, n)) for n in ("t0", "t1")}
    concat_oracle_sgd(lookups, dense, feats, d_outs, lr)
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    d_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()
    }
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_dev, d_dev, jnp.asarray(lr), jnp.asarray(1)
    )
    for n in ("t0", "t1"):
        np.testing.assert_allclose(
            ebc.export_table(tables, n), dense[n], rtol=1e-4, atol=1e-5
        )


def test_dense_exchange_weighted_matches_oracle(mesh8, monkeypatch):
    lookups, ebc = build(mesh8, monkeypatch, 64, weighted=True)
    assert all(
        ebc._dense_exchange_ok(g)
        for g in ebc.plan.groups
        if g.is_model_parallel
    ), "weighted concat groups must ride the dense exchange"
    lr = 0.1
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)
    rng = np.random.default_rng(3)
    feats, weights = make_batch(rng, weighted=True)
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    w_dev = {
        k: jax.device_put(v, mesh8.batch_sharding())
        for k, v in weights.items()
    }
    outs = jax.jit(ebc.forward)(tables, feats_dev, w_dev)
    dense = {n: np.array(ebc.export_table(tables, n)) for n in ("t0", "t1")}
    ref = concat_oracle_fwd(lookups, dense, feats, weights)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )
    d_outs = {
        "e0": rng.normal(size=(32, 32)).astype(np.float32),
        "e1": rng.normal(size=(32, 24)).astype(np.float32),
        "e2": rng.normal(size=(32, 16)).astype(np.float32),
    }
    concat_oracle_sgd(lookups, dense, feats, d_outs, lr, weights)
    d_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()
    }
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_dev, d_dev, jnp.asarray(lr), jnp.asarray(1),
        w_dev,
    )
    for n in ("t0", "t1"):
        np.testing.assert_allclose(
            ebc.export_table(tables, n), dense[n], rtol=1e-4, atol=1e-5
        )


def test_dense_exchange_equals_disabled_path(mesh8, monkeypatch):
    """Bit-comparable results with the path on vs off (same batch, same
    init) — the cross-engine equivalence sweep pattern."""
    rng = np.random.default_rng(4)
    feats, _ = make_batch(rng)
    d_outs = {
        "e0": rng.normal(size=(32, 32)).astype(np.float32),
        "e1": rng.normal(size=(32, 24)).astype(np.float32),
        "e2": rng.normal(size=(32, 16)).astype(np.float32),
    }
    results = {}
    for mode in ("on", "off"):
        _, ebc = build(mesh8, monkeypatch, 64, enabled=(mode == "on"))
        engaged = any(
            ebc._dense_exchange_ok(g)
            for g in ebc.plan.groups
            if g.is_model_parallel
        )
        assert engaged == (mode == "on")
        tables = ebc.init(jax.random.key(0))
        opt_state = ebc.init_optimizer(tables)
        feats_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in feats.items()
        }
        outs = jax.jit(ebc.forward)(tables, feats_dev)
        d_dev = {
            k: jax.device_put(v, mesh8.batch_sharding())
            for k, v in d_outs.items()
        }
        tables, opt_state = jax.jit(ebc.backward_and_update)(
            tables, opt_state, feats_dev, d_dev, jnp.asarray(0.1),
            jnp.asarray(1),
        )
        results[mode] = (
            {k: np.asarray(v) for k, v in outs.items()},
            {n: ebc.export_table(tables, n) for n in ("t0", "t1")},
        )
    for k in results["on"][0]:
        np.testing.assert_allclose(
            results["on"][0][k], results["off"][0][k], rtol=1e-5, atol=1e-6
        )
    for n in ("t0", "t1"):
        np.testing.assert_allclose(
            results["on"][1][n], results["off"][1][n], rtol=1e-5, atol=1e-6
        )


def test_dense_exchange_auto_cap_measurement(mesh8, monkeypatch):
    """auto_unique_caps measures per-(block, shard) unique caps and the
    engine engages without an explicit env cap."""
    monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", "auto")
    lookups, ebc = build(mesh8, monkeypatch, cap=0)
    rng = np.random.default_rng(5)
    feats, _ = make_batch(rng)
    ebc.auto_unique_caps(feats)
    mp_groups = [g for g in ebc.plan.groups if g.is_model_parallel]
    assert mp_groups
    for g in mp_groups:
        assert ebc.dense_exchange_caps.get(g.name, 0) >= 128
        assert ebc._dense_exchange_ok(g)
    tables = ebc.init(jax.random.key(0))
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    outs = jax.jit(ebc.forward)(tables, feats_dev)
    dense = {n: np.array(ebc.export_table(tables, n)) for n in ("t0", "t1")}
    ref = concat_oracle_fwd(lookups, dense, feats)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )
