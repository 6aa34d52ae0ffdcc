"""Rowwise-packed table+accum storage (HCTR_TPU_ROWWISE_PACK).

RowWiseAdaGrad rowop groups store [R, E+1] (weights ‖ scalar accum): the
accum update folds into the SAME ADD-form scatter as the weight delta.
Results must equal the separate-array path (torchrec ROWWISE_ADAGRAD
semantics, the MLPerf DLRM reference embedding optimizer).
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

from test_embedding_collection import random_keys


def _build(rm, monkeypatch, packed):
    # the trio path must be taken for the pack to engage (dense-sweep shards
    # keep separate state); disable the dense-sweep threshold in BOTH arms
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "0")
    monkeypatch.setenv("HCTR_TPU_ROWWISE_PACK", "1" if packed else "0")
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=96, ev_size=8)
    t1 = EmbeddingTableConfig(name="t1", max_vocabulary_size=64, ev_size=8)
    lookups = [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4),
        LookupConfig(1, t1, "f1", "e1", Combiner_t.Mean, 3),
    ]
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"])])
    compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
    opt = OptParams(
        Optimizer_t.RowWiseAdaGrad, lr=0.3, initial_accu_value=0.0,
        epsilon=1e-7,
    )
    ebc = EmbeddingCollection(compiled, rm, opt)
    if packed:
        assert ebc.packed_kind, "rowwise pack did not engage"
        assert set(ebc.packed_kind.values()) == {"rowwise"}
    else:
        assert not ebc.packed_kind
    tables = ebc.init(jax.random.key(3))
    return ebc, tables


@pytest.mark.parametrize("segsum", ["xla", "scan"])
def test_rowwise_packed_matches_separate(mesh8, monkeypatch, segsum):
    monkeypatch.setenv("HCTR_TPU_SEGSUM", segsum)
    rng = np.random.default_rng(52)
    batch = 32
    feats = {
        "f0": random_keys(rng, batch, 4, 96),
        "f1": random_keys(rng, batch, 3, 64),
    }
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = {
        "t0": rng.normal(size=(96, 8)).astype(np.float32),
        "t1": rng.normal(size=(64, 8)).astype(np.float32),
    }
    results = {}
    for packed in (False, True):
        ebc, tables = _build(mesh8, monkeypatch, packed)
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        fd = {k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()}
        dd = {k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()}
        fwd = jax.jit(ebc.forward)(tables, fd)
        for step in (1, 2):
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, fd, dd, jnp.asarray(0.3), jnp.asarray(step)
            )
        results[packed] = (
            {k: np.asarray(v) for k, v in fwd.items()},
            {n: ebc.export_table(tables, n) for n in dense},
        )
    for k in results[True][0]:
        np.testing.assert_allclose(
            results[True][0][k], results[False][0][k],
            rtol=1e-5, atol=1e-6, err_msg=f"fwd {k} ({segsum})",
        )
    for n in dense:
        np.testing.assert_allclose(
            results[True][1][n], results[False][1][n],
            rtol=1e-4, atol=1e-6, err_msg=f"table {n} ({segsum})",
        )


def test_rowwise_packed_import_preserves_accum(mesh1, monkeypatch):
    ebc, tables = _build(mesh1, monkeypatch, packed=True)
    state = ebc.init_optimizer(tables)
    keys = np.array([[3, 5, INVALID_KEY, INVALID_KEY]], dtype=np.int32)
    d = np.ones((1, 8), dtype=np.float32)
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f0": keys, "f1": np.full((1, 3), -1, np.int32)},
        {"e0": d, "e1": np.zeros((1, 8), np.float32)},
        jnp.asarray(0.3), jnp.asarray(1),
    )
    gname = next(iter(ebc.packed_groups))
    raw = np.asarray(tables[gname])
    assert raw.shape[1] == 9  # E + 1 scalar accum column
    accum_before = raw[:, 8:].copy()
    assert np.abs(accum_before).sum() > 0
    tables = ebc.import_table(tables, "t0", np.zeros((96, 8), np.float32))
    raw2 = np.asarray(tables[gname])
    np.testing.assert_array_equal(raw2[:, 8:], accum_before)
    np.testing.assert_array_equal(ebc.export_table(tables, "t0"), 0.0)


def test_rowwise_packed_accum_matches_unpacked_state(mesh1, monkeypatch):
    """The packed accum column must track the unpacked accum state."""
    rng = np.random.default_rng(7)
    keys = np.array([[3, 5, 5, INVALID_KEY]], dtype=np.int32)
    d = rng.normal(size=(1, 8)).astype(np.float32)
    feed = {"f0": keys, "f1": np.full((1, 3), -1, np.int32)}
    douts = {"e0": d, "e1": np.zeros((1, 8), np.float32)}
    dense = {
        "t0": rng.normal(size=(96, 8)).astype(np.float32),
        "t1": rng.normal(size=(64, 8)).astype(np.float32),
    }
    accs = {}
    for packed in (False, True):
        ebc, tables = _build(mesh1, monkeypatch, packed)
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, feed, douts, jnp.asarray(0.3), jnp.asarray(1)
        )
        if packed:
            gname = next(iter(ebc.packed_groups))
            accs[packed] = np.asarray(tables[gname])[:, 8]
        else:
            gname = next(g.name for g in ebc.plan.groups)
            accs[packed] = np.asarray(state[gname]["accum"])[:, 0]
    np.testing.assert_allclose(accs[True], accs[False], rtol=1e-6, atol=1e-8)
