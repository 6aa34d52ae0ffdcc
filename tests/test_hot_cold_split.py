"""Frequent/infrequent (hot/cold) table split: exactness vs the unsplit path.

Reference lineage: HybridEmbedding frequent/infrequent categories; snapshot
analog: frequent-key hash table in
embedding/data_distributor/data_compression_operators.cu:213. The TPU
implementation splits big sum/mean tables into a replicated one-hot "hot"
prefix and a sharded rowop "cold" remainder; results must be EXACT for any
key distribution.
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

VOCAB = 300_000
HOT = 1024


@pytest.fixture(autouse=True)
def enable_split(monkeypatch):
    monkeypatch.setenv("HCTR_TPU_HOT_ROWS", str(HOT))
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "32768")
    monkeypatch.setenv("HCTR_TPU_SPLIT_VOCAB", str(256 * 1024))


def _build(rm, combiner, hot_rows):
    t = EmbeddingTableConfig(name="big", max_vocabulary_size=VOCAB, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", combiner, 6)]
    plan = ShardingPlan(strategy=[("mp", ["big"])])
    import os

    os.environ["HCTR_TPU_HOT_ROWS"] = str(hot_rows)
    compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
    opt = OptParams(
        Optimizer_t.AdaGrad, lr=0.3, initial_accu_value=0.0, epsilon=1e-7
    )
    return compiled, EmbeddingCollection(compiled, rm, opt)


def _keys(rng, batch):
    # power-law-ish mix: most keys in the hot window, some cold, some padding
    hot = rng.integers(0, HOT, (batch, 6))
    cold = rng.integers(HOT, VOCAB, (batch, 6))
    pick = rng.random((batch, 6))
    keys = np.where(pick < 0.7, hot, cold).astype(np.int32)
    keys[pick > 0.95] = INVALID_KEY
    keys[:, 0] = np.abs(keys[:, 0])  # ensure at least one valid
    return keys


@pytest.mark.parametrize("combiner", [Combiner_t.Sum, Combiner_t.Mean])
def test_split_matches_unsplit(mesh8, combiner):
    rng = np.random.default_rng(3)
    batch = 64
    keys = _keys(rng, batch)
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)

    results = {}
    for hot_rows in (HOT, 0):
        compiled, ebc = _build(mesh8, combiner, hot_rows)
        if hot_rows:
            assert "big" in compiled.table_splits
            kinds = {
                t.name: g.compute_kind
                for g in compiled.groups
                for t in g.tables
            }
            assert kinds["big::hot"] == "onehot"
            assert kinds["big::cold"] == "rowop"
        tables = ebc.init(jax.random.key(1))
        tables = ebc.import_table(tables, "big", dense)
        state = ebc.init_optimizer(tables)
        kd = jax.device_put(keys, mesh8.batch_sharding())
        dd = jax.device_put(d, mesh8.batch_sharding())
        fwd = jax.jit(ebc.forward)(tables, {"f": kd})
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.3), jnp.asarray(1)
        )
        results[hot_rows] = (
            np.asarray(fwd["e"]),
            ebc.export_table(tables, "big"),
        )
    np.testing.assert_allclose(
        results[HOT][0], results[0][0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        results[HOT][1], results[0][1], rtol=1e-4, atol=1e-5
    )


def test_split_export_import_roundtrip(mesh1):
    compiled, ebc = _build(mesh1, Combiner_t.Sum, HOT)
    tables = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)
    tables = ebc.import_table(tables, "big", dense)
    back = ebc.export_table(tables, "big")
    np.testing.assert_allclose(back, dense, rtol=1e-6)


def test_split_evict_and_freeze(mesh1):
    compiled, ebc = _build(mesh1, Combiner_t.Sum, HOT)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    # evict one hot and one cold row through the user-level name
    tables, state = ebc.evict(
        tables, state, "big", np.array([5, HOT + 7], dtype=np.int64)
    )
    exported = ebc.export_table(tables, "big")
    np.testing.assert_array_equal(exported[5], 0.0)
    np.testing.assert_array_equal(exported[HOT + 7], 0.0)
    assert np.abs(exported[6]).sum() > 0
    # freezing the user-level name freezes BOTH sub-tables
    ebc.frozen_tables.add("big")
    before = ebc.export_table(tables, "big")
    keys = np.array([[3, HOT + 11, INVALID_KEY, INVALID_KEY, INVALID_KEY, INVALID_KEY]], dtype=np.int32)
    d = np.ones((1, 8), dtype=np.float32)
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )
    np.testing.assert_array_equal(ebc.export_table(tables, "big"), before)


@pytest.mark.parametrize("combiner", [Combiner_t.Sum, Combiner_t.Mean])
def test_superhot_three_tier_matches_unsplit(mesh8, combiner, monkeypatch):
    """HCTR_TPU_SUPERHOT_ROWS: superhot(one-hot MXU)/hot(rowop)/cold(sharded
    rowop) three-way split must be exact vs the unsplit table, and the tier
    engines must be as designed (superhot=onehot, hot+cold=rowop)."""
    SHOT = 256
    rng = np.random.default_rng(9)
    batch = 64
    # mix across all three windows + padding
    keys = _keys(rng, batch)
    keys[:, 1] = rng.integers(0, SHOT, batch)  # guarantee superhot traffic
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)

    results = {}
    for shot_rows in (SHOT, 0):
        monkeypatch.setenv("HCTR_TPU_SUPERHOT_ROWS", str(shot_rows))
        monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "512")
        # HOT(1024) > onehot threshold(512) so ::hot compiles to rowop and
        # the three tiers land on three DIFFERENT engines
        compiled, ebc = _build(mesh8, combiner, HOT if shot_rows else 0)
        if shot_rows:
            kinds = {
                t.name: g.compute_kind
                for g in compiled.groups
                for t in g.tables
            }
            assert kinds["big::shot"] == "onehot"
            assert kinds["big::hot"] == "rowop"
            assert kinds["big::cold"] == "rowop"
            assert len(compiled.table_splits["big"]) == 3
        tables = ebc.init(jax.random.key(1))
        tables = ebc.import_table(tables, "big", dense)
        state = ebc.init_optimizer(tables)
        kd = jax.device_put(keys, mesh8.batch_sharding())
        dd = jax.device_put(d, mesh8.batch_sharding())
        fwd = jax.jit(ebc.forward)(tables, {"f": kd})
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.3),
            jnp.asarray(1),
        )
        results[shot_rows] = (
            np.asarray(fwd["e"]),
            ebc.export_table(tables, "big"),
        )
    np.testing.assert_allclose(
        results[SHOT][0], results[0][0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        results[SHOT][1], results[0][1], rtol=1e-4, atol=1e-5
    )


def test_superhot_evict_routes_all_tiers(mesh1, monkeypatch):
    monkeypatch.setenv("HCTR_TPU_SUPERHOT_ROWS", "256")
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "512")
    compiled, ebc = _build(mesh1, Combiner_t.Sum, HOT)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    tables, state = ebc.evict(
        tables, state, "big", np.array([3, 300, HOT + 7], dtype=np.int64)
    )
    exported = ebc.export_table(tables, "big")
    for row in (3, 300, HOT + 7):
        np.testing.assert_array_equal(exported[row], 0.0)
    assert np.abs(exported[4]).sum() > 0
