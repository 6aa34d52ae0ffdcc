"""Partial table placement: shard_matrix / per-table shard counts honored.

Reference: embedding/common.hpp:253-267 (tables on device subsets with
per-table shard counts); samples/dlrm/sharding/planner.py. TPU mapping:
f logical shards with mesh/f replica groups — per-device rows = vocab/f,
matching the reference's per-device footprint, with results identical to
full sharding.
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
from hugectr_tpu.parallel.planner import auto_plan, round_robin_plan
from hugectr_tpu.embedding.collection import EmbeddingCollection

from test_embedding_collection import random_keys


def _lookups():
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=96, ev_size=8)
    t1 = EmbeddingTableConfig(name="t1", max_vocabulary_size=64, ev_size=8)
    return [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4),
        LookupConfig(1, t1, "f1", "e1", Combiner_t.Mean, 3),
    ]


def test_shard_counts_change_per_device_storage(mesh8):
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"])])
    full = compile_plan(_lookups(), plan, num_shards=8)
    partial = compile_plan(
        _lookups(), plan, num_shards=8, shard_counts={"t0": 2, "t1": 8}
    )
    # t0 with f=2: per-device rows = ceil(96/2) = 48 vs full 12
    def rows_of(compiled, name):
        for g in compiled.groups:
            for ti, t in enumerate(g.tables):
                if t.name == name:
                    return int(g.rows_per_shard[ti]), g.num_shards, g.num_replicas
        raise KeyError(name)

    assert rows_of(full, "t0") == (12, 8, 1)
    assert rows_of(partial, "t0") == (48, 2, 4)
    assert rows_of(partial, "t1") == (8, 8, 1)


@pytest.mark.parametrize("counts", [{"t0": 1, "t1": 2}, {"t0": 4, "t1": 8}])
def test_partial_matches_full(mesh8, counts):
    """Partial placement must give the SAME numbers as full sharding."""
    rng = np.random.default_rng(29)
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
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"])])
    results = {}
    for sc in (None, counts):
        compiled = compile_plan(
            _lookups(), plan, num_shards=8, shard_counts=sc
        )
        ebc = EmbeddingCollection(
            compiled, mesh8, OptParams(Optimizer_t.AdaGrad, lr=0.2, epsilon=1e-7)
        )
        tables = ebc.init(jax.random.key(7))
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        fd = {k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()}
        dd = {k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()}
        fwd = jax.jit(ebc.forward)(tables, fd)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, fd, dd, jnp.asarray(0.2), jnp.asarray(1)
        )
        results[bool(sc)] = (
            {k: np.asarray(v) for k, v in fwd.items()},
            {n: ebc.export_table(tables, n) for n in dense},
        )
    for k in results[True][0]:
        np.testing.assert_allclose(
            results[True][0][k], results[False][0][k],
            rtol=1e-5, atol=1e-5, err_msg=f"fwd {k} {counts}",
        )
    for n in dense:
        np.testing.assert_allclose(
            results[True][1][n], results[False][1][n],
            rtol=1e-4, atol=1e-5, err_msg=f"table {n} {counts}",
        )


def test_partial_evict_hits_all_replicas(mesh8):
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"])])
    compiled = compile_plan(
        _lookups(), plan, num_shards=8, shard_counts={"t0": 2, "t1": 8}
    )
    ebc = EmbeddingCollection(
        compiled, mesh8, OptParams(Optimizer_t.SGD, lr=0.1)
    )
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    tables, state = ebc.evict(tables, state, "t0", np.array([10, 33]))
    out = ebc.export_table(tables, "t0")
    np.testing.assert_array_equal(out[10], 0.0)
    np.testing.assert_array_equal(out[33], 0.0)
    assert np.abs(out[11]).sum() > 0
    # replicas must stay consistent: a train step after evict still matches
    # an unsplit collection (covered by test_partial_matches_full); here we
    # check all replica copies were cleared via the raw storage
    g, ti = ebc._find_table("t0")
    raw = np.asarray(tables[g.name])
    stride = g.num_shards * g.total_local_rows
    # replica-0 storage row via the engine's own placement map (key k ->
    # shard (k + rot) % f at local row k // f, plan.table_shard_rotation)
    srow0 = int(ebc._table_storage_rows(g, ti, int(g.table_vocab[ti]))[10])
    for r in range(g.num_replicas):
        np.testing.assert_array_equal(raw[r * stride + srow0], 0.0)


def test_planner_output_drives_engine(mesh8):
    """auto_plan / round_robin shard matrices change the compiled plan."""
    names = ["a", "b", "c"]
    sizes = [8e6, 4e6, 1e6]
    hot = [50, 10, 1]
    strategy, matrix = auto_plan(
        names, sizes, hot, num_devices=8,
        dp_threshold_bytes=0.0, max_search_iter=8,
    )
    counts = {n: sum(1 for row in matrix if n in row) for n in names}
    tables = [
        EmbeddingTableConfig(name=n, max_vocabulary_size=1000, ev_size=8)
        for n in names
    ]
    lookups = [
        LookupConfig(i, t, f"f{i}", f"e{i}", Combiner_t.Sum, 2)
        for i, t in enumerate(tables)
    ]
    compiled = compile_plan(
        lookups, ShardingPlan(strategy=strategy), num_shards=8,
        shard_counts=counts,
    )
    got = {
        t.name: g.num_shards
        for g in compiled.groups
        for t in g.tables
        if g.is_model_parallel
    }
    for n, f in counts.items():
        if n in got:
            # engine uses the next divisor of 8 >= planner count
            expect = f
            while 8 % expect:
                expect += 1
            assert got[n] == expect, (n, f, got)
    # round robin: each table on exactly one device -> f=1, full-vocab local
    strategy2, matrix2 = round_robin_plan(names, 8)
    counts2 = {n: sum(1 for row in matrix2 if n in row) for n in names}
    compiled2 = compile_plan(
        lookups, ShardingPlan(strategy=strategy2), num_shards=8,
        shard_counts=counts2,
    )
    for g in compiled2.groups:
        if g.is_model_parallel:
            assert g.num_shards == 1 and g.num_replicas == 8
            for ti in range(len(g.tables)):
                assert int(g.rows_per_shard[ti]) == 1000
