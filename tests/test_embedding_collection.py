"""Embedding collection vs a dense NumPy reference.

Mirrors the reference test strategy: GPU embedding collection checked against
EmbeddingReferenceCPU (test/utest/embedding_collection/reference_embedding.hpp)
— here, the sharded shard_map engine vs a plain dense-gather NumPy oracle.
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


def make_lookups():
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=100, ev_size=8)
    t1 = EmbeddingTableConfig(name="t1", max_vocabulary_size=57, ev_size=8)
    t2 = EmbeddingTableConfig(name="t2", max_vocabulary_size=31, ev_size=8)
    return [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4),
        LookupConfig(1, t1, "f1", "e1", Combiner_t.Mean, 3),
        LookupConfig(2, t2, "f2", "e2", Combiner_t.Concat, 2),
        # second lookup into t0 (shared table)
        LookupConfig(3, t0, "f3", "e3", Combiner_t.Sum, 1),
    ]


def random_keys(rng, batch, hotness, vocab, pad_prob=0.3):
    keys = rng.integers(0, vocab, size=(batch, hotness)).astype(np.int32)
    mask = rng.random((batch, hotness)) < pad_prob
    # keep at least one valid key per row
    mask[:, 0] = False
    keys[mask] = INVALID_KEY
    return keys


class NumpyEBC:
    """Dense-gather oracle."""

    def __init__(self, lookups, tables):
        self.lookups = lookups
        self.tables = {n: v.copy() for n, v in tables.items()}

    def forward(self, feats):
        outs = {}
        for lk in self.lookups:
            keys = feats[lk.bottom_name]
            tab = self.tables[lk.table.name]
            valid = keys != INVALID_KEY
            safe = np.where(valid, keys, 0)
            rows = tab[safe] * valid[..., None]
            if lk.combiner == Combiner_t.Concat:
                outs[lk.top_name] = rows.reshape(keys.shape[0], -1)
            elif lk.combiner == Combiner_t.Mean:
                cnt = np.maximum(valid.sum(1, keepdims=True), 1)
                outs[lk.top_name] = rows.sum(1) / cnt
            else:
                outs[lk.top_name] = rows.sum(1)
        return outs

    def sgd_update(self, feats, d_outs, lr):
        for lk in self.lookups:
            keys = feats[lk.bottom_name]
            d = d_outs[lk.top_name]
            tab = self.tables[lk.table.name]
            valid = keys != INVALID_KEY
            b, h = keys.shape
            e = tab.shape[1]
            if lk.combiner == Combiner_t.Concat:
                d_rows = d.reshape(b, h, e)
            elif lk.combiner == Combiner_t.Mean:
                cnt = np.maximum(valid.sum(1, keepdims=True), 1)[..., None]
                d_rows = np.broadcast_to((d[:, None, :] / cnt), (b, h, e))
            else:
                d_rows = np.broadcast_to(d[:, None, :], (b, h, e))
            for bi in range(b):
                for hi in range(h):
                    if valid[bi, hi]:
                        tab[keys[bi, hi]] -= lr * d_rows[bi, hi]


@pytest.mark.parametrize("strategy", ["all_mp", "all_dp", "mixed"])
def test_forward_matches_oracle(mesh8, strategy):
    lookups = make_lookups()
    names = ["t0", "t1", "t2"]
    if strategy == "all_mp":
        plan = ShardingPlan(strategy=[("mp", names)])
    elif strategy == "all_dp":
        plan = ShardingPlan(strategy=[("dp", names)])
    else:
        plan = ShardingPlan(strategy=[("mp", ["t0"]), ("dp", ["t1", "t2"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    ebc = EmbeddingCollection(compiled, mesh8, OptParams(Optimizer_t.SGD, lr=0.1))
    tables = ebc.init(jax.random.key(0))

    rng = np.random.default_rng(1)
    batch = 32
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    outs = jax.jit(ebc.forward)(tables, feats_dev)

    dense_tables = {n: ebc.export_table(tables, n) for n in names}
    oracle = NumpyEBC(lookups, dense_tables)
    ref = oracle.forward(feats)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name], rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("strategy", ["all_mp", "mixed"])
def test_sgd_backward_matches_oracle(mesh8, strategy):
    lookups = make_lookups()
    names = ["t0", "t1", "t2"]
    if strategy == "all_mp":
        plan = ShardingPlan(strategy=[("mp", names)])
    else:
        plan = ShardingPlan(strategy=[("mp", ["t0", "t1"]), ("dp", ["t2"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    lr = 0.1
    ebc = EmbeddingCollection(compiled, mesh8, OptParams(Optimizer_t.SGD, lr=lr))
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)

    rng = np.random.default_rng(2)
    batch = 32
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 16)).astype(np.float32),
        "e3": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense_tables = {n: ebc.export_table(tables, n) for n in names}
    oracle = NumpyEBC(lookups, dense_tables)
    oracle.sgd_update(feats, d_outs, lr)

    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    d_dev = {k: jax.device_put(v, mesh8.batch_sharding()) for k, v in d_outs.items()}
    step = jnp.asarray(1)
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_dev, d_dev, jnp.asarray(lr), step
    )
    for n in names:
        np.testing.assert_allclose(
            ebc.export_table(tables, n), oracle.tables[n], rtol=1e-4, atol=1e-5
        )


def test_matches_single_device(mesh8, mesh1):
    """8-way sharded result == single-device result (numerics modulo order)."""
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"]), ("dp", ["t2"])])
    rng = np.random.default_rng(3)
    batch = 16
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    outs = {}
    for rm in (mesh8, mesh1):
        compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
        ebc = EmbeddingCollection(compiled, rm, OptParams(Optimizer_t.SGD, lr=0.1))
        tables = ebc.init(jax.random.key(0))
        # force identical dense table contents across mesh sizes
        dense = {
            n: np.random.default_rng(7).normal(
                size=(t.max_vocabulary_size, t.ev_size)
            ).astype(np.float32)
            for n, t in {
                "t0": lookups[0].table,
                "t1": lookups[1].table,
                "t2": lookups[2].table,
            }.items()
        }
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        feats_dev = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in feats.items()
        }
        outs[rm] = jax.jit(ebc.forward)(tables, feats_dev)
    for top in ("e0", "e1", "e2", "e3"):
        np.testing.assert_allclose(
            np.asarray(outs[mesh8][top]),
            np.asarray(outs[mesh1][top]),
            rtol=1e-5,
            atol=1e-5,
        )


def test_adagrad_sparse_update_dedup(mesh1):
    """Duplicate keys in one batch must see ONE summed-gradient update."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=10, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.5, initial_accu_value=0.0, epsilon=1e-7)
    ebc = EmbeddingCollection(compiled, mesh1, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)

    # row 3 appears twice in one sample, row 5 once
    keys = np.array([[3, 3, 5, INVALID_KEY]], dtype=np.int32)
    d = np.ones((1, 8), dtype=np.float32)
    before = ebc.export_table(tables, "t")
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )
    after = ebc.export_table(tables, "t")
    # grad for row 3 = 2.0 summed; adagrad: accum=(2)^2=4 -> delta=-0.5*2/2=-0.5
    np.testing.assert_allclose(after[3] - before[3], -0.5, rtol=1e-5)
    # row 5: accum=1 -> delta=-0.5
    np.testing.assert_allclose(after[5] - before[5], -0.5, rtol=1e-5)
    # untouched rows unchanged
    np.testing.assert_allclose(after[0], before[0])


def test_mp_capacity_slicing_matches_uncapped(mesh8):
    """Owner-partition k_limit slicing (active when K*factor/N < K) must not
    change results when the capacity bound holds."""
    import os

    t = EmbeddingTableConfig(name="big", max_vocabulary_size=4096, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["big"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(5)
    batch = 512  # K = 2048 -> k_limit = 512 with factor 2 on 8 shards
    keys = rng.integers(0, 4096, (batch, 4)).astype(np.int32)
    d = rng.normal(size=(batch, 8)).astype(np.float32)

    results = {}
    for factor in ("8.0", "2.0"):  # 8.0 = no effective slicing (cap >= K/1)
        os.environ["HCTR_TPU_MP_CAPACITY_FACTOR"] = factor
        try:
            ebc = EmbeddingCollection(compiled, mesh8, opt)
            tables = ebc.init(jax.random.key(4))
            state = ebc.init_optimizer(tables)
            kd = jax.device_put(keys, mesh8.batch_sharding())
            dd = jax.device_put(d, mesh8.batch_sharding())
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.3), jnp.asarray(1)
            )
            results[factor] = ebc.export_table(tables, "big")
        finally:
            del os.environ["HCTR_TPU_MP_CAPACITY_FACTOR"]
    np.testing.assert_allclose(results["2.0"], results["8.0"], rtol=1e-5, atol=1e-6)


def test_fwd_partitioned_matches_masked(mesh8):
    """Owner-partitioned forward (sort+slice+scatter) == masked gather+pool."""
    import os

    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
    ebc = EmbeddingCollection(compiled, mesh8, OptParams(Optimizer_t.SGD, lr=0.1))
    tables = ebc.init(jax.random.key(9))
    rng = np.random.default_rng(9)
    batch = 32
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.3),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    feats_dev = {
        k: jax.device_put(v, mesh8.batch_sharding()) for k, v in feats.items()
    }
    outs = {}
    for mode in ("1", "0"):
        os.environ["HCTR_TPU_FWD_PARTITION"] = mode
        try:
            outs[mode] = {
                k: np.asarray(v)
                for k, v in jax.jit(ebc.forward)(tables, feats_dev).items()
            }
        finally:
            del os.environ["HCTR_TPU_FWD_PARTITION"]
    for k in outs["1"]:
        np.testing.assert_allclose(
            outs["1"][k], outs["0"][k], rtol=1e-5, atol=1e-5, err_msg=k
        )


@pytest.mark.parametrize("unique_kind", ["few", "many"])
def test_unique_cap_compaction_exact(mesh1, monkeypatch, unique_kind):
    """HCTR_TPU_UCAP_FACTOR slicing is EXACT: under the cap it runs the
    compact prefix, over the cap the lax.cond fallback runs full-K —
    results equal the uncapped path either way."""
    monkeypatch.setenv("HCTR_TPU_SEGSUM", "xla")
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=2048, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(13)
    batch = 512  # K = 2048; factor 0.3 -> cap 1024
    if unique_kind == "few":
        keys = rng.integers(0, 64, (batch, 4)).astype(np.int32)  # U <= 64
    else:
        keys = np.arange(batch * 4, dtype=np.int32).reshape(batch, 4) % 2048
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    results = {}
    for factor in ("0", "0.3"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", factor)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3), jnp.asarray(1)
        )
        results[factor] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(
        results["0.3"], results["0"], rtol=1e-6, atol=1e-7
    )


def test_segsum_split_matches_fold(mesh1, monkeypatch):
    """HCTR_TPU_SEGSUM_FOLD_BYTES=0 forces the split [K,E]+1-D row-id
    segment sums (the huge-K memory form); results must equal the default
    folded [K,E+1] form bit-for-bit math (same f32 sums). Covers both the
    ucap-windowed and unwindowed chains."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=2048, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(21)
    keys = rng.integers(0, 2048, (256, 4)).astype(np.int32)
    keys[0, 0] = -1  # padding
    d = rng.normal(size=(256, 8)).astype(np.float32)
    results = {}
    for ucap in ("0", "0.5"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", ucap)
        for budget in ("default", "0"):
            if budget == "0":
                monkeypatch.setenv("HCTR_TPU_SEGSUM_FOLD_BYTES", "0")
            else:
                monkeypatch.delenv("HCTR_TPU_SEGSUM_FOLD_BYTES", raising=False)
            ebc = EmbeddingCollection(compiled, mesh1, opt)
            tables = ebc.init(jax.random.key(4))
            state = ebc.init_optimizer(tables)
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, {"f": keys}, {"e": d},
                jnp.asarray(0.3), jnp.asarray(1),
            )
            results[(ucap, budget)] = ebc.export_table(tables, "t")
        np.testing.assert_allclose(
            results[(ucap, "0")], results[(ucap, "default")],
            rtol=1e-6, atol=1e-7,
        )


def test_rowwise_adagrad_matches_oracle(mesh1):
    """RowWiseAdaGrad (torchrec ROWWISE_ADAGRAD semantics): one accumulator
    scalar per row, accum += mean(g^2) over the row; duplicate keys see one
    summed-gradient update."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=10, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(
        Optimizer_t.RowWiseAdaGrad, lr=0.5, initial_accu_value=0.0,
        epsilon=1e-7,
    )
    ebc = EmbeddingCollection(compiled, mesh1, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    # one accumulator scalar per row
    assert next(iter(state.values()))["accum"].shape[1] == 1

    # row 3 twice in one sample, row 5 once; non-uniform cotangent
    keys = np.array([[3, 3, 5, INVALID_KEY]], dtype=np.int32)
    d = np.arange(8, dtype=np.float32)[None, :] + 1.0
    before = ebc.export_table(tables, "t")
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )
    after = ebc.export_table(tables, "t")
    g3 = 2.0 * (np.arange(8) + 1.0)  # summed over the duplicate
    a3 = np.mean(g3 * g3)
    np.testing.assert_allclose(
        after[3] - before[3], -0.5 * g3 / (np.sqrt(a3) + 1e-7), rtol=1e-5
    )
    g5 = np.arange(8) + 1.0
    a5 = np.mean(g5 * g5)
    np.testing.assert_allclose(
        after[5] - before[5], -0.5 * g5 / (np.sqrt(a5) + 1e-7), rtol=1e-5
    )
    np.testing.assert_allclose(after[0], before[0])


def test_rowwise_adagrad_sharded_matches_single(mesh8, mesh1):
    """RowWiseAdaGrad on the 8-way MP engine == single-device result."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=128, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    rng = np.random.default_rng(3)
    keys = random_keys(rng, 64, 4, 128)
    d = rng.normal(size=(64, 8)).astype(np.float32)
    # identical imported tables on both meshes (init placement differs)
    shared = rng.normal(size=(128, 8)).astype(np.float32)
    res = {}
    for rm in (mesh8, mesh1):
        compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
        opt = OptParams(Optimizer_t.RowWiseAdaGrad, lr=0.2, epsilon=1e-7)
        ebc = EmbeddingCollection(compiled, rm, opt)
        tables = ebc.init(jax.random.key(1))
        tables = ebc.import_table(tables, "t", shared)
        state = ebc.init_optimizer(tables)
        kd = jax.device_put(keys, rm.batch_sharding())
        dd = jax.device_put(d, rm.batch_sharding())
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.2),
            jnp.asarray(1),
        )
        res[rm] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(res[mesh8], res[mesh1], rtol=1e-5, atol=1e-6)


def test_auto_unique_cap_exact(mesh1, monkeypatch):
    """HCTR_TPU_UCAP_FACTOR=auto measures the first batch's unique count and
    compiles a right-sized window; results stay exact vs the uncapped path
    (cond fallback covers later overflow)."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=100_000, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(17)
    keys = rng.integers(0, 256, (512, 4)).astype(np.int32)  # few uniques
    d = rng.normal(size=(512, 8)).astype(np.float32)
    results = {}
    for mode in ("0", "auto"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        if mode == "auto":
            assert ebc.knob_ucap_auto
            ebc.auto_unique_caps({"f": keys})
            gname = list(ebc.unique_caps)[0]
            # 256 possible uniques -> cap rounds to 512, far below K=2048
            assert ebc.unique_caps[gname] == 512
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3),
            jnp.asarray(1),
        )
        results[mode] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(
        results["auto"], results["0"], rtol=1e-6, atol=1e-7
    )


def test_auto_unique_cap_overflow_falls_back(mesh1, monkeypatch):
    """A later batch with MORE uniques than the measured cap must take the
    exact full-K fallback, not drop gradients."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=100_000, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(23)
    few = rng.integers(0, 200, (512, 4)).astype(np.int32)
    many = np.arange(512 * 4, dtype=np.int32).reshape(512, 4)  # all unique
    d = rng.normal(size=(512, 8)).astype(np.float32)
    results = {}
    for mode in ("0", "auto"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        if mode == "auto":
            ebc.auto_unique_caps({"f": few})  # cap sized for `few`
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        step = jax.jit(ebc.backward_and_update)
        tables, state = step(
            tables, state, {"f": many}, {"e": d}, jnp.asarray(0.3),
            jnp.asarray(1),
        )
        results[mode] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(
        results["auto"], results["0"], rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize(
    "opt_kind",
    [
        Optimizer_t.AdaGrad,
        Optimizer_t.RowWiseAdaGrad,
        Optimizer_t.Adam,
        Optimizer_t.FTRL,
        Optimizer_t.MomentumSGD,
    ],
)
def test_dense_update_path_matches_trio(mesh1, monkeypatch, opt_kind):
    """HCTR_TPU_DENSE_UPDATE_ROWS (small-shard dense-sweep update) must
    produce the same result as the windowed gather/scatter trio for every
    stateful optimizer, including untouched-row state bit-identity."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=4096, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(
        opt_kind, lr=0.3, epsilon=1e-7, momentum_factor=0.9,
        lambda1=0.01, lambda2=0.01, ftrl_beta=0.1,
    )
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 4096, (256, 4)).astype(np.int32)
    keys[0, 3] = INVALID_KEY
    d = rng.normal(size=(256, 8)).astype(np.float32)
    res = {}
    for mode in ("0", "262144"):
        monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        for step in (1, 2):
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3),
                jnp.asarray(step),
            )
        res[mode] = (
            ebc.export_table(tables, "t"),
            {k: np.asarray(v) for k, v in state[list(state)[0]].items()},
        )
    np.testing.assert_allclose(res["262144"][0], res["0"][0], rtol=2e-5,
                               atol=1e-6)
    for k in res["0"][1]:
        np.testing.assert_allclose(
            res["262144"][1][k], res["0"][1][k], rtol=2e-5, atol=1e-6,
            err_msg=f"state slot {k}",
        )


@pytest.mark.parametrize(
    "opt_kind", [Optimizer_t.AdaGrad, Optimizer_t.RowWiseAdaGrad]
)
def test_dense_grad_dtype_bf16(mesh1, monkeypatch, opt_kind):
    """HCTR_TPU_DENSE_GRAD_DTYPE=bfloat16 (bf16 dense-grad scatter buffer)
    tracks the exact f32 buffer within bf16 rounding for the AdaGrad family
    (the only optimizers the knob applies to — others keep the exact f32
    touch-count column)."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=2048, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 8)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(opt_kind, lr=0.1, epsilon=1e-7)
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2048, (128, 8)).astype(np.int32)
    d = rng.normal(size=(128, 8)).astype(np.float32)
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "262144")
    res = {}
    for mode in ("float32", "bfloat16"):
        monkeypatch.setenv("HCTR_TPU_DENSE_GRAD_DTYPE", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        tables = ebc.init(jax.random.key(9))
        state = ebc.init_optimizer(tables)
        for step in (1, 2):
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.1),
                jnp.asarray(step),
            )
        res[mode] = ebc.export_table(tables, "t")
    # Elementwise AdaGrad's first-touch delta is ~lr*sign(g): rows whose
    # duplicate-summed gradient cancels to ~0 can flip sign under bf16
    # rounding (intrinsic to ANY bf16 accumulation, incl. the gated bf16
    # segsum path) — compare only where the exact summed grad is not tiny.
    g_exact = np.zeros((2048, 8), np.float64)
    np.add.at(g_exact, keys.ravel(), np.repeat(d, 8, axis=0))
    solid = np.abs(g_exact) > 1e-2
    np.testing.assert_allclose(
        res["bfloat16"][solid], res["float32"][solid], rtol=0.02, atol=0.01
    )
    # must differ somewhere (proves the bf16 path actually engaged)
    assert not np.array_equal(res["bfloat16"], res["float32"])


def test_dense_update_path_sharded(mesh8, mesh1, monkeypatch):
    """Dense-sweep update on the 8-way MP engine == single-device."""
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "262144")
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=512, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    rng = np.random.default_rng(7)
    keys = random_keys(rng, 64, 4, 512)
    d = rng.normal(size=(64, 8)).astype(np.float32)
    shared = rng.normal(size=(512, 8)).astype(np.float32)
    res = {}
    for rm in (mesh8, mesh1):
        compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
        opt = OptParams(Optimizer_t.AdaGrad, lr=0.2, epsilon=1e-7)
        ebc = EmbeddingCollection(compiled, rm, opt)
        tables = ebc.init(jax.random.key(1))
        tables = ebc.import_table(tables, "t", shared)
        state = ebc.init_optimizer(tables)
        kd = jax.device_put(keys, rm.batch_sharding())
        dd = jax.device_put(d, rm.batch_sharding())
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.2),
            jnp.asarray(1),
        )
        res[rm] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(res[mesh8], res[mesh1], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("batch_kind", ["sparse", "dense_fallback"])
def test_valid_prefix_compaction_exact(mesh1, monkeypatch, batch_kind):
    """Valid-prefix compaction (auto-measured): a mostly-padding key list
    runs its forward gather and whole post-sort backward chain on the
    measured valid prefix; a later batch with MORE valid keys than the cap
    takes the exact full-K cond fallback. Both must equal the uncompacted
    path bit-for-bit in f32 tolerance."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=100_000, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 8)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(41)

    def sparse_batch(seed):
        r = np.random.default_rng(seed)
        k = r.integers(0, 100_000, (256, 8)).astype(np.int32)
        mask = r.random((256, 8)) < 0.9  # ~90% padding
        k[mask] = INVALID_KEY
        return k

    first = sparse_batch(1)
    test_keys = sparse_batch(2) if batch_kind == "sparse" else (
        rng.integers(0, 100_000, (256, 8)).astype(np.int32)  # all valid
    )
    d = rng.normal(size=(256, 8)).astype(np.float32)
    results = {}
    for mode in ("0", "auto"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        if mode == "auto":
            ebc.auto_unique_caps({"f": first})
            gname = list(ebc.valid_caps)[0]
            assert ebc.valid_caps[gname] < 256 * 8
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        fwd = np.asarray(jax.jit(ebc.forward)(tables, {"f": test_keys})["e"])
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": test_keys}, {"e": d}, jnp.asarray(0.3),
            jnp.asarray(1),
        )
        results[mode] = (fwd, ebc.export_table(tables, "t"))
    np.testing.assert_allclose(
        results["auto"][0], results["0"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results["auto"][1], results["0"][1], rtol=1e-5, atol=1e-6
    )


def test_valid_prefix_compaction_dense_path(mesh1, monkeypatch):
    """Valid-prefix slice composes with the small-shard dense-sweep update."""
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "262144")
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=4096, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 8)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.RowWiseAdaGrad, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(43)
    keys = rng.integers(0, 4096, (256, 8)).astype(np.int32)
    keys[rng.random((256, 8)) < 0.9] = INVALID_KEY
    d = rng.normal(size=(256, 8)).astype(np.float32)
    results = {}
    for mode in ("0", "auto"):
        monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", mode)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        if mode == "auto":
            ebc.auto_unique_caps({"f": keys})
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3),
            jnp.asarray(1),
        )
        results[mode] = ebc.export_table(tables, "t")
    np.testing.assert_allclose(
        results["auto"], results["0"], rtol=1e-5, atol=1e-6
    )


def test_big_operand_sorted_forward_matches(mesh1, monkeypatch):
    """HCTR_TPU_FWD_SORTED_BYTES: forcing the sorted-gather forward (the
    multi-GB shared-group path — input-order gathers pay the ~30 ns/row TLB
    rate, sorted gathers hold ~6 ns/row) must be numerically identical to
    the masked-gather forward, mean/concat included."""
    monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", "0")
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    rng = np.random.default_rng(21)
    batch = 16
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    outs = {}
    for thr in ("0", "1"):  # off vs force-on (1 byte threshold)
        monkeypatch.setenv("HCTR_TPU_FWD_SORTED_BYTES", thr)
        compiled = compile_plan(lookups, plan, num_shards=1)
        ebc = EmbeddingCollection(
            compiled, mesh1, OptParams(Optimizer_t.SGD, lr=0.1)
        )
        assert ebc.knob_fwd_sorted_bytes == int(thr)
        tables = ebc.init(jax.random.key(3))
        o = jax.jit(ebc.forward)(tables, feats)
        outs[thr] = {k: np.asarray(v) for k, v in o.items()}
    for k in outs["0"]:
        np.testing.assert_allclose(
            outs["1"][k], outs["0"][k], rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "opt_kind", [Optimizer_t.AdaGrad, Optimizer_t.RowWiseAdaGrad]
)
def test_dense_key_ratio_rule_matches_trio(mesh1, monkeypatch, opt_kind):
    """HCTR_TPU_DENSE_KEY_RATIO: key-dense big shards (K >= ratio*R) take
    the dense-sweep update even above DENSE_UPDATE_ROWS, exactly (measured
    +27% on the 200-table EBC case, K/R=0.55)."""
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=4096, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 16)]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(opt_kind, lr=0.3, epsilon=1e-7)
    rng = np.random.default_rng(33)
    keys = rng.integers(0, 4096, (256, 16)).astype(np.int32)  # K=4096=R
    keys[0, 3] = INVALID_KEY
    d = rng.normal(size=(256, 8)).astype(np.float32)
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "0")
    res = {}
    for ratio in ("0", "0.5"):
        monkeypatch.setenv("HCTR_TPU_DENSE_KEY_RATIO", ratio)
        ebc = EmbeddingCollection(compiled, mesh1, opt)
        assert ebc.knob_dense_key_ratio == float(ratio)
        tables = ebc.init(jax.random.key(4))
        state = ebc.init_optimizer(tables)
        for step in (1, 2):
            tables, state = jax.jit(ebc.backward_and_update)(
                tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3),
                jnp.asarray(step),
            )
        res[ratio] = (
            ebc.export_table(tables, "t"),
            {k: np.asarray(v) for k, v in state[list(state)[0]].items()},
        )
    np.testing.assert_allclose(res["0.5"][0], res["0"][0], rtol=2e-5,
                               atol=1e-6)
    for k in res["0"][1]:
        np.testing.assert_allclose(
            res["0.5"][1][k], res["0"][1][k], rtol=2e-5, atol=1e-6,
            err_msg=f"state slot {k}",
        )


def test_dense_ratio_guarded_for_unmeasured_window_groups(mesh1, monkeypatch):
    """Windowed (hot/cold) key lists are mostly padding; without a measured
    valid cap the ratio rule must NOT count the padded list length (review
    finding: HOT_ROWS without UCAP auto would misroute cold tiers onto the
    R-proportional dense sweep)."""
    monkeypatch.setenv("HCTR_TPU_DENSE_KEY_RATIO", "0.3")
    t = EmbeddingTableConfig(name="t", max_vocabulary_size=4096, ev_size=8)
    lookups = [
        LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4, key_lo=0, key_hi=1024,
                     key_shift=0),
    ]
    plan = ShardingPlan(strategy=[("mp", ["t"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    ebc = EmbeddingCollection(compiled, mesh1, OptParams(Optimizer_t.AdaGrad, lr=0.1))
    (g,) = compiled.groups
    assert ebc._opt_knobs(g.name)["dense_ratio"] == 0.0  # guarded
    # measured valid cap restores the rule
    ebc.valid_caps[g.name] = 512
    assert ebc._opt_knobs(g.name)["dense_ratio"] == 0.3
    # non-windowed groups keep the rule without a measurement
    lookups2 = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 4)]
    compiled2 = compile_plan(lookups2, plan, num_shards=1)
    ebc2 = EmbeddingCollection(
        compiled2, mesh1, OptParams(Optimizer_t.AdaGrad, lr=0.1)
    )
    (g2,) = compiled2.groups
    assert ebc2._opt_knobs(g2.name)["dense_ratio"] == 0.3
