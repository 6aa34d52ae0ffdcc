"""Weighted (per-key sp_weight) embedding lookups vs a NumPy oracle.

Reference semantics (HugeCTR/embedding/operators/weighted_model_forward.cu,
weighted_network_forward.cu:71, weighted_model_backward.cu:127,
weighted_mp_index_calculation.cu): forward pools sum(w_i * e_i), the mean
("Average") combiner divides by sum(w_i), and row gradients scale by w_i.
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


def make_weighted_lookups():
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=100, ev_size=8)
    t1 = EmbeddingTableConfig(name="t1", max_vocabulary_size=57, ev_size=8)
    t2 = EmbeddingTableConfig(name="t2", max_vocabulary_size=31, ev_size=8)
    return [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4, sp_weight_name="w0"),
        LookupConfig(1, t1, "f1", "e1", Combiner_t.Mean, 3, sp_weight_name="w1"),
        # unweighted lookup sharing a group with weighted ones
        LookupConfig(2, t0, "f2", "e2", Combiner_t.Sum, 2),
        LookupConfig(3, t2, "f3", "e3", Combiner_t.Concat, 2, sp_weight_name="w3"),
    ]


def random_keys(rng, batch, hotness, vocab, pad_prob=0.3):
    keys = rng.integers(0, vocab, size=(batch, hotness)).astype(np.int32)
    mask = rng.random((batch, hotness)) < pad_prob
    mask[:, 0] = False
    keys[mask] = INVALID_KEY
    return keys


def oracle_forward(lookups, tables, feats, weights):
    outs = {}
    for lk in lookups:
        keys = feats[lk.bottom_name]
        tab = tables[lk.table.name]
        valid = keys != INVALID_KEY
        safe = np.where(valid, keys, 0)
        w = (
            weights[lk.sp_weight_name]
            if lk.sp_weight_name
            else np.ones_like(keys, np.float32)
        ) * valid
        rows = tab[safe] * w[..., None]
        if lk.combiner == Combiner_t.Concat:
            outs[lk.top_name] = rows.reshape(keys.shape[0], -1)
        elif lk.combiner == Combiner_t.Mean:
            if lk.sp_weight_name:
                den = w.sum(1, keepdims=True)
                den = np.where(den == 0, 1.0, den)
            else:
                den = np.maximum(valid.sum(1, keepdims=True), 1)
            outs[lk.top_name] = rows.sum(1) / den
        else:
            outs[lk.top_name] = rows.sum(1)
    return outs


def oracle_sgd(lookups, tables, feats, weights, d_outs, lr):
    for lk in lookups:
        keys = feats[lk.bottom_name]
        d = d_outs[lk.top_name]
        tab = tables[lk.table.name]
        valid = keys != INVALID_KEY
        b, h = keys.shape
        e = tab.shape[1]
        w = (
            weights[lk.sp_weight_name]
            if lk.sp_weight_name
            else np.ones_like(keys, np.float32)
        ) * valid
        if lk.combiner == Combiner_t.Concat:
            d_rows = d.reshape(b, h, e) * w[..., None]
        elif lk.combiner == Combiner_t.Mean:
            if lk.sp_weight_name:
                den = w.sum(1, keepdims=True)
                den = np.where(den == 0, 1.0, den)
            else:
                den = np.maximum(valid.sum(1, keepdims=True), 1)
            d_rows = (d / den)[:, None, :] * w[..., None]
        else:
            d_rows = d[:, None, :] * w[..., None]
        for bi in range(b):
            for hi in range(h):
                if valid[bi, hi]:
                    tab[keys[bi, hi]] -= lr * d_rows[bi, hi]


def _data(rng, batch=32):
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 100, pad_prob=0.0),
        "f3": random_keys(rng, batch, 2, 31, pad_prob=0.0),
    }
    # mixed-sign weights, plus one all-zero weight row to hit the den==0 guard
    weights = {
        "w0": rng.normal(size=(batch, 4)).astype(np.float32),
        "w1": rng.random((batch, 3)).astype(np.float32) + 0.1,
        "w3": rng.normal(size=(batch, 2)).astype(np.float32),
    }
    weights["w1"][0, :] = 0.0
    return feats, weights


@pytest.mark.parametrize("strategy", ["all_mp", "all_dp", "mixed"])
def test_weighted_forward_matches_oracle(mesh8, strategy):
    lookups = make_weighted_lookups()
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
    rng = np.random.default_rng(7)
    feats, weights = _data(rng)
    sh = mesh8.batch_sharding()
    feats_dev = {k: jax.device_put(v, sh) for k, v in feats.items()}
    w_dev = {k: jax.device_put(v, sh) for k, v in weights.items()}
    outs = jax.jit(ebc.forward)(tables, feats_dev, feature_weights=w_dev)
    dense = {n: ebc.export_table(tables, n) for n in names}
    ref = oracle_forward(lookups, dense, feats, weights)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("strategy", ["all_mp", "mixed"])
def test_weighted_sgd_backward_matches_oracle(mesh8, strategy):
    lookups = make_weighted_lookups()
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
    rng = np.random.default_rng(8)
    batch = 32
    feats, weights = _data(rng, batch)
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 8)).astype(np.float32),
        "e3": rng.normal(size=(batch, 16)).astype(np.float32),
    }
    dense = {n: np.array(ebc.export_table(tables, n)) for n in names}
    oracle_sgd(lookups, dense, feats, weights, d_outs, lr)
    sh = mesh8.batch_sharding()
    feats_dev = {k: jax.device_put(v, sh) for k, v in feats.items()}
    w_dev = {k: jax.device_put(v, sh) for k, v in weights.items()}
    d_dev = {k: jax.device_put(v, sh) for k, v in d_outs.items()}
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_dev, d_dev, jnp.asarray(lr), jnp.asarray(1),
        feature_weights=w_dev,
    )
    for n in names:
        np.testing.assert_allclose(
            ebc.export_table(tables, n), dense[n], rtol=1e-4, atol=1e-5
        )


def test_weighted_adagrad_8way_matches_1way(mesh8, mesh1):
    """Weighted lookups with a stateful optimizer: 8-way sharded training
    step == single-device step (covers the per-key grad expansion through
    the sort/segsum dedup path on both meshes)."""
    lookups = make_weighted_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1"]), ("dp", ["t2"])])
    rng = np.random.default_rng(9)
    batch = 16
    feats, weights = _data(rng, batch)
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 8)).astype(np.float32),
        "e3": rng.normal(size=(batch, 16)).astype(np.float32),
    }
    results = {}
    fwd_results = {}
    for rm in (mesh8, mesh1):
        compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
        ebc = EmbeddingCollection(
            compiled, rm, OptParams(Optimizer_t.AdaGrad, lr=0.1)
        )
        tables = ebc.init(jax.random.key(0))
        # identical dense content across mesh sizes
        dense = {}
        for n in ("t0", "t1", "t2"):
            g, ti = ebc._find_table(n)
            v = int(g.table_vocab[ti])
            dense[n] = np.asarray(
                np.random.default_rng(17).normal(size=(v, 8)), np.float32
            )
            tables = ebc.import_table(tables, n, dense[n])
        opt_state = ebc.init_optimizer(tables)
        sh = rm.batch_sharding()
        feats_dev = {k: jax.device_put(v, sh) for k, v in feats.items()}
        w_dev = {k: jax.device_put(v, sh) for k, v in weights.items()}
        d_dev = {k: jax.device_put(v, sh) for k, v in d_outs.items()}
        outs = jax.jit(ebc.forward)(tables, feats_dev, feature_weights=w_dev)
        fwd_results[rm] = {k: np.asarray(v) for k, v in outs.items()}
        tables, opt_state = jax.jit(ebc.backward_and_update)(
            tables, opt_state, feats_dev, d_dev,
            jnp.asarray(0.1), jnp.asarray(1), feature_weights=w_dev,
        )
        results[rm] = {n: ebc.export_table(tables, n) for n in ("t0", "t1", "t2")}
    for k in fwd_results[mesh8]:
        np.testing.assert_allclose(
            fwd_results[mesh8][k], fwd_results[mesh1][k], rtol=1e-4, atol=1e-5
        )
    for n in results[mesh8]:
        np.testing.assert_allclose(
            results[mesh8][n], results[mesh1][n], rtol=1e-4, atol=1e-5
        )


def test_all_ones_weights_match_unweighted(mesh8):
    """sp_weights of 1.0 must reproduce the unweighted engine exactly."""
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=64, ev_size=8)
    mk = lambda wname: [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4, sp_weight_name=wname),
        LookupConfig(1, t0, "f1", "e1", Combiner_t.Mean, 3, sp_weight_name=wname and "w1"),
    ]
    plan = ShardingPlan(strategy=[("mp", ["t0"])])
    rng = np.random.default_rng(11)
    batch = 16
    feats = {
        "f0": random_keys(rng, batch, 4, 64),
        "f1": random_keys(rng, batch, 3, 64),
    }
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = np.asarray(rng.normal(size=(64, 8)), np.float32)
    out_tabs = {}
    for wname in ("w0", ""):
        lookups = mk(wname)
        compiled = compile_plan(lookups, plan, num_shards=mesh8.data_parallel_size)
        ebc = EmbeddingCollection(
            compiled, mesh8, OptParams(Optimizer_t.AdaGrad, lr=0.1)
        )
        tables = ebc.init(jax.random.key(0))
        tables = ebc.import_table(tables, "t0", dense)
        opt_state = ebc.init_optimizer(tables)
        sh = mesh8.batch_sharding()
        feats_dev = {k: jax.device_put(v, sh) for k, v in feats.items()}
        d_dev = {k: jax.device_put(v, sh) for k, v in d_outs.items()}
        fw = (
            {
                "w0": jax.device_put(np.ones((batch, 4), np.float32), sh),
                "w1": jax.device_put(np.ones((batch, 3), np.float32), sh),
            }
            if wname
            else None
        )
        outs = jax.jit(ebc.forward)(tables, feats_dev, feature_weights=fw)
        tables, opt_state = jax.jit(ebc.backward_and_update)(
            tables, opt_state, feats_dev, d_dev,
            jnp.asarray(0.1), jnp.asarray(1), feature_weights=fw,
        )
        out_tabs[wname] = (
            {k: np.asarray(v) for k, v in outs.items()},
            ebc.export_table(tables, "t0"),
        )
    for k in out_tabs["w0"][0]:
        np.testing.assert_allclose(
            out_tabs["w0"][0][k], out_tabs[""][0][k], rtol=1e-6, atol=1e-6
        )
    np.testing.assert_allclose(
        out_tabs["w0"][1], out_tabs[""][1], rtol=1e-6, atol=1e-6
    )


def test_config_api_plumbs_sp_weight(mesh1):
    """EmbeddingCollectionConfig.embedding_lookup(sp_weight_name=...) reaches
    the compiled plan."""
    from hugectr_tpu.embedding.config import EmbeddingCollectionConfig

    t = EmbeddingTableConfig(name="t0", max_vocabulary_size=50, ev_size=8)
    ebc_cfg = EmbeddingCollectionConfig()
    ebc_cfg.embedding_lookup([t, t], ["f0", "f1"], "emb", "sum",
                             sp_weight_name=["w0", ""])
    lks = ebc_cfg.build_lookup_configs()
    assert lks[0].sp_weight_name == "w0"
    assert lks[1].sp_weight_name == ""
    compiled = compile_plan(
        lks, ebc_cfg.sharding_plan(), num_shards=1
    )
    (g,) = compiled.groups
    assert g.has_weights
    assert g.lookups[0].sp_weight_name == "w0"


def test_model_level_weighted_lookup(mesh1):
    """Model wiring: embedding_lookup(sp_weight_name=...) pulls the weight
    feature from the batch through check_out_tensor/eval (reference: the
    sparse-value tensors feeding the weighted embedding path)."""
    import hugectr_tpu as hugectr
    from hugectr_tpu.core.types import DataReaderType_t

    B = 8
    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=B, batchsize=B, lr=0.01
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=2
    )
    model = hugectr.Model(
        solver, reader,
        hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.SGD),
        resource_manager=mesh1,
    )
    model.add(
        hugectr.Input(
            label_dim=1, label_name="label", dense_dim=2, dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 3, True, 1)
            ],
        )
    )
    t = hugectr.EmbeddingTableConfig(name="t0", max_vocabulary_size=40, ev_size=8)
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup([t], ["d0"], "emb", ["sum"], sp_weight_name=["w0"])
    ebc.shard(shard_matrix=[["t0"]], shard_strategy=[("mp", ["t0"])])
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "dense"], top_names=["c"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["c"], top_names=["out"], num_output=1,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["out", "label"], top_names=["loss"],
        )
    )
    model.compile()
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 40, (B, 3)).astype(np.int32)
    w = rng.normal(size=(B, 3)).astype(np.float32)
    batch = {
        "label": np.zeros((B, 1), np.float32),
        "dense": np.zeros((B, 2), np.float32),
        "d0": keys,
        "w0": w,
    }
    emb = np.asarray(model.check_out_tensor("emb", dict(batch)))
    tab = model.ec.export_table(model.state["emb_tables"], "t0")
    want = (tab[keys] * w[..., None]).sum(1)
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-5)
    # missing weight feature raises with a clear message
    bad = {k: v for k, v in batch.items() if k != "w0"}
    with pytest.raises(KeyError, match="w0"):
        model.check_out_tensor("emb", bad)


# ------------------- round 5: weighted lookups on the FAST engines --------
def _split_lookups():
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=100, ev_size=8)
    return [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 4, sp_weight_name="w0"),
        LookupConfig(1, t0, "f1", "e1", Combiner_t.Mean, 3, sp_weight_name="w1"),
    ]


def _split_data(rng, batch=32):
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 100),
    }
    weights = {
        "w0": rng.normal(size=(batch, 4)).astype(np.float32),
        "w1": rng.random((batch, 3)).astype(np.float32) + 0.1,
    }
    weights["w1"][0, :] = 0.0  # den==0 guard
    return feats, weights


@pytest.mark.parametrize("superhot", [0, 8])
def test_weighted_hot_cold_split_matches_oracle(mesh1, monkeypatch, superhot):
    """Weighted Sum/Mean lookups split into hot/cold tiers (plus the one-hot
    superhot tier when enabled) and still match the unsplit oracle exactly —
    the round-4 'weighted tables never split/onehot' exclusion is gone."""
    monkeypatch.setenv("HCTR_TPU_HOT_ROWS", "16")
    monkeypatch.setenv("HCTR_TPU_SUPERHOT_ROWS", str(superhot))
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "8" if superhot else "0")
    lookups = _split_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    assert compiled.merges, "expected a hot/cold split for the weighted table"
    if superhot:
        assert any(
            g.compute_kind == "onehot" for g in compiled.groups
        ), "superhot tier should compile to the one-hot engine"
    lr = 0.1
    ebc = EmbeddingCollection(compiled, mesh1, OptParams(Optimizer_t.SGD, lr=lr))
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)
    rng = np.random.default_rng(11)
    feats, weights = _split_data(rng)
    dense = {"t0": np.array(ebc.export_table(tables, "t0"))}
    ref = oracle_forward(lookups, dense, feats, weights)
    feats_d = {k: jax.device_put(v) for k, v in feats.items()}
    w_d = {k: jax.device_put(v) for k, v in weights.items()}
    outs = jax.jit(ebc.forward)(tables, feats_d, w_d)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )
    d_outs = {
        "e0": rng.normal(size=(32, 8)).astype(np.float32),
        "e1": rng.normal(size=(32, 8)).astype(np.float32),
    }
    oracle_sgd(lookups, dense, feats, weights, d_outs, lr)
    d_d = {k: jax.device_put(v) for k, v in d_outs.items()}
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_d, d_d, jnp.asarray(lr), jnp.asarray(1), w_d
    )
    np.testing.assert_allclose(
        ebc.export_table(tables, "t0"), dense["t0"], rtol=1e-4, atol=1e-5
    )


def test_weighted_onehot_engine_matches_oracle(mesh1, monkeypatch):
    """Weighted lookups on the one-hot MXU engine: per-key weights ride the
    counts matrix; fwd + SGD backward match the oracle."""
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "128")
    lookups = _split_lookups()
    plan = ShardingPlan(strategy=[("dp", ["t0"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    assert all(g.compute_kind == "onehot" for g in compiled.groups)
    lr = 0.1
    ebc = EmbeddingCollection(compiled, mesh1, OptParams(Optimizer_t.SGD, lr=lr))
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)
    rng = np.random.default_rng(12)
    feats, weights = _split_data(rng)
    dense = {"t0": np.array(ebc.export_table(tables, "t0"))}
    ref = oracle_forward(lookups, dense, feats, weights)
    feats_d = {k: jax.device_put(v) for k, v in feats.items()}
    w_d = {k: jax.device_put(v) for k, v in weights.items()}
    outs = jax.jit(ebc.forward)(tables, feats_d, w_d)
    for lk in lookups:
        np.testing.assert_allclose(
            np.asarray(outs[lk.top_name]), ref[lk.top_name],
            rtol=1e-5, atol=1e-5,
        )
    d_outs = {
        "e0": rng.normal(size=(32, 8)).astype(np.float32),
        "e1": rng.normal(size=(32, 8)).astype(np.float32),
    }
    oracle_sgd(lookups, dense, feats, weights, d_outs, lr)
    d_d = {k: jax.device_put(v) for k, v in d_outs.items()}
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state, feats_d, d_d, jnp.asarray(lr), jnp.asarray(1), w_d
    )
    np.testing.assert_allclose(
        ebc.export_table(tables, "t0"), dense["t0"], rtol=1e-4, atol=1e-5
    )


def test_weighted_onehot_cross_sample_weight_cancel(mesh1, monkeypatch):
    """Signed weights that cancel ACROSS samples (+1, -1 on the same key)
    must still apply the row's update — the touch counts sum |counts|, not
    the signed column sum (plan.py exactness note)."""
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "64")
    t0 = EmbeddingTableConfig(name="t0", max_vocabulary_size=16, ev_size=4)
    lookups = [
        LookupConfig(0, t0, "f0", "e0", Combiner_t.Sum, 1, sp_weight_name="w0")
    ]
    plan = ShardingPlan(strategy=[("dp", ["t0"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    assert compiled.groups[0].compute_kind == "onehot"
    ebc = EmbeddingCollection(compiled, mesh1, OptParams(Optimizer_t.SGD, lr=1.0))
    tables = ebc.init(jax.random.key(0))
    opt_state = ebc.init_optimizer(tables)
    feats = {"f0": np.array([[5], [5]], np.int32)}  # same key twice
    weights = {"w0": np.array([[1.0], [-1.0]], np.float32)}
    d_outs = {"e0": np.array([[1, 0, 0, 0], [0, 0, 0, 0]], np.float32)}
    before = np.array(ebc.export_table(tables, "t0"))
    tables, opt_state = jax.jit(ebc.backward_and_update)(
        tables, opt_state,
        {k: jax.device_put(v) for k, v in feats.items()},
        {k: jax.device_put(v) for k, v in d_outs.items()},
        jnp.asarray(1.0), jnp.asarray(1),
        {k: jax.device_put(v) for k, v in weights.items()},
    )
    after = np.array(ebc.export_table(tables, "t0"))
    # grad[5] = (+1)*d0 + (-1)*d1 = [1,0,0,0]; SGD lr=1 -> row 5 -= grad
    np.testing.assert_allclose(
        after[5], before[5] - np.array([1, 0, 0, 0]), rtol=1e-5, atol=1e-6
    )
