"""Host-spill tier for EBC dynamic tables (HierarchicalKV analog —
reference: SOK hkv backend; embedding_training_cache.hpp staged host PS).
Exactness: rows spilled to the host master and staged back must carry the
trained values AND optimizer state bit-for-bit."""
import numpy as np
import jax
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t
from hugectr_tpu.embedding.host_spill import HostSpillTier


def _model(rm, capacity=32):
    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=8, batchsize=8, lr=0.2,
        repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=2
    )
    model = hugectr.Model(
        solver, reader,
        hugectr.CreateOptimizer(
            optimizer_type=hugectr.Optimizer_t.AdaGrad, initial_accu_value=0.0
        ),
        resource_manager=rm,
    )
    model.add(
        hugectr.Input(
            label_dim=1, label_name="label", dense_dim=2, dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    t = hugectr.EmbeddingTableConfig(
        name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=capacity
    )
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup([t], ["d0"], "emb", ["sum"])
    ebc.shard(shard_matrix=[["dyn"]], shard_strategy=[("mp", ["dyn"])])
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
            act_type=hugectr.Activation_t.Non,  # relu(0) would kill the
            # cold-start gradient: a dynamic table's first batch pools to 0
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["out", "label"], top_names=["loss"],
        )
    )
    model.compile()
    return model


def _train_on(model, keys):
    batch = {
        "label": np.random.default_rng(0).random((8, 1)).round().astype(np.float32),
        "dense": np.zeros((8, 2), np.float32),
        "d0": np.asarray(keys, np.int32).reshape(8, 2),
    }
    dev = model._put_batch(dict(batch))
    model._rng, sub = jax.random.split(model._rng)
    model.state, loss = model._train_step(model.state, dev, sub)
    assert np.isfinite(float(loss))


def _device_row(model, key):
    ec = model.ec
    g, ti = ec._find_table("dyn")
    ks = ec._host_key_store(model.state["emb_tables"], g)
    slots = ec._dynamic_host_slots(ks, g, ti, np.asarray([key]))
    if slots[0] < 0:
        return None, None
    rep = jax.jit(lambda x: x, out_shardings=ec.rm.replicated_sharding())
    vec = np.asarray(rep(model.state["emb_tables"][g.name]))[slots[0]].copy()
    acc = np.asarray(rep(model.state["eopt"][g.name]["accum"]))[slots[0]].copy()
    return vec, acc


def test_spill_and_stage_back_roundtrip(mesh1):
    model = _model(mesh1, capacity=32)
    model.start_data_reading()
    tier = HostSpillTier(model, "dyn", spill_watermark=0.75)

    keys_a = np.arange(16)  # 8x2
    tier.stage_batch(keys_a)
    _train_on(model, keys_a)
    vec3, acc3 = _device_row(model, 3)
    assert vec3 is not None and np.abs(vec3).sum() > 0
    assert acc3.sum() > 0  # AdaGrad accum advanced

    tier.spill(evict_frac=1.0)  # full flush: every live row to the master
    assert tier.host_size == 16
    assert _device_row(model, 3)[0] is None  # device set cleared
    np.testing.assert_allclose(tier.lookup_host(3), vec3, rtol=1e-6)

    # a different working set trains while key 3 lives on the host
    keys_b = np.arange(100, 116)
    tier.stage_batch(keys_b)
    _train_on(model, keys_b)
    assert _device_row(model, 3)[0] is None

    # staging key 3 back restores value AND optimizer state exactly
    staged = tier.stage_batch(np.asarray([3] * 16))
    assert staged == 1
    vec3b, acc3b = _device_row(model, 3)
    np.testing.assert_allclose(vec3b, vec3, rtol=1e-6)
    np.testing.assert_allclose(acc3b, acc3, rtol=1e-6)


def test_watermark_auto_spill(mesh1):
    model = _model(mesh1, capacity=32)
    model.start_data_reading()
    tier = HostSpillTier(model, "dyn", spill_watermark=0.5)  # spill at 16
    seen = {}
    for lo in (0, 16, 32, 48):
        keys = np.arange(lo, lo + 16)
        tier.stage_batch(keys)
        _train_on(model, keys)
        vec, _ = _device_row(model, lo)
        seen[lo] = vec
    # earlier working sets were spilled to the master (watermark 16 of 32)
    assert tier.host_size >= 16
    # every trained key remains reachable: device or host master
    for lo, vec in seen.items():
        dv, _ = _device_row(model, lo)
        hv = tier.lookup_host(lo)
        assert dv is not None or hv is not None
        if dv is None:
            # the master holds the value it was spilled with; keys not
            # retrained since (disjoint working sets) must match exactly
            np.testing.assert_allclose(hv, vec, rtol=1e-6)


def test_static_table_rejected(mesh1):
    model = _model(mesh1)
    with pytest.raises(KeyError):
        HostSpillTier(model, "nope")


def test_lru_eviction_keeps_hot_keys(mesh1):
    """spill() evicts the LEAST-recently-used subset: keys touched every
    batch survive the spill on-device (HKV cold-bucket eviction analog)."""
    model = _model(mesh1, capacity=64)
    model.start_data_reading()
    tier = HostSpillTier(model, "dyn", spill_watermark=0.9, evict_frac=0.5)
    hot = np.arange(8)  # first 8 keys ride in every batch
    for lo in (8, 16, 24, 32):
        keys = np.concatenate([hot, np.arange(lo, lo + 8)])
        tier.stage_batch(keys)
        _train_on(model, keys)
    evicted = tier.spill()  # explicit LRU spill of half the working set
    assert evicted > 0
    for k in hot:
        dv, _ = _device_row(model, int(k))
        assert dv is not None, f"hot key {k} was evicted before cold keys"


def test_steady_state_no_device_readback(mesh1, monkeypatch):
    """The per-batch staging path must NOT read the device key store back
    (the round-4 version paid a full readback every call)."""
    model = _model(mesh1, capacity=256)
    model.start_data_reading()
    tier = HostSpillTier(model, "dyn", spill_watermark=0.9, resync_interval=10**9)
    calls = {"n": 0}
    orig = tier._device_resident

    def counting():
        calls["n"] += 1
        return orig()

    monkeypatch.setattr(tier, "_device_resident", counting)
    for t in range(6):
        keys = np.arange(t * 16, t * 16 + 16)
        tier.stage_batch(keys)
        _train_on(model, keys)
    assert calls["n"] == 0, "steady-state staging read the device store back"


def test_vocab_4x_working_set_trains(mesh1):
    """Scale test: a key stream over 4x the device working set trains with
    spill active; every trained key stays reachable (device or master) and
    staged-back rows carry their trained values."""
    rng = np.random.default_rng(3)
    model = _model(mesh1, capacity=64)
    model.start_data_reading()
    tier = HostSpillTier(model, "dyn", spill_watermark=0.75)
    vocab = 256  # 4x the 64-row working set
    for _ in range(40):
        keys = rng.integers(0, vocab, 16)
        tier.stage_batch(keys)
        _train_on(model, keys)
    # coverage: most of the vocab was touched; none of it may be lost
    touched = 0
    for k in range(vocab):
        dv, _ = _device_row(model, k)
        hv = tier.lookup_host(k)
        if dv is not None or hv is not None:
            touched += 1
    assert touched > vocab // 2
    assert tier.host_size > 64  # master grew beyond the device working set
