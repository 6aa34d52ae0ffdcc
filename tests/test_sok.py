"""SOK-analog standalone lookup library tests (reference:
sparse_operation_kit function tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hugectr_tpu.sok as sok
from hugectr_tpu.core.types import Optimizer_t
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import EmbeddingTableConfig


def _engine(rm, dp=()):
    sok.init(rm)
    tables = [
        EmbeddingTableConfig(name="a", max_vocabulary_size=100, ev_size=8),
        EmbeddingTableConfig(name="b", max_vocabulary_size=50, ev_size=8),
    ]
    return sok.LookupEngine(
        tables,
        hotness=[3, 2],
        combiners=["sum", "mean"],
        opt=OptParams(Optimizer_t.SGD, lr=0.1),
        rm=rm,
        dp_tables=dp,
    )


def test_lookup_matches_manual(mesh8):
    eng = _engine(mesh8)
    tables = eng.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b = 16
    k0 = rng.integers(0, 100, (b, 3)).astype(np.int32)
    k1 = rng.integers(0, 50, (b, 2)).astype(np.int32)
    k0[0, 2] = -1  # padding
    outs = jax.jit(lambda t, a, c: eng.lookup(t, [a, c]))(
        tables,
        jax.device_put(k0, mesh8.batch_sharding()),
        jax.device_put(k1, mesh8.batch_sharding()),
    )
    ta = eng.ec.export_table(tables, "a")
    tb = eng.ec.export_table(tables, "b")
    want0 = np.stack(
        [ta[[k for k in row if k >= 0]].sum(0) for row in k0]
    )
    want1 = np.stack([tb[row].mean(0) for row in k1])
    np.testing.assert_allclose(np.asarray(outs[0]), want0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want1, rtol=1e-5, atol=1e-5)


def test_optimizer_wrapper_and_dump_load(mesh8, tmp_path):
    eng = _engine(mesh8)
    tables = eng.init(jax.random.key(1))
    wrapper = sok.OptimizerWrapper(eng)
    opt_state = wrapper.initialize(tables)
    rng = np.random.default_rng(1)
    b = 16
    keys = [
        jax.device_put(
            rng.integers(0, v, (b, h)).astype(np.int32), mesh8.batch_sharding()
        )
        for v, h in ((100, 3), (50, 2))
    ]
    d_outs = [
        jax.device_put(
            rng.normal(size=(b, 8)).astype(np.float32), mesh8.batch_sharding()
        )
        for _ in range(2)
    ]
    before = eng.ec.export_table(tables, "a").copy()
    tables, opt_state = jax.jit(wrapper.apply_gradients)(
        tables, opt_state, keys, d_outs, 0.1, 1
    )
    after = eng.ec.export_table(tables, "a")
    assert not np.allclose(before, after)
    # dump/load round trip
    sok.dump(str(tmp_path), eng, tables)
    tables2 = eng.init(jax.random.key(2))
    tables2 = sok.load(str(tmp_path), eng, tables2)
    np.testing.assert_allclose(
        eng.ec.export_table(tables2, "a"), after, rtol=1e-6
    )


def test_all2all_dense_embedding(mesh8):
    sok.init(mesh8)
    t = EmbeddingTableConfig(name="d", max_vocabulary_size=64, ev_size=16)
    eng = sok.LookupEngine(
        [t], [1], ["sum"], OptParams(Optimizer_t.SGD, lr=0.1), rm=mesh8
    )
    tables = eng.init(jax.random.key(3))
    keys = jax.device_put(
        np.arange(16, dtype=np.int32), mesh8.batch_sharding()
    )
    out = sok.all2all_dense_embedding(eng, tables, keys)
    td = eng.ec.export_table(tables, "d")
    np.testing.assert_allclose(np.asarray(out), td[:16], rtol=1e-6)


def test_evict_and_incremental_dump(mesh8):
    import jax.numpy as jnp

    eng = _engine(mesh8)
    tables = eng.init(jax.random.key(5))
    state = eng.ec.init_optimizer(tables)
    before = eng.ec.export_table(tables, "a")
    assert np.abs(before[7]).sum() > 0
    tables, state = eng.ec.evict(tables, state, "a", np.asarray([7, 13]))
    after = eng.ec.export_table(tables, "a")
    np.testing.assert_allclose(after[7], 0.0)
    np.testing.assert_allclose(after[13], 0.0)
    np.testing.assert_allclose(after[5], before[5])
    inc = sok.incremental_model_dump(eng, tables, {"a": np.asarray([5, 7])})
    np.testing.assert_allclose(inc["a"]["values"][0], before[5])
    np.testing.assert_allclose(inc["a"]["values"][1], 0.0)


def test_variable_create_and_train(mesh8):
    """sok.Variable: real distributed table object (distributed_variable.py
    analog) — lookup, gradient apply, assign/to_numpy round trip."""
    sok.init(mesh8)
    v = sok.Variable.create(
        rows=64, ev=8, key=jax.random.key(3), name="v0", max_hotness=2,
        opt_params=OptParams(Optimizer_t.SGD, lr=0.5),
    )
    assert v.shape == (64, 8)
    dense = np.random.default_rng(5).normal(size=(64, 8)).astype(np.float32)
    v.assign(dense)
    np.testing.assert_allclose(v.to_numpy(), dense, rtol=1e-6)
    keys = np.full((16, 2), -1, dtype=np.int32)
    keys[0] = [3, 9]
    keys[1] = [4, -1]
    out = np.asarray(v.lookup(keys))
    np.testing.assert_allclose(out[0], dense[3] + dense[9], rtol=1e-5)
    np.testing.assert_allclose(out[1], dense[4], rtol=1e-5)
    d = np.zeros((16, 8), dtype=np.float32)
    d[:2] = 1.0
    v.apply_gradients(keys, d, lr=0.5)
    after = v.to_numpy()
    np.testing.assert_allclose(after[3], dense[3] - 0.5, rtol=1e-5)
    np.testing.assert_allclose(after[0], dense[0], rtol=1e-6)  # untouched


def test_localized_variable_mode(mesh8):
    sok.init(mesh8)
    v = sok.Variable(
        rows=40, ev=8, key=jax.random.key(1), name="vloc",
        mode="localized:0",
    )
    g = v.engine.ec.plan.groups[0]
    assert g.num_shards == 1 and g.num_replicas == 8
    dense = np.random.default_rng(2).normal(size=(40, 8)).astype(np.float32)
    v.assign(dense)
    k = np.full((8, 1), -1, dtype=np.int32)
    k[0, 0] = 7
    out = np.asarray(v.lookup(k))
    np.testing.assert_allclose(out[0], dense[7], rtol=1e-5)


def test_dynamic_variable_full_lifecycle(mesh1):
    """sok.DynamicVariable: exact store, size/capacity, evict, reserve
    (dynamic_variable.py:34-305 analog)."""
    sok.init(mesh1)
    v = sok.DynamicVariable(
        dimension=8, initial_capacity=32, key=jax.random.key(0),
        max_hotness=2,
        opt_params=OptParams(Optimizer_t.SGD, lr=0.5),
    )
    assert v.capacity == 32 and v.size == 0
    keys = np.array([[1000001, 7], [42, -1]], dtype=np.int32)
    # first lookup misses (not yet inserted)
    np.testing.assert_array_equal(np.asarray(v.lookup(keys)), 0.0)
    v.apply_gradients(keys, np.ones((2, 8), np.float32), lr=0.5)
    assert v.size == 3
    out = np.asarray(v.lookup(keys))
    assert np.abs(out).sum() > 0
    v.evict(np.array([42]))
    assert v.size == 2
    v.reserve(128)
    assert v.capacity == 128 and v.size == 2
    out2 = np.asarray(v.lookup(keys))
    # rows for keys 1000001 and 7 survived the growth
    assert np.abs(out2[0]).sum() > 0


def test_dynamic_variable_hkv_host_spill(mesh1):
    """backend="hkv": trained vocabulary exceeds the device working set —
    rows spill to the host master and restage exactly on later lookups
    (HierarchicalKV host-tier analog, dynamic_variable.py backend='hkv')."""
    sok.init(mesh1)
    v = sok.DynamicVariable(
        dimension=4, initial_capacity=64, key=jax.random.key(1),
        backend="hkv", spill_watermark=0.5,
        opt_params=OptParams(Optimizer_t.SGD, lr=1.0),
    )
    # train 3 waves of 30 distinct keys each — 90 keys > device capacity 64
    # (rows start from random init; record post-train values per wave and
    # require the spill/restage roundtrip to reproduce them EXACTLY)
    waves = [np.arange(w * 30, (w + 1) * 30, dtype=np.int32) for w in range(3)]
    trained = []
    for w, ks in enumerate(waves):
        keys = ks.reshape(-1, 1)
        v.lookup(keys)  # stage (first wave: nothing to stage)
        d = np.full((30, 4), float(w + 1), np.float32)
        v.apply_gradients(keys, d, lr=1.0)
        trained.append(np.asarray(v.lookup(keys), np.float32))
    assert v.total_size == 90
    assert v.host_size > 0  # at least one spill happened
    for w, ks in enumerate(waves):
        out = np.asarray(v.lookup(ks.reshape(-1, 1)), np.float32)
        np.testing.assert_allclose(
            out, trained[w], rtol=1e-6, atol=0,
            err_msg=f"wave {w} rows lost or corrupted across spill/restage",
        )
    # second update on restaged rows accumulates correctly
    v.apply_gradients(waves[0].reshape(-1, 1), np.ones((30, 4), np.float32),
                      lr=1.0)
    out = np.asarray(v.lookup(waves[0].reshape(-1, 1)), np.float32)
    np.testing.assert_allclose(out, trained[0] - 1.0, rtol=1e-5)
    # evict removes from both tiers
    v.evict(np.array([0, 1, 2]))
    assert v.total_size == 87
    merged = v.export_merged()
    assert len(merged) == 87 and 0 not in merged
    # host rows freed by evict must NOT be reused for live keys: train a
    # fresh wave (forces a spill that upserts new keys into the host master)
    # and require every earlier key to survive bit-exact
    before = {k: np.array(val) for k, val in v.export_merged().items()}
    ks4 = np.arange(100, 130, dtype=np.int32).reshape(-1, 1)
    v.lookup(ks4)
    v.apply_gradients(ks4, np.full((30, 4), 7.0, np.float32), lr=1.0)
    after = v.export_merged()
    assert v.total_size == 117
    for k, val in before.items():
        np.testing.assert_array_equal(
            np.asarray(after[k]), val,
            err_msg=f"key {k} corrupted by host-row reuse after evict",
        )
    # mixed batch: resident keys + enough fresh keys to cross the watermark.
    # The spill must not lose the batch's own resident keys — they restage
    # and the lookup returns their trained (nonzero) vectors.
    resident_keys = ks4[:5]  # just trained, resident on device
    want_vals = np.asarray(v.lookup(resident_keys), np.float32)
    fresh_keys = np.arange(500, 560, dtype=np.int32).reshape(-1, 1)
    batch = np.concatenate([resident_keys, fresh_keys])
    out = np.asarray(v.lookup(batch), np.float32)
    np.testing.assert_allclose(
        out[:5], want_vals, rtol=1e-6,
        err_msg="resident batch keys lost by spill during staging",
    )


def test_lookup_sparse_sp_weights(mesh8):
    """Per-key weights (reference: sok.lookup_sparse sp_weights,
    lookup.py:425; PreprocessingForwardWithWeight): sum -> sum_h w*e,
    mean -> sum_h w*e / sum_h w; padded slots contribute nothing."""
    sok.init(mesh8)
    tables_cfg = [
        EmbeddingTableConfig(name="a", max_vocabulary_size=100, ev_size=8),
        EmbeddingTableConfig(name="b", max_vocabulary_size=50, ev_size=8),
    ]
    eng = sok.LookupEngine(
        tables_cfg,
        hotness=[3, 2],
        combiners=["sum", "mean"],
        opt=OptParams(Optimizer_t.SGD, lr=0.1),
        rm=mesh8,
        use_sp_weight=True,
    )
    tables = eng.init(jax.random.key(3))
    rng = np.random.default_rng(3)
    b = 16
    k0 = rng.integers(0, 100, (b, 3)).astype(np.int32)
    k1 = rng.integers(0, 50, (b, 2)).astype(np.int32)
    k0[0, 2] = -1  # padding: weight must be ignored
    w0 = rng.uniform(0.1, 2.0, (b, 3)).astype(np.float32)
    w1 = rng.uniform(0.1, 2.0, (b, 2)).astype(np.float32)
    outs = jax.jit(
        lambda t, a, c, wa, wc: sok.lookup_sparse(
            eng, t, [a, c], sp_weights=[wa, wc]
        )
    )(
        tables,
        jax.device_put(k0, mesh8.batch_sharding()),
        jax.device_put(k1, mesh8.batch_sharding()),
        jax.device_put(w0, mesh8.batch_sharding()),
        jax.device_put(w1, mesh8.batch_sharding()),
    )
    ta = eng.ec.export_table(tables, "a")
    tb = eng.ec.export_table(tables, "b")
    want0 = np.stack([
        sum(w0[i, h] * ta[k0[i, h]] for h in range(3) if k0[i, h] >= 0)
        for i in range(b)
    ])
    want1 = np.stack([
        sum(w1[i, h] * tb[k1[i, h]] for h in range(2)) / w1[i].sum()
        for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(outs[0]), want0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want1, rtol=1e-5, atol=1e-5)

    # weights=None with a weighted engine degrades to the unweighted combiner
    outs_nw = jax.jit(lambda t, a, c: eng.lookup(t, [a, c]))(
        tables,
        jax.device_put(k0, mesh8.batch_sharding()),
        jax.device_put(k1, mesh8.batch_sharding()),
    )
    want_sum = np.stack(
        [ta[[k for k in row if k >= 0]].sum(0) for row in k0]
    )
    np.testing.assert_allclose(
        np.asarray(outs_nw[0]), want_sum, rtol=1e-5, atol=1e-5
    )

    # backward: SGD row update is -lr * w * d summed over occurrences
    opt_state = eng.init_optimizer(tables)
    d0 = rng.normal(size=(b, 8)).astype(np.float32)
    d1 = rng.normal(size=(b, 8)).astype(np.float32)
    tables2, _ = eng.apply_gradients(
        tables, opt_state,
        [jax.device_put(k0, mesh8.batch_sharding()),
         jax.device_put(k1, mesh8.batch_sharding())],
        [jax.device_put(d0, mesh8.batch_sharding()),
         jax.device_put(d1, mesh8.batch_sharding())],
        lr=0.1, step=1,
        sp_weights=[jax.device_put(w0, mesh8.batch_sharding()),
                    jax.device_put(w1, mesh8.batch_sharding())],
    )
    want_a = ta.copy()
    for i in range(b):
        for h in range(3):
            if k0[i, h] >= 0:
                want_a[k0[i, h]] -= 0.1 * w0[i, h] * d0[i]
    want_b = tb.copy()
    for i in range(b):
        wn = w1[i] / w1[i].sum()
        for h in range(2):
            want_b[k1[i, h]] -= 0.1 * wn[h] * d1[i]
    got_a = eng.ec.export_table(tables2, "a")
    got_b = eng.ec.export_table(tables2, "b")
    np.testing.assert_allclose(got_a, want_a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-4, atol=1e-4)


def test_dynamic_variable_to_static_roundtrip(mesh1):
    """to_static/to_dynamic conversion (reference:
    dynamic_variable.py:205-222): snapshot rows for a key set into a dense
    buffer, train it with dense code, write it back exactly."""
    sok.init(mesh1)
    v = sok.DynamicVariable(
        dimension=8, initial_capacity=64, key=jax.random.key(2),
        opt_params=OptParams(Optimizer_t.SGD, lr=1.0),
    )
    keys = np.array([5, 900001, 13], dtype=np.int64)
    v.apply_gradients(keys.astype(np.int32).reshape(-1, 1),
                      np.ones((3, 8), np.float32), lr=1.0)
    before = np.asarray(v.lookup(keys.astype(np.int32).reshape(-1, 1)),
                        np.float32)
    # snapshot: trained keys read their rows, an unseen key reads zeros
    buf = v.to_static(np.array([5, 900001, 13, 777], dtype=np.int64))
    np.testing.assert_allclose(buf[:3], before, rtol=1e-6)
    np.testing.assert_array_equal(buf[3], 0.0)
    assert v.is_static()
    with pytest.raises(RuntimeError):
        v.lookup(keys.astype(np.int32).reshape(-1, 1))
    with pytest.raises(RuntimeError):
        v.apply_gradients(keys.astype(np.int32).reshape(-1, 1),
                          np.ones((3, 8), np.float32), lr=1.0)
    with pytest.raises(RuntimeError):
        v.to_static(keys)
    # dense "training": assign a modified buffer, then convert back
    v.assign(buf + 2.0)
    v.to_dynamic()
    assert not v.is_static()
    with pytest.raises(RuntimeError):
        v.to_dynamic()
    after = np.asarray(
        v.lookup(np.array([[5], [900001], [13], [777]], np.int32)),
        np.float32,
    )
    np.testing.assert_allclose(after[:3], before + 2.0, rtol=1e-6)
    # the unseen key was inserted by the write-back with its buffer value
    np.testing.assert_allclose(after[3], np.full(8, 2.0), rtol=1e-6)
    assert v.size == 4


def test_distributed_localized_variable_classes(mesh8):
    """Explicit class spellings (reference: distributed_variable.py:126,235)
    behave like their Variable(mode=...) equivalents."""
    sok.init(mesh8)
    dv = sok.DistributedVariable(64, 8, name="dv_cls")
    lv = sok.LocalizedVariable(64, 8, name="lv_cls", target_gpu=0)
    keys = jnp.asarray(np.arange(8, dtype=np.int32))
    assert np.asarray(dv.lookup(keys)).shape == (8, 8)
    assert np.asarray(lv.lookup(keys)).shape == (8, 8)
    # localized = one logical shard (whole table per replica group)
    g, _ = lv.engine.ec._find_table(lv._table_name)
    assert g.num_shards == 1
    g2, _ = dv.engine.ec._find_table(dv._table_name)
    assert g2.num_shards == mesh8.num_devices


def test_sok_export_assign_roundtrip(mesh1):
    """sok.export / sok.assign (reference: dynamic_variable.py:465,494)."""
    sok.init(mesh1)
    v = sok.DynamicVariable(dimension=4, initial_capacity=64, name="ea_var")
    keys = np.asarray([3, 77, 1000], np.int64)
    vals = np.arange(12, dtype=np.float32).reshape(3, 4)
    sok.assign(v, keys, vals)
    out_k, out_v = sok.export(v)
    order = np.argsort(out_k)
    np.testing.assert_array_equal(np.sort(out_k), np.sort(keys))
    got = {int(k): out_v[i] for i, k in enumerate(out_k)}
    for i, k in enumerate(keys):
        np.testing.assert_allclose(got[int(k)], vals[i], rtol=1e-6)


def test_sparse_read_and_evict(mesh1):
    """hkv-only read+migrate (reference: lookup.py:75)."""
    sok.init(mesh1)
    v = sok.DynamicVariable(
        dimension=4, initial_capacity=32, name="sre_var", backend="hkv"
    )
    keys = np.asarray([5, 9], np.int64)
    vals = np.asarray([[1, 1, 1, 1], [2, 2, 2, 2]], np.float32)
    sok.assign(v, keys, vals)
    got = sok.sparse_read_and_evict(v, keys)
    np.testing.assert_allclose(got, vals, rtol=1e-6)
    # rows migrated: device store no longer holds them, host master does
    assert not set(keys.tolist()) & set(v._device_resident().tolist())
    assert set(keys.tolist()) <= set(v._host_index.keys())
    # det backend refuses
    det = sok.DynamicVariable(dimension=4, initial_capacity=32, name="det_var")
    with pytest.raises(TypeError):
        sok.sparse_read_and_evict(det, keys)


def test_sok_sgd_optimizer(mesh1):
    """sok.SGD scatter-sub semantics (reference: optimizer.py SGD)."""
    sok.init(mesh1)
    v = sok.Variable(16, 4, name="sgd_var")
    before = v.to_numpy().copy()
    keys = np.asarray([2, 7], np.int32)
    grads = np.ones((2, 4), np.float32)
    opt = sok.SGD(lr=0.5)
    opt.apply_gradients([((grads, keys), v)])
    after = v.to_numpy()
    np.testing.assert_allclose(after[[2, 7]], before[[2, 7]] - 0.5, rtol=1e-5)
    untouched = np.setdiff1d(np.arange(16), keys)
    np.testing.assert_array_equal(after[untouched], before[untouched])


def test_sok_sgd_overrides_variable_optimizer(mesh1):
    """sok.SGD performs the plain scatter-sub even on a variable configured
    with another optimizer — never silently applies that optimizer
    (reference: sok.SGD w[idx] -= lr*g regardless of the variable)."""
    sok.init(mesh1)
    v = sok.Variable(
        16, 4, name="adam_var",
        opt_params=OptParams(Optimizer_t.Adam, lr=0.5, beta1=0.9, beta2=0.999),
    )
    before = v.to_numpy().copy()
    keys = np.asarray([1, 5], np.int32)
    grads = np.full((2, 4), 0.25, np.float32)
    sok.SGD(lr=0.2).apply_gradients([((grads, keys), v)])
    after = v.to_numpy()
    # plain SGD: -lr * g exactly (Adam would give -lr*mhat/(sqrt(vhat)+eps))
    np.testing.assert_allclose(
        after[[1, 5]], before[[1, 5]] - 0.2 * 0.25, rtol=1e-5
    )

    # dense ndarray gradient applies to every row
    v2 = sok.Variable(8, 4, name="dense_grad_var")
    b2 = v2.to_numpy().copy()
    g = np.full((8, 4), 1.0, np.float32)
    sok.SGD(lr=0.1).apply_gradients([(g, v2)])
    np.testing.assert_allclose(v2.to_numpy(), b2 - 0.1, rtol=1e-5)
