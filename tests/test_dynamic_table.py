"""Exact dynamic embedding tables (reference: DynamicEmbeddingTable,
embedding_storage/dynamic_embedding.cu:1-588).

The TPU analog is a probed open-addressing key store aligned with the table
rows: collision-FREE lookups/updates up to the probe depth (the old hashing
trick silently aliased colliding keys onto one row), insert-on-backward,
exact eviction, and capacity growth by host-side rehash between passes.
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


def _build(rm, capacity=64, opt_kind=Optimizer_t.SGD):
    t = EmbeddingTableConfig(
        name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=capacity
    )
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 2)]
    plan = ShardingPlan(strategy=[("mp", ["dyn"])])
    compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
    opt = OptParams(opt_kind, lr=0.5, initial_accu_value=0.0, epsilon=1e-7)
    ebc = EmbeddingCollection(compiled, rm, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    return ebc, tables, state


def _step(ebc, tables, state, keys, d):
    return jax.jit(ebc.backward_and_update)(
        tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(1)
    )


def test_colliding_keys_get_distinct_rows(mesh1):
    """Find two keys that alias under the HASHING trick; the exact store
    must give them independent rows (the VERDICT's acceptance test)."""
    from hugectr_tpu.embedding.collection import _hash_mix

    cap = 16
    # search keys whose hash maps to the same base slot
    h = np.asarray(_hash_mix(jnp.arange(10_000))).astype(np.uint64) % cap
    base = None
    for slot in range(cap):
        ks = np.where(h == slot)[0]
        if len(ks) >= 2:
            base = (int(ks[0]), int(ks[1]))
            break
    assert base is not None
    k1, k2 = base

    ebc, tables, state = _build(mesh1, capacity=cap)
    d = np.ones((2, 8), dtype=np.float32)
    keys = np.array([[k1, INVALID_KEY], [k2, INVALID_KEY]], dtype=np.int32)
    # insert both (backward pass inserts + applies SGD update)
    tables, state = _step(ebc, tables, state, keys, d)
    gname = ebc.plan.groups[0].name
    ks_store = np.asarray(tables[f"{gname}#keys"])
    slot1 = np.where(ks_store == k1)[0]
    slot2 = np.where(ks_store == k2)[0]
    assert len(slot1) >= 1 and len(slot2) >= 1
    assert slot1[0] != slot2[0], "colliding keys share a row"
    # updating k1 must not touch k2's row
    raw_before = np.asarray(tables[gname])
    keys1 = np.array([[k1, INVALID_KEY]], dtype=np.int32)
    tables, state = _step(ebc, tables, state, keys1, np.ones((1, 8), np.float32))
    raw_after = np.asarray(tables[gname])
    assert not np.allclose(raw_after[slot1[0]], raw_before[slot1[0]])
    np.testing.assert_array_equal(raw_after[slot2[0]], raw_before[slot2[0]])


def test_forward_miss_then_hit(mesh1):
    ebc, tables, state = _build(mesh1, capacity=32)
    keys = np.array([[7, 9]], dtype=np.int32)
    # before insertion: lookups miss -> zero output
    out0 = jax.jit(ebc.forward)(tables, {"f": keys})
    np.testing.assert_array_equal(np.asarray(out0["e"]), 0.0)
    # backward inserts; forward now returns the (updated) rows
    tables, state = _step(ebc, tables, state, keys, np.ones((1, 8), np.float32))
    out1 = jax.jit(ebc.forward)(tables, {"f": keys})
    assert np.abs(np.asarray(out1["e"])).sum() > 0


def test_key_store_export_import_roundtrip(mesh1):
    """export_key_store/import_key_store restore key→row alignment in a
    fresh collection whose live store placed DIFFERENT keys (the
    embedding_dump/embedding_load dynamic-table contract; without the key
    store the positionally imported values pair with the wrong keys)."""
    ebc, tables, state = _build(mesh1, capacity=32)
    keys = np.array([[7, 9]], dtype=np.int32)
    tables, state = _step(ebc, tables, state, keys, np.ones((1, 8), np.float32))
    out_ref = np.asarray(jax.jit(ebc.forward)(tables, {"f": keys})["e"])
    vals = ebc.export_table(tables, "dyn")
    ks = ebc.export_key_store(tables, "dyn")
    assert ks is not None and 7 in ks and 9 in ks

    # fresh collection trains OTHER keys -> different live placement
    ebc2, tables2, state2 = _build(mesh1, capacity=32)
    tables2, state2 = _step(
        ebc2, tables2, state2, np.array([[3, 21]], np.int32),
        np.ones((1, 8), np.float32),
    )
    tables2 = ebc2.import_table(tables2, "dyn", vals)
    tables2 = ebc2.import_key_store(tables2, "dyn", ks)
    out2 = np.asarray(jax.jit(ebc2.forward)(tables2, {"f": keys})["e"])
    np.testing.assert_allclose(out2, out_ref, rtol=1e-6)

    # static tables have no key store
    from hugectr_tpu.parallel.plan import (
        EmbeddingTableConfig as _T, LookupConfig as _L, ShardingPlan as _P,
        compile_plan as _cp,
    )
    st = _T(name="s", max_vocabulary_size=16, ev_size=8)
    comp = _cp([_L(0, st, "f", "e", Combiner_t.Sum, 1)],
               _P(strategy=[("mp", ["s"])]), num_shards=1)
    ebc_s = EmbeddingCollection(comp, mesh1, OptParams(Optimizer_t.SGD, lr=0.1))
    t_s = ebc_s.init(jax.random.key(1))
    assert ebc_s.export_key_store(t_s, "s") is None


def test_dynamic_adagrad_dedup(mesh1):
    """Duplicate dynamic keys see ONE summed-gradient update (exact store +
    segment dedup compose)."""
    ebc, tables, state = _build(mesh1, capacity=32, opt_kind=Optimizer_t.AdaGrad)
    keys = np.array([[5, 5]], dtype=np.int32)
    d = np.ones((1, 8), dtype=np.float32)
    tables, state = _step(ebc, tables, state, keys, d)
    gname = ebc.plan.groups[0].name
    ks_store = np.asarray(tables[f"{gname}#keys"])
    slot = np.where(ks_store == 5)[0]
    assert len(slot) == 1
    row = np.asarray(tables[gname])[slot[0]]
    # grad = 2 summed; accum = 4; delta = -0.5*2/sqrt(4) = -0.5 from init 0...
    # (row was random-init then claimed; delta applied on top)
    # verify via the accumulator instead: exactly (2g)^2 once
    accum = np.asarray(state[gname]["accum"])[slot[0]]
    np.testing.assert_allclose(accum, 4.0, rtol=1e-6)


def test_exact_evict_does_not_clobber(mesh1):
    ebc, tables, state = _build(mesh1, capacity=32)
    keys = np.array([[3, 11]], dtype=np.int32)
    tables, state = _step(ebc, tables, state, keys, np.ones((1, 8), np.float32))
    gname = ebc.plan.groups[0].name
    ks_store = np.asarray(tables[f"{gname}#keys"])
    s3 = np.where(ks_store == 3)[0][0]
    s11 = np.where(ks_store == 11)[0][0]
    before11 = np.asarray(tables[gname])[s11].copy()
    tables, state = ebc.evict(tables, state, "dyn", np.array([3]))
    raw = np.asarray(tables[gname])
    np.testing.assert_array_equal(raw[s3], 0.0)
    np.testing.assert_array_equal(raw[s11], before11)  # untouched
    ks2 = np.asarray(tables[f"{gname}#keys"])
    assert 3 not in ks2 and 11 in ks2


def test_capacity_growth_preserves_rows(mesh1):
    ebc, tables, state = _build(mesh1, capacity=32, opt_kind=Optimizer_t.AdaGrad)
    keys = np.array([[1, 2], [3, INVALID_KEY]], dtype=np.int32)
    d = np.ones((2, 8), dtype=np.float32)
    tables, state = _step(ebc, tables, state, keys, d)
    gname = ebc.plan.groups[0].name
    ks = np.asarray(tables[f"{gname}#keys"])
    rows_before = {
        int(k): np.asarray(tables[gname])[np.where(ks == k)[0][0]].copy()
        for k in (1, 2, 3)
    }
    ec2, tables2, state2 = ebc.grow_dynamic_capacity(
        tables, state, "dyn", 128
    )
    g2 = ec2.plan.groups[0]
    assert int(g2.table_vocab[0]) == 128
    ks2 = np.asarray(tables2[f"{g2.name}#keys"])
    raw2 = np.asarray(tables2[g2.name])
    for k, row in rows_before.items():
        slot = np.where(ks2 == k)[0]
        assert len(slot) == 1, f"key {k} lost in growth"
        np.testing.assert_allclose(raw2[slot[0]], row, rtol=1e-6)
    # the grown table keeps training
    tables2, state2 = jax.jit(ec2.backward_and_update)(
        tables2, state2, {"f": keys}, {"e": d}, jnp.asarray(0.5), jnp.asarray(2)
    )


def test_dynamic_multichip_matches_single(mesh8, mesh1):
    """8-way sharded dynamic table == single-device result."""
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 1000, (16, 2)).astype(np.int32)
    d = rng.normal(size=(16, 8)).astype(np.float32)
    outs = {}
    for rm in (mesh8, mesh1):
        ebc, tables, state = _build(rm, capacity=256)
        # zero the init so values are comparable across mesh sizes
        gname = ebc.plan.groups[0].name
        tables[gname] = jnp.zeros_like(tables[gname])
        kd = jax.device_put(keys, rm.batch_sharding())
        dd = jax.device_put(d, rm.batch_sharding())
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": kd}, {"e": dd}, jnp.asarray(0.5), jnp.asarray(1)
        )
        fwd = jax.jit(ebc.forward)(tables, {"f": kd})
        outs[rm] = np.asarray(fwd["e"])
    np.testing.assert_allclose(outs[mesh8], outs[mesh1], rtol=1e-5, atol=1e-6)


def test_dynamic_mean_combiner_multichip(mesh8, mesh1):
    """Review regression: mean-combiner counts must be GLOBAL (raw key
    validity), not the shard-local exact-store found mask."""
    t = EmbeddingTableConfig(
        name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=256
    )
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Mean, 3)]
    plan = ShardingPlan(strategy=[("mp", ["dyn"])])
    rng = np.random.default_rng(41)
    keys = rng.integers(0, 500, (16, 3)).astype(np.int32)
    keys[2, 1] = INVALID_KEY
    d = rng.normal(size=(16, 8)).astype(np.float32)
    outs = {}
    for rm in (mesh8, mesh1):
        compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
        opt = OptParams(Optimizer_t.SGD, lr=0.5)
        ebc = EmbeddingCollection(compiled, rm, opt)
        tables = ebc.init(jax.random.key(0))
        gname = ebc.plan.groups[0].name
        tables[gname] = jnp.zeros_like(tables[gname])
        kd = jax.device_put(keys, rm.batch_sharding())
        dd = jax.device_put(d, rm.batch_sharding())
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, ebc.init_optimizer(tables), {"f": kd}, {"e": dd},
            jnp.asarray(0.5), jnp.asarray(1),
        )
        fwd = jax.jit(ebc.forward)(tables, {"f": kd})
        outs[rm] = np.asarray(fwd["e"])
    np.testing.assert_allclose(outs[mesh8], outs[mesh1], rtol=1e-5, atol=1e-6)


def test_growth_preserves_sibling_tables(mesh1):
    """Review regression: growing one dynamic table must NOT re-randomize
    other tables (same group or other groups) or their optimizer state."""
    td = EmbeddingTableConfig(
        name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=32
    )
    td2 = EmbeddingTableConfig(
        name="dyn2", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=32
    )
    ts = EmbeddingTableConfig(name="stat", max_vocabulary_size=40, ev_size=8)
    lookups = [
        LookupConfig(0, td, "f0", "e0", Combiner_t.Sum, 2),
        LookupConfig(1, td2, "f1", "e1", Combiner_t.Sum, 2),
        LookupConfig(2, ts, "f2", "e2", Combiner_t.Sum, 2),
    ]
    plan = ShardingPlan(strategy=[("mp", ["dyn", "dyn2", "stat"])])
    compiled = compile_plan(lookups, plan, num_shards=1)
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.5, initial_accu_value=0.0, epsilon=1e-7)
    ebc = EmbeddingCollection(compiled, mesh1, opt)
    tables = ebc.init(jax.random.key(0))
    state = ebc.init_optimizer(tables)
    feats = {
        "f0": np.array([[1, 2]], dtype=np.int32),
        "f1": np.array([[5, 6]], dtype=np.int32),
        "f2": np.array([[7, 8]], dtype=np.int32),
    }
    d = {f"e{i}": np.ones((1, 8), np.float32) for i in range(3)}
    tables, state = jax.jit(ebc.backward_and_update)(
        tables, state, feats, d, jnp.asarray(0.5), jnp.asarray(1)
    )
    stat_before = ebc.export_table(tables, "stat")
    # dyn2 rows before growth (via its store)
    g2, t2i = ebc._find_table("dyn2")
    ks2 = ebc._host_key_store(tables, g2)
    import numpy as _np
    s5 = _np.where(ks2 == 5)[0][0]
    dyn2_row5 = _np.asarray(tables[g2.name])[s5].copy()
    accum5 = _np.asarray(state[g2.name]["accum"])[s5].copy()
    assert accum5.sum() > 0

    ec2, tables2, state2 = ebc.grow_dynamic_capacity(tables, state, "dyn", 128)
    # static sibling preserved exactly
    np.testing.assert_allclose(
        ec2.export_table(tables2, "stat"), stat_before, rtol=1e-6
    )
    # dyn2 entry + optimizer state preserved
    ng2, nt2i = ec2._find_table("dyn2")
    nks2 = ec2._host_key_store(tables2, ng2)
    ns5 = _np.where(nks2 == 5)[0]
    assert len(ns5) == 1
    np.testing.assert_allclose(
        _np.asarray(tables2[ng2.name])[ns5[0]], dyn2_row5, rtol=1e-6
    )
    np.testing.assert_allclose(
        _np.asarray(state2[ng2.name]["accum"])[ns5[0]], accum5, rtol=1e-6
    )
    # static table's optimizer state preserved too
    gs, tsi = ebc._find_table("stat")
    ngs, ntsi = ec2._find_table("stat")
    old_rows = ebc._table_storage_rows(gs, tsi, 40)
    new_rows = ec2._table_storage_rows(ngs, ntsi, 40)
    old_acc = _np.asarray(state[gs.name]["accum"])[old_rows]
    new_acc = _np.asarray(state2[ngs.name]["accum"])[new_rows]
    np.testing.assert_allclose(new_acc, old_acc, rtol=1e-6)


# ---------------------------------------------------------- exact i64 keys
def _find_splitmix_collision():
    """Two distinct i64 keys whose 31-bit splitmix folds collide (the round-3
    aliasing gap: hash folding silently shared a row between them)."""
    from hugectr_tpu.model.model import Model

    rng = np.random.default_rng(0)
    ks = np.unique(rng.integers(0, 2**62, size=300_000, dtype=np.int64))
    h = Model._splitmix31(ks)
    uq, cnt = np.unique(h, return_counts=True)
    dups = uq[cnt >= 2]
    assert len(dups) > 0, "no splitmix collision in sample (raise sample size)"
    pair = np.where(h == dups[0])[0][:2]
    return int(ks[pair[0]]), int(ks[pair[1]])


def test_i64_exact_fold_distinct_ids_and_roundtrip():
    """Colliding i64 keys get DISTINCT 31-bit ids (reference:
    DynamicEmbeddingTable is exact for i64, dynamic_embedding.cu), and the
    assignment map survives a save/restore roundtrip."""
    from types import SimpleNamespace

    from hugectr_tpu.model.model import Model

    k1, k2 = _find_splitmix_collision()
    assert int(Model._splitmix31(np.asarray([k1]))[0]) == int(
        Model._splitmix31(np.asarray([k2]))[0]
    )
    ns = SimpleNamespace(_splitmix31=Model._splitmix31)
    w = np.array([[k1, k2, -1]], dtype=np.int64)
    out = Model._i64_exact_fold(ns, "dyn", w)
    assert out[0, 0] != out[0, 1], "colliding i64 keys must not share an id"
    assert out[0, 2] == INVALID_KEY
    assert out.dtype == np.int32 and (out[0, :2] >= 0).all()
    assert (out[0, :2] != 2**31 - 1).all()  # never the EMPTY sentinel
    # determinism: same keys -> same ids on re-fold
    out2 = Model._i64_exact_fold(ns, "dyn", w)
    np.testing.assert_array_equal(out, out2)
    # persistence roundtrip
    arrays = Model._i64_fold_maps_arrays(ns)
    ns2 = SimpleNamespace(_splitmix31=Model._splitmix31)
    Model._restore_i64_fold_maps(ns2, arrays)
    out3 = Model._i64_exact_fold(ns2, "dyn", w)
    np.testing.assert_array_equal(out, out3)
    # a NEW key hitting an occupied slot probes onward, not onto k1/k2
    k3_candidates = np.unique(
        np.random.default_rng(1).integers(0, 2**62, 400_000, dtype=np.int64)
    )
    h3 = Model._splitmix31(k3_candidates)
    target = int(Model._splitmix31(np.asarray([k1]))[0])
    same = k3_candidates[(h3 == target) & (k3_candidates != k1)
                         & (k3_candidates != k2)]
    if len(same):
        out4 = Model._i64_exact_fold(ns2, "dyn", same[:1].reshape(1, 1))
        assert int(out4[0, 0]) not in (int(out[0, 0]), int(out[0, 1]))


def test_i64_dynamic_model_trains_colliding_keys_distinctly(mesh1, tmp_path):
    """End-to-end: an i64_input_key model with a dynamic table folds the
    colliding pair to distinct rows; snapshot save/load preserves the map."""
    import hugectr_tpu as hugectr
    from hugectr_tpu.core.types import DataReaderType_t

    k1, k2 = _find_splitmix_collision()
    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=8, batchsize=8, lr=0.1,
        i64_input_key=True, repeat_dataset=True,
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
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(
            name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=64
        )
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
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
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["out", "label"], top_names=["loss"],
        )
    )
    model.compile()
    batch = {"d0": np.array([[k1, k2]] * 8, dtype=np.int64)}
    folded = model._fold_i64_keys(batch)["d0"]
    assert folded[0, 0] != folded[0, 1]
    model.fit(max_iter=3, display=10, eval_interval=0)
    # snapshot roundtrip preserves the assignment
    model.download_params_to_files(str(tmp_path / "snap"), 3)
    saved = dict(model._i64_maps["dyn"])
    model._i64_maps = {}
    model._i64_rev = {}
    model.load_params_from_files(str(tmp_path / "snap_iter3"))
    assert model._i64_maps["dyn"] == saved
    folded2 = model._fold_i64_keys(batch)["d0"]
    np.testing.assert_array_equal(folded2, folded)


def test_no_reinsert_into_evict_hole(mesh1):
    """A key resident at a LATER probe slot must not re-insert into an
    earlier hole punched by evict() (review finding: first-hit probing
    would then serve the fresh zeroed row and abandon the trained one)."""
    from hugectr_tpu.embedding.collection import _hash_mix

    cap = 16
    h = np.asarray(_hash_mix(jnp.arange(10_000))).astype(np.uint64) % cap
    base = None
    for slot in range(cap):
        ks = np.where(h == slot)[0]
        if len(ks) >= 2:
            base = (int(ks[0]), int(ks[1]))
            break
    k1, k2 = base  # same base slot: k1 claims it, k2 probes onward

    ebc, tables, state = _build(mesh1, capacity=cap)
    keys = np.array([[k1, INVALID_KEY], [k2, INVALID_KEY]], dtype=np.int32)
    d = np.ones((2, 8), np.float32)
    tables, state = _step(ebc, tables, state, keys, d)
    gname = ebc.plan.groups[0].name
    ks_store = np.asarray(tables[f"{gname}#keys"])
    slot2 = int(np.where(ks_store == k2)[0][0])
    vec2 = np.asarray(tables[gname])[slot2].copy()

    # evict k1 -> EMPTY hole at k2's earlier probe position
    tables, state = ebc.evict(tables, state, "dyn", np.array([k1]))
    ks_store = np.asarray(tables[f"{gname}#keys"])
    assert k1 not in ks_store.tolist()

    # train k2 again: must UPDATE the original slot, not re-insert at the hole
    keys2 = np.array([[k2, INVALID_KEY]], dtype=np.int32)
    tables, state = _step(ebc, tables, state, keys2, np.ones((1, 8), np.float32))
    ks_store = np.asarray(tables[f"{gname}#keys"])
    occurrences = np.where(ks_store == k2)[0]
    assert len(occurrences) == 1, f"k2 duplicated at {occurrences}"
    assert int(occurrences[0]) == slot2
    vec2_after = np.asarray(tables[gname])[slot2]
    assert not np.allclose(vec2_after, vec2), "k2's trained row not updated"
