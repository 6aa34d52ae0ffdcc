"""End-to-end Model API tests (analog of reference test/pybind_test/model_test.py).

Builds small models through the public API, trains on synthetic data on the
8-device CPU mesh, and checks loss decrease, eval metrics, and checkpoint
round-trip.
"""
import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t, Metric_t


def _build_dcn_model(rm, batchsize=256, use_ebc=True):
    solver = hugectr.CreateSolver(
        max_eval_batches=4,
        batchsize_eval=batchsize,
        batchsize=batchsize,
        lr=0.01,
        metrics_spec={Metric_t.AUC: 1.0},
        repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic,
        synthetic_num_batches=32,
    )
    optimizer = hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.Adam)
    model = hugectr.Model(solver, reader, optimizer, resource_manager=rm)
    num_tables = 4
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=13,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam(f"data{i}", 2, True, 1)
                for i in range(num_tables)
            ],
        )
    )
    if use_ebc:
        tables = [
            hugectr.EmbeddingTableConfig(
                name=f"t{i}", max_vocabulary_size=1000 + i * 37, ev_size=16
            )
            for i in range(num_tables)
        ]
        ebc = hugectr.EmbeddingCollectionConfig()
        ebc.embedding_lookup(
            table_config=tables,
            bottom_name=[f"data{i}" for i in range(num_tables)],
            top_name="sparse_embedding",
            combiner=["sum"] * num_tables,
        )
        ebc.shard(
            shard_matrix=[[f"t{i}" for i in range(num_tables)]] * rm.num_devices,
            shard_strategy=[
                ("mp", [f"t{i}" for i in range(num_tables - 1)]),
                ("dp", [f"t{num_tables-1}"]),
            ],
        )
        model.add(ebc)
    else:
        model.add(
            hugectr.SparseEmbedding(
                embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
                workspace_size_per_gpu_in_mb=1,
                embedding_vec_size=16,
                combiner="sum",
                sparse_embedding_name="sparse_embedding",
                bottom_name="data0",
            )
        )
    emb_width = num_tables * 16 if use_ebc else None
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP,
            bottom_names=["dense"],
            top_names=["mlp1"],
            num_outputs=[32, 16],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BatchNorm,
            bottom_names=["mlp1"],
            top_names=["mlp1_bn"],
        )
    )
    concat_bottoms = (
        ["sparse_embedding", "mlp1_bn"] if use_ebc else ["mlp1_bn"]
    )
    if not use_ebc:
        # legacy path: 3D [B, 1, 16] -> reshape to 2D
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.Reshape,
                bottom_names=["sparse_embedding"],
                top_names=["emb2d"],
                leading_dim=16,
            )
        )
        concat_bottoms = ["emb2d", "mlp1_bn"]
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=concat_bottoms,
            top_names=["concat1"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MultiCross,
            bottom_names=["concat1"],
            top_names=["cross1"],
            num_layers=2,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["cross1"],
            top_names=["logit"],
            num_output=1,
            act_type=hugectr.Activation_t.Non,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["logit", "label"],
            top_names=["loss"],
        )
    )
    model.compile()
    return model


def test_dcn_ebc_trains_and_evals(mesh8):
    model = _build_dcn_model(mesh8, use_ebc=True)
    model.summary()
    losses = [model.train() for _ in range(30)]
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"
    vals = model.eval()
    assert "auc" in vals and 0.0 <= vals["auc"] <= 1.0


def test_legacy_sparse_embedding_path(mesh8):
    model = _build_dcn_model(mesh8, use_ebc=False)
    losses = [model.train() for _ in range(15)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_checkpoint_roundtrip(mesh8, tmp_path):
    model = _build_dcn_model(mesh8, use_ebc=True)
    for _ in range(5):
        model.train()
    prefix = str(tmp_path / "snap")
    model.download_params_to_files(prefix, 5)
    ref = model.ec.export_table(model.state["emb_tables"], "t0").copy()
    # train further, then restore
    for _ in range(5):
        model.train()
    changed = model.ec.export_table(model.state["emb_tables"], "t0")
    assert not np.allclose(ref, changed)
    # BatchNorm running stats live in net_state and must restore too:
    # the state at iter 10 differs from the iter-5 snapshot, so a correct
    # load must change net_state back (ADVICE r1 regression).
    import jax

    at_iter10 = jax.tree.leaves(jax.tree.map(np.asarray, model.state["net_state"]))
    model.load_params_from_files(f"{prefix}_iter5")
    back = model.ec.export_table(model.state["emb_tables"], "t0")
    np.testing.assert_allclose(ref, back, rtol=1e-6)
    restored = jax.tree.leaves(jax.tree.map(np.asarray, model.state["net_state"]))
    assert any(
        not np.allclose(a, b) for a, b in zip(at_iter10, restored)
    ), "net_state unchanged by load (BN running stats not restored)"


def test_graph_to_json(mesh8, tmp_path):
    model = _build_dcn_model(mesh8, use_ebc=True)
    path = str(tmp_path / "graph.json")
    model.graph_to_json(path)
    import json

    with open(path) as f:
        g = json.load(f)
    assert len(g["dense_layers"]) >= 5


def test_i64_input_keys_fold(mesh8):
    """i64_input_key: 64-bit keys fold host-side to table-local int32
    (Solver.i64_input_key end-to-end analog); values >= 2^31 no longer wrap
    silently."""
    solver = hugectr.CreateSolver(
        max_eval_batches=2,
        batchsize_eval=64,
        batchsize=64,
        lr=0.01,
        i64_input_key=True,
        repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=4
    )
    model = hugectr.Model(
        solver,
        reader,
        hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.SGD),
        resource_manager=mesh8,
    )
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=4,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(name="t0", max_vocabulary_size=100, ev_size=8)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
    ebc.shard(shard_matrix=[["t0"]] * 8, shard_strategy=[("mp", ["t0"])])
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "dense"],
            top_names=["c"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["c"],
            top_names=["logit"],
            num_output=1,
            act_type=hugectr.Activation_t.Non,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["logit", "label"],
            top_names=["loss"],
        )
    )
    model.compile()
    # unit check: >= 2^31 keys fold to k % vocab, padding survives
    big = np.array(
        [[2**33 + 7, -1], [2**31 + 101, 5]], dtype=np.int64
    )
    folded = model._fold_i64_keys({"d0": big})["d0"]
    assert folded.dtype == np.int32
    assert folded[0, 0] == (2**33 + 7) % 100
    assert folded[0, 1] == -1
    assert folded[1, 0] == (2**31 + 101) % 100
    assert folded[1, 1] == 5
    # e2e: training with the i64 synthetic pipeline stays finite
    losses = [model.train() for _ in range(5)]
    assert np.isfinite(losses).all()


def test_norm_dataset_trains(mesh8, tmp_path):
    """Norm-format dataset through the full Model API (generator -> reader
    -> fit); slot_size_array un-bakes the reference's global key offsets."""
    from hugectr_tpu.core.types import Check_t
    from hugectr_tpu.data import DataGenerator, DataGeneratorParams

    sizes = [50, 60, 70, 80]
    DataGenerator(DataGeneratorParams(
        format=DataReaderType_t.Norm,
        label_dim=1, dense_dim=13, num_slot=4,
        source=str(tmp_path / "train.txt"),
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=sizes, nnz_array=[2, 2, 2, 2],
        num_files=2, eval_num_files=1, num_samples_per_file=1024,
        check_type=Check_t.Sum,
    )).generate()
    solver = hugectr.CreateSolver(
        max_eval_batches=2, batchsize_eval=256, batchsize=256, lr=0.01,
        metrics_spec={Metric_t.AUC: 1.0}, repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Norm,
        source=[str(tmp_path / "train.txt")],
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=sizes,
    )
    optimizer = hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.Adam)
    model = hugectr.Model(solver, reader, optimizer, resource_manager=mesh8)
    model.add(hugectr.Input(
        label_dim=1, label_name="label", dense_dim=13, dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam(f"data{i}", 2, True, 1)
            for i in range(4)
        ],
    ))
    tables = [
        hugectr.EmbeddingTableConfig(
            name=f"t{i}", max_vocabulary_size=sizes[i], ev_size=8
        )
        for i in range(4)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(
        table_config=tables,
        bottom_name=[f"data{i}" for i in range(4)],
        top_name="emb", combiner=["sum"] * 4,
    )
    ebc.shard(shard_matrix=[[t.name for t in tables]] * mesh8.num_devices,
              shard_strategy=[("mp", [t.name for t in tables])])
    model.add(ebc)
    model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.Concat,
                                 bottom_names=["emb", "dense"],
                                 top_names=["c"]))
    model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.MLP,
                                 bottom_names=["c"], top_names=["m"],
                                 num_outputs=[32, 16]))
    model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.InnerProduct,
                                 bottom_names=["m"], top_names=["logit"],
                                 num_output=1,
                                 act_type=hugectr.Activation_t.Non))
    model.add(hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["logit", "label"], top_names=["loss"]))
    model.compile()
    losses = [model.train() for _ in range(10)]
    assert np.isfinite(losses).all()
    vals = model.eval()
    assert 0.0 <= vals["auc"] <= 1.0


def test_skip_dense_layers_ablation(mesh8, monkeypatch):
    """SKIP_DENSE_LAYERS zeroes the named layer's outputs at trace time
    (benchmark ablation; reference SKIP_BOTTOM_MLP/SKIP_TOP_MLP analog)."""
    model = _build_dcn_model(mesh8, use_ebc=True)
    batch = None
    model.start_data_reading()
    batch = next(model._train_iter)
    # find an intermediate MLP top name from the graph
    top = None
    for cfg in model.network.configs:
        if cfg.layer_type == hugectr.Layer_t.MLP:
            top = cfg.top_names[0]
            break
    assert top is not None
    monkeypatch.setenv("SKIP_DENSE_LAYERS", top)
    out = model.check_out_tensor(top, batch)
    assert np.all(out == 0.0), "skipped layer output must be zeros"


def test_predict_tool_matches_live_model(mesh8, tmp_path):
    """tools/predict.py: graph JSON + snapshot -> predictions identical to
    the live model's eval forward (criteo_predict-analog inference CLI)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "predict_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools", "predict.py"),
    )
    predict_tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(predict_tool)

    model = _build_dcn_model(mesh8, batchsize=64)
    for _ in range(3):
        model.train()
    graph = str(tmp_path / "graph.json")
    model.graph_to_json(graph)
    model.download_params_to_files(str(tmp_path / "snap"), 3)

    # live-model predictions over its (seeded, cached) synthetic eval set
    want = []
    source, feeder = model._eval_batches()
    for i, batch in enumerate(source):
        if i >= model.solver.max_eval_batches:
            break
        _l, preds, _lab = model._eval_step(model.state, batch)
        want.append(np.asarray(preds["label"]))
    if feeder is not None:
        feeder.stop()
    want = np.concatenate(want, axis=0)

    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic,
        synthetic_num_batches=32,
    )
    got = predict_tool.predict(
        graph,
        str(tmp_path / "snap_iter3"),
        reader,
        max_batches=model.solver.max_eval_batches,
        resource_manager=mesh8,
    )
    assert set(got) == {"label"}
    np.testing.assert_allclose(got["label"], want, rtol=1e-5, atol=1e-6)


def test_remote_fs_snapshot_roundtrip(mesh8, tmp_path):
    """Snapshot dump/load through a non-local FileSystem backend (fsspec
    'memory://' stands in for hdfs/s3/gcs — reference: fs-agnostic
    EmbeddingParameterIO, weight_io/fs_interface.cpp + DataSourceParams)."""
    model = _build_dcn_model(mesh8, batchsize=64)
    for _ in range(3):
        model.train()
    model.download_params_to_files("memory://ckpt/snap", 3)
    ref = model.ec.export_table(model.state["emb_tables"], "t0").copy()
    for _ in range(3):
        model.train()
    assert not np.allclose(ref, model.ec.export_table(model.state["emb_tables"], "t0"))
    model.load_params_from_files("memory://ckpt/snap_iter3")
    np.testing.assert_allclose(
        ref, model.ec.export_table(model.state["emb_tables"], "t0"), rtol=1e-6
    )
    # graph JSON round-trips through the same layer
    model.graph_to_json("memory://ckpt/graph.json")
    m2 = hugectr.Model.construct_from_json(
        "memory://ckpt/graph.json",
        reader_params=hugectr.DataReaderParams(
            data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=8
        ),
        resource_manager=mesh8,
    )
    assert [l.layer_type for l in m2.dense_layers] == [
        l.layer_type for l in model.dense_layers
    ]
    # remote listdir returns names (fsspec ls() defaults to detail dicts —
    # regression for embedding_load's table discovery on remote dirs)
    from hugectr_tpu.io import filesystem as iofs

    names = iofs.listdir("memory://ckpt/snap_iter3")
    assert "dense_model.npz" in names
    assert any(n.startswith("sparse_") for n in names)
    # embedding_load discovers tables on the remote dir through listdir
    model.embedding_dump("memory://ckpt/emb", ["t0"])
    model.embedding_load("memory://ckpt/emb")


def test_check_keys_env_asserts_out_of_range(mesh1, monkeypatch):
    """HCTR_TPU_CHECK_KEYS=1: static-table keys >= vocab raise host-side
    instead of silently wrapping (reference surfaces corrupt lookups;
    Model::check_overflow analog for inputs)."""
    monkeypatch.setenv("HCTR_TPU_CHECK_KEYS", "1")
    model = _tiny_dlrm(mesh1) if "_tiny_dlrm" in globals() else None
    if model is None:
        import hugectr_tpu as hugectr

        solver = hugectr.CreateSolver(
            max_eval_batches=1, batchsize_eval=16, batchsize=16, lr=0.01,
            repeat_dataset=True,
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
                label_dim=1, label_name="label", dense_dim=4,
                dense_name="dense",
                data_reader_sparse_param_array=[
                    hugectr.DataReaderSparseParam("d0", 2, True, 1)
                ],
            )
        )
        tables = [
            hugectr.EmbeddingTableConfig(
                name="t0", max_vocabulary_size=50, ev_size=8
            )
        ]
        ebc = hugectr.EmbeddingCollectionConfig()
        ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
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
    ok_batch = {
        "label": np.zeros((16, 1), np.float32),
        "dense": np.zeros((16, 4), np.float32),
        "d0": np.full((16, 2), 49, np.int32),
    }
    model._put_batch(dict(ok_batch))  # in-range: no raise
    bad = dict(ok_batch)
    bad["d0"] = np.full((16, 2), 50, np.int32)  # == vocab -> out of range
    with pytest.raises(ValueError, match="t0"):
        model._put_batch(bad)
    # padding keys (-1) are fine
    pad = dict(ok_batch)
    pad["d0"] = np.full((16, 2), -1, np.int32)
    model._put_batch(pad)
    # negative non-padding keys are a dataset bug too (silent wrap)
    neg = dict(ok_batch)
    neg["d0"] = np.full((16, 2), -7, np.int32)
    with pytest.raises(ValueError, match="negative"):
        model._put_batch(neg)


def test_noop_knob_warnings():
    """Non-default no-op Solver knobs emit one warning each (VERDICT r3)."""
    import hugectr_tpu as hugectr

    s = hugectr.CreateSolver(
        train_inter_iteration_overlap=True,
        all_reduce_algo="ONESHOT",
        use_cuda_graph=False,
    )

    class Rec:
        def __init__(self):
            self.msgs = []

        def warning(self, m):
            self.msgs.append(m)

    rec = Rec()
    warned = s.warn_noop_knobs(rec)
    assert set(warned) == {
        "train_inter_iteration_overlap", "all_reduce_algo", "use_cuda_graph"
    }
    assert len(rec.msgs) == 3
    assert any("XLA" in m for m in rec.msgs)
    # defaults stay silent
    s2 = hugectr.CreateSolver()
    assert s2.warn_noop_knobs(rec) == []


def test_check_keys_env_zero_disables(mesh1, monkeypatch):
    """HCTR_TPU_CHECK_KEYS=0 must DISABLE the check like every other knob
    (review finding: bool(env) treated '0' as enabled)."""
    monkeypatch.setenv("HCTR_TPU_CHECK_KEYS", "0")
    import hugectr_tpu as hugectr

    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=16, batchsize=16, lr=0.01,
        repeat_dataset=True,
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
            label_dim=1, label_name="label", dense_dim=4, dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(name="t0", max_vocabulary_size=50, ev_size=8)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
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
    assert model._check_keys is False
    bad = {
        "label": np.zeros((16, 1), np.float32),
        "dense": np.zeros((16, 4), np.float32),
        "d0": np.full((16, 2), 50, np.int32),  # out of range, but check off
    }
    model._put_batch(bad)  # must not raise


def test_snapshot_rotation_layout_stamp(mesh8, tmp_path):
    """Snapshots stamp the shard-rotation layout; loading across a rotation
    mismatch raises instead of silently misaligning raw storage arrays
    (review finding)."""
    import json as _json

    import hugectr_tpu as hugectr

    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=16, batchsize=16, lr=0.01,
        repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=2
    )
    model = hugectr.Model(
        solver, reader,
        hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.AdaGrad),
        resource_manager=mesh8,
    )
    model.add(
        hugectr.Input(
            label_dim=1, label_name="label", dense_dim=4, dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(
            name="t0", max_vocabulary_size=4096, ev_size=8
        )
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
    ebc.shard(shard_matrix=[["t0"]] * 8, shard_strategy=[("mp", ["t0"])])
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
    model.train()
    assert model._rotated_layout() is True  # 8-way MP + default rotation
    model.download_params_to_files(str(tmp_path / "snap"), 1)
    meta = _json.load(open(tmp_path / "snap_iter1" / "meta.json"))
    assert meta["shard_rotation"] == 1
    model.load_params_from_files(str(tmp_path / "snap_iter1"))  # same: ok
    # forge a mismatching stamp -> load must refuse
    meta["shard_rotation"] = 0
    _json.dump(meta, open(tmp_path / "snap_iter1" / "meta.json", "w"))
    with pytest.raises(ValueError, match="shard_rotation"):
        model.load_params_from_files(str(tmp_path / "snap_iter1"))


def test_eval_scan_matches_per_batch(mesh1, monkeypatch):
    """Scanned eval (K cached batches per lax.scan dispatch, bulk metric
    writes) returns the SAME metrics as the per-batch path — single-device
    mesh so the scan path engages on the CPU backend."""
    model = _build_dcn_model(mesh1, use_ebc=True)
    for _ in range(5):
        model.train()
    monkeypatch.setenv("HCTR_TPU_EVAL_SCAN", "0")
    vals_loop = model.eval()
    monkeypatch.setenv("HCTR_TPU_EVAL_SCAN", "1")
    vals_scan = model.eval()
    assert set(vals_scan) == set(vals_loop)
    for k in vals_loop:
        assert abs(vals_scan[k] - vals_loop[k]) < 1e-5, (k, vals_scan, vals_loop)
