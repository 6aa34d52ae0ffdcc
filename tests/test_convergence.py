"""Convergence + API-surface tests (analog of reference
test/pybind_test/model_test.py convergence gates)."""
import os

import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t, Metric_t


def _model(
    rm,
    learnable=True,
    batch=512,
    emb_dtype="float32",
    optimizer_type=None,
    seed=7,
):
    solver = hugectr.CreateSolver(
        max_eval_batches=8,
        batchsize_eval=batch,
        batchsize=batch,
        lr=0.05,
        metrics_spec={Metric_t.AUC: 1.0, Metric_t.AverageLoss: 1.0},
        repeat_dataset=True,
        seed=seed,
        embedding_vec_dtype=emb_dtype,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic,
        synthetic_num_batches=24,
        synthetic_learnable=learnable,
    )
    optimizer = hugectr.CreateOptimizer(
        optimizer_type=optimizer_type or hugectr.Optimizer_t.Adam
    )
    model = hugectr.Model(solver, reader, optimizer, resource_manager=rm)
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=4,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam(f"data{i}", 1, True, 1)
                for i in range(3)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(
            name=f"t{i}", max_vocabulary_size=200, ev_size=8
        )
        for i in range(3)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(
        table_config=tables,
        bottom_name=[f"data{i}" for i in range(3)],
        top_name="emb",
        combiner=["sum"] * 3,
    )
    ebc.shard(
        shard_matrix=[[t.name for t in tables]] * rm.num_devices,
        shard_strategy=[("mp", [t.name for t in tables])],
    )
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "dense"],
            top_names=["concat1"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP,
            bottom_names=["concat1"],
            top_names=["mlp1"],
            num_outputs=[32, 16],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["mlp1"],
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


GATE_STEPS = 1000
NOISE_SEEDS = (7, 17, 27)


def _train_auc(rm, steps=GATE_STEPS, **kw):
    model = _model(rm, **kw)
    for _ in range(steps):
        model.train_async()
    return model.eval()["auc"]


@pytest.fixture(scope="module")
def fp32_noise_floor(mesh8):
    """Calibrated run-to-run AUC noise of the synthetic task: fp32/Adam at
    GATE_STEPS across NOISE_SEEDS seeds -> (mean, sigma). The gates below
    bound accuracy-affecting speed options at this floor instead of a loose
    fixed tolerance (VERDICT r3 item 5 — MLPerf margins are ~0.0005 AUC, so
    a 0.03 @ 300-step gate could pass options that fail a real run)."""
    aucs = [_train_auc(mesh8, seed=s) for s in NOISE_SEEDS]
    mean = float(np.mean(aucs))
    sigma = float(np.std(aucs))
    return mean, sigma, aucs


def _gate(sigma):
    # 2.5 sigma of measured seed noise, floored at 0.005 so a degenerate
    # near-zero sigma (seeds agreeing by luck) cannot make the gate flaky
    return max(2.5 * sigma, 0.005)


def test_learnable_synthetic_converges(mesh8):
    """Key-parity labels are perfectly learnable by an embedding model: AUC
    must climb well above chance within a few hundred steps."""
    model = _model(mesh8)
    for _ in range(300):
        model.train_async()
    vals = model.eval()
    assert vals["auc"] > 0.72, f"failed to learn: {vals}"


def test_bf16_embedding_convergence_gate(mesh8, fp32_noise_floor):
    """bf16 embedding vectors must cost no more AUC than run-to-run seed
    variance at GATE_STEPS (the gate behind the bench's bf16 operating
    point; reference mixed-precision embedding uses fp16 vectors with fp32
    optimizer math)."""
    mean, sigma, aucs = fp32_noise_floor
    bf16 = _train_auc(mesh8, emb_dtype="bfloat16")
    assert bf16 > 0.72, (bf16, aucs)
    assert abs(bf16 - mean) < _gate(sigma), (bf16, mean, sigma, aucs)


def test_bf16_optimizer_state_convergence_gate(
    mesh8, fp32_noise_floor, monkeypatch
):
    """bf16 OPTIMIZER STATE gate (the bench operating point): with fp32
    bias-correction scalars, bf16 moments must cost no more AUC than seed
    variance vs fp32 state (both with bf16 vectors)."""
    mean, sigma, _ = fp32_noise_floor
    aucs = {}
    for dt in ("float32", "bfloat16"):
        monkeypatch.setenv("HCTR_TPU_EMB_STATE_DTYPE", dt)
        aucs[dt] = _train_auc(mesh8, emb_dtype="bfloat16")
    assert aucs["bfloat16"] > 0.72, aucs
    assert abs(aucs["bfloat16"] - aucs["float32"]) < _gate(sigma), (
        aucs, sigma,
    )


def test_rowwise_adagrad_convergence_gate(mesh8, fp32_noise_floor):
    """RowWiseAdaGrad (torchrec-style scalar accumulator per row — the
    MLPerf DLRM reference implementation's embedding optimizer) must cost
    no more AUC than seed variance vs element-wise AdaGrad. This is the
    gate behind offering it as a bench operating point."""
    _mean, sigma, _ = fp32_noise_floor
    aucs = {}
    for ot in (
        hugectr.Optimizer_t.AdaGrad,
        hugectr.Optimizer_t.RowWiseAdaGrad,
    ):
        aucs[ot] = _train_auc(mesh8, optimizer_type=ot)
    rw = aucs[hugectr.Optimizer_t.RowWiseAdaGrad]
    ew = aucs[hugectr.Optimizer_t.AdaGrad]
    assert rw > 0.72, aucs
    assert abs(rw - ew) < _gate(sigma), (aucs, sigma)


def test_auto_ucap_model_path(mesh8, monkeypatch):
    """HCTR_TPU_UCAP_FACTOR=auto end-to-end: the Model measures unique caps
    off the first batch and training still converges/learns."""
    monkeypatch.setenv("HCTR_TPU_UCAP_FACTOR", "auto")
    # vocab above the onehot threshold so the rowop engine (which consumes
    # the caps) is exercised
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "0")
    model = _model(mesh8)
    for _ in range(60):
        model.train_async()
    assert model.ec.unique_caps, "auto caps were never measured"
    loss = model.train()
    assert np.isfinite(loss)


def test_freeze_dense_and_embedding(mesh8):
    model = _model(mesh8, learnable=False, batch=64)
    import jax

    model.train()
    d0 = jax.tree.leaves(model.state["dense_params"])[0].copy()
    e0 = model.ec.export_table(model.state["emb_tables"], "t0").copy()
    model.freeze_dense()
    model.freeze_embedding()
    for _ in range(3):
        model.train()
    assert np.allclose(jax.tree.leaves(model.state["dense_params"])[0], d0)
    assert np.allclose(
        model.ec.export_table(model.state["emb_tables"], "t0"), e0
    )
    model.unfreeze_dense()
    model.unfreeze_embedding()
    for _ in range(2):
        model.train()
    assert not np.allclose(jax.tree.leaves(model.state["dense_params"])[0], d0)
    assert not np.allclose(
        model.ec.export_table(model.state["emb_tables"], "t0"), e0
    )


def test_graph_json_roundtrip_and_retrain(mesh8, tmp_path):
    model = _model(mesh8, learnable=False, batch=64)
    path = str(tmp_path / "graph.json")
    model.graph_to_json(path)
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=8
    )
    model2 = hugectr.Model.construct_from_json(
        path,
        reader_params=reader,
        optimizer=hugectr.CreateOptimizer(
            optimizer_type=hugectr.Optimizer_t.Adam
        ),
        resource_manager=mesh8,
    )
    losses = [model2.train() for _ in range(3)]
    assert np.isfinite(losses).all()
    assert [l.layer_type for l in model2.dense_layers] == [
        l.layer_type for l in model.dense_layers
    ]


def test_multitask_per_label_metrics(mesh8):
    """Multi-task models report per-task AUC (reference: multi-label AUC)."""
    import runpy, sys, os

    samples_dir = os.path.join(os.path.dirname(__file__), "..", "samples")
    sys.path.insert(0, samples_dir)
    try:
        import common as sample_common

        orig = sample_common.make_reader

        def small(args, slots, nnz_array=None, **kw):
            kw.update(num_samples_per_file=256, num_files=2)
            return orig(args, [min(s, 300) for s in slots], nnz_array=nnz_array, **kw)

        sample_common.make_reader = small
        argv, sys.argv = sys.argv, ["mmoe", "--batchsize", "64", "--data_dir", "/tmp/mmoe_mt"]
        try:
            mod = runpy.run_path(os.path.join(samples_dir, "mmoe.py"), run_name="nm")
        finally:
            sys.argv = argv
            sample_common.make_reader = orig
    finally:
        sys.path.remove(samples_dir)
    model = mod["model"]
    model.compile()
    model.train()
    vals = model.eval()
    assert "auc" in vals and "auc_married_label" in vals, vals


def test_per_table_freeze(mesh8):
    model = _model(mesh8, learnable=False, batch=64)
    e0 = model.ec.export_table(model.state["emb_tables"], "t0").copy()
    e1 = model.ec.export_table(model.state["emb_tables"], "t1").copy()
    model.freeze_embedding("t0")
    for _ in range(3):
        model.train()
    assert np.allclose(
        model.ec.export_table(model.state["emb_tables"], "t0"), e0
    )
    assert not np.allclose(
        model.ec.export_table(model.state["emb_tables"], "t1"), e1
    )
    model.unfreeze_embedding("t0")
    for _ in range(2):
        model.train()
    assert not np.allclose(
        model.ec.export_table(model.state["emb_tables"], "t0"), e0
    )


def test_solver_level_training_callbacks(mesh8):
    """Reference CreateSolver(training_callbacks=[...]) parity: callbacks
    registered at solver level fire during fit."""
    calls = []

    class CB(hugectr.TrainingCallback):
        def on_training_start(self, model):
            calls.append("start")

        def on_training_end(self, model, iteration):
            calls.append("end")

    import hugectr_tpu as h
    from hugectr_tpu.core.types import DataReaderType_t

    solver = h.CreateSolver(
        batchsize=256, batchsize_eval=256, max_eval_batches=2,
        repeat_dataset=True, training_callbacks=[CB()],
    )
    reader = h.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=4
    )
    m = h.Model(solver, reader, h.CreateOptimizer(
        optimizer_type=h.Optimizer_t.SGD), resource_manager=mesh8)
    m.add(h.Input(label_dim=1, label_name="label", dense_dim=4,
                  dense_name="dense",
                  data_reader_sparse_param_array=[
                      h.DataReaderSparseParam("d0", 1, True, 1)]))
    tables = [h.EmbeddingTableConfig(name="t", max_vocabulary_size=50,
                                     ev_size=4)]
    ebc = h.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
    ebc.shard(shard_matrix=[["t"]] * mesh8.num_devices,
              shard_strategy=[("mp", ["t"])])
    m.add(ebc)
    m.add(h.DenseLayer(layer_type=h.Layer_t.Concat,
                       bottom_names=["emb", "dense"], top_names=["c"]))
    m.add(h.DenseLayer(layer_type=h.Layer_t.InnerProduct,
                       bottom_names=["c"], top_names=["logit"], num_output=1,
                       act_type=h.Activation_t.Non))
    m.add(h.DenseLayer(layer_type=h.Layer_t.BinaryCrossEntropyLoss,
                       bottom_names=["logit", "label"], top_names=["loss"]))
    m.compile()
    m.fit(max_iter=3, display=10, eval_interval=100)
    assert calls == ["start", "end"]
