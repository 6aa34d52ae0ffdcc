"""Reference Python-API surface parity.

The reference exports these names from its pybind module
(HugeCTR/src/pybind/module_main.cpp + include/pybind/*.hpp) and documents
them in docs/source/api/python_interface.md; a HugeCTR user switching over
must find every one. Functional methods get behavior tests, not just
existence checks.
"""
import os

import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t


def _tiny_model(rm, tmp_path=None, reader=None, lr=0.05):
    solver = hugectr.CreateSolver(
        max_eval_batches=2, batchsize_eval=32, batchsize=32, lr=lr,
        warmup_steps=1,
    )
    reader = reader or hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=4
    )
    model = hugectr.Model(
        solver,
        reader,
        hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.AdaGrad),
        resource_manager=rm,
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
        hugectr.EmbeddingTableConfig(name="t0", max_vocabulary_size=64, ev_size=8)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(tables, ["d0"], "emb", ["sum"])
    ebc.shard(shard_matrix=[["t0"]], shard_strategy=[("mp", ["t0"])])
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "dense"],
            top_names=["c1"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["c1"],
            top_names=["fc1"],
            num_output=1,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["fc1", "label"],
            top_names=["loss"],
        )
    )
    model.compile()
    return model


def test_module_exports_reference_names():
    """Every pybind-exported class/enum of the reference module resolves
    (module_main.cpp:36-48 + common_wrapper.hpp registrations)."""
    names = [
        "CreateSolver", "CreateOptimizer", "Model", "Input", "SparseEmbedding",
        "DenseLayer", "DenseLayerComputeConfig", "EmbeddingCollectionConfig",
        "EmbeddingTableConfig", "DataReaderParams", "DataReaderSparseParam",
        "AsyncParam", "DataSourceParams", "DataGenerator",
        "DataGeneratorParams", "LearningRateScheduler", "TrainingCallback",
        "OptParamsPy",
        # enums (common_wrapper.hpp)
        "Error_t", "Check_t", "DataReaderType_t", "FileSystemType_t",
        "SourceType_t", "TrainPSType_t", "Embedding_t", "Initializer_t",
        "Layer_t", "Alignment_t", "LrPolicy_t", "Optimizer_t", "Update_t",
        "Activation_t", "FcPosition_t", "Regularizer_t", "MetricsType",
        "MetricsRawType", "DeviceLayout", "AllReduceAlgo", "Distribution_t",
        "PowerLaw_t", "Tensor_t", "CommunicationStrategy",
        "CompressionStrategy",
    ]
    missing = [n for n in names if not hasattr(hugectr, n)]
    assert not missing, f"missing exports: {missing}"
    # spot-check enum members used by reference scripts
    assert hugectr.FcPosition_t.Head and hugectr.FcPosition_t.Tail
    assert hugectr.Alignment_t.Auto and hugectr.Alignment_t.Non
    assert hugectr.FileSystemType_t.HDFS and hugectr.FileSystemType_t.S3
    assert hugectr.Distribution_t.PowerLaw
    assert hugectr.Tensor_t.Train and hugectr.Tensor_t.Evaluate
    assert hugectr.DeviceLayout.LocalFirst
    assert hugectr.AllReduceAlgo.OneShot
    assert hugectr.Update_t.LazyGlobal
    assert hugectr.Error_t.WrongInput
    err = hugectr.HugeCTRError(hugectr.Error_t.EndOfFile, "eof")
    assert err.error_t == hugectr.Error_t.EndOfFile


def test_async_param_constraint():
    hugectr.AsyncParam(num_threads=2, num_batches_per_thread=4)
    with pytest.raises(ValueError):
        hugectr.AsyncParam(multi_hot_reader=False, is_dense_float=True)


def test_data_source_params_uri():
    dsp = hugectr.DataSourceParams(
        source=hugectr.FileSystemType_t.HDFS, server="nn", port=9000
    )
    assert dsp.make_uri("/data/x.npy") == "hdfs://nn:9000/data/x.npy"
    local = hugectr.DataSourceParams(source="local")
    assert local.make_uri("/tmp/x") == "/tmp/x"


def test_lowlevel_training_api(mesh1):
    """set_learning_rate / get_current_loss / get_eval_metrics /
    get_learning_rate_scheduler / reader handles (reference low-level API,
    python_interface.md:908-1060)."""
    model = _tiny_model(mesh1)
    model.start_data_reading()
    lrs = model.get_learning_rate_scheduler()
    assert lrs.get_next(10) > 0
    loss = model.train()
    assert model.get_current_loss() == pytest.approx(loss)
    vals = model.eval()
    assert model.get_eval_metrics() == vals
    # explicit-LR override: set_learning_rate(0.0) must FREEZE updates, not
    # silently fall back to the scheduler (reference low-level semantics)
    model.set_learning_rate(0.0)
    before = np.asarray(
        model.ec.export_table(model.state["emb_tables"], "t0")
    ).copy()
    model.train()
    after = np.asarray(model.ec.export_table(model.state["emb_tables"], "t0"))
    np.testing.assert_array_equal(after, before)
    # negative restores the scheduler: training changes weights again
    model.set_learning_rate(-1.0)
    model.train()
    after2 = np.asarray(model.ec.export_table(model.state["emb_tables"], "t0"))
    assert np.abs(after2 - before).max() > 1e-6
    rd = model.get_data_reader_train()
    assert rd.is_eof() is False
    assert model.get_data_reader_eval().is_eof() is False
    # reader-handle staging flow (reference: DataReader::is_started /
    # read_a_batch_to_device[_delay_release] / ready_to_collect)
    assert rd.is_started() is True  # start_data_reading() above
    n = rd.read_a_batch_to_device()
    assert n == model.solver.batchsize
    n2 = rd.read_a_batch_to_device_delay_release()
    assert n2 == model.solver.batchsize
    rd.ready_to_collect()  # no-op handshake, must not raise
    re = model.get_data_reader_eval()
    assert re.read_a_batch_to_device() == model.solver.batchsize_eval
    assert re.is_started() is True


def test_reset_learning_rate_scheduler(mesh1):
    model = _tiny_model(mesh1)
    model.reset_learning_rate_scheduler(
        0.5, warmup_steps=2, decay_start=4, decay_steps=4, decay_power=1.0,
        end_lr=0.1,
    )
    lrs = model.get_learning_rate_scheduler()
    assert lrs.get_next(1) == pytest.approx(0.25)
    assert lrs.get_next(2) == pytest.approx(0.5)
    assert lrs.get_next(8) == pytest.approx(0.1)
    model.train()  # re-jitted step still runs


def test_granular_save_load(mesh1, tmp_path):
    """load_dense_weights / load_dense_optimizer_states /
    load_sparse_weights / load_sparse_optimizer_states restore exactly the
    slice they name (reference: model.cpp:439-519)."""
    model = _tiny_model(mesh1)
    for _ in range(3):
        model.train()
    model.save_params_to_files(str(tmp_path / "snap"), 3)
    snap = str(tmp_path / "snap_iter3")
    ref_dense = np.asarray(
        next(iter(jax_leaves(model.state["dense_params"])))
    ).copy()
    ref_table = np.asarray(
        model.ec.export_table(model.state["emb_tables"], "t0")
    ).copy()
    gname = next(iter(model.state["eopt"]))
    slot = next(iter(model.state["eopt"][gname]))
    ref_eopt = np.asarray(model.state["eopt"][gname][slot]).copy()

    for _ in range(3):  # diverge
        model.train()
    model.load_dense_weights(snap)
    np.testing.assert_array_equal(
        np.asarray(next(iter(jax_leaves(model.state["dense_params"])))),
        ref_dense,
    )
    model.load_dense_optimizer_states(snap)
    model.load_sparse_weights(snap)
    np.testing.assert_array_equal(
        np.asarray(model.ec.export_table(model.state["emb_tables"], "t0")),
        ref_table,
    )
    model.load_sparse_optimizer_states(snap)
    np.testing.assert_array_equal(
        np.asarray(model.state["eopt"][gname][slot]), ref_eopt
    )
    # list-of-dirs form (reference signature)
    model.load_sparse_weights([snap + "/sparse_t0"])


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_embedding_dump_load(mesh1, tmp_path):
    model = _tiny_model(mesh1)
    model.train()
    ref = np.asarray(
        model.ec.export_table(model.state["emb_tables"], "t0")
    ).copy()
    model.embedding_dump(str(tmp_path / "emb"), ["t0"])
    assert (tmp_path / "emb" / "t0" / "emb_vector.npy").exists()
    for _ in range(2):
        model.train()
    model.embedding_load(str(tmp_path / "emb"))
    np.testing.assert_array_equal(
        np.asarray(model.ec.export_table(model.state["emb_tables"], "t0")), ref
    )


def test_read_a_batch_stages_for_next_train(mesh1):
    """read_a_batch stages a batch that the NEXT train() consumes (reference
    low-level pattern: read_a_batch_to_device() then train() trains on the
    staged data — no silently skipped batches)."""
    model = _tiny_model(mesh1)
    model.start_data_reading()
    assert model.read_a_batch(is_train=True) is True
    staged = model._staged_train_batch
    assert staged is not None
    seen = []
    orig = model._train_step
    model._train_step = lambda s, b, r: (seen.append(b), orig(s, b, r))[1]
    model.train()
    assert seen[0] is staged
    assert model._staged_train_batch is None
    model.train()  # unstaged path still works
    assert len(seen) == 2 and seen[1] is not staged


def test_params_num_weights_and_batch_peek(mesh1):
    """get_params_num / copy_weights_for_evaluation / read_a_batch /
    update_label_weights (reference: model.hpp public surface)."""
    model = _tiny_model(mesh1)
    n = model.get_params_num()
    emb = 64 * 8
    dense = sum(
        int(np.prod(x.shape)) for x in jax_leaves(model.state["dense_params"])
    )
    assert n == emb + dense
    model.copy_weights_for_evaluation()  # shared-state no-op, must exist
    assert model.read_a_batch(is_train=True) is True
    assert model.read_a_batch(is_train=False) is True
    # update_label_weights re-weights the (single) loss
    model.train()
    model.update_label_weights(["label"], [2.0])
    with pytest.raises(ValueError):
        model.update_label_weights(["nope"], [1.0])
    assert model.network.loss_specs[0].weight == 2.0


def test_embedding_gen_tool_output_loads(mesh1, tmp_path):
    """tools/embedding_gen.py writes snapshot tables loadable via
    embedding_load (reference: tools/model_generation/embedding_gen.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "embedding_gen",
        os.path.join(os.path.dirname(__file__), "..", "tools", "embedding_gen.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    gen.generate([64], 8, str(tmp_path / "snap"), names=["t0"], seed=7)
    expected = np.load(tmp_path / "snap" / "sparse_t0" / "emb_vector.npy")
    assert expected.shape == (64, 8)
    bound = np.sqrt(1.0 / 64)
    assert np.abs(expected).max() <= bound

    model = _tiny_model(mesh1)
    # embedding_load expects <dir>/<table>/emb_vector.npy layout
    os.rename(tmp_path / "snap" / "sparse_t0", tmp_path / "snap" / "t0")
    model.embedding_load(str(tmp_path / "snap"))
    np.testing.assert_allclose(
        np.asarray(model.ec.export_table(model.state["emb_tables"], "t0")),
        expected,
        rtol=1e-6,
    )


def test_set_source_and_eof(mesh1, tmp_path):
    """Raw reader: exhausting a non-repeating source flips is_eof; a
    set_source re-points and resets (reference epoch-mode flow,
    python_interface.md set_source)."""
    from hugectr_tpu.data.generator import DataGenerator

    params = hugectr.DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=4,
        num_slot=1,
        source=str(tmp_path / "a.bin"),
        eval_source=str(tmp_path / "b.bin"),
        slot_size_array=[64],
        nnz_array=[2],
        num_samples=64,
        eval_num_samples=64,
    )
    DataGenerator(params).generate()
    solver_reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Raw,
        source=[str(tmp_path / "a.bin")],
        eval_source=str(tmp_path / "b.bin"),
        num_samples=64,
        eval_num_samples=64,
    )
    model = _tiny_model(mesh1, reader=solver_reader)
    model.solver.repeat_dataset = False
    model.train_reader = model._make_reader(train=True)
    rd = model.get_data_reader_train()
    n = 0
    with pytest.raises(StopIteration):
        while True:
            model.train()
            n += 1
    assert n == 2  # 64 samples / batch 32
    assert rd.is_eof()
    rd.set_source(str(tmp_path / "b.bin"))
    assert not rd.is_eof()
    model.train()  # reads from the new source

    # eval reader EOF: a non-repeating eval source that runs dry before
    # max_eval_batches flips the eval handle's is_eof
    model.solver.max_eval_batches = 100
    model.eval_reader = model._make_reader(train=False)
    model._eval_cache = None
    erd = model.get_data_reader_eval()
    assert not erd.is_eof()
    model.eval()
    assert erd.is_eof()
    erd.set_source(str(tmp_path / "a.bin"))
    assert not erd.is_eof()


def test_data_reader_params_data_source_params():
    """data_source_params prefixes plain paths (reference:
    DataReaderParams.data_source_params); keyset is accepted."""
    dsp = hugectr.DataSourceParams(
        source=hugectr.FileSystemType_t.HDFS, server="nn", port=8020
    )
    rp = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Parquet,
        source=["/data/file_list.txt"],
        eval_source="/data/val_list.txt",
        keyset="/data/file_list.keyset",
        data_source_params=dsp,
    )
    assert rp.source == ["hdfs://nn:8020/data/file_list.txt"]
    assert rp.eval_source == "hdfs://nn:8020/data/val_list.txt"
    assert rp.keyset == ["/data/file_list.keyset"]
