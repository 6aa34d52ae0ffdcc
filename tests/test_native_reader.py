"""Native C++ async raw reader vs python RawReader equivalence."""
import os

import numpy as np
import pytest

from hugectr_tpu.core.types import DataReaderType_t
from hugectr_tpu.data import BatchSpec, DataGenerator, DataGeneratorParams, RawReader, SparseFeatureSpec
from hugectr_tpu.data.native_reader import NativeRawReader, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_python(tmp_path):
    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=3,
        num_slot=2,
        source=str(tmp_path / "train.bin"),
        eval_source=str(tmp_path / "eval.bin"),
        slot_size_array=[50, 70],
        nnz_array=[2, 1],
        num_samples=1000,
        eval_num_samples=100,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=128,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=3,
        dense_name="dense",
        sparse=(
            SparseFeatureSpec("a", (2,)),
            SparseFeatureSpec("b", (1,)),
        ),
    )
    py = RawReader(
        str(tmp_path / "train.bin"), spec, float_label_dense=True, repeat=False
    )
    nat = NativeRawReader(
        str(tmp_path / "train.bin"), spec, float_label_dense=True, repeat=False
    )
    assert nat.num_batches == py.num_batches == 1000 // 128
    pb = list(py)
    nb = list(nat)
    assert len(pb) == len(nb)
    for b1, b2 in zip(pb, nb):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_repeat_mode(tmp_path):
    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=2,
        num_slot=1,
        source=str(tmp_path / "t.bin"),
        eval_source=str(tmp_path / "e.bin"),
        slot_size_array=[10],
        nnz_array=[1],
        num_samples=256,
        eval_num_samples=64,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=64,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=2,
        dense_name="dense",
        sparse=(SparseFeatureSpec("a", (1,)),),
    )
    nat = NativeRawReader(str(tmp_path / "t.bin"), spec, float_label_dense=True, repeat=True)
    it = iter(nat)
    seen = [next(it) for _ in range(10)]  # 2.5 epochs without blocking
    assert len(seen) == 10
    # epoch wraps: batch 4 == batch 0
    np.testing.assert_array_equal(seen[0]["a"], seen[4]["a"])
    nat.close()


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_reiterable(tmp_path):
    """ADVICE r1: fresh __iter__ must rewind to batch 0 (eval re-reads)."""
    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=2,
        num_slot=1,
        source=str(tmp_path / "t.bin"),
        eval_source=str(tmp_path / "e.bin"),
        slot_size_array=[10],
        nnz_array=[1],
        num_samples=256,
        eval_num_samples=64,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=64,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=2,
        dense_name="dense",
        sparse=(SparseFeatureSpec("a", (1,)),),
    )
    nat = NativeRawReader(
        str(tmp_path / "t.bin"), spec, float_label_dense=True, repeat=False
    )
    pass1 = list(nat)
    pass2 = list(nat)
    pass3 = list(nat)
    assert len(pass1) == len(pass2) == len(pass3) == 4
    for b1, b2 in zip(pass1, pass2):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    nat.close()


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_num_samples_repeat(tmp_path):
    """ADVICE r1: num_samples caps the cycled subset in repeat mode too."""
    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=2,
        num_slot=1,
        source=str(tmp_path / "t.bin"),
        eval_source=str(tmp_path / "e.bin"),
        slot_size_array=[10],
        nnz_array=[1],
        num_samples=512,
        eval_num_samples=64,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=64,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=2,
        dense_name="dense",
        sparse=(SparseFeatureSpec("a", (1,)),),
    )
    # file has 8 batches; num_samples=128 limits the epoch to 2
    nat = NativeRawReader(
        str(tmp_path / "t.bin"),
        spec,
        num_samples=128,
        float_label_dense=True,
        repeat=True,
    )
    assert nat.num_batches == 2
    it = iter(nat)
    seen = [next(it) for _ in range(5)]
    np.testing.assert_array_equal(seen[0]["a"], seen[2]["a"])  # wraps at 2
    np.testing.assert_array_equal(seen[1]["a"], seen[3]["a"])
    assert not np.array_equal(seen[0]["a"], seen[1]["a"])
    nat.close()


def test_int_dense_log_transform(tmp_path):
    """Int-dense decode is log(x+1) with negative clamp (split_batch.cu:35)."""
    spec = BatchSpec(
        batch_size=4,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=2,
        dense_name="dense",
        sparse=(SparseFeatureSpec("a", (1,)),),
    )
    rows = np.array(
        [
            [1, 0, 5, 7],
            [0, 3, -1, 9],
            [1, 100, 2, 3],
            [0, 7, 0, 1],
        ],
        dtype=np.int32,
    )
    rd = RawReader.__new__(RawReader)
    rd.spec = spec
    rd.float_label_dense = False
    b = RawReader._decode(rd, rows)
    dn = rows[:, 1:3].astype(np.float32)
    expect = np.log1p(np.maximum(dn, 0))
    np.testing.assert_allclose(b["dense"], expect, rtol=1e-6)


def _write_tsv(path, rows, rng):
    """Synthetic Criteo-style TSV: label \\t 13 ints \\t 26 hex cats."""
    lines = []
    cats_used = []
    for _ in range(rows):
        label = int(rng.integers(0, 2))
        dense = [str(int(rng.integers(0, 100))) for _ in range(13)]
        # skew: few hot hex ids + a random tail; some empty fields
        cs = []
        row_cats = []
        for c in range(26):
            if rng.random() < 0.05:
                cs.append("")  # missing
                row_cats.append(0)
            else:
                v = int(rng.integers(0, 8)) if rng.random() < 0.7 else int(
                    rng.integers(0, 1 << 24)
                )
                cs.append(format(v, "x"))
                row_cats.append(v)
        cats_used.append(row_cats)
        lines.append("\t".join([str(label)] + dense + cs))
    path.write_text("\n".join(lines) + "\n")
    return np.asarray(cats_used, np.int64)


def test_criteo_to_raw_native(tmp_path):
    """Native TSV->Raw converter (dlrm_script analog): row layout, hex
    hashing, missing-field zeros; --remap makes id 0 the most frequent."""
    import subprocess
    import sys

    rng = np.random.default_rng(11)
    tsv = tmp_path / "day.tsv"
    cats = _write_tsv(tsv, 500, rng)
    out = tmp_path / "day.bin"
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "criteo_to_raw.py")
    subprocess.run(
        [sys.executable, tool, "--input", str(tsv), "--output", str(out),
         "--vocab_cap", "1000000"],
        check=True,
    )
    arr = np.fromfile(out, np.int32).reshape(500, 40)
    assert set(np.unique(arr[:, 0])) <= {0, 1}
    np.testing.assert_array_equal(arr[:, 14:], cats % 1000000)

    # remap: per column, id 0 must be the most frequent ORIGINAL id
    out2 = tmp_path / "day_remap.bin"
    subprocess.run(
        [sys.executable, tool, "--input", str(tsv), "--output", str(out2),
         "--vocab_cap", "1000000", "--remap"],
        check=True,
    )
    arr2 = np.fromfile(out2, np.int32).reshape(500, 40)
    for c in range(26):
        orig = arr[:, 14 + c]
        new = arr2[:, 14 + c]
        # frequency of new id 0 == max frequency of any original id
        u, n = np.unique(orig, return_counts=True)
        assert (new == 0).sum() == n.max(), f"col {c}"
        # remap is a bijection preserving multiplicity
        u2, n2 = np.unique(new, return_counts=True)
        np.testing.assert_array_equal(np.sort(n), np.sort(n2))
        assert u2.max() == len(u) - 1

    # the converted file feeds RawReader directly (MLPerf raw layout)
    from hugectr_tpu.data import BatchSpec, RawReader, SparseFeatureSpec

    spec = BatchSpec(
        batch_size=100,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=13,
        dense_name="dense",
        sparse=tuple(
            SparseFeatureSpec(name=f"d{i}", slot_nnz=(1,)) for i in range(26)
        ),
    )
    r = RawReader(str(out), spec, repeat=False)
    b = next(iter(r))
    assert b["dense"].shape == (100, 13)
    np.testing.assert_allclose(
        b["dense"][:, 0], np.log1p(arr[:100, 1].astype(np.float32))
    )

    # the streaming numpy fallback must be byte-identical to the native
    # converter, with and without --remap (it chunks the parse and remaps
    # via memmap passes — bounded memory on arbitrarily large inputs)
    env = dict(os.environ, HCTR_TPU_FORCE_NUMPY="1")
    for flags, ref in (((), out), (("--remap",), out2)):
        outn = tmp_path / f"day_np{'_remap' if flags else ''}.bin"
        subprocess.run(
            [sys.executable, tool, "--input", str(tsv), "--output",
             str(outn), "--vocab_cap", "1000000", *flags],
            check=True, env=env,
        )
        np.testing.assert_array_equal(
            np.fromfile(outn, np.int32).reshape(500, 40),
            np.fromfile(ref, np.int32).reshape(500, 40),
            err_msg=f"numpy fallback diverges from native ({flags})",
        )


def test_fused_h2d_training_matches_per_feature(tmp_path, mesh1, monkeypatch):
    """HCTR_TPU_FUSED_H2D: one [B, W] int32 upload + in-graph split_3_way
    decode must train identically to the host-decoded per-feature path."""
    import jax
    import hugectr_tpu as hugectr
    from hugectr_tpu.core.types import Metric_t

    DataGenerator(DataGeneratorParams(
        format=DataReaderType_t.Raw, label_dim=1, dense_dim=4, num_slot=2,
        source=str(tmp_path / "t.bin"), eval_source=str(tmp_path / "e.bin"),
        slot_size_array=[50, 80], nnz_array=[2, 3], num_samples=256,
        eval_num_samples=64, seed=3,
    )).generate()

    def run(fused):
        monkeypatch.setenv("HCTR_TPU_FUSED_H2D", "1" if fused else "0")
        solver = hugectr.CreateSolver(
            batchsize=32, batchsize_eval=32, lr=0.1, max_eval_batches=2,
            repeat_dataset=True, seed=5,
        )
        reader = hugectr.DataReaderParams(
            data_reader_type=DataReaderType_t.RawAsync,
            source=[str(tmp_path / "t.bin")],
            eval_source=str(tmp_path / "e.bin"),
            num_samples=256, eval_num_samples=64, slot_size_array=[50, 80],
        )
        opt = hugectr.CreateOptimizer(
            optimizer_type=hugectr.Optimizer_t.AdaGrad
        )
        model = hugectr.Model(solver, reader, opt)
        model.add(hugectr.Input(
            label_dim=1, label_name="label", dense_dim=4, dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1),
                hugectr.DataReaderSparseParam("d1", 3, True, 1),
            ],
        ))
        tables = [
            hugectr.EmbeddingTableConfig(
                name=f"t{i}", max_vocabulary_size=[50, 80][i], ev_size=8
            )
            for i in range(2)
        ]
        ebc = hugectr.EmbeddingCollectionConfig()
        ebc.embedding_lookup(tables, ["d0", "d1"], "emb", ["sum", "sum"])
        ebc.shard(shard_matrix=[[t.name for t in tables]],
                  shard_strategy=[("mp", [t.name for t in tables])])
        model.add(ebc)
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "dense"], top_names=["c"]))
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP, bottom_names=["c"],
            top_names=["m"], num_outputs=[8, 1],
            activations=[hugectr.Activation_t.Relu, hugectr.Activation_t.Non]))
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["m", "label"], top_names=["loss"]))
        model.compile()
        if fused:
            from hugectr_tpu.data.reader import FUSED_KEY
            assert getattr(model.train_reader, "fused", False)
        losses = [model.train() for _ in range(4)]
        tbl = model.ec.export_table(model.state["emb_tables"], "t0")
        return losses, tbl

    l1, t1 = run(True)
    l0, t0 = run(False)
    np.testing.assert_allclose(l1, l0, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(t1, t0, rtol=1e-6, atol=1e-7)
