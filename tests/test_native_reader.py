"""Native C++ async raw reader vs python RawReader equivalence."""
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
