"""Data generator + reader tests (analog of reference
test/utest/data_reader/: generate synthetic files on disk, read back, check
shapes/values)."""
import numpy as np
import pytest

from hugectr_tpu.core.types import Check_t, DataReaderType_t, PowerLaw_t
from hugectr_tpu.data import (
    BatchSpec,
    DataGenerator,
    DataGeneratorParams,
    DeviceFeeder,
    ParquetReader,
    RawReader,
    SparseFeatureSpec,
    SyntheticReader,
    power_law_keys,
)


def _spec(batch=32, slots=3, nnz=2, label_dim=1, dense_dim=4):
    return BatchSpec(
        batch_size=batch,
        label_dims=(label_dim,),
        label_names=("label",),
        dense_dim=dense_dim,
        dense_name="dense",
        sparse=tuple(
            SparseFeatureSpec(name=f"data{i}", slot_nnz=(nnz,)) for i in range(slots)
        ),
    )


def test_power_law_keys_bounds_and_skew():
    rng = np.random.default_rng(0)
    k = power_law_keys(rng, 10000, 100000, alpha=1.2)
    assert k.min() >= 0 and k.max() < 10000
    # power law: low keys dominate
    assert (k < 100).mean() > 0.5


def test_raw_generator_and_reader(tmp_path):
    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.bin"),
        eval_source=str(tmp_path / "eval.bin"),
        slot_size_array=[100, 200, 300],
        nnz_array=[2, 2, 2],
        num_samples=500,
        eval_num_samples=100,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    spec = _spec(batch=64)
    r = RawReader(
        str(tmp_path / "train.bin"),
        spec,
        float_label_dense=True,
        repeat=False,
    )
    assert r.num_batches == 500 // 64
    batches = list(r)
    assert len(batches) == r.num_batches
    b = batches[0]
    assert b["label"].shape == (64, 1)
    assert b["dense"].shape == (64, 4)
    assert b["data0"].shape == (64, 2)
    assert b["data0"].min() >= 0 and b["data0"].max() < 100
    assert b["data2"].max() < 300
    assert set(np.unique(b["label"])) <= {0.0, 1.0}


def test_raw_reader_tail_batch_rows_annotation(tmp_path):
    """drop_incomplete=False pads the tail batch but annotates the ACTUAL
    sample count (ROWS_KEY) so read_a_batch_to_device can report it
    (reference returns the true read count)."""
    from hugectr_tpu.data.reader import ROWS_KEY

    p = DataGeneratorParams(
        format=DataReaderType_t.Raw,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.bin"),
        eval_source=str(tmp_path / "eval.bin"),
        slot_size_array=[100, 200, 300],
        nnz_array=[2, 2, 2],
        num_samples=150,  # 2 full batches of 64 + tail of 22
        eval_num_samples=64,
        float_label_dense=True,
    )
    DataGenerator(p).generate()
    r = RawReader(
        str(tmp_path / "train.bin"),
        _spec(batch=64),
        float_label_dense=True,
        drop_incomplete=False,
        repeat=False,
    )
    batches = list(r)
    assert len(batches) == 3
    assert ROWS_KEY not in batches[0] and ROWS_KEY not in batches[1]
    assert int(batches[2][ROWS_KEY]) == 150 - 2 * 64
    assert batches[2]["label"].shape == (64, 1)  # still padded to full shape


def test_parquet_generator_and_reader(tmp_path):
    p = DataGeneratorParams(
        format=DataReaderType_t.Parquet,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.txt"),
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=[50, 60, 70],
        nnz_array=[1, 2, 1],
        num_files=2,
        eval_num_files=1,
        num_samples_per_file=100,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=32,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=4,
        dense_name="dense",
        sparse=(
            SparseFeatureSpec("data0", (1,)),
            SparseFeatureSpec("data1", (2,)),
            SparseFeatureSpec("data2", (1,)),
        ),
    )
    r = ParquetReader(str(tmp_path / "train.txt"), spec, repeat=False)
    assert r.num_batches == 200 // 32
    batches = list(r)
    assert len(batches) == r.num_batches
    b = batches[0]
    assert b["data1"].shape == (32, 2)
    assert b["data1"].max() < 60
    assert b["dense"].shape == (32, 4)


def test_device_feeder():
    spec = _spec(batch=16, slots=2)
    reader = SyntheticReader(
        spec, {"data0": [100], "data1": [200]}, num_batches=5, repeat=False
    )
    got = list(DeviceFeeder(reader, put_fn=lambda b: b, depth=2))
    assert len(got) == 5
    assert got[0]["data1"].max() < 200


def test_parquet_shuffle_epochs(tmp_path):
    p = DataGeneratorParams(
        format=DataReaderType_t.Parquet,
        label_dim=1,
        dense_dim=2,
        num_slot=1,
        source=str(tmp_path / "t.txt"),
        eval_source=str(tmp_path / "e.txt"),
        slot_size_array=[50],
        nnz_array=[1],
        num_files=4,
        eval_num_files=1,
        num_samples_per_file=64,
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
    b2 = [
        b["a"].copy()
        for b in ParquetReader(str(tmp_path / "t.txt"), spec, repeat=False)
    ]
    key = lambda bs: sorted(tuple(b.ravel().tolist()) for b in bs)
    reordered = False
    for seed in range(1, 6):  # a 4-element shuffle can be identity by chance
        r1 = ParquetReader(
            str(tmp_path / "t.txt"), spec, repeat=False, shuffle=True, seed=seed
        )
        b1 = [b["a"].copy() for b in r1]
        assert len(b1) == len(b2) == 4
        assert key(b1) == key(b2)  # same multiset of batches
        reordered |= any((x != y).any() for x, y in zip(b1, b2))
    assert reordered


def test_async_parquet_matches_sync(tmp_path):
    """Threaded row-group streaming yields IDENTICAL batches to the
    synchronous reader (parquet_data_reader_worker.cpp analog)."""
    from hugectr_tpu.data import AsyncParquetReader

    p = DataGeneratorParams(
        format=DataReaderType_t.Parquet,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.txt"),
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=[50, 60, 70],
        nnz_array=[1, 2, 1],
        num_files=3,
        eval_num_files=1,
        num_samples_per_file=100,
    )
    DataGenerator(p).generate()
    spec = BatchSpec(
        batch_size=32,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=4,
        dense_name="dense",
        sparse=(
            SparseFeatureSpec("data0", (1,)),
            SparseFeatureSpec("data1", (2,)),
            SparseFeatureSpec("data2", (1,)),
        ),
    )
    sync = ParquetReader(str(tmp_path / "train.txt"), spec, repeat=False)
    anc = AsyncParquetReader(
        str(tmp_path / "train.txt"), spec, repeat=False, n_threads=3, prefetch=4
    )
    bs, ba = list(sync), list(anc)
    assert len(bs) == len(ba) == sync.num_batches
    for b1, b2 in zip(bs, ba):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    # re-iterable (eval path)
    ba2 = list(anc)
    assert len(ba2) == len(ba)


@pytest.mark.parametrize("check", [Check_t.Sum, Check_t.Non])
def test_norm_generator_and_reader(tmp_path, check):
    """Norm write->read roundtrip (DataSetHeader + CheckSum framing,
    data_generation_for_test2 layout); baked slot offsets subtracted via
    slot_size_array."""
    from hugectr_tpu.data import NormReader

    sizes = [100, 200, 300]
    p = DataGeneratorParams(
        format=DataReaderType_t.Norm,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.txt"),
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=sizes,
        nnz_array=[2, 2, 2],
        num_files=3,
        eval_num_files=1,
        num_samples_per_file=100,
        check_type=check,
    )
    DataGenerator(p).generate()
    spec = _spec(batch=64)
    r = NormReader(
        str(tmp_path / "train.txt"), spec, repeat=False,
        slot_size_array=sizes,
    )
    assert r.num_batches == 300 // 64
    batches = list(r)
    assert len(batches) == r.num_batches
    b = batches[0]
    assert b["label"].shape == (64, 1)
    assert b["dense"].shape == (64, 4)
    assert b["dense"].min() >= 0.0 and b["dense"].max() <= 1.0
    for i, v in enumerate(sizes):
        assert b[f"data{i}"].min() >= 0 and b[f"data{i}"].max() < v
    # WITHOUT slot_size_array the reference's baked global offsets remain
    r2 = NormReader(str(tmp_path / "train.txt"), spec, repeat=False)
    b2 = next(iter(r2))
    assert b2["data1"].min() >= 100 and b2["data2"].min() >= 300
    np.testing.assert_array_equal(b2["data1"] - 100, b["data1"])


def test_norm_checksum_detects_corruption(tmp_path):
    """A flipped payload byte must raise NormCheckError (reference:
    Error_t::DataCheckError, check_sum.hpp)."""
    from hugectr_tpu.data import NormCheckError, NormReader

    p = DataGeneratorParams(
        format=DataReaderType_t.Norm,
        label_dim=1,
        dense_dim=4,
        num_slot=3,
        source=str(tmp_path / "train.txt"),
        eval_source=str(tmp_path / "eval.txt"),
        slot_size_array=[100, 200, 300],
        nnz_array=[2, 2, 2],
        num_files=1,
        eval_num_files=1,
        num_samples_per_file=100,
        check_type=Check_t.Sum,
    )
    DataGenerator(p).generate()
    data = (tmp_path / "train.txt.d" / "gen_0.data").read_bytes()
    corrupted = bytearray(data)
    corrupted[200] ^= 0x5A  # somewhere inside an early record payload
    (tmp_path / "train.txt.d" / "gen_0.data").write_bytes(bytes(corrupted))
    r = NormReader(str(tmp_path / "train.txt"), _spec(batch=64), repeat=False)
    with pytest.raises(NormCheckError):
        list(r)


def test_norm_variable_nnz_walk(tmp_path):
    """Hand-written Norm file with per-record VARIABLE nnz exercises the
    record-walk parser."""
    import numpy as np

    from hugectr_tpu.data import NormReader

    d = tmp_path / "nd"
    d.mkdir()

    def unit(payload: bytes) -> bytes:
        s = np.frombuffer(payload, np.uint8).sum(dtype=np.uint64) & 0xFF
        return (
            np.int32(len(payload)).tobytes() + payload + np.uint8(s).tobytes()
        )

    n_rec = 7
    out = bytearray()
    hdr = np.array([1, n_rec, 1, 2, 2, 0, 0, 0], "<i8")
    out += unit(hdr.tobytes())
    expect = []
    for i in range(n_rec):
        rec = bytearray()
        rec += np.array([float(i % 2)], "<f4").tobytes()          # label
        rec += np.array([0.25, 0.75], "<f4").tobytes()            # dense
        nnz0 = 1 + (i % 2)                                        # 1 or 2
        rec += np.int32(nnz0).tobytes()
        rec += np.arange(i, i + nnz0, dtype="<u4").tobytes()
        rec += np.int32(1).tobytes()
        rec += np.array([42 + i], "<u4").tobytes()
        expect.append((nnz0, i))
        out += unit(bytes(rec))
    (d / "f0.data").write_bytes(bytes(out))
    (tmp_path / "list.txt").write_text(f"1\n{d / 'f0.data'}\n")

    spec = BatchSpec(
        batch_size=7,
        label_dims=(1,),
        label_names=("label",),
        dense_dim=2,
        dense_name="dense",
        sparse=(
            SparseFeatureSpec(name="a", slot_nnz=(2,)),
            SparseFeatureSpec(name="b", slot_nnz=(1,)),
        ),
    )
    r = NormReader(str(tmp_path / "list.txt"), spec, repeat=False)
    b = next(iter(r))
    for i, (nnz0, base) in enumerate(expect):
        assert b["a"][i, 0] == base
        assert b["a"][i, 1] == (base + 1 if nnz0 == 2 else -1)
        assert b["b"][i, 0] == 42 + i
