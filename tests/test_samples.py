"""Sample model-zoo graphs compile and train (analog of reference
test/pybind_test/model_test.py parametrized over CRITEO/DCN/DEEPFM/WDL...).

Each sample script is imported with patched argv + tiny synthetic data; we
run a few steps and require finite decreasing-ish loss.
"""
import os
import runpy
import sys

import numpy as np
import pytest

SAMPLES = [
    "criteo_parquet", "wdl", "dcn", "deepfm", "ncf", "mmoe", "din", "bst",
    # NCF family variants (reference: samples/ncf/{ncf,neumf}.py)
    "ncf --variant ncf",
    "ncf --variant neumf",
    # single shared-bottom multi-task (reference: samples/mmoe/shared_bottom.py)
    "mmoe --variant shared_bottom",
    "dlrm_ftrl",
    # FTRL DLRM with max_vocabulary_size=-1 dynamic tables
    # (reference: samples/ftrl/dlrm_train_ftrl.py --use_dynamic_hash_table)
    "dlrm_ftrl --use_dynamic_hash_table",
]


def test_dlrm_sample_multislice_hierarchical(monkeypatch, mesh8):
    """Flagship sample with --num_slices/--comm_strategy (the reference
    multi-node config analog, samples/dcn/dcn_2node_*.py + DLRM multi-node):
    a (2,4) hierarchical mesh with Hierarchical comm trains end-to-end."""
    samples_dir = os.path.join(os.path.dirname(__file__), "..", "samples")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "dlrm_dcnv2", "--batchsize", "64", "--vocab_cap", "500",
            "--num_slices", "2", "--comm_strategy", "hierarchical",
        ],
    )
    mod = runpy.run_path(
        os.path.join(samples_dir, "dlrm_dcnv2.py"), run_name="not_main"
    )
    model = mod["model"]
    assert model.rm.is_hierarchical and model.rm.num_slices == 2
    losses = [model.train() for _ in range(4)]
    assert np.isfinite(losses).all(), f"non-finite loss {losses}"


def test_dlrm_one_hot_e2e(mesh8):
    """One-hot DLRM EBC E2E (reference:
    test/embedding_collection_test/dgx_a100_one_hot.py — the same DLRM
    graph with MULTI_HOT_SIZES = [1]*26): every lookup routes hotness-1
    keys; trains with finite decreasing-ish loss and evals."""
    from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

    model = build_dlrm_dcnv2(
        mesh8, batchsize=64, vocab_cap=500, synthetic_batches=8,
        multi_hot_sizes=[1] * 26,
    )
    losses = [model.train() for _ in range(6)]
    assert np.isfinite(losses).all(), f"non-finite loss {losses}"
    vals = model.eval()
    assert 0.0 <= vals["auc"] <= 1.0


@pytest.mark.parametrize("name", SAMPLES)
def test_sample_graph_trains(name, tmp_path, monkeypatch, mesh8):
    name, *extra = name.split()
    samples_dir = os.path.join(os.path.dirname(__file__), "..", "samples")
    monkeypatch.syspath_prepend(samples_dir)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            name,
            "--data_dir",
            str(tmp_path),
            "--batchsize",
            "64",
            *extra,
        ],
    )
    # make the synthetic dataset tiny
    import common as sample_common

    orig = sample_common.make_reader

    def small_reader(args, slot_sizes, nnz_array=None, **kw):
        small = [min(s, 500) for s in slot_sizes]
        kw.update(num_samples_per_file=256, num_files=2)
        return orig(args, small, nnz_array=nnz_array, **kw)

    monkeypatch.setattr(sample_common, "make_reader", small_reader)
    mod = runpy.run_path(
        os.path.join(samples_dir, f"{name}.py"), run_name="not_main"
    )
    model = mod["model"]
    model.compile()
    losses = [model.train() for _ in range(8)]
    assert np.isfinite(losses).all(), f"{name}: non-finite loss {losses}"
    # sanity: eval runs
    vals = model.eval()
    assert 0.0 <= vals["auc"] <= 1.0
