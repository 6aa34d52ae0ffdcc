"""True multi-process (multi-controller) training test.

SURVEY §4 notes the reference has no fake comm backend and gates multi-node
tests into clusters; here we do better: spawn 2 REAL processes with
jax.distributed over localhost, each holding 4 virtual CPU devices (global
8-device mesh), and train a hybrid-parallel model end-to-end.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# exercise the measured-window path: every controller must end up with the
# SAME caps (auto_unique_caps max-reduces measurements across processes)
os.environ["HCTR_TPU_UCAP_FACTOR"] = "auto"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import numpy as np
import hugectr_tpu as hugectr
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import DataReaderType_t

raw_path = sys.argv[4]
rm = ResourceManager.create()
solver = hugectr.CreateSolver(
    max_eval_batches=2, batchsize_eval=64, batchsize=64, lr=0.05, seed=11
)
reader = hugectr.DataReaderParams(
    data_reader_type=DataReaderType_t.RawAsync,
    source=[raw_path],
    eval_source=raw_path,
    float_label_dense=True,
)
model = hugectr.Model(
    solver, reader,
    hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.AdaGrad),
    resource_manager=rm,
)
model.add(hugectr.Input(
    label_dim=1, label_name="label", dense_dim=4, dense_name="dense",
    data_reader_sparse_param_array=[
        hugectr.DataReaderSparseParam("d0", 2, True, 1),
        hugectr.DataReaderSparseParam("d1", 2, True, 1),
    ],
))
tables = [
    hugectr.EmbeddingTableConfig(name=f"t{i}", max_vocabulary_size=100, ev_size=8)
    for i in range(2)
]
ebc = hugectr.EmbeddingCollectionConfig()
ebc.embedding_lookup(tables, ["d0", "d1"], "emb", ["sum", "sum"])
ebc.shard(
    shard_matrix=[[t.name for t in tables]] * rm.num_devices,
    shard_strategy=[("mp", ["t0"]), ("dp", ["t1"])],
)
model.add(ebc)
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.Concat,
    bottom_names=["emb", "dense"], top_names=["c"]))
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.MLP,
    bottom_names=["c"], top_names=["m"], num_outputs=[16, 1],
    activations=[hugectr.Activation_t.Relu, hugectr.Activation_t.Non]))
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
    bottom_names=["m", "label"], top_names=["loss"]))
model.compile()
# each process must read a DISJOINT slice of every global batch
local = model._host_decode_batch(next(iter(model.train_reader)))
print(f"SHARDSUM {pid} {float(local['d0'].sum()):.0f}")
losses = [model.train() for _ in range(4)]
assert all(np.isfinite(losses)), losses
assert losses[-1] != losses[0]
print(f"UCAPS {pid} {sorted(model.ec.unique_caps.items())} "
      f"{sorted(model.ec.valid_caps.items())}")
vals = model.eval()
assert 0.0 <= vals["auc"] <= 1.0
model.download_params_to_files(sys.argv[5] + "/snap", 4)  # master-only write
print(f"WORKER {pid} OK losses={losses} auc={vals['auc']:.4f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    from hugectr_tpu import DataGenerator, DataGeneratorParams
    from hugectr_tpu.core.types import DataReaderType_t as DRT

    raw = str(tmp_path / "train.bin")
    DataGenerator(
        DataGeneratorParams(
            format=DRT.Raw,
            label_dim=1,
            dense_dim=4,
            num_slot=2,
            source=raw,
            eval_source=str(tmp_path / "eval.bin"),
            slot_size_array=[100, 100],
            nnz_array=[2, 2],
            num_samples=2048,
            eval_num_samples=256,
            float_label_dense=True,
        )
    ).generate()
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(script),
                str(pid),
                "2",
                str(port),
                raw,
                str(tmp_path),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER {pid} OK" in out, out[-2000:]
    # both processes computed the SAME global losses (SPMD consistency)
    l0 = [ln for ln in outs[0].splitlines() if "losses=" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "losses=" in ln][0]
    assert l0.split("losses=")[1] == l1.split("losses=")[1]
    # ...but each read a DISJOINT data shard (no duplicated global batches)
    s0 = [ln for ln in outs[0].splitlines() if ln.startswith("SHARDSUM 0")][0]
    s1 = [ln for ln in outs[1].splitlines() if ln.startswith("SHARDSUM 1")][0]
    assert s0.split()[2] != s1.split()[2], (s0, s1)
    # measured compaction windows are identical across controllers (the
    # jitted SPMD programs would otherwise diverge)
    u0 = [ln for ln in outs[0].splitlines() if ln.startswith("UCAPS 0")][0]
    u1 = [ln for ln in outs[1].splitlines() if ln.startswith("UCAPS 1")][0]
    assert u0.split(None, 2)[2] == u1.split(None, 2)[2], (u0, u1)
    # master-only snapshot write succeeded
    assert (tmp_path / "snap_iter4" / "dense_model.npz").exists()
