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


# Worker for the EXACT multi-controller i64 test: every process stages its
# DISJOINT slice of a deterministic global batch stream; the fold maps must
# come out bit-identical across processes AND identical to a
# single-controller run over the same global batches (reference exactness:
# DynamicEmbeddingTable is exact for i64 in every deployment mode,
# embedding_storage/dynamic_embedding.cu).
_I64_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
ndev = 8 // nproc
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    f" --xla_force_host_platform_device_count={ndev}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    )
import numpy as np
import hugectr_tpu as hugectr
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import DataReaderType_t

GB = 64  # global batch
rm = ResourceManager.create()
solver = hugectr.CreateSolver(
    max_eval_batches=1, batchsize_eval=GB, batchsize=GB, lr=0.1, seed=7,
    i64_input_key=True, repeat_dataset=True,
)
reader = hugectr.DataReaderParams(
    data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=2
)
model = hugectr.Model(
    solver, reader,
    hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.SGD),
    resource_manager=rm,
)
model.add(hugectr.Input(
    label_dim=1, label_name="label", dense_dim=2, dense_name="dense",
    data_reader_sparse_param_array=[
        hugectr.DataReaderSparseParam("d0", 2, True, 1),
        hugectr.DataReaderSparseParam("d1", 1, True, 1),
    ],
))
tables = [
    hugectr.EmbeddingTableConfig(
        name="dyn", max_vocabulary_size=-1, ev_size=8, dynamic_capacity=512
    ),
    hugectr.EmbeddingTableConfig(name="st", max_vocabulary_size=50, ev_size=8),
]
ebc = hugectr.EmbeddingCollectionConfig()
ebc.embedding_lookup(tables, ["d0", "d1"], "emb", ["sum", "sum"])
ebc.shard(
    shard_matrix=[[t.name for t in tables]] * rm.num_devices,
    shard_strategy=[("mp", ["dyn", "st"])],
)
model.add(ebc)
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.Concat,
    bottom_names=["emb", "dense"], top_names=["c"]))
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.InnerProduct,
    bottom_names=["c"], top_names=["out"], num_output=1))
model.add(hugectr.DenseLayer(layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
    bottom_names=["out", "label"], top_names=["loss"]))
model.compile()
assert model._mc_sync_feed() == (nproc > 1)

def global_batch(t):
    # deterministic global stream; i64 keys >= 2^31 with cross-process
    # overlap AND per-process-unique keys each step
    i = np.arange(GB)[:, None]
    j = np.arange(2)[None, :]
    d0 = (2**33 + (i * 7 + j * 3 + t * 13) % 40).astype(np.int64)
    d0[t % GB, 0] = 2**40 + t  # a brand-new key every step, one process only
    d1 = ((i + t) % 50).astype(np.int64)
    rng = np.random.default_rng(1000 + t)
    return {
        "label": (rng.random((GB, 1)) > 0.5).astype(np.float32),
        "dense": rng.random((GB, 2)).astype(np.float32),
        "d0": d0, "d1": d1,
    }

model._train_iter = iter([])  # block reader feed; batches are staged below
losses = []
lo, hi = pid * (GB // nproc), (pid + 1) * (GB // nproc)
for t in range(4):
    g = global_batch(t)
    local = {k: v[lo:hi] for k, v in g.items()}
    model._staged_train_batch = model._put_batch(local)
    losses.append(model.train())
print("I64LOSSES", pid, json.dumps([round(float(x), 10) for x in losses]))
print("I64MAP", pid, json.dumps(sorted(model._i64_maps["dyn"].items())))
# snapshot roundtrip preserves the map (master writes, everyone reads)
snap = sys.argv[4]
model.download_params_to_files(snap + "/i64snap", 4)
saved = dict(model._i64_maps["dyn"])
model._i64_maps = {}; model._i64_rev = {}
model.load_params_from_files(snap + "/i64snap_iter4")
assert model._i64_maps["dyn"] == saved, "snapshot did not restore fold map"
if nproc > 1:
    # reader-driven phase: the sync feed folds on the consuming thread with
    # per-process DIFFERENT synthetic keys; union-sync must keep maps equal
    model._train_iter = None
    model.start_data_reading()
    for _ in range(2):
        model.train()
    print("I64MAP2", pid, json.dumps(sorted(model._i64_maps["dyn"].items())))
print("I64WORKER", pid, "OK")
"""


def _run_i64_workers(tmp_path, nproc):
    port = _free_port()
    script = tmp_path / f"i64worker{nproc}.py"
    script.write_text(_I64_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    snap = tmp_path / f"snap{nproc}"
    snap.mkdir(exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), str(port),
             str(snap)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(nproc)
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
        assert p.returncode == 0, f"i64 worker {pid}/{nproc}:\n{out[-3000:]}"
        assert f"I64WORKER {pid} OK" in out, out[-2000:]
    return outs


def _grab(out, tag):
    return [ln.split(None, 2)[2] for ln in out.splitlines() if ln.startswith(tag)]


def test_two_process_i64_exact_fold(tmp_path):
    """Exact i64 dynamic keys under multi-controller: fold maps bit-identical
    across processes AND vs a single-controller run over the same global
    batch stream; losses match the single-controller run; snapshot
    roundtrip; the reader-driven sync-feed phase keeps maps in union-sync."""
    import json

    outs2 = _run_i64_workers(tmp_path, 2)
    out1 = _run_i64_workers(tmp_path, 1)[0]
    m0 = _grab(outs2[0], "I64MAP 0")[0]
    m1 = _grab(outs2[1], "I64MAP 1")[0]
    ms = _grab(out1, "I64MAP 0")[0]
    assert m0 == m1, "fold maps diverged across controllers"
    assert m0 == ms, "multi-controller fold map != single-controller map"
    l2 = json.loads(_grab(outs2[0], "I64LOSSES 0")[0])
    l1 = json.loads(_grab(out1, "I64LOSSES 0")[0])
    import numpy as np

    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    # reader-driven phase: maps still identical across processes
    r0 = _grab(outs2[0], "I64MAP2 0")[0]
    r1 = _grab(outs2[1], "I64MAP2 1")[0]
    assert r0 == r1
    assert len(json.loads(r0)) > len(json.loads(m0))  # reader added keys


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


# Flagship-shape multi-controller dryrun (VERDICT-r4 #7; reference analog:
# utest_2node, test_embedding_collection_v2.cu:517): the 26-table
# DLRM-DCNv2 shape (real multi-hot sizes, hot/cold split tables, measured
# ucap windows) compiles and steps across 2 REAL processes on the
# hierarchical ("dcn","ici") mesh, with the process boundary on the slice
# boundary. Vocabs are capped for CI wall-clock (the bench caps too).
_FLAGSHIP_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["HCTR_TPU_UCAP_FACTOR"] = "auto"
os.environ["HCTR_TPU_HOT_ROWS"] = "8192"
os.environ["HCTR_TPU_SPLIT_VOCAB"] = "8192"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
import numpy as np
from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import CommunicationStrategy
from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

rm = ResourceManager.create(num_slices=2)  # (2,4): dcn axis = processes
assert rm.is_hierarchical and rm.num_processes == 2
model = build_dlrm_dcnv2(
    rm, batchsize=64, vocab_cap=100_000, synthetic_batches=2,
    ev_size=32, comm_strategy=CommunicationStrategy.Hierarchical,
)
losses = [model.train() for _ in range(2)]
assert all(np.isfinite(losses)), losses
vals = model.eval()
assert 0.0 <= vals["auc"] <= 1.0
print(f"FLAGSHIP {pid} OK losses={[round(float(x), 8) for x in losses]}")
"""


def test_two_process_flagship_hierarchical(tmp_path):
    port = _free_port()
    script = tmp_path / "flagship_worker.py"
    script.write_text(_FLAGSHIP_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"flagship worker {pid}:\n{out[-3000:]}"
        assert f"FLAGSHIP {pid} OK" in out, out[-2000:]
    l0 = [ln for ln in outs[0].splitlines() if "losses=" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "losses=" in ln][0]
    assert l0.split("losses=")[1] == l1.split("losses=")[1]
