"""Hierarchical 2-D ("dcn","ici") mesh: 2-level exchange == flat exchange.

Reference: hier_model_parallel_embedding.cpp:183-226 (intra-node-first
exchange); here the intra-slice-first reduce-scatter decomposition must be
numerically identical to the flat collective and to a 1-D mesh run.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hugectr_tpu.core.mesh import ResourceManager
from hugectr_tpu.core.types import Combiner_t, CommunicationStrategy, Optimizer_t
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)
from hugectr_tpu.embedding.collection import EmbeddingCollection

from test_embedding_collection import make_lookups, random_keys


@pytest.fixture(scope="module")
def mesh2x4():
    return ResourceManager.create(num_devices=8, num_slices=2)


def test_mesh_facts(mesh2x4):
    assert mesh2x4.is_hierarchical
    assert mesh2x4.num_slices == 2
    assert mesh2x4.slice_size == 4
    assert mesh2x4.data_parallel_size == 8
    assert mesh2x4.data_axes == ("dcn", "ici")


@pytest.mark.parametrize(
    "strategy",
    [CommunicationStrategy.Uniform, CommunicationStrategy.Hierarchical],
)
def test_hier_mesh_matches_flat_mesh(mesh2x4, mesh8, strategy):
    lookups = make_lookups()
    plan = ShardingPlan(strategy=[("mp", ["t0", "t1", "t2"])])
    rng = np.random.default_rng(17)
    batch = 32
    feats = {
        "f0": random_keys(rng, batch, 4, 100),
        "f1": random_keys(rng, batch, 3, 57),
        "f2": random_keys(rng, batch, 2, 31, pad_prob=0.0),
        "f3": random_keys(rng, batch, 1, 100, pad_prob=0.0),
    }
    d_outs = {
        "e0": rng.normal(size=(batch, 8)).astype(np.float32),
        "e1": rng.normal(size=(batch, 8)).astype(np.float32),
        "e2": rng.normal(size=(batch, 16)).astype(np.float32),
        "e3": rng.normal(size=(batch, 8)).astype(np.float32),
    }
    dense = {
        n: np.random.default_rng(23).normal(size=(v, 8)).astype(np.float32)
        for n, v in (("t0", 100), ("t1", 57), ("t2", 31))
    }
    results = {}
    for rm, comm in ((mesh2x4, strategy), (mesh8, CommunicationStrategy.Uniform)):
        compiled = compile_plan(
            make_lookups(), plan, num_shards=rm.data_parallel_size
        )
        ebc = EmbeddingCollection(
            compiled,
            rm,
            OptParams(Optimizer_t.AdaGrad, lr=0.2, epsilon=1e-7),
            comm_strategy=comm,
        )
        tables = ebc.init(jax.random.key(2))
        for n, v in dense.items():
            tables = ebc.import_table(tables, n, v)
        state = ebc.init_optimizer(tables)
        feats_dev = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in feats.items()
        }
        d_dev = {
            k: jax.device_put(v, rm.batch_sharding()) for k, v in d_outs.items()
        }
        fwd = jax.jit(ebc.forward)(tables, feats_dev)
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, feats_dev, d_dev, jnp.asarray(0.2), jnp.asarray(1)
        )
        results[rm] = (
            {k: np.asarray(v) for k, v in fwd.items()},
            {n: ebc.export_table(tables, n) for n in dense},
        )
    for k in results[mesh2x4][0]:
        np.testing.assert_allclose(
            results[mesh2x4][0][k], results[mesh8][0][k],
            rtol=1e-5, atol=1e-5, err_msg=f"fwd {k} ({strategy})",
        )
    for n in dense:
        np.testing.assert_allclose(
            results[mesh2x4][1][n], results[mesh8][1][n],
            rtol=1e-4, atol=1e-5, err_msg=f"table {n} ({strategy})",
        )


def test_hier_model_trains(mesh2x4):
    """Full Model API on the hierarchical mesh with Hierarchical comm."""
    import hugectr_tpu as hugectr
    from hugectr_tpu.core.types import DataReaderType_t, Metric_t

    solver = hugectr.CreateSolver(
        max_eval_batches=2,
        batchsize_eval=64,
        batchsize=64,
        lr=0.01,
        metrics_spec={Metric_t.AUC: 1.0},
        repeat_dataset=True,
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=8
    )
    optimizer = hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.AdaGrad)
    model = hugectr.Model(solver, reader, optimizer, resource_manager=mesh2x4)
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=4,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("data0", 3, True, 1)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(
            name="t0", max_vocabulary_size=500, ev_size=8
        )
    ]
    ebc = hugectr.EmbeddingCollectionConfig(
        comm_strategy=CommunicationStrategy.Hierarchical
    )
    ebc.embedding_lookup(
        table_config=tables,
        bottom_name=["data0"],
        top_name="emb",
        combiner=["sum"],
    )
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
    losses = [model.train() for _ in range(10)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
