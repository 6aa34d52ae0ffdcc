"""docs/embedding_collection.md walkthrough guard: the planner-generated
placement plans (round_robin / uniform / auto) drive `ebc.shard` and train
end-to-end through the Model API, producing identical losses across plans
(placement changes WHERE rows live, never results — reference:
notebooks/embedding_collection.ipynb sweeps the same three plans).
"""
import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t
from hugectr_tpu.parallel import planner

SLOT_SIZES = [200, 96, 130, 50]
EV = 8


def _train(rm, plan_name):
    solver = hugectr.CreateSolver(
        batchsize=64, batchsize_eval=64, max_eval_batches=2, lr=0.05, seed=7
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=4
    )
    opt = hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.AdaGrad)
    model = hugectr.Model(solver, reader, opt, resource_manager=rm)
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=4,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam(f"data{i}", 1, True, 1)
                for i in range(len(SLOT_SIZES))
            ],
        )
    )
    tables = [
        # zero init => loss trajectories are placement-independent (per-shard
        # init RNG streams otherwise differ across layouts, like the reference)
        hugectr.EmbeddingTableConfig(
            name=str(i), max_vocabulary_size=v, ev_size=EV, init_scale=0.0
        )
        for i, v in enumerate(SLOT_SIZES)
    ]
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(
        tables,
        [f"data{i}" for i in range(len(tables))],
        [f"emb{i}" for i in range(len(tables))],
        ["sum"] * len(tables),
    )
    names = [t.name for t in tables]
    n = rm.num_devices
    if plan_name == "round_robin":
        strategy, matrix = planner.round_robin_plan(names, num_devices=n)
    elif plan_name == "auto":
        strategy, matrix = planner.auto_plan(
            names,
            table_sizes_bytes=[v * EV * 4 for v in SLOT_SIZES],
            hotness=[1] * len(names),
            num_devices=n,
            dp_threshold_bytes=100 * EV * 4,
        )
    else:
        strategy, matrix = planner.uniform_plan(names, num_devices=n)
    ebc.shard(shard_matrix=matrix, shard_strategy=strategy)
    model.add(ebc)
    for layer in [
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=[f"emb{i}" for i in range(len(tables))],
            top_names=["cat"],
        ),
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["dense", "cat"],
            top_names=["all"],
        ),
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["all"],
            top_names=["fc1"],
            num_output=1,
        ),
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["fc1", "label"],
            top_names=["loss"],
        ),
    ]:
        model.add(layer)
    model.compile()
    losses = []
    for _ in range(4):
        losses.append(float(model.train()))
    return np.array(losses)


@pytest.mark.parametrize("plan_name", ["round_robin", "uniform", "auto"])
def test_placement_plans_train_and_agree(mesh8, plan_name):
    ref = _train(mesh8, "uniform")
    got = _train(mesh8, plan_name)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)
    assert np.isfinite(got).all()
