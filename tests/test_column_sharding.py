"""Column-wise embedding sharding (reference:
split_column_wise_sharding_config, src/embeddings/embedding_collection.cpp)."""
import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t


def _model(rm, factor):
    solver = hugectr.CreateSolver(
        max_eval_batches=2, batchsize_eval=64, batchsize=64, lr=0.05
    )
    reader = hugectr.DataReaderParams(
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
    t = hugectr.EmbeddingTableConfig(name="t0", max_vocabulary_size=100, ev_size=16)
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(t, "d0", "emb", "sum")
    ebc.shard(
        shard_matrix=[["t0"]] * rm.num_devices,
        shard_strategy=[("mp", ["t0"])],
        column_factors={"t0": factor} if factor > 1 else None,
    )
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["emb"],
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


@pytest.mark.parametrize("factor", [2, 4])
def test_column_split_structure_and_training(mesh8, factor):
    model = _model(mesh8, factor)
    # table was rewritten into `factor` sub-tables of ev/factor
    names = [t.name for g in model.ec.plan.groups for t in g.tables]
    assert names == [f"t0#col{j}" for j in range(factor)]
    for g in model.ec.plan.groups:
        assert g.ev_size == 16 // factor
    # output width is still the full ev
    assert model.network.input_shapes["emb"][1] == 16
    losses = [model.train() for _ in range(5)]
    assert np.isfinite(losses).all()
    vals = model.eval()
    assert 0.0 <= vals["auc"] <= 1.0


def test_column_split_matches_unsplit_forward(mesh8):
    """A column-split lookup is numerically a plain lookup with the table
    columns partitioned (same keys -> concatenated halves)."""
    m1 = _model(mesh8, 1)
    m2 = _model(mesh8, 2)
    # copy m1's table into m2's two half-tables
    full = m1.ec.export_table(m1.state["emb_tables"], "t0")
    m2.state["emb_tables"] = m2.ec.import_table(
        m2.state["emb_tables"], "t0#col0", full[:, :8]
    )
    m2.state["emb_tables"] = m2.ec.import_table(
        m2.state["emb_tables"], "t0#col1", full[:, 8:]
    )
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 100, (64, 2)).astype(np.int32)
    keys[1, 1] = -1  # padding
    batch = {
        "label": np.zeros((64, 1), np.float32),
        "dense": np.zeros((64, 4), np.float32),
        "d0": keys,
    }
    out1 = m1.check_out_tensor("emb", batch)
    out2 = m2.check_out_tensor("emb", batch)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)
