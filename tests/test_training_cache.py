"""Embedding training cache: host-staged huge-table training (reference:
include/embedding_training_cache/)."""
import numpy as np
import pytest

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t
from hugectr_tpu.embedding.training_cache import EmbeddingTrainingCache


def test_etc_pass_roundtrip(mesh1):
    capacity = 64  # device staging capacity
    huge_vocab = 10_000  # host master table
    solver = hugectr.CreateSolver(
        max_eval_batches=1, batchsize_eval=32, batchsize=32, lr=0.1
    )
    reader = hugectr.DataReaderParams(
        data_reader_type=DataReaderType_t.Synthetic, synthetic_num_batches=2
    )
    model = hugectr.Model(
        solver,
        reader,
        hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.SGD),
        resource_manager=mesh1,
    )
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=2,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam("d0", 2, True, 1)
            ],
        )
    )
    t = hugectr.EmbeddingTableConfig(
        name="huge", max_vocabulary_size=capacity, ev_size=8
    )
    ebc = hugectr.EmbeddingCollectionConfig()
    ebc.embedding_lookup(t, "d0", "emb", "sum")
    ebc.shard(shard_matrix=[["huge"]], shard_strategy=[("mp", ["huge"])])
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

    rng = np.random.default_rng(0)
    host = rng.normal(size=(huge_vocab, 8)).astype(np.float32)
    host_before = host.copy()
    etc = EmbeddingTrainingCache(model, "huge", host)

    # pass 1: keys in [9000, 9050)
    keyset = np.arange(9000, 9050)
    etc.update(keyset)
    # check staged rows match host
    staged = model.ec.export_table(model.state["emb_tables"], "huge")
    np.testing.assert_allclose(staged[:50], host[9000:9050], rtol=1e-6)
    # key mapping
    raw = np.array([[9000, 9049], [9010, 12345]], np.int64)
    mapped = etc.map_keys(raw)
    assert mapped.tolist() == [[0, 49], [10, -1]]

    # train a step on remapped keys through the model's jitted step
    batch = {
        "label": np.ones((32, 1), np.float32),
        "dense": np.zeros((32, 2), np.float32),
        "d0": np.tile(mapped[:1], (32, 1)).astype(np.int32),
    }
    model.start_data_reading()
    import jax

    dev_batch = model._put_batch(batch)
    model._rng, sub = jax.random.split(model._rng)
    model.state, loss = model._train_step(model.state, dev_batch, sub)
    assert np.isfinite(float(loss))

    # flush back: touched host rows changed, untouched identical
    etc.flush()
    assert not np.allclose(host[9000], host_before[9000])
    np.testing.assert_allclose(host[0], host_before[0])
    np.testing.assert_allclose(host[9020], host_before[9020])  # key unused

    inc = etc.get_incremental_model()
    assert inc["keys"].tolist() == keyset.tolist()

    # pass 2 with a different keyset restages correctly
    etc.update(np.arange(100, 120))
    staged2 = model.ec.export_table(model.state["emb_tables"], "huge")
    np.testing.assert_allclose(staged2[:20], host[100:120], rtol=1e-6)


def test_etc_capacity_guard(mesh1):
    pytest.importorskip("jax")
    # capacity error surfaces clearly
    from hugectr_tpu.embedding.training_cache import EmbeddingTrainingCache

    class FakeEC:
        def _find_table(self, name):
            import numpy as np

            class G:
                table_vocab = np.array([4])
                ev_size = 2
                name = "g"

            return G(), 0

    class FakeModel:
        class ec:
            pass

    m = FakeModel()
    m.ec = FakeEC()
    m.state = {}
    etc = EmbeddingTrainingCache(m, "t", np.zeros((100, 2), np.float32))
    with pytest.raises(ValueError, match="exceeds staging capacity"):
        etc.update(np.arange(10))
