"""Flagship model builders used by bench.py and __graft_entry__.py.

DLRM-DCNv2 per the MLPerf v3.1 reference configuration
(reference: samples/dlrm/train.py:28-86,370-466 — 26 tables, multi-hot,
ev_size 128, bottom MLP 512/256/128, DCNv2 cross with projection_dim 512 ×3,
top MLP 1024/1024/512/256/1, AdaGrad), with a `scale` knob to shrink
vocabularies for CI / dry-run environments.
"""
from __future__ import annotations

import hugectr_tpu as hugectr
from hugectr_tpu.core.types import DataReaderType_t, Metric_t

# MLPerf Criteo 1TB multi-hot stats (reference: samples/dlrm/train.py:28-86)
MLPERF_TABLE_SIZES = [
    40000000, 39060, 17295, 7424, 20265, 3, 7122, 1543, 63, 40000000,
    3067956, 405282, 10, 2209, 11938, 155, 4, 976, 14, 40000000,
    40000000, 40000000, 590152, 12973, 108, 36,
]
MLPERF_MULTI_HOT_SIZES = [
    3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1, 12,
    100, 27, 10, 3, 40, 1,
]
NUM_TABLE = 26
NUM_DENSE = 13


def build_dlrm_dcnv2(
    rm,
    batchsize: int = 8192,
    ev_size: int = 128,
    vocab_cap: int = 2_000_000,
    synthetic_batches: int = 64,
    lr: float = 0.005,
    use_mixed_precision: bool = False,
    bottom_mlp=(512, 256, 128),
    top_mlp=(1024, 1024, 512, 256, 1),
    projection_dim: int = 512,
    num_cross_layers: int = 3,
    comm_strategy=None,
    reader=None,
    multi_hot_sizes=None,
    max_eval_batches: int = 8,
):
    """DLRM-DCNv2; returns a compiled Model.

    `reader`: optional DataReaderParams overriding the default synthetic
    power-law source (e.g. a RawAsync/Parquet reader over a real or
    generated dataset — the real-Criteo MLPerf entry point).
    `multi_hot_sizes`: per-table hotness override — [1]*26 gives the
    one-hot DLRM E2E config (reference:
    test/embedding_collection_test/dgx_a100_one_hot.py MULTI_HOT_SIZES)."""
    table_sizes = [min(v, vocab_cap) for v in MLPERF_TABLE_SIZES]
    if multi_hot_sizes is None:
        multi_hot_sizes = MLPERF_MULTI_HOT_SIZES
    import os

    solver = hugectr.CreateSolver(
        max_eval_batches=max_eval_batches,
        batchsize_eval=batchsize,
        batchsize=batchsize,
        lr=lr,
        use_mixed_precision=use_mixed_precision,
        embedding_vec_dtype=os.environ.get("HCTR_TPU_EMB_DTYPE", "float32"),
        metrics_spec={Metric_t.AUC: 0.80275},
        repeat_dataset=True,
    )
    if reader is None:
        reader = hugectr.DataReaderParams(
            data_reader_type=DataReaderType_t.Synthetic,
            synthetic_num_batches=synthetic_batches,
            # power-law keys like the reference DataGenerator's default
            # distribution (Criteo-like hot-key skew; data_generator.cpp:92-105)
            synthetic_alpha=1.05,
        )
    # HCTR_BENCH_OPT: "adagrad" (reference HugeCTR operating point) or
    # "rowwise_adagrad" (MLPerf DLRM torchrec reference implementation's
    # embedding optimizer; AUC-gated in test_convergence.py)
    optimizer = hugectr.CreateOptimizer(
        optimizer_type=hugectr.Optimizer_t(
            os.environ.get("HCTR_BENCH_OPT", "adagrad")
        ),
        initial_accu_value=0.0,
    )
    model = hugectr.Model(solver, reader, optimizer, resource_manager=rm)
    model.add(
        hugectr.Input(
            label_dim=1,
            label_name="label",
            dense_dim=NUM_DENSE,
            dense_name="dense",
            data_reader_sparse_param_array=[
                hugectr.DataReaderSparseParam(
                    f"data{i}", multi_hot_sizes[i], True, 1
                )
                for i in range(NUM_TABLE)
            ],
        )
    )
    tables = [
        hugectr.EmbeddingTableConfig(
            name=str(i), max_vocabulary_size=table_sizes[i], ev_size=ev_size
        )
        for i in range(NUM_TABLE)
    ]
    ebc = hugectr.EmbeddingCollectionConfig(
        comm_strategy=comm_strategy or "uniform"
    )
    ebc.embedding_lookup(
        table_config=tables,
        bottom_name=[f"data{i}" for i in range(NUM_TABLE)],
        top_name="sparse_embedding",
        combiner=["sum"] * NUM_TABLE,
    )
    names = [str(i) for i in range(NUM_TABLE)]
    ebc.shard(
        shard_matrix=[names] * rm.num_devices,
        shard_strategy=[("mp", names)],
    )
    model.add(ebc)
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP,
            bottom_names=["dense"],
            top_names=["mlp1"],
            num_outputs=list(bottom_mlp),
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["sparse_embedding", "mlp1"],
            top_names=["concat1"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MultiCross,
            bottom_names=["concat1"],
            top_names=["interaction1"],
            projection_dim=projection_dim,
            num_layers=num_cross_layers,
        )
    )
    acts = [hugectr.Activation_t.Relu] * (len(top_mlp) - 1) + [
        hugectr.Activation_t.Non
    ]
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP,
            bottom_names=["interaction1"],
            top_names=["mlp2"],
            num_outputs=list(top_mlp),
            activations=acts,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["mlp2", "label"],
            top_names=["loss"],
        )
    )
    model.compile()
    return model


def build_tiny_dlrm(rm, batchsize: int = 32, comm_strategy=None):
    """Tiny-shape variant for compile checks / multi-chip dry runs."""
    return build_dlrm_dcnv2(
        rm,
        batchsize=batchsize,
        comm_strategy=comm_strategy,
        ev_size=16,
        vocab_cap=1000,
        synthetic_batches=4,
        bottom_mlp=(32, 16),
        top_mlp=(32, 16, 1),
        projection_dim=8,
        num_cross_layers=2,
    )
