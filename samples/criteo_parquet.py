"""Criteo baseline (reference: samples/criteo/criteo_parquet.py):
single 16-dim embedding + 4-layer MLP."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SLOT_SIZES = [
    203931, 18598, 14092, 7012, 18977, 4, 6385, 1245, 49, 186213, 71328,
    67288, 11, 2168, 7338, 61, 4, 932, 15, 204515, 141526, 199433, 60919,
    9137, 71, 34,
]

args = sample_args("criteo")
solver = hugectr.CreateSolver(
    max_eval_batches=100,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=args.lr,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
reader = make_reader(args, SLOT_SIZES)
optimizer = hugectr.CreateOptimizer(optimizer_type=hugectr.Optimizer_t.Adam)
model = hugectr.Model(solver, reader, optimizer)
model.add(
    hugectr.Input(
        label_dim=1,
        label_name="label",
        dense_dim=13,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam("data1", 1, True, 26)
        ],
    )
)
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=150,
        embedding_vec_size=16,
        combiner="sum",
        sparse_embedding_name="sparse_embedding1",
        bottom_name="data1",
        optimizer=optimizer,
        slot_size_array=SLOT_SIZES,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["sparse_embedding1"],
        top_names=["reshape1"],
        leading_dim=416,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=["reshape1", "dense"],
        top_names=["concat1"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.MLP,
        bottom_names=["concat1"],
        top_names=["mlp1"],
        num_outputs=[200, 200, 200],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=["mlp1"],
        top_names=["fc4"],
        num_output=1,
        act_type=hugectr.Activation_t.Non,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["fc4", "label"],
        top_names=["loss"],
    )
)
if __name__ == "__main__":
    model.compile()
    model.summary()
    model.fit(
        max_iter=args.max_iter,
        display=args.display,
        eval_interval=args.eval_interval,
    )
