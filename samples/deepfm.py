"""DeepFM (reference: samples/deepfm/deepfm_parquet.py): 11-dim embeddings
split into 10-dim latent vectors (FM second-order + deep MLP) and 1-dim
first-order weights, combined with dense WeightMultiply features."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SLOT_SIZES = [
    203931, 18598, 14092, 7012, 18977, 4, 6385, 1245, 49, 186213, 71328,
    67288, 11, 2168, 7338, 61, 4, 932, 15, 204515, 141526, 199433, 60919,
    9137, 71, 34,
]

args = sample_args("deepfm")
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
        embedding_type=hugectr.Embedding_t.LocalizedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=183,
        embedding_vec_size=11,
        combiner="sum",
        sparse_embedding_name="sparse_embedding1",
        bottom_name="data1",
        optimizer=optimizer,
        slot_size_array=SLOT_SIZES,
    )
)
# [B, 26, 11] -> [B*26, 11] -> latent [B*26,10] + first-order [B*26,1]
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["sparse_embedding1"],
        top_names=["reshape1"],
        leading_dim=11,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Slice,
        bottom_names=["reshape1"],
        top_names=["slice11", "slice12"],
        ranges=[(0, 10), (10, 11)],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["slice11"],
        top_names=["reshape2"],
        leading_dim=260,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["slice12"],
        top_names=["reshape3"],
        leading_dim=26,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.WeightMultiply,
        bottom_names=["dense"],
        top_names=["weight_multiply1"],
        weight_dims=[13, 10],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.WeightMultiply,
        bottom_names=["dense"],
        top_names=["weight_multiply2"],
        weight_dims=[13, 1],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=["reshape2", "weight_multiply1"],
        top_names=["concat1"],
    )
)
prev = "concat1"
for i in (1, 2, 3):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[prev],
            top_names=[f"fc{i}"],
            num_output=400,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.ReLU,
            bottom_names=[f"fc{i}"],
            top_names=[f"relu{i}"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Dropout,
            bottom_names=[f"relu{i}"],
            top_names=[f"dropout{i}"],
            dropout_rate=0.5,
        )
    )
    prev = f"dropout{i}"
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=[prev],
        top_names=["fc4"],
        num_output=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.FmOrder2,
        bottom_names=["concat1"],
        top_names=["fmorder2"],
        out_dim=10,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.ReduceSum,
        bottom_names=["fmorder2"],
        top_names=["reducesum1"],
        axis=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=["reshape3", "weight_multiply2"],
        top_names=["concat2"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.ReduceSum,
        bottom_names=["concat2"],
        top_names=["reducesum2"],
        axis=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Add,
        bottom_names=["fc4", "reducesum1", "reducesum2"],
        top_names=["add"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["add", "label"],
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
