"""Wide & Deep (reference: samples/wdl/wdl_1gpu.py): wide 1-dim embedding +
deep 16-dim embedding + 2x1024 MLP with dropout; wide output added to the
deep logit."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

# Criteo 1-day slot sizes (reference: wdl_1gpu.py slot_size_array, 26 deep
# slots + 2 wide cross-product slots)
DEEP_SLOTS = [
    203750, 18573, 14082, 7020, 18966, 4, 6382, 1246, 49, 185920, 71354,
    67346, 11, 2166, 7340, 60, 4, 934, 15, 204208, 141572, 199066, 60940,
    9115, 72, 34,
]
WIDE_SLOTS = [278899, 355877]

args = sample_args("wdl")
solver = hugectr.CreateSolver(
    max_eval_batches=100,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=args.lr,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
reader = make_reader(args, WIDE_SLOTS + DEEP_SLOTS)
optimizer = hugectr.CreateOptimizer(
    optimizer_type=hugectr.Optimizer_t.Adam,
    beta1=0.9,
    beta2=0.999,
    epsilon=1e-7,
)
model = hugectr.Model(solver, reader, optimizer)
model.add(
    hugectr.Input(
        label_dim=1,
        label_name="label",
        dense_dim=13,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam("wide_data", 1, True, 2),
            hugectr.DataReaderSparseParam("deep_data", 1, True, 26),
        ],
    )
)
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=24,
        embedding_vec_size=1,
        combiner="sum",
        sparse_embedding_name="sparse_embedding2",
        bottom_name="wide_data",
        optimizer=optimizer,
        slot_size_array=WIDE_SLOTS,
    )
)
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=342,
        embedding_vec_size=16,
        combiner="sum",
        sparse_embedding_name="sparse_embedding1",
        bottom_name="deep_data",
        optimizer=optimizer,
        slot_size_array=DEEP_SLOTS,
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
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["sparse_embedding2"],
        top_names=["reshape2"],
        leading_dim=2,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.ReduceSum,
        bottom_names=["reshape2"],
        top_names=["wide_redn"],
        axis=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=["reshape1", "dense"],
        top_names=["concat1"],
    )
)
prev = "concat1"
for i in (1, 2):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[prev],
            top_names=[f"fc{i}"],
            num_output=1024,
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
        top_names=["fc3"],
        num_output=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Add,
        bottom_names=["fc3", "wide_redn"],
        top_names=["add1"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["add1", "label"],
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
