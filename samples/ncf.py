"""NCF-GMF (reference: samples/ncf/gmf.py): MovieLens user/item embeddings,
elementwise product, single logit."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SLOT_SIZES = [162543, 56573]  # users, items (ml-20m)

args = sample_args("ncf")
solver = hugectr.CreateSolver(
    max_eval_batches=100,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=0.0045,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
reader = make_reader(args, SLOT_SIZES, dense_dim=1)
optimizer = hugectr.CreateOptimizer(
    optimizer_type=hugectr.Optimizer_t.Adam, beta1=0.25, beta2=0.5, epsilon=1e-8
)
model = hugectr.Model(solver, reader, optimizer)
model.add(
    hugectr.Input(
        label_dim=1,
        label_name="label",
        dense_dim=1,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam("data", 1, True, 2)
        ],
    )
)
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=60,
        embedding_vec_size=16,
        combiner="sum",
        sparse_embedding_name="gmf_embedding",
        bottom_name="data",
        optimizer=optimizer,
        slot_size_array=SLOT_SIZES,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["gmf_embedding"],
        top_names=["reshape1"],
        leading_dim=32,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Slice,
        bottom_names=["reshape1"],
        top_names=["user", "item"],
        ranges=[(0, 16), (16, 32)],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.ElementwiseMultiply,
        bottom_names=["user", "item"],
        top_names=["multiply1"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=["multiply1"],
        top_names=["gmf_out"],
        num_output=1,
        act_type=hugectr.Activation_t.Non,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["gmf_out", "label"],
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
