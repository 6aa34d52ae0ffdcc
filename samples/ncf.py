"""NCF family (reference: samples/ncf/{gmf,ncf,neumf}.py): MovieLens
user/item collaborative filtering.

--variant gmf   : elementwise user*item product -> logit (default)
--variant ncf   : MLP tower over the concatenated user/item embedding
--variant neumf : GMF branch + MLP branch, concat -> logit (NeuMF)
"""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SLOT_SIZES = [162543, 56573]  # users, items (ml-20m)

args = sample_args(
    "ncf",
    extra=lambda p: p.add_argument(
        "--variant", default="gmf", choices=["gmf", "ncf", "neumf"]
    ),
)
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
# one mixed embedding, per-branch halves sliced off like the reference
# (neumf.py "mixed_embedding" pattern); gmf/ncf use a 16-dim vector per
# slot, neumf adds an extra 16-dim GMF half (32 per slot).
EV = 16 if args.variant != "neumf" else 32
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=60,
        embedding_vec_size=EV,
        combiner="sum",
        sparse_embedding_name="mixed_embedding",
        bottom_name="data",
        optimizer=optimizer,
        slot_size_array=SLOT_SIZES,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["mixed_embedding"],
        top_names=["reshape1"],
        leading_dim=2 * EV,
    )
)


def _gmf_branch(user, item, top):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.ElementwiseMultiply,
            bottom_names=[user, item],
            top_names=[top],
        )
    )


def _mlp_tower(bottom, top, widths=(256, 256, 128, 64)):
    prev = bottom
    for i, w in enumerate(widths):
        last = i == len(widths) - 1
        fc, drop = f"fc{i + 1}", (top if last else f"dropout{i + 1}")
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.InnerProduct,
                bottom_names=[prev],
                top_names=[fc],
                num_output=w,
                act_type=hugectr.Activation_t.Relu,
            )
        )
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.Dropout,
                bottom_names=[fc],
                top_names=[drop],
                dropout_rate=0.5,
            )
        )
        prev = drop


if args.variant == "gmf":
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Slice,
            bottom_names=["reshape1"],
            top_names=["user", "item"],
            ranges=[(0, EV), (EV, 2 * EV)],
        )
    )
    _gmf_branch("user", "item", "gmf_multiply")
    head = "gmf_multiply"
elif args.variant == "ncf":
    _mlp_tower("reshape1", "mlp_out")
    head = "mlp_out"
else:  # neumf: first 16 dims of each slot feed the MLP, the rest GMF
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Slice,
            bottom_names=["reshape1"],
            top_names=["mlp_user", "gmf_user", "mlp_item", "gmf_item"],
            ranges=[(0, 16), (16, 32), (32, 48), (48, 64)],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["mlp_user", "mlp_item"],
            top_names=["mlp_in"],
        )
    )
    _mlp_tower("mlp_in", "mlp_out")
    _gmf_branch("gmf_user", "gmf_item", "gmf_multiply")
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["gmf_multiply", "mlp_out"],
            top_names=["concat_head"],
        )
    )
    head = "concat_head"

model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=[head],
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
if __name__ == "__main__":
    model.compile()
    model.summary()
    model.fit(
        max_iter=args.max_iter,
        display=args.display,
        eval_interval=args.eval_interval,
    )
