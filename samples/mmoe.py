"""MMoE multi-task (reference: samples/mmoe/mmoe_parquet.py): UCI Census,
two binary labels, 3 shared experts gated per task, per-task towers and
losses (multi-label Input + label_weights).

--variant shared_bottom (reference: samples/mmoe/shared_bottom.py): one
shared bottom MLP feeding both task towers, no expert gating."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SLOT_SIZES = [
    91, 73622, 17, 1425, 3, 24, 15, 5, 10, 2, 3, 6, 8, 133, 114, 1675,
    6, 6, 51, 38, 8, 47, 10, 9, 10, 3, 4, 7, 5, 2, 52, 9,
]
NUM_SLOTS = len(SLOT_SIZES)
EV = 16
EMB_WIDTH = NUM_SLOTS * EV  # 512
N_EXPERT = 3

args = sample_args(
    "mmoe",
    extra=lambda p: p.add_argument(
        "--variant", default="mmoe", choices=["mmoe", "shared_bottom"]
    ),
)
solver = hugectr.CreateSolver(
    max_eval_batches=100,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=args.lr,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
reader = make_reader(args, SLOT_SIZES, label_dim=2, dense_dim=2)
optimizer = hugectr.CreateOptimizer(
    optimizer_type=hugectr.Optimizer_t.SGD, atomic_update=True
)
# two binary labels -> the generator writes label columns per label_dim; we
# reuse one label column for both tasks in the synthetic setting
model = hugectr.Model(solver, reader, optimizer)
model.add(
    hugectr.Input(
        label_dim=[1, 1],
        label_name=["50k_label", "married_label"],
        dense_dim=2,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam("data1", 1, True, NUM_SLOTS)
        ],
        label_weights={"50k_label": 0.5, "married_label": 0.5},
    )
)
model.add(
    hugectr.SparseEmbedding(
        embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
        workspace_size_per_gpu_in_mb=1000,
        embedding_vec_size=EV,
        combiner="sum",
        sparse_embedding_name="embedding",
        bottom_name="data1",
        optimizer=optimizer,
        slot_size_array=SLOT_SIZES,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["embedding"],
        top_names=["reshape_embedding"],
        leading_dim=EMB_WIDTH,
    )
)
if args.variant == "shared_bottom":
    N_EXPERT = 1  # one shared bottom, no gating
# experts (shared bottom): 512 -> 256 -> 128 with two task outputs each
for e in range(N_EXPERT):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["reshape_embedding"],
            top_names=[f"e{e}_fc1"],
            num_output=256,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.ReLU,
            bottom_names=[f"e{e}_fc1"],
            top_names=[f"e{e}_relu1"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[f"e{e}_relu1"],
            top_names=[f"e{e}_out"],
            num_output=128,
        )
    )
def _build_tower(task):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[f"tower_{task}_input"],
            top_names=[f"tower_{task}_fc"],
            num_output=64,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.ReLU,
            bottom_names=[f"tower_{task}_fc"],
            top_names=[f"tower_{task}_relu"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[f"tower_{task}_relu"],
            top_names=[f"{task}_out"],
            num_output=1,
            act_type=hugectr.Activation_t.Non,
        )
    )


# per-task gates: softmax over experts, scale-broadcast, gate and sum
# (shared_bottom variant: towers read the single bottom output directly)
for task in ("A", "B"):
    if args.variant == "shared_bottom":
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.InnerProduct,
                bottom_names=["e0_out"],
                top_names=[f"tower_{task}_input"],
                num_output=128,
            )
        )
        _build_tower(task)
        continue
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["reshape_embedding"],
            top_names=[f"g{task}_dense"],
            num_output=N_EXPERT,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Softmax,
            bottom_names=[f"g{task}_dense"],
            top_names=[f"g{task}_softmax"],
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Slice,
            bottom_names=[f"g{task}_softmax"],
            top_names=[f"g{task}_e{e}" for e in range(N_EXPERT)],
            ranges=[(e, e + 1) for e in range(N_EXPERT)],
        )
    )
    gated = []
    for e in range(N_EXPERT):
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.Scale,
                bottom_names=[f"g{task}_e{e}"],
                top_names=[f"g{task}_e{e}_scaled"],
                axis=0,
                factor=128,
            )
        )
        model.add(
            hugectr.DenseLayer(
                layer_type=hugectr.Layer_t.ElementwiseMultiply,
                bottom_names=[f"e{e}_out", f"g{task}_e{e}_scaled"],
                top_names=[f"e{e}_{task}_gated"],
            )
        )
        gated.append(f"e{e}_{task}_gated")
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Add,
            bottom_names=gated,
            top_names=[f"tower_{task}_input"],
        )
    )
    _build_tower(task)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["A_out", "50k_label"],
        top_names=["lossA"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["B_out", "married_label"],
        top_names=["lossB"],
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
