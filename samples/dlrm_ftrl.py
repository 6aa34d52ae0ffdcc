"""DLRM with FTRL optimizer and (optionally) EXACT dynamic hash tables
(reference: samples/ftrl/dlrm_train_ftrl.py): per-table embedding lookups
concatenated into a 3-D [B, slots, ev] tensor feeding the DLRM pairwise
Interaction layer, bottom MLP 512-256-128, top MLP 1024-1024-512-256-1.

``--use_dynamic_hash_table`` flips every table to ``max_vocabulary_size=-1``
(reference: dlrm_train_ftrl.py:221-223) — rows are created on first touch by
the probed exact key store (insert-on-backward) instead of preallocated.
"""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr
from hugectr_tpu.core.mesh import ResourceManager

SLOT_SIZES = [
    39884, 39043, 17289, 7420, 20263, 3, 7120, 1543, 63, 38532, 2953546,
    403346, 10, 2208, 11938, 155, 4, 976, 14, 39979, 25641295, 39664984,
    585935, 12972, 108, 36,
]
EV = 128

args = sample_args("dlrm_ftrl")
use_dynamic = bool(getattr(args, "use_dynamic_hash_table", False))
solver = hugectr.CreateSolver(
    max_eval_batches=50,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=args.lr,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
# samples run out-of-the-box: cap synthetic vocabularies on one host
capped = [min(s, 400_000) for s in SLOT_SIZES]
reader = make_reader(args, capped, nnz_array=[1] * 26)
optimizer = hugectr.CreateOptimizer(
    optimizer_type=hugectr.Optimizer_t.FTRL,
    lr=args.lr,
    beta=0.0,
    lambda1=0.01,
    lambda2=0.01,
)
rm = ResourceManager.create(num_devices=args.num_devices)
model = hugectr.Model(solver, reader, optimizer, resource_manager=rm)
model.add(
    hugectr.Input(
        label_dim=1,
        label_name="label",
        dense_dim=13,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam(f"data{i}", 1, True, 1)
            for i in range(26)
        ],
    )
)
tables = [
    hugectr.EmbeddingTableConfig(
        name=str(i),
        max_vocabulary_size=-1 if use_dynamic else capped[i],
        ev_size=EV,
        dynamic_capacity=4096 if use_dynamic else 0,
    )
    for i in range(26)
]
ebc = hugectr.EmbeddingCollectionConfig()
ebc.embedding_lookup(
    tables, [f"data{i}" for i in range(26)], "sparse_embedding1", ["sum"] * 26
)
ebc.shard(
    shard_matrix=[[t.name for t in tables]] * rm.num_devices,
    shard_strategy=[("mp", [t.name for t in tables])],
)
model.add(ebc)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["sparse_embedding1"],
        top_names=["emb3d"],
        shape=[-1, 26, EV],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.MLP,
        bottom_names=["dense"],
        top_names=["bottom_mlp"],
        num_outputs=[512, 256, EV],
        activations=[hugectr.Activation_t.Relu] * 3,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Interaction,  # needs 3-D embedding input
        bottom_names=["bottom_mlp", "emb3d"],
        top_names=["interaction1"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.MLP,
        bottom_names=["interaction1"],
        top_names=["top_mlp"],
        num_outputs=[1024, 1024, 512, 256, 1],
        activations=[hugectr.Activation_t.Relu] * 4
        + [hugectr.Activation_t.Non],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
        bottom_names=["top_mlp", "label"],
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
