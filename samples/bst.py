"""BST (reference: samples/bst/bst_avg_pooling.py): behavior-sequence
transformer — MultiHeadAttention + SequenceMask block over the history, mean
pooled, concatenated with user/target embeddings into a Dice MLP."""
from common import make_reader, sample_args  # noqa: F401 (sets sys.path)

import hugectr_tpu as hugectr

SEQ = 10
USER_VOCAB = [192403]
GOOD_VOCAB = [63001] * SEQ
TGOOD_VOCAB = [63001]
CATE_VOCAB = [801] * SEQ
TCATE_VOCAB = [801]

args = sample_args("bst")
solver = hugectr.CreateSolver(
    max_eval_batches=70,
    batchsize_eval=args.batchsize,
    batchsize=args.batchsize,
    lr=args.lr,
    num_devices=args.num_devices,
    repeat_dataset=True,
)
reader = make_reader(
    args,
    USER_VOCAB + GOOD_VOCAB + TGOOD_VOCAB + CATE_VOCAB + TCATE_VOCAB,
    dense_dim=1,
)
optimizer = hugectr.CreateOptimizer(
    optimizer_type=hugectr.Optimizer_t.Adam, beta1=0.9, beta2=0.999, epsilon=1e-9
)
model = hugectr.Model(solver, reader, optimizer)
model.add(
    hugectr.Input(
        label_dim=1,
        label_name="label",
        dense_dim=1,
        dense_name="dense",
        data_reader_sparse_param_array=[
            hugectr.DataReaderSparseParam("UserID", 1, True, 1),
            hugectr.DataReaderSparseParam("GoodID", 1, True, SEQ),
            hugectr.DataReaderSparseParam("Target_Good", 1, True, 1),
            hugectr.DataReaderSparseParam("CateID", 1, True, SEQ),
            hugectr.DataReaderSparseParam("Target_Cate", 1, True, 1),
        ],
    )
)
for name, bottom, slots, ev, mb in (
    ("sparse_embedding_user", "UserID", USER_VOCAB, 18, 84),
    ("sparse_embedding_good", "GoodID", GOOD_VOCAB, 16, 72),
    ("sparse_embedding_item_good", "Target_Good", TGOOD_VOCAB, 16, 8),
    ("sparse_embedding_cate", "CateID", CATE_VOCAB, 16, 30),
    ("sparse_embedding_item_cate", "Target_Cate", TCATE_VOCAB, 16, 4),
):
    model.add(
        hugectr.SparseEmbedding(
            embedding_type=hugectr.Embedding_t.DistributedSlotSparseEmbeddingHash,
            workspace_size_per_gpu_in_mb=mb,
            embedding_vec_size=ev,
            combiner="sum",
            sparse_embedding_name=name,
            bottom_name=bottom,
            optimizer=optimizer,
            slot_size_array=slots,
        )
    )
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.SequenceMask,
        bottom_names=["dense", "dense"],
        top_names=["sequence_mask"],
        max_sequence_len_from=SEQ,
        max_sequence_len_to=SEQ,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=["sparse_embedding_cate", "sparse_embedding_good"],
        top_names=["hist_emb_list"],
        axis=2,
    )
)
for proj in ("query_emb", "key_emb", "value_emb"):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=["hist_emb_list"],
            top_names=[proj],
            num_output=32,
        )
    )
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.MultiHeadAttention,
        bottom_names=["query_emb", "key_emb", "value_emb", "sequence_mask"],
        top_names=["attention_out"],
        num_attention_heads=4,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Add,
        bottom_names=["attention_out", "query_emb"],
        top_names=["attention_add_shortcut"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.LayerNorm,
        bottom_names=["attention_add_shortcut"],
        top_names=["attention_layer_norm"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=["attention_layer_norm"],
        top_names=["attention_ffn1"],
        num_output=128,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=["attention_ffn1"],
        top_names=["attention_ffn2"],
        num_output=32,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Add,
        bottom_names=["attention_ffn2", "attention_layer_norm"],
        top_names=["attention_ffn_shortcut"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.LayerNorm,
        bottom_names=["attention_ffn_shortcut"],
        top_names=["attention_ffn_layer_norm"],
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.ReduceMean,
        bottom_names=["attention_ffn_layer_norm"],
        top_names=["reduce_attention_ffn_layer_norm"],
        axis=1,
    )
)
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Reshape,
        bottom_names=["reduce_attention_ffn_layer_norm"],
        top_names=["reshape_attention_out"],
        leading_dim=32,
    )
)
for emb, dim in (
    ("sparse_embedding_user", 18),
    ("sparse_embedding_item_good", 16),
    ("sparse_embedding_item_cate", 16),
):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Reshape,
            bottom_names=[emb],
            top_names=[f"reshape_{emb}"],
            leading_dim=dim,
        )
    )
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.Concat,
        bottom_names=[
            "reshape_sparse_embedding_user",
            "reshape_sparse_embedding_item_good",
            "reshape_sparse_embedding_item_cate",
            "reshape_attention_out",
        ],
        top_names=["dnn_input"],
    )
)
prev = "dnn_input"
for i, width in enumerate((256, 128, 64), start=1):
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.InnerProduct,
            bottom_names=[prev],
            top_names=[f"fc_bst_i{i}"],
            num_output=width,
        )
    )
    model.add(
        hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.PReLU_Dice,
            bottom_names=[f"fc_bst_i{i}"],
            top_names=[f"dice_{i}"],
            elu_alpha=0.2,
            eps=1e-8,
        )
    )
    prev = f"dice_{i}"
model.add(
    hugectr.DenseLayer(
        layer_type=hugectr.Layer_t.InnerProduct,
        bottom_names=[prev],
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
