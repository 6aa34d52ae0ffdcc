"""Embedding-collection benchmark runner.

Analog of the reference benchmark suite
(reference: benchmarks/embedding_collection/{benchmark.sh,hugectr/train.py}):
builds an EBC model from one of the synthetic table cases (or the DLRM-DCNv2
flagship), trains on power-law synthetic data, and prints a one-line JSON
with steady-state examples/sec. The SKIP_* component-ablation env flags
(SKIP_EMBEDDING, SKIP_EMBEDDING_UPDATE, SKIP_BOTTOM_MLP, SKIP_TOP_MLP, ...)
are honored by the Model pipeline for per-stage accounting, matching the
reference's model_pipeline.cpp:118-147 ablations.

Usage:
    python benchmarks/embedding_collection/train.py --case dcnv2 \
        --batchsize 8192 --vocab_cap 2000000 --iters 20
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference-suite flag names -> the generic dense-layer ablation
# (bottom MLP = "mlp1", top MLP = "mlp2"/"m2" in these graphs)
_skips = [
    s
    for flag, s in (("SKIP_BOTTOM_MLP", "mlp1"), ("SKIP_TOP_MLP", "mlp2,m2"))
    if os.environ.get(flag)
]
if _skips:
    prev = os.environ.get("SKIP_DENSE_LAYERS", "")
    os.environ["SKIP_DENSE_LAYERS"] = ",".join(
        [x for x in [prev] if x] + _skips
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="dcnv2",
                    help="dcnv2 | 180table_70B_hotness80 | "
                         "7table_470B_hotness20 | 510table_110B_hotness5 | "
                         "200table_100B_hotness20")
    ap.add_argument("--batchsize", type=int, default=8192)
    ap.add_argument("--vocab_cap", type=int, default=1_000_000,
                    help="per-table vocabulary cap (0 = full scale; the "
                         "full cases need multi-host HBM)")
    ap.add_argument("--ev_size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=1.1)
    ap.add_argument("--optimizer", default="adagrad")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "HCTR_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/hugectr_tpu_jaxcache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import hugectr_tpu as hugectr
    from hugectr_tpu.core.mesh import ResourceManager
    from hugectr_tpu.core.types import DataReaderType_t

    rm = ResourceManager.create(num_devices=len(jax.devices()))

    if args.case == "dcnv2":
        from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

        os.environ.setdefault("HCTR_BENCH_OPT", args.optimizer)
        model = build_dlrm_dcnv2(
            rm,
            batchsize=args.batchsize,
            vocab_cap=args.vocab_cap or 2_000_000,
            synthetic_batches=32,
            use_mixed_precision=True,
            ev_size=args.ev_size,
        )
        hotness_total = sum(
            __import__("hugectr_tpu.tools.flagship", fromlist=["x"])
            .MLPERF_MULTI_HOT_SIZES
        )
    else:
        from configs import expand

        sizes, hots = expand(args.case, args.vocab_cap)
        hotness_total = sum(hots)
        solver = hugectr.CreateSolver(
            max_eval_batches=4,
            batchsize_eval=args.batchsize,
            batchsize=args.batchsize,
            lr=0.005,
            use_mixed_precision=True,
            repeat_dataset=True,
        )
        reader = hugectr.DataReaderParams(
            data_reader_type=DataReaderType_t.Synthetic,
            synthetic_num_batches=16,
            synthetic_alpha=args.alpha,
        )
        optimizer = hugectr.CreateOptimizer(
            optimizer_type=hugectr.Optimizer_t(args.optimizer),
            initial_accu_value=0.0,
        )
        model = hugectr.Model(solver, reader, optimizer, resource_manager=rm)
        model.add(
            hugectr.Input(
                label_dim=1,
                label_name="label",
                dense_dim=13,
                dense_name="dense",
                data_reader_sparse_param_array=[
                    hugectr.DataReaderSparseParam(f"data{i}", hots[i], True, 1)
                    for i in range(len(sizes))
                ],
            )
        )
        tables = [
            hugectr.EmbeddingTableConfig(
                name=str(i), max_vocabulary_size=sizes[i],
                ev_size=args.ev_size,
            )
            for i in range(len(sizes))
        ]
        ebc = hugectr.EmbeddingCollectionConfig()
        ebc.embedding_lookup(
            table_config=tables,
            bottom_name=[f"data{i}" for i in range(len(sizes))],
            top_name="emb",
            combiner=["sum"] * len(sizes),
        )
        names = [str(i) for i in range(len(sizes))]
        ebc.shard(
            shard_matrix=[names] * rm.num_devices,
            shard_strategy=[("mp", names)],
        )
        model.add(ebc)
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP, bottom_names=["dense"],
            top_names=["mlp1"], num_outputs=[512, 256, args.ev_size],
        ))
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.Concat,
            bottom_names=["emb", "mlp1"], top_names=["c"],
        ))
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.MLP, bottom_names=["c"],
            top_names=["m2"], num_outputs=[1024, 512, 256, 1],
            activations=[hugectr.Activation_t.Relu] * 3
            + [hugectr.Activation_t.Non],
        ))
        model.add(hugectr.DenseLayer(
            layer_type=hugectr.Layer_t.BinaryCrossEntropyLoss,
            bottom_names=["m2", "label"], top_names=["loss"],
        ))
        model.compile()

    for _ in range(args.warmup):
        model.train()
    jax.block_until_ready(model.state["dense_params"])
    t0 = time.perf_counter()
    loss = None
    for _ in range(args.iters):
        loss = model.train_async()
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    skips = sorted(k for k in os.environ if k.startswith("SKIP_"))
    print(json.dumps({
        "case": args.case,
        "examples_per_sec": round(args.iters * args.batchsize / dt, 1),
        "sec_per_iter": round(dt / args.iters, 5),
        "batchsize": args.batchsize,
        "vocab_cap": args.vocab_cap,
        "ev_size": args.ev_size,
        "hotness_total": hotness_total,
        "devices": rm.num_devices,
        "skips": skips,
    }))


if __name__ == "__main__":
    main()
