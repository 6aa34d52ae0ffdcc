"""Benchmark harness: DLRM-DCNv2 (MLPerf v3.1 shape) training throughput.

Runs the flagship model on the available accelerator (1 TPU chip under the
driver), measures steady-state training examples/sec, and prints ONE JSON
line. `vs_baseline` is examples/sec relative to the reference's MLPerf v3.1
DLRM-DCNv2 per-GPU operating point (~2.5M examples/s/H100, derived from the
published 8×H100 submissions; the repo itself stores no absolute text figure —
see BASELINE.md).
"""
import json
import os
import sys
import time

BASELINE_EXAMPLES_PER_SEC_PER_CHIP = 2.5e6


def main():
    # bench operating point: bf16 embedding vectors, xla segment-sum with
    # unique-prefix compaction (exact — cond fallback when unique rows
    # exceed the cap), one-hot MXU engine for small tables (lib default)
    os.environ.setdefault("HCTR_TPU_EMB_DTYPE", "bfloat16")
    # bf16 optimizer state: validated by the AUC convergence gate
    # (tests/test_convergence.py::test_bf16_optimizer_state_convergence_gate)
    os.environ.setdefault("HCTR_TPU_EMB_STATE_DTYPE", "bfloat16")
    os.environ.setdefault("HCTR_TPU_SEGSUM", "xla")
    # auto: unique-row compaction windows measured from the first batch
    # (exact — lax.cond falls back to full-K on overflow)
    os.environ.setdefault("HCTR_TPU_UCAP_FACTOR", "auto")
    # measured-window headroom: branch work scales with the window, and the
    # cond falls back to the exact full-K chain on overflow, so tight is
    # fast AND exact. Sweep (v5e, ex/s): 1.25=134.2k / 1.10=142.3k /
    # 1.05=146.7k / 1.02=fallback storm (do not use).
    os.environ.setdefault("HCTR_TPU_UCAP_HEADROOM", "1.05")
    # rowwise_adagrad = the MLPerf DLRM reference implementation's embedding
    # optimizer (torchrec ROWWISE_ADAGRAD); AUC-gated vs element-wise
    # AdaGrad in test_convergence.py::test_rowwise_adagrad_convergence_gate
    os.environ.setdefault("HCTR_BENCH_OPT", "rowwise_adagrad")
    # hot/cold split (HybridEmbedding frequent/infrequent analog): the hot
    # prefix of each big table lives in per-table small storage groups where
    # XLA row ops run in the cheap small-operand regime (~5-10 ns/row vs
    # ~30). EXACT for any key distribution (test_hot_cold_split.py); the
    # speed benefit assumes frequency-ordered vocab, which power-law
    # synthetic keys and --frequency-remap'd Criteo both satisfy.
    # Sweeps (v5e, ex/s): batch 8192 @SH1024: 16k=110.6k / 32k=114.2k /
    # 64k=117.2k / 128k=111.8k; batch 16384 @SH1024: 64k=183.7k /
    # 128k=184.7k (2048-row superhot regresses: 64k=177.2k, 128k=178.3k).
    os.environ.setdefault("HCTR_TPU_HOT_ROWS", "131072")
    os.environ.setdefault("HCTR_TPU_SPLIT_VOCAB", "16384")
    # superhot MXU tier: first 1k rows of each split table served by the
    # one-hot counts-matmul engine (power-law head at flops cost instead of
    # per-key scatter issue cost). Sweep (v5e, ex/s): 512=133.0k /
    # 1024=134.2k / 2048=132.7k / 4096=129.3k; hot re-sweep at 1024 kept
    # 64k best (32k=132.8k, 128k=133.9k).
    os.environ.setdefault("HCTR_TPU_SUPERHOT_ROWS", "1024")
    # binned AUC finalize for the 5.24M-sample eval buffers: the exact
    # sort path costs ~1.9 s per finalize at this size (~360 ns/element
    # XLA 1-D sort); the binned closure is 2 scatter passes with a <1e-4
    # bound (tests/test_metrics.py::test_auc_binned_matches_exact) —
    # far inside the MLPerf AUC target's 1e-3 granularity
    os.environ.setdefault("HCTR_TPU_AUC_EXACT_MAX", "1048576")
    # honor driver environment; default to whatever platform JAX picks
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "HCTR_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/hugectr_tpu_jaxcache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hugectr_tpu.core.mesh import ResourceManager
    from hugectr_tpu.tools.flagship import build_dlrm_dcnv2

    n_dev = len(jax.devices())
    on_tpu = jax.devices()[0].platform == "tpu"
    # operating point: per-chip batch 16384 (HugeCTR's own scaling chart
    # batch; MLPerf v3.1 per-GPU batches are 6912/2112 — batch is reported
    # in the JSON). Measured (v5e, ex/s): 8192=167.8k / 16384=183.7k /
    # 32768=180.4k at the 64k/1k tiers; 16384 re-tuned -> 184.7k.
    batch = int(os.environ.get("HCTR_BENCH_BATCH", 16384 if on_tpu else 256))
    vocab_cap = int(
        os.environ.get("HCTR_BENCH_VOCAB_CAP", 2_000_000 if on_tpu else 2000)
    )
    # eval sweep size: 320 batches x 16384 = 5.24M samples per eval() pass
    # (MLPerf-scale AUC buffer; the 89M-sample Criteo eval set is 17 such
    # passes). 32 distinct device-cached batches cycle to fill the sweep.
    eval_batches = int(os.environ.get("HCTR_BENCH_EVAL_BATCHES", 320 if on_tpu else 8))
    rm = ResourceManager.create(num_devices=n_dev)
    model = build_dlrm_dcnv2(
        rm,
        batchsize=batch,
        vocab_cap=vocab_cap,
        synthetic_batches=32,
        use_mixed_precision=on_tpu,
        ev_size=128 if on_tpu else 32,
        max_eval_batches=eval_batches,
    )

    warmup = 5
    iters = 20 if on_tpu else 5
    for _ in range(warmup):
        model.train()
    import jax as _jax

    _jax.block_until_ready(model.state["dense_params"])
    t0 = time.perf_counter()
    loss = None
    for _ in range(iters):
        loss = model.train_async()  # async dispatch; feeder keeps device fed
    _jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ex_per_sec = iters * batch / dt

    # eval throughput (MLPerf time-to-AUC includes the 89M-sample eval
    # sweeps): full eval() passes — jitted fwd + device AUC accumulation +
    # the per-batch host metric sync, max_eval_batches x batchsize_eval
    # examples per pass
    model.eval()  # compile + populate the device eval cache
    eval_passes = 2 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(eval_passes):
        model.eval()
    dt_e = time.perf_counter() - t0
    eval_ex_per_sec = (
        eval_passes * model.solver.max_eval_batches * batch / dt_e
    )
    # end-to-end input-pipeline row (VERDICT-r4 #8): the SAME flagship model
    # fed by the full native RawAsync reader chain over generated Criteo-
    # shape Raw data — NO device-cached batches. In this environment the
    # axon relay serializes H2D at ~25 ms + ~65 MB/s once an executable is
    # loaded (ROADMAP "tunnel artifact"), so this row measures the tunnel,
    # not the framework: readers sustain >0.76M ex/s host-side and on real
    # TPU hosts (GB/s DMA) the fused upload leaves input off the critical
    # path. Recorded so the cached-batch caveat has an explicit companion.
    e2e_ex_per_sec = None
    if on_tpu and os.environ.get("HCTR_BENCH_E2E", "1") != "0":
        import gc
        import tempfile

        import hugectr_tpu as hugectr
        from hugectr_tpu.core.types import DataReaderType_t
        from hugectr_tpu.tools.flagship import (
            MLPERF_MULTI_HOT_SIZES,
            MLPERF_TABLE_SIZES,
        )

        del model
        gc.collect()
        e2e_iters = 10
        tmpd = tempfile.mkdtemp(prefix="hctr_e2e_")
        raw = os.path.join(tmpd, "train.bin")
        table_sizes = [min(v, vocab_cap) for v in MLPERF_TABLE_SIZES]
        hugectr.DataGenerator(
            hugectr.DataGeneratorParams(
                format=DataReaderType_t.Raw,
                label_dim=1, dense_dim=13, num_slot=26,
                source=raw, eval_source=os.path.join(tmpd, "eval.bin"),
                slot_size_array=table_sizes,
                nnz_array=list(MLPERF_MULTI_HOT_SIZES),
                num_samples=(e2e_iters + 3) * batch,
                eval_num_samples=batch,
            )
        ).generate()
        reader = hugectr.DataReaderParams(
            data_reader_type=DataReaderType_t.RawAsync,
            source=[raw], eval_source=os.path.join(tmpd, "eval.bin"),
        )
        m2 = build_dlrm_dcnv2(
            rm, batchsize=batch, vocab_cap=vocab_cap,
            use_mixed_precision=on_tpu, ev_size=128, reader=reader,
        )
        for _ in range(3):
            m2.train()
        t0 = time.perf_counter()
        loss = None
        for _ in range(e2e_iters):
            loss = m2.train_async()
        _jax.block_until_ready(loss)
        e2e_ex_per_sec = e2e_iters * batch / (time.perf_counter() - t0)

    out = {
        "metric": "dlrm_dcnv2_train_examples_per_sec",
        "value": round(ex_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC_PER_CHIP, 4),
        "batch": batch,
        "devices": n_dev,
        "platform": jax.devices()[0].platform,
        "iters": iters,
        "sec_per_iter": round(dt / iters, 5),
        "eval_examples_per_sec": round(eval_ex_per_sec, 1),
        "eval_sweep_batches": eval_batches,
        "emb_dtype": os.environ["HCTR_TPU_EMB_DTYPE"],
        "emb_state_dtype": os.environ.get("HCTR_TPU_EMB_STATE_DTYPE", "float32"),
        "segsum": os.environ["HCTR_TPU_SEGSUM"],
        "optimizer": os.environ["HCTR_BENCH_OPT"],
        "ucap": os.environ["HCTR_TPU_UCAP_FACTOR"],
        "hot_rows": int(os.environ["HCTR_TPU_HOT_ROWS"]),
        "superhot_rows": int(os.environ.get("HCTR_TPU_SUPERHOT_ROWS", "0")),
        "ucap_headroom": os.environ.get("HCTR_TPU_UCAP_HEADROOM", "1.25"),
        "vocab_cap": vocab_cap,
        # measurement caveats vs the full MLPerf operating point: per-table
        # vocab capped (4x40M tables exceed one chip's HBM), synthetic
        # power-law keys, device-cached batches (input pipeline measured
        # separately; async readers sustain >2M ex/s host-side)
        "caveats": "vocab_capped,synthetic_keys,device_cached_batches",
    }
    if e2e_ex_per_sec is not None:
        # full reader-fed number + the reason it differs here (see comment
        # above): the axon relay's ~65 MB/s serialized H2D is the ceiling
        out["e2e_reader_examples_per_sec"] = round(e2e_ex_per_sec, 1)
        out["e2e_caveat"] = "tunnel_h2d_bound_65MBps_env_artifact"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
