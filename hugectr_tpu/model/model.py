"""High-level Model API: graph building, compile, fit/eval, checkpointing.

TPU-native analog of the reference's `Model` god-object
(HugeCTR/src/pybind/model.cpp, model_compile.cpp, model_pipeline.cpp).
The reference hand-builds per-GPU stream pipelines with event edges and CUDA
graphs; here the WHOLE training iteration — embedding forward, dense
forward/backward, wgrad exchange, dense + sparse optimizer updates — is one
jitted SPMD program over the mesh, and XLA owns scheduling/overlap
(SURVEY.md §7 mapping).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DenseLayer, Input, Solver
from ..core.logger import get_logger
from ..core.mesh import ResourceManager, set_default_resource_manager
from ..core.types import (
    Combiner_t,
    DataReaderType_t,
    INVALID_KEY,
    Metric_t,
)
from ..data.reader import (
    FUSED_KEY,
    ROWS_KEY,
    BaseReader,
    BatchSpec,
    DeviceFeeder,
    ParquetReader,
    RawReader,
    SparseFeatureSpec,
    SyntheticReader,
)
from ..embedding.collection import EmbeddingCollection
from ..embedding.config import EmbeddingCollectionConfig, SparseEmbedding
from ..io import filesystem as iofs
from ..layers.base import LayerCtx
from ..layers.network import Network
from ..metrics.metrics import MetricAccumulator
from ..optim.dense import DenseOptimizer
from ..optim.lr_schedule import LearningRateScheduler
from ..optim.params import OptParams
from ..parallel.plan import LookupConfig, compile_plan

logger = get_logger()


@dataclasses.dataclass
class _KeySource:
    """Where a lookup's keys come from in the batch dict."""

    param_name: str  # sparse feature (DataReaderSparseParam top) name
    col_begin: int
    col_end: int
    key_offset: int = 0  # slot_size_array offset (legacy fused tables)


class TrainingCallback:
    """Reference parity hooks (include/pybind/training_callback.hpp)."""

    def on_training_start(self, model: "Model"):
        pass

    def on_eval_start(self, model: "Model", iteration: int):
        pass

    def on_eval_end(self, model: "Model", iteration: int, metrics: Dict) -> bool:
        return False  # True => early stop

    def on_training_end(self, model: "Model", iteration: int):
        pass


class _DataReaderHandle:
    """Low-level reader view (reference: python_interface.md "DataReader" —
    set_source + is_eof). Obtained via Model.get_data_reader_train/eval."""

    def __init__(self, model: "Model", train: bool):
        self._model = model
        self._train = train

    @property
    def reader(self):
        return (
            self._model.train_reader if self._train else self._model.eval_reader
        )

    def set_source(self, file_name: str = "") -> None:
        """Re-point this reader at a new source file/list (reference:
        DataReader::set_source); resets EOF."""
        if self._train:
            self._model.set_source(source=file_name or None)
        else:
            self._model.set_source(eval_source=file_name)

    def is_eof(self) -> bool:
        """True once a non-repeating source ran out (reference:
        DataReader::is_eof)."""
        if self._train:
            return bool(getattr(self._model, "_train_eof", False))
        return bool(getattr(self._model, "_eval_eof", False))

    def is_started(self) -> bool:
        """Whether batch production is running (reference:
        DataReader::is_started — worker threads launched, and they STAY
        started; EOF does not un-start a reader). Here: an explicit
        started flag set when this reader's feed first produces."""
        if self._train:
            return self._model._train_iter is not None
        return bool(getattr(self._model, "_eval_feed_started", False))

    def read_a_batch_to_device(self) -> int:
        """Stage the next batch onto the devices; returns the number of
        examples read, 0 at EOF (reference:
        DataReader::read_a_batch_to_device). The staged train batch is
        consumed by the NEXT Model.train() call (reference low-level
        pattern: stage, then train on the staged data). Returns the ACTUAL
        sample count, which is < batchsize for a padded tail batch when
        drop_incomplete_batch=False."""
        ok = self._model.read_a_batch(is_train=self._train)
        if not ok:
            return 0
        s = self._model.solver
        nominal = int(s.batchsize if self._train else s.batchsize_eval)
        actual = getattr(self._model, "_last_read_rows", 0)
        return int(actual) if actual else nominal

    def read_a_batch_to_device_delay_release(self) -> int:
        """Reference split of read vs buffer release (delay_release +
        ready_to_collect) is a CUDA double-buffer handshake; the XLA feed
        pipeline has no host-visible buffer to release, so this is the same
        staged read (DeviceFeeder keeps its own prefetch depth)."""
        return self.read_a_batch_to_device()

    def ready_to_collect(self) -> None:
        """No-op for parity (reference: DataReader::ready_to_collect — frees
        the delay-released buffer; see read_a_batch_to_device_delay_release)."""


class Model:
    """add()/compile()/fit() orchestrator (reference: pybind Model)."""

    def __init__(
        self,
        solver: Solver,
        reader_params,
        optimizer: OptParams,
        resource_manager: Optional[ResourceManager] = None,
    ):
        self.solver = solver
        self.reader_params = reader_params
        self.opt_params = optimizer
        self.rm = resource_manager or ResourceManager.create(
            num_devices=solver.num_devices,
            ev_parallelism=solver.ev_parallelism,
            num_slices=solver.num_slices,
        )
        set_default_resource_manager(self.rm)
        self.input: Optional[Input] = None
        self.dense_layers: List[DenseLayer] = []
        self.ebc_configs: List[EmbeddingCollectionConfig] = []
        self.sparse_embeddings: List[SparseEmbedding] = []
        self.callbacks: List[TrainingCallback] = list(
            getattr(solver, "training_callbacks", []) or []
        )
        self._compiled = False
        self._iter = 0
        import threading

        # guards the exact i64->int31 assignment maps (train + eval
        # DeviceFeeder threads fold batches concurrently)
        self._i64_lock = threading.Lock()
        self.lr_sch = LearningRateScheduler(
            base_lr=solver.lr,
            warmup_steps=solver.warmup_steps,
            decay_start=solver.decay_start,
            decay_steps=solver.decay_steps,
            decay_power=solver.decay_power,
            end_lr=solver.end_lr,
        )

    # ------------------------------------------------------------------ add
    def add(self, obj: Any) -> None:
        if isinstance(obj, Input):
            if self.input is not None:
                raise ValueError("only one Input supported")
            self.input = obj
        elif isinstance(obj, EmbeddingCollectionConfig):
            self.ebc_configs.append(obj)
        elif isinstance(obj, SparseEmbedding):
            self.sparse_embeddings.append(obj)
        elif isinstance(obj, DenseLayer):
            self.dense_layers.append(obj)
        else:
            raise TypeError(f"cannot add {type(obj)}")

    # -------------------------------------------------------------- compile
    def compile(self, loss_names=None, loss_weights=None) -> None:
        if self.input is None:
            raise ValueError("model needs an Input")
        s = self.solver
        _restore_knobs = s.apply_engine_knobs()
        try:
            self._compile_impl(loss_names, loss_weights)
        finally:
            _restore_knobs()

    def _compile_impl(self, loss_names=None, loss_weights=None) -> None:
        s = self.solver
        inp = self.input
        if loss_names and loss_weights:
            inp.label_weights = dict(zip(loss_names, loss_weights))

        # ---- batch spec -------------------------------------------------
        sparse_specs = tuple(
            SparseFeatureSpec(name=p.top_name, slot_nnz=tuple(p.per_slot_nnz()))
            for p in inp.data_reader_sparse_param_array
        )
        self.batch_spec = BatchSpec(
            batch_size=s.batchsize,
            label_dims=tuple(inp.label_dims()),
            label_names=tuple(inp.label_names()),
            dense_dim=inp.dense_dim,
            dense_name=inp.dense_name,
            sparse=sparse_specs,
            key_dtype=np.int64 if s.i64_input_key else np.int32,
        )
        self.eval_batch_spec = dataclasses.replace(
            self.batch_spec, batch_size=s.batchsize_eval
        )
        self._sparse_by_name = {f.name: f for f in sparse_specs}

        # ---- embedding plan ----------------------------------------------
        lookup_cfgs: List[LookupConfig] = []
        self._key_sources: Dict[str, _KeySource] = {}
        self._user_tops: Dict[str, List[str]] = {}  # user top -> internal tops
        self._top3d: Dict[str, Tuple[int, int]] = {}  # user top -> (slots, ev)
        strategy: List[Tuple[str, List[str]]] = []
        column_factors: Dict[str, int] = {}
        shard_counts: Dict[str, int] = {}

        from ..parallel.plan import EmbeddingTableConfig as _ETC

        split_tables: Dict[str, List] = {}  # cache sub-tables per (table, F)
        for ebc in self.ebc_configs:
            ebc_factors = ebc.column_factors or {}
            for decl in ebc.lookup_decls:
                feat = self._sparse_by_name.get(decl.bottom_name)
                if feat is None:
                    raise ValueError(
                        f"EBC lookup bottom {decl.bottom_name!r} has no sparse input"
                    )
                factor = int(ebc_factors.get(decl.table.name, 1))
                if factor > 1:
                    # column-wise sharding: rewrite into `factor` sub-tables
                    # each ev/factor wide (reference:
                    # split_column_wise_sharding_config,
                    # src/embeddings/embedding_collection.cpp:25-130)
                    if decl.table.ev_size % factor:
                        raise ValueError(
                            f"table {decl.table.name}: ev_size "
                            f"{decl.table.ev_size} not divisible by column "
                            f"factor {factor}"
                        )
                    if decl.combiner == Combiner_t.Concat:
                        raise NotImplementedError(
                            "column-wise sharding with concat combiner"
                        )
                    subs = split_tables.get(decl.table.name)
                    if subs is None:
                        subs = [
                            _ETC(
                                name=f"{decl.table.name}#col{j}",
                                max_vocabulary_size=decl.table.max_vocabulary_size,
                                ev_size=decl.table.ev_size // factor,
                                opt_params=decl.table.opt_params,
                                init_scale=decl.table.init_scale,
                                dynamic_capacity=decl.table.dynamic_capacity,
                            )
                            for j in range(factor)
                        ]
                        split_tables[decl.table.name] = subs
                    sub_tables = subs
                else:
                    sub_tables = [decl.table]
                for sub in sub_tables:
                    lid = len(lookup_cfgs)
                    top = f"{decl.top_name}:{lid}"
                    lookup_cfgs.append(
                        LookupConfig(
                            lookup_id=lid,
                            table=sub,
                            bottom_name=top,
                            top_name=top,
                            combiner=decl.combiner,
                            max_hotness=feat.total_nnz,
                            sp_weight_name=getattr(decl, "sp_weight_name", ""),
                        )
                    )
                    self._key_sources[top] = _KeySource(
                        param_name=feat.name, col_begin=0, col_end=feat.total_nnz
                    )
                    self._user_tops.setdefault(decl.top_name, []).append(top)
            plan = ebc.sharding_plan()
            # strategy entries referencing split tables cover their sub-tables
            for kind, names in plan.strategy:
                expanded = []
                for n in names:
                    if n in split_tables:
                        expanded.extend(t.name for t in split_tables[n])
                    else:
                        expanded.append(n)
                strategy.append((kind, expanded))
            column_factors.update(plan.column_factors)
            # partial placement: per-table device count from shard_matrix
            # (embedding/common.hpp:253-267; planner output is honored)
            if ebc.shard_matrix:
                for name in {
                    n for row in ebc.shard_matrix for n in row
                }:
                    f = sum(1 for row in ebc.shard_matrix if name in row)
                    targets = (
                        [t.name for t in split_tables[name]]
                        if name in split_tables
                        else [name]
                    )
                    for t in targets:
                        shard_counts[t] = f

        for se in self.sparse_embeddings:
            feat = self._sparse_by_name.get(se.bottom_name)
            if feat is None:
                raise ValueError(
                    f"SparseEmbedding bottom {se.bottom_name!r} has no sparse input"
                )
            from ..parallel.plan import EmbeddingTableConfig

            vocab = se.vocabulary_for(self.rm.num_devices)
            table = EmbeddingTableConfig(
                name=f"sparse_table_{se.sparse_embedding_name}",
                max_vocabulary_size=vocab,
                ev_size=se.embedding_vec_size,
                opt_params=se.optimizer,
            )
            offsets = (
                np.concatenate([[0], np.cumsum(se.slot_size_array)[:-1]]).astype(int)
                if se.slot_size_array
                else np.zeros(feat.slot_num, dtype=int)
            )
            col = 0
            tops = []
            for si, nnz in enumerate(feat.slot_nnz):
                lid = len(lookup_cfgs)
                top = f"{se.sparse_embedding_name}:{lid}"
                lookup_cfgs.append(
                    LookupConfig(
                        lookup_id=lid,
                        table=table,
                        bottom_name=top,
                        top_name=top,
                        combiner=Combiner_t(se.combiner),
                        max_hotness=nnz,
                    )
                )
                self._key_sources[top] = _KeySource(
                    param_name=feat.name,
                    col_begin=col,
                    col_end=col + nnz,
                    key_offset=int(offsets[si]) if si < len(offsets) else 0,
                )
                tops.append(top)
                col += nnz
            self._user_tops[se.sparse_embedding_name] = tops
            self._top3d[se.sparse_embedding_name] = (
                feat.slot_num,
                se.embedding_vec_size,
            )
            strategy.append(("mp", [table.name]))

        self.ec: Optional[EmbeddingCollection] = None
        if lookup_cfgs:
            from ..parallel.plan import ShardingPlan

            plan = compile_plan(
                lookup_cfgs,
                ShardingPlan(strategy=strategy, column_factors=column_factors),
                num_shards=self.rm.data_parallel_size,
                shard_counts=shard_counts,
            )
            emb_dtype = (
                jnp.bfloat16
                if s.embedding_vec_dtype in ("bfloat16", "bf16")
                else jnp.float32
            )
            comm = None
            for ebc in self.ebc_configs:
                comm = ebc.comm_strategy
                break
            self.ec = EmbeddingCollection(
                plan, self.rm, self.opt_params, dtype=emb_dtype,
                comm_strategy=comm,
            )

        # ---- dense network -------------------------------------------------
        input_shapes: Dict[str, Tuple[int, ...]] = {}
        b = s.batchsize
        for name, dim in zip(self.batch_spec.label_names, self.batch_spec.label_dims):
            input_shapes[name] = (b, dim)
        input_shapes[inp.dense_name] = (b, inp.dense_dim)
        if self.ec is not None:
            for user_top, tops in self._user_tops.items():
                width = 0
                for t in tops:
                    _, lm = self.ec.plan.group_of_lookup(int(t.rsplit(":", 1)[1]))
                    width += lm.out_end - lm.out_begin
                if user_top in self._top3d:
                    slots, ev = self._top3d[user_top]
                    input_shapes[user_top] = (b, slots, ev)
                else:
                    input_shapes[user_top] = (b, width)
        self.network = Network(
            self.dense_layers,
            input_shapes,
            label_weights=inp.label_weights,
            batch_size=b,
        )

        # ---- init state -----------------------------------------------------
        rng = jax.random.PRNGKey(s.seed or 0)
        rng, net_rng, emb_rng = jax.random.split(rng, 3)
        dense_params, net_state = self.network.init(net_rng)
        rep = self.rm.replicated_sharding()
        dense_params = jax.device_put(dense_params, rep)
        net_state = jax.device_put(net_state, rep)
        self.dense_opt = DenseOptimizer(self.opt_params)
        dopt_state = jax.device_put(self.dense_opt.init(dense_params), rep)
        state = {
            "step": jnp.zeros((), jnp.int32),
            # explicit LR override (low-level API Model.set_learning_rate);
            # <= 0 means "use the in-graph scheduler"
            "lr_override": jnp.asarray(-1.0, jnp.float32),
            "rng": jax.device_put(rng, rep),
            "dense_params": dense_params,
            "net_state": net_state,
            "dopt": dopt_state,
        }
        if self.ec is not None:
            tables = self.ec.init(emb_rng)
            state["emb_tables"] = tables
            state["eopt"] = self.ec.init_optimizer(tables)
        self.state = state
        self._rng = rng

        # ---- readers --------------------------------------------------------
        self.train_reader = self._make_reader(train=True)
        self.eval_reader = self._make_reader(train=False)
        self._train_iter = None
        self._build_steps()
        # one accumulator per loss/task (reference: multi-label per-class
        # AUC, metrics.cu multi-label path). Single-task models report plain
        # metric names; multi-task adds "<metric>_<label>" per task.
        _ldims = dict(
            zip(self.batch_spec.label_names, self.batch_spec.label_dims)
        )
        self.metrics = MetricAccumulator(
            s.metrics_spec,
            batch_size=s.batchsize_eval,
            max_batches=s.max_eval_batches,
            sharding=self.rm.batch_sharding(),
            label_dim=_ldims.get(self.network.loss_specs[0].label_name, 1),
        )
        self._task_metrics = {
            spec.label_name: MetricAccumulator(
                s.metrics_spec,
                batch_size=s.batchsize_eval,
                max_batches=s.max_eval_batches,
                sharding=self.rm.batch_sharding(),
                label_dim=_ldims.get(spec.label_name, 1),
            )
            for spec in self.network.loss_specs[1:]
        }
        # opt-in host-side out-of-range key assertion (captured here like
        # the other engine knobs; "0"/"" disable like every HCTR_TPU_* knob)
        self._check_keys = os.environ.get(
            "HCTR_TPU_CHECK_KEYS", "0"
        ) not in ("", "0")
        if self.rm.is_master_process():
            s.warn_noop_knobs(logger)
        self._compiled = True

    # ------------------------------------------------------------- readers
    def _make_reader(self, train: bool) -> Optional[BaseReader]:
        rp = self.reader_params
        if rp is None:
            return None
        spec = self.batch_spec if train else self.eval_batch_spec
        if self.rm.num_processes > 1:
            # each process reads its own slice of the global batch
            if spec.batch_size % self.rm.num_processes:
                raise ValueError(
                    f"global batch {spec.batch_size} not divisible by "
                    f"{self.rm.num_processes} processes"
                )
            spec = dataclasses.replace(
                spec, batch_size=spec.batch_size // self.rm.num_processes
            )
        kind = DataReaderType_t(rp.data_reader_type)
        src = rp.source[0] if train and rp.source else rp.eval_source
        if kind == DataReaderType_t.Synthetic or not src:
            vocabs = self._slot_vocabs()
            return SyntheticReader(
                spec,
                vocabs,
                num_batches=getattr(rp, "synthetic_num_batches", 64),
                alpha=getattr(rp, "synthetic_alpha", 0.0),
                seed=(self.solver.seed or 1234)
                + (0 if train else 99991)
                + 7919 * self.rm.process_index,
                learnable_labels=getattr(rp, "synthetic_learnable", False),
            )
        if kind in (DataReaderType_t.Raw, DataReaderType_t.RawAsync):
            # Fused upload (default): the reader yields undecoded [B, W]
            # int32 rows; ONE device_put per batch and the split_3_way
            # decode runs inside the jitted step (reference runs it on
            # device too — multi_hot/split_batch.cu). i64 keys need the
            # host-side fold, so they keep per-feature decode.
            fused = (
                os.environ.get("HCTR_TPU_FUSED_H2D", "1") != "0"
                and not self.solver.i64_input_key
            )
            # Raw rows carry labels/dense as ints unless float_label_dense
            # (or AsyncParam.is_dense_float for the multi-hot reader)
            # prefer the native threaded IO core (AsyncDataReader analog)
            from ..data.native_reader import NativeRawReader, native_available

            # AsyncParam tuning (reference: AsyncParam pybind class):
            # num_threads -> fill threads, num_batches_per_thread -> ring
            # queue depth; is_dense_float mirrors float_label_dense
            ap = rp.async_param
            n_threads = getattr(ap, "num_threads", rp.num_workers) or rp.num_workers
            q_depth = (
                max(getattr(ap, "num_batches_per_thread", 6) or 6, 2)
                if ap is not None
                else 6
            )
            dense_float = rp.float_label_dense or bool(
                ap is not None
                and getattr(ap, "is_dense_float", False)
                and getattr(ap, "multi_hot_reader", True)
            )
            self._fused_float = dense_float
            if native_available():
                try:
                    return NativeRawReader(
                        src,
                        spec,
                        num_samples=rp.num_samples if train else rp.eval_num_samples,
                        float_label_dense=dense_float,
                        repeat=self.solver.repeat_dataset if train else False,
                        n_threads=n_threads,
                        queue_depth=q_depth,
                        process_index=self.rm.process_index,
                        num_processes=self.rm.num_processes,
                        fused=fused,
                    )
                except RuntimeError as e:
                    logger.warning(f"native raw reader unavailable: {e}")
            # AsyncParam.shuffle -> batch-order shuffling;
            # read_file_sequentially pins it off (reference:
            # DataReaderParams.read_file_sequentially)
            shuf = bool(
                train
                and ap is not None
                and getattr(ap, "shuffle", False)
                and not rp.read_file_sequentially
            )
            return RawReader(
                src,
                spec,
                num_samples=rp.num_samples if train else rp.eval_num_samples,
                float_label_dense=dense_float,
                drop_incomplete=self.solver.drop_incomplete_batch,
                repeat=self.solver.repeat_dataset if train else False,
                shuffle=shuf,
                seed=self.solver.seed or 0,
                process_index=self.rm.process_index,
                num_processes=self.rm.num_processes,
                fused=fused,
            )
        if kind == DataReaderType_t.Parquet:
            from ..data.reader import AsyncParquetReader

            cls = (
                ParquetReader
                if os.environ.get("HCTR_TPU_SYNC_PARQUET")
                else AsyncParquetReader
            )
            kw = {}
            if cls is AsyncParquetReader:
                kw["n_threads"] = max(rp.num_workers, 1)
            # Parquet fused rows always carry labels/dense as f32 bits
            kw["fused"] = (
                os.environ.get("HCTR_TPU_FUSED_H2D", "1") != "0"
                and not self.solver.i64_input_key
            )
            self._fused_float = True
            return cls(
                src,
                spec,
                repeat=self.solver.repeat_dataset if train else False,
                drop_incomplete=self.solver.drop_incomplete_batch,
                process_index=self.rm.process_index,
                num_processes=self.rm.num_processes,
                **kw,
            )
        if kind == DataReaderType_t.Norm:
            from ..data.reader import NormReader

            return NormReader(
                src,
                spec,
                repeat=self.solver.repeat_dataset if train else False,
                drop_incomplete=self.solver.drop_incomplete_batch,
                slot_size_array=rp.slot_size_array or None,
                process_index=self.rm.process_index,
                num_processes=self.rm.num_processes,
            )
        raise NotImplementedError(f"reader {kind}")

    def _slot_vocabs(self) -> Dict[str, List[int]]:
        """Per-slot vocab bounds for synthetic key generation."""
        vocabs: Dict[str, List[int]] = {}
        for f in self.batch_spec.sparse:
            vocabs[f.name] = [1000] * f.slot_num
        if self.ec is not None:
            for top, ks in self._key_sources.items():
                t = self.ec.plan.lookups[int(top.rsplit(":", 1)[1])].table
                vocab = int(t.vocabulary_size)
                f = self._sparse_by_name[ks.param_name]
                # locate slot index by column range
                col = 0
                for si, nnz in enumerate(f.slot_nnz):
                    if col == ks.col_begin:
                        vocabs[f.name][si] = max(vocab - ks.key_offset, 2)
                        break
                    col += nnz
        return vocabs

    # ------------------------------------------------------------ step fns
    def _decode_batch(self, batch):
        """Device-side split_3_way (reference: multi_hot/split_batch.cu).

        Fused-upload batches arrive as ONE [B, row_ints] int32 array; the
        label/dense/sparse split, dtype conversion and int-dense log(x+1)
        transform run here, inside the jitted step, exactly mirroring
        RawReader._decode's host semantics. Non-fused batches pass through.
        """
        if FUSED_KEY not in batch:
            return batch
        raw = batch[FUSED_KEY]
        s = self.batch_spec
        # float layout: Raw with float_label_dense, or any Parquet source
        # (its fused rows always carry labels/dense as f32 bit patterns)
        fld = getattr(self, "_fused_float", False)
        b = {}
        off = 0
        for name, dim in zip(s.label_names, s.label_dims):
            col = jax.lax.slice_in_dim(raw, off, off + dim, axis=1)
            b[name] = (
                jax.lax.bitcast_convert_type(col, jnp.float32)
                if fld
                else col.astype(jnp.float32)
            )
            off += dim
        dn = jax.lax.slice_in_dim(raw, off, off + s.dense_dim, axis=1)
        if fld:
            b[s.dense_name] = jax.lax.bitcast_convert_type(dn, jnp.float32)
        else:
            b[s.dense_name] = jnp.log1p(
                jnp.maximum(dn, 0).astype(jnp.float32)
            )
        off += s.dense_dim
        for f in s.sparse:
            b[f.name] = jax.lax.slice_in_dim(
                raw, off, off + f.total_nnz, axis=1
            )
            off += f.total_nnz
        return b

    def _host_decode_batch(self, batch):
        """Numpy mirror of _decode_batch for host-side consumers
        (auto-ucap measurement on the first batch)."""
        if FUSED_KEY not in batch:
            return batch
        raw = np.asarray(batch[FUSED_KEY])
        s = self.batch_spec
        fld = getattr(self, "_fused_float", False)
        b = {}
        off = 0
        for name, dim in zip(s.label_names, s.label_dims):
            lab = raw[:, off : off + dim]
            b[name] = (lab.view(np.float32) if fld else lab).astype(np.float32)
            off += dim
        dn = raw[:, off : off + s.dense_dim]
        b[s.dense_name] = (
            dn.view(np.float32).astype(np.float32)
            if fld
            else np.log1p(np.maximum(dn, 0).astype(np.float32))
        )
        off += s.dense_dim
        for f in s.sparse:
            b[f.name] = raw[:, off : off + f.total_nnz]
            off += f.total_nnz
        return b

    def _feature_keys(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Build per-lookup key arrays from the raw batch (jit-traceable)."""
        out = {}
        for top, ks in self._key_sources.items():
            k = batch[ks.param_name][:, ks.col_begin : ks.col_end]
            if ks.key_offset:
                k = jnp.where(k >= 0, k + ks.key_offset, k)
            out[top] = k
        return out

    def _feature_weights(self, batch) -> Optional[Dict[str, jax.Array]]:
        """Per-key sparse-weight features for weighted lookups (reference
        sp_weight path): sp_weight_name must name a batch feature of shape
        [B, hotness] (e.g. a dense Input block or an extra reader column)."""
        if self.ec is None:
            return None
        names = {
            lk.sp_weight_name
            for lk in self.ec.plan.lookups
            if lk.sp_weight_name
        }
        if not names:
            return None
        out = {}
        for n in names:
            if n not in batch:
                raise KeyError(
                    f"weighted lookup needs feature {n!r} in the batch "
                    "(declare it as an input feature)"
                )
            out[n] = jnp.asarray(batch[n]).astype(jnp.float32)
        return out

    def _user_tensors(self, emb_outs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Per-lookup outputs -> user-level top tensors (2D concat, or 3D
        for legacy SparseEmbedding tops)."""
        tensors = {}
        for user_top, tops in self._user_tops.items():
            if len(tops) == 1:
                t = emb_outs[tops[0]]
            else:
                t = jnp.concatenate([emb_outs[tp] for tp in tops], axis=1)
            if user_top in self._top3d:
                slots, ev = self._top3d[user_top]
                t = t.reshape(t.shape[0], slots, ev)
            tensors[user_top] = t
        return tensors

    def _build_steps(self):
        net = self.network
        ec = self.ec
        s = self.solver
        compute_dtype = s.compute_dtype
        lr_sch = self.lr_sch
        dense_opt = self.dense_opt
        dense_frozen = getattr(self, "_dense_frozen", False)
        emb_frozen = getattr(self, "_emb_frozen", False)
        # component-skip ablations (reference: SKIP_* env flags honored in
        # model_pipeline.cpp:118-147 for per-stage benchmark accounting)
        skip_embedding = bool(os.environ.get("SKIP_EMBEDDING"))
        skip_emb_update = bool(os.environ.get("SKIP_EMBEDDING_UPDATE"))

        def train_step(state, batch, rng=None):
            batch = self._decode_batch(batch)
            step = state["step"] + 1
            ov = state.get("lr_override", jnp.asarray(-1.0, jnp.float32))
            # >= 0: an explicit set_learning_rate(0.0) must freeze updates,
            # not silently re-enable the scheduler
            lr = jnp.where(ov >= 0, ov, lr_sch(step))
            if rng is None:
                # in-graph per-step stream. NOTE: callers that loop
                # train_async without any host-side per-step work must NOT
                # use this path on the CPU backend — fully unthrottled async
                # dispatch lets one virtual device fall >40 s behind and
                # trips XLA's collective-rendezvous timeout (measured);
                # train_async therefore passes an explicit host-split key.
                rng = jax.random.fold_in(state["rng"], step)
            feature_keys = (
                self._feature_keys(batch)
                if ec is not None and not skip_embedding
                else {}
            )
            if ec is not None and skip_embedding:
                b = batch[self.batch_spec.dense_name].shape[0]
                emb_outs = {
                    lm.top_name: jnp.zeros(
                        (b, lm.out_end - lm.out_begin), jnp.float32
                    )
                    for gg in ec.plan.groups
                    for lm in gg.lookups
                }
                # tiered splits: the network consumes the MERGED top
                for m in ec.plan.merges:
                    emb_outs[m.top_name] = emb_outs.pop(m.sub_tops[0])
                    for sub in m.sub_tops[1:]:
                        del emb_outs[sub]
            else:
                emb_outs = (
                    ec.forward(
                        state["emb_tables"], feature_keys,
                        feature_weights=self._feature_weights(batch),
                    )
                    if ec is not None
                    else {}
                )

            def loss_fn(dense_params, emb_outs_in):
                tensors = {
                    n: batch[n]
                    for n in (*self.batch_spec.label_names, self.batch_spec.dense_name)
                }
                tensors.update(self._user_tensors(emb_outs_in))
                ctx = LayerCtx(
                    training=True, compute_dtype=compute_dtype, rng=rng
                )
                loss, (out, new_net_state) = net.forward_with_loss(
                    dense_params, state["net_state"], tensors, ctx
                )
                return loss, new_net_state

            if ec is not None:
                (loss, new_net_state), (dgrads, egrads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(state["dense_params"], emb_outs)
            else:
                (loss, new_net_state), dgrads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state["dense_params"])
                egrads = {}
            if dense_frozen:
                new_dense, new_dopt = state["dense_params"], state["dopt"]
            else:
                new_dense, new_dopt = dense_opt.update(
                    state["dense_params"], state["dopt"], dgrads, lr, step
                )
            new_state = {
                "step": step,
                "lr_override": ov,
                "rng": state["rng"],
                "dense_params": new_dense,
                "net_state": new_net_state,
                "dopt": new_dopt,
            }
            if ec is not None:
                if emb_frozen or skip_embedding or skip_emb_update:
                    new_tables, new_eopt = state["emb_tables"], state["eopt"]
                else:
                    new_tables, new_eopt = ec.backward_and_update(
                        state["emb_tables"],
                        state["eopt"],
                        feature_keys,
                        egrads,
                        lr,
                        step,
                        feature_weights=self._feature_weights(batch),
                    )
                new_state["emb_tables"] = new_tables
                new_state["eopt"] = new_eopt
            return new_state, loss

        def eval_step(state, batch):
            batch = self._decode_batch(batch)
            feature_keys = self._feature_keys(batch) if ec is not None else {}
            emb_outs = (
                ec.forward(
                    state["emb_tables"], feature_keys,
                    feature_weights=self._feature_weights(batch),
                )
                if ec is not None
                else {}
            )
            tensors = {
                n: batch[n]
                for n in (*self.batch_spec.label_names, self.batch_spec.dense_name)
            }
            tensors.update(self._user_tensors(emb_outs))
            ctx = LayerCtx(training=False, compute_dtype=compute_dtype, rng=None)
            loss, (out, _) = net.forward_with_loss(
                state["dense_params"], state["net_state"], tensors, ctx
            )
            preds = net.predictions(out)
            labels = {
                spec.label_name: tensors[spec.label_name] for spec in net.loss_specs
            }
            return loss, preds, labels

        def eval_scan_step(state, stacked):
            # K forwards in ONE dispatch over leading-axis-stacked cached
            # batches: removes the ~6 ms/batch host dispatch+metric overhead
            # measured round-5 (reference analog: the eval pipeline runs all
            # eval batches inside one graph capture, model_pipeline.cpp:475)
            def body(carry, batch):
                loss, preds, labels = eval_step(state, batch)
                return carry, (loss, preds, labels)

            _, (losses, preds, labels) = jax.lax.scan(body, None, stacked)
            return losses, preds, labels

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)
        self._eval_scan_step = jax.jit(eval_scan_step)

    def _build_i64_fold(self) -> Dict[str, list]:
        """Per-sparse-feature column windows for host-side int64 key folding.

        i64_input_key (reference Solver knob, end-to-end i64 keys through
        parser.hpp): device-side key math stays int32 for HBM/ICI
        efficiency, so 64-bit keys fold ON THE HOST while still wide:
        static tables take table-local `k mod vocab` (exact for in-range
        keys, the documented wrap otherwise); dynamic tables use an EXACT
        host-side i64 -> 31-bit assignment (_i64_exact_fold) so two
        distinct 64-bit keys can never share a row (reference
        DynamicEmbeddingTable is exact for i64,
        embedding_storage/dynamic_embedding.cu)."""
        fold: Dict[str, list] = {}
        if self.ec is None:
            return fold
        for top, ks in self._key_sources.items():
            # use the ORIGINAL lookup's table: after a hot/cold split,
            # group_of_lookup would resolve to the hot sub-table and fold
            # every key into the hot window
            t = self.ec.plan.lookups[int(top.rsplit(":", 1)[1])].table
            fold.setdefault(ks.param_name, []).append(
                (
                    ks.col_begin,
                    ks.col_end,
                    int(t.vocabulary_size) - ks.key_offset,
                    bool(t.is_dynamic),
                    t.name.split("::", 1)[0],
                )
            )
        return fold

    def _mc_sync_feed(self) -> bool:
        """True when batches must be folded on the CONSUMING thread.

        Exact i64 assignment under multi-controller issues a host collective
        per dynamic-table window per batch (_mc_union_missing); collective
        order must match across processes, which only the user-program order
        guarantees — prefetch threads could interleave train/eval collectives
        differently per process. So this mode trades feeder overlap for
        exactness (reference keeps exactness at full rate because its
        dynamic table is device-resident per GPU; here keys fold host-side)."""
        if self.rm.num_processes <= 1 or not self.solver.i64_input_key:
            return False
        if not getattr(self, "_i64_fold", None):
            self._i64_fold = self._build_i64_fold()
        return any(
            dyn
            for ws in self._i64_fold.values()
            for (_lo, _hi, _mod, dyn, _t) in ws
        )

    @staticmethod
    def _splitmix31(w: np.ndarray) -> np.ndarray:
        """64 -> 31-bit mix (probe start for the exact fold); never emits
        the key store's EMPTY sentinel 2^31-1."""
        m = w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        f = ((m >> np.uint64(33)) & np.uint64(0x7FFFFFFF)).astype(np.int64)
        return np.where(f == 2**31 - 1, 0, f)

    def _i64_exact_fold(self, tname: str, w: np.ndarray) -> np.ndarray:
        """EXACT i64 -> int31 key assignment for one dynamic table.

        A host-side open-addressed map (splitmix start, linear probe) hands
        every distinct 64-bit key its own 31-bit id — unlike plain hash
        folding, two distinct i64 keys can never alias (the round-3
        exactness gap: >50% chance of an aliased pair beyond ~55k keys).
        The map persists in snapshots (i64_fold_maps.npz) so assignments
        survive checkpoint/restore. Negative keys are padding (handled by
        the caller)."""
        maps = getattr(self, "_i64_maps", None)
        if maps is None:
            maps = self._i64_maps = {}
            self._i64_rev = {}
        m = maps.setdefault(tname, {})
        rev = self._i64_rev.setdefault(tname, {})
        uq = np.unique(w[w >= 0])
        missing = [k for k in uq.tolist() if k not in m]
        if getattr(getattr(self, "rm", None), "num_processes", 1) > 1:
            # EXACT multi-controller assignment: every process contributes
            # its batch shard's new keys, each inserts the sorted UNION with
            # the same deterministic probe — maps stay bit-identical by
            # induction (they start identical: empty or restored from the
            # master-written snapshot). The collective runs EVERY batch
            # (even with no new keys anywhere) so call order matches;
            # _mc_sync_feed() disables prefetch threads in this mode so the
            # consuming thread issues these collectives in program order.
            # Reference exactness analog: dynamic_embedding.cu's
            # DynamicEmbeddingTable is exact for i64 in every deployment.
            missing = self._mc_union_missing(missing)
            missing = [k for k in missing if k not in m]
        if missing:
            # serialized assignment: train and eval DeviceFeeder threads
            # fold concurrently, and an unlocked check-then-set on `rev`
            # could hand the same int31 id to two DISTINCT i64 keys —
            # exactly the aliasing this map exists to eliminate
            import threading

            lock = getattr(self, "_i64_lock", None)
            if lock is None:
                lock = self._i64_lock = threading.Lock()
            with lock:
                for k, c0 in zip(missing, self._splitmix31(np.asarray(missing))):
                    if k in m:  # another thread placed it meanwhile
                        continue
                    c = int(c0)
                    while True:
                        owner = rev.get(c)
                        if owner is None:
                            m[k] = c
                            rev[c] = k
                            break
                        if owner == k:
                            break
                        c += 1
                        if c >= 2**31 - 1:  # skip the EMPTY sentinel, wrap
                            c = 0
        flat = w.reshape(-1)
        neg = flat < 0
        uq2, inv = np.unique(np.where(neg, 0, flat), return_inverse=True)
        # (uq2 keys are always present in m here: single-controller inserts
        # every local unique; multi-controller inserts the union, a superset)
        lut = np.fromiter(
            (m.get(int(k), 0) for k in uq2), np.int32, len(uq2)
        )
        out = lut[inv]
        return np.where(neg, np.int32(INVALID_KEY), out).reshape(w.shape)

    def _mc_union_missing(self, missing) -> list:
        """Sorted union of every process's new i64 keys (host collective).

        Two rounds: allgather per-process counts, then pad-to-max and
        allgather the key arrays (skipped when no process has new keys —
        the common steady-state, so the per-batch cost is ONE tiny
        collective). Every process participates unconditionally; call sites
        must execute in identical program order on all controllers."""
        from jax.experimental import multihost_utils

        n = np.asarray([len(missing)], np.int32)
        counts = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
        mx = int(counts.max())
        if mx == 0:
            return []
        pad = np.full((mx,), -1, np.int64)
        if missing:
            pad[: len(missing)] = np.asarray(missing, np.int64)
        # allgather rides jnp arrays, which TRUNCATE int64 to int32 without
        # jax_enable_x64 — ship each key as (lo, hi) int32 halves instead
        lo = (pad & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        hi = (pad >> 32).astype(np.int64).astype(np.int32)
        both = np.stack([lo, hi], axis=1)
        allk = np.asarray(multihost_utils.process_allgather(both))
        allk = allk.reshape(-1, 2)
        keys = (allk[:, 1].astype(np.int64) << 32) | (
            allk[:, 0].view(np.uint32).astype(np.int64)
        )
        return np.unique(keys[keys >= 0]).tolist()

    def _fold_i64_keys(self, batch):
        if not getattr(self, "_i64_fold", None):
            self._i64_fold = self._build_i64_fold()
        out = dict(batch)
        for name, windows in self._i64_fold.items():
            if name not in out:
                continue
            k = np.asarray(out[name])
            if k.dtype != np.int64:
                continue
            k32 = np.empty(k.shape, np.int32)
            for lo, hi, modulo, dynamic, tname in windows:
                w = k[:, lo:hi]
                neg = w < 0
                if dynamic:
                    # exact in EVERY deployment mode: multi-controller runs
                    # union-sync the assignment (see _mc_union_missing)
                    k32[:, lo:hi] = self._i64_exact_fold(tname, w)
                    continue
                f = (w % max(modulo, 1)).astype(np.int32)
                k32[:, lo:hi] = np.where(neg, np.int32(INVALID_KEY), f)
            out[name] = k32
        return out

    def _i64_fold_maps_arrays(self) -> Dict[str, np.ndarray]:
        """{<table>.orig / <table>.fold} arrays for snapshot persistence."""
        arrays: Dict[str, np.ndarray] = {}
        for tname, m in getattr(self, "_i64_maps", {}).items():
            if not m:
                continue
            arrays[f"{tname}.orig"] = np.fromiter(
                m.keys(), np.int64, len(m)
            )
            arrays[f"{tname}.fold"] = np.fromiter(
                m.values(), np.int32, len(m)
            )
        return arrays

    def _restore_i64_fold_maps(self, arrays) -> None:
        self._i64_maps = {}
        self._i64_rev = {}
        names = {k.rsplit(".", 1)[0] for k in arrays.keys()}
        for tname in names:
            orig = np.asarray(arrays[f"{tname}.orig"])
            fold = np.asarray(arrays[f"{tname}.fold"])
            self._i64_maps[tname] = dict(
                zip(orig.tolist(), fold.tolist())
            )
            self._i64_rev[tname] = dict(
                zip(fold.tolist(), orig.tolist())
            )

    def _maybe_auto_ucap(self, host_batch) -> None:
        """First-batch hook for HCTR_TPU_UCAP_FACTOR=auto: measure per-group
        unique-row counts on the first real batch (host-side) so the jitted
        step (traced right after) compiles with measured compaction
        windows."""
        if (
            self.ec is None
            or not self.ec.knob_ucap_auto
            or self.ec.ucap_measured
        ):
            return
        host_batch = self._host_decode_batch(host_batch)
        b = (
            self._fold_i64_keys(host_batch)
            if self.solver.i64_input_key
            else host_batch
        )
        fk = {
            k: np.asarray(v) for k, v in self._feature_keys(b).items()
        }
        self.ec.auto_unique_caps(fk)

    def _check_keys_in_range(self, batch) -> None:
        """Opt-in (HCTR_TPU_CHECK_KEYS=1) host-side out-of-range key
        assertion: static-table keys must satisfy 0 <= k < vocab. Off the
        hot path by default — the engine's documented behavior is to wrap
        (k % vocab), which masks dataset/config bugs the reference would
        surface as corrupt lookups (reference diagnostics analog:
        Model::check_overflow, model.cpp:1251-1258)."""
        if not getattr(self, "_i64_fold", None):
            self._i64_fold = self._build_i64_fold()
        b = self._host_decode_batch(batch)
        for name, windows in self._i64_fold.items():
            if name not in b:
                continue
            k = np.asarray(b[name])
            for lo, hi, modulo, dynamic, tname in windows:
                if dynamic:
                    continue  # any key is a valid dynamic-table key
                w = k[:, lo:hi]
                bad = w[(w >= modulo)]
                if bad.size:
                    raise ValueError(
                        f"HCTR_TPU_CHECK_KEYS: feature {name!r} cols "
                        f"[{lo},{hi}) has key {int(bad.max())} >= vocab "
                        f"bound {modulo} of table {tname!r} (keys must be "
                        "table-local; the engine would silently wrap)"
                    )
                # negative keys other than the -1 padding sentinel would
                # silently wrap through Python-style % too
                neg = w[(w < 0) & (w != INVALID_KEY)]
                if neg.size:
                    raise ValueError(
                        f"HCTR_TPU_CHECK_KEYS: feature {name!r} cols "
                        f"[{lo},{hi}) has negative key {int(neg.min())} "
                        f"(only -1 padding is valid) for table {tname!r}"
                    )

    def _put_batch(self, batch) -> Dict[str, jax.Array]:
        batch.pop(ROWS_KEY, None)  # host-only tail-batch annotation
        if getattr(self, "_check_keys", False):
            self._check_keys_in_range(batch)
        self._maybe_auto_ucap(batch)
        if self.solver.i64_input_key:
            batch = self._fold_i64_keys(batch)
        sh = self.rm.batch_sharding()
        if self.rm.num_processes > 1:
            # multi-controller: every process supplies ITS batch shard; the
            # readers were built with the per-process local batch size
            # (reference analog: per-node reader workers feeding local GPUs)
            return {
                k: jax.make_array_from_process_local_data(sh, v)
                for k, v in batch.items()
            }
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    # ------------------------------------------------------------ training
    def start_data_reading(self):
        if self._train_iter is not None:
            return
        # Device-resident batch cache: synthetic datasets (and any reader
        # with cache_train_data set) are uploaded once and cycled, removing
        # per-step H2D transfer (reference analog: cache_eval_data +
        # repeat_dataset over a small dataset).
        cache_n = getattr(self.reader_params, "cache_train_data", 0)
        if not cache_n and isinstance(self.train_reader, SyntheticReader):
            cache_n = self.train_reader.num_batches
        if cache_n:
            import itertools

            it = iter(self.train_reader)
            batches = [self._put_batch(next(it)) for _ in range(cache_n)]
            self._train_iter = itertools.cycle(batches)
            self._train_feeder = None
        else:
            # tail-batch sample counts ride alongside the device feed in a
            # FIFO (DeviceFeeder preserves order): read_a_batch pops one per
            # consumed batch to report the ACTUAL read count
            import collections

            self._train_rows_fifo = collections.deque()

            def put_train(b):
                rows = b.get(ROWS_KEY)
                self._train_rows_fifo.append(
                    int(rows) if rows is not None else 0
                )
                return self._put_batch(b)

            if self._mc_sync_feed():
                self._train_iter = iter(map(put_train, iter(self.train_reader)))
                self._train_feeder = None
            else:
                feeder = DeviceFeeder(self.train_reader, put_train, depth=3)
                self._train_iter = iter(feeder)
                self._train_feeder = feeder

    def train(self) -> float:
        """One training iteration; returns loss (blocking read)."""
        return float(self.train_async())

    def train_async(self) -> jax.Array:
        """One training iteration without host sync; returns the device loss.

        The reference overlaps iterations via prefetch streams
        (model_pipeline.cpp:371-418); here async dispatch + the DeviceFeeder
        keep the accelerator busy as long as the host never blocks.
        """
        self.start_data_reading()
        staged = getattr(self, "_staged_train_batch", None)
        if staged is not None:
            # consume the batch staged by read_a_batch (reference low-level
            # pattern: read_a_batch_to_device() then train())
            batch = staged
            self._staged_train_batch = None
        else:
            try:
                batch = next(self._train_iter)
                fifo = getattr(self, "_train_rows_fifo", None)
                if fifo:
                    fifo.popleft()  # keep tail-count FIFO aligned
            except StopIteration:
                # non-repeating source exhausted (reference: IDataReader EOF;
                # observable via get_data_reader_train().is_eof(), reset with
                # set_source)
                self._train_eof = True
                raise
        # host-side split doubles as a dispatch throttle: the tiny per-step
        # host work keeps the async queue short enough that no device
        # straggles past XLA's collective-rendezvous timeout (CPU backend)
        self._rng, sub = jax.random.split(self._rng)
        self.state, loss = self._train_step(self.state, batch, sub)
        self._iter += 1
        self._last_loss = loss
        return loss

    def _eval_batches(self):
        """Eval batch source; honors cache_eval_data (reference Solver knob)
        and caches synthetic eval sets on device."""
        cache_n = getattr(self.reader_params, "cache_eval_data", 0)
        if not cache_n and isinstance(self.eval_reader, SyntheticReader):
            cache_n = min(self.eval_reader.num_batches, self.solver.max_eval_batches)
        if cache_n:
            stacked, k_built = getattr(self, "_eval_cache_stacked", (None, 0))
            if not getattr(self, "_eval_cache", None) and stacked is not None:
                # the scanned path freed the per-batch copies; reconstruct
                # them from stacked slices for the per-batch fallback
                self._eval_cache = [
                    {name: stacked[name][i] for name in stacked}
                    for i in range(k_built)
                ]
            if getattr(self, "_eval_cache", None) is None:
                it = iter(self.eval_reader)
                self._eval_cache = [
                    self._put_batch(next(it)) for _ in range(cache_n)
                ]
            if (
                self.solver.repeat_dataset
                and len(self._eval_cache) < self.solver.max_eval_batches
            ):
                # repeating dataset smaller than the eval sweep: cycle the
                # cached device batches so eval() covers the FULL
                # max_eval_batches window (reference semantics: eval always
                # runs max_eval_batches when the source repeats)
                import itertools

                return (
                    itertools.islice(
                        itertools.cycle(self._eval_cache),
                        self.solver.max_eval_batches,
                    ),
                    None,
                )
            return self._eval_cache, None
        if self._mc_sync_feed():
            class _SyncFeed:
                def __init__(s, it):
                    s._it = it

                def __iter__(s):
                    return s._it

                def stop(s):
                    pass

            sf = _SyncFeed(map(self._put_batch, iter(self.eval_reader)))
            return sf, sf
        feeder = DeviceFeeder(self.eval_reader, self._put_batch, depth=3)
        return feeder, feeder

    def _eval_scanned(self, cache) -> Dict[str, float]:
        """Scanned eval over the device batch cache: chunks of K cached
        batches run as ONE jitted lax.scan dispatch with bulk metric writes
        (measured round-5: the per-batch path pays ~6 ms/batch of host
        dispatch + metric-update overhead on top of a 33.8 ms forward)."""
        total = self.solver.max_eval_batches
        stacked, k = getattr(self, "_eval_cache_stacked", (None, 0))
        if stacked is None:
            k = min(len(cache), total)
            stacked = {
                name: jnp.stack([b[name] for b in cache[:k]])
                for name in cache[0]
            }
            self._eval_cache_stacked = (stacked, k)
            # free the per-batch device copies — keeping both doubled the
            # standing eval-cache HBM; _eval_batches reconstructs them from
            # stacked slices if the per-batch path is ever re-engaged
            self._eval_cache = []
        if not self.solver.repeat_dataset:
            total = min(total, k)
        spec0 = self.network.loss_specs[0]
        n = 0
        while n < total:
            cnt = min(k, total - n)
            # cycled chunks RECOMPUTE the same K forwards on purpose: the
            # cached batches stand in for distinct eval data, so reusing
            # one chunk's outputs would inflate the measured eval
            # throughput ~total/k times (real eval sets never cycle — the
            # reader-fed path has distinct batches throughout)
            losses, preds, labels = self._eval_scan_step(self.state, stacked)
            self.metrics.update_batches(
                preds[spec0.label_name], labels[spec0.label_name], cnt,
                losses=losses,
            )
            for name, acc in self._task_metrics.items():
                acc.update_batches(preds[name], labels[name], cnt)
            n += cnt
        vals = self.metrics.finalize()
        for name, acc in self._task_metrics.items():
            for m, v in acc.finalize().items():
                vals[f"{m}_{name}"] = v
        self._last_eval_metrics = vals
        return vals

    def eval(self) -> Dict[str, float]:
        """Full evaluation pass over max_eval_batches; returns metric dict."""
        self.metrics.reset()
        for acc in self._task_metrics.values():
            acc.reset()
        self._eval_feed_started = True
        # scanned eval only off the CPU multi-device emulation: a K-batch
        # scan packs K x (all_gather ...) into one dispatch, and the CPU
        # backend's 40 s per-collective thread rendezvous can straggle under
        # host load (observed as a fatal rendezvous abort in CI) — real TPU
        # meshes and single-device runs have no such fragility
        scan_ok = (
            self.rm.data_parallel_size == 1
            or jax.devices()[0].platform != "cpu"
        ) and os.environ.get("HCTR_TPU_EVAL_SCAN", "1") != "0"
        if scan_ok and getattr(self, "_eval_cache_stacked", (None, 0))[0] is not None:
            return self._eval_scanned(None)  # stacked cache already owns eval
        source, feeder = self._eval_batches()
        cache = getattr(self, "_eval_cache", None)
        if feeder is None and cache and scan_ok:
            return self._eval_scanned(cache)
        n = 0
        exhausted = True  # flipped off when max_eval_batches stops us first
        for batch in source:
            if n >= self.solver.max_eval_batches:
                if feeder:
                    feeder.stop()
                exhausted = False
                break
            loss, preds, labels = self._eval_step(self.state, batch)
            spec = self.network.loss_specs[0]
            # device loss accumulates lazily — a float(loss) here would
            # host-sync every eval batch and serialize the dispatch queue
            self.metrics.update(
                preds[spec.label_name], labels[spec.label_name], loss=loss
            )
            for name, acc in self._task_metrics.items():
                acc.update(preds[name], labels[name])
            n += 1
        # non-repeating eval source ran dry before max_eval_batches
        # (reference: DataReader::is_eof on the eval reader). Cached/
        # synthetic sources are finite views of repeating data — not EOF.
        if exhausted and feeder is not None:
            self._eval_eof = True
        vals = self.metrics.finalize()
        for name, acc in self._task_metrics.items():
            for m, v in acc.finalize().items():
                vals[f"{m}_{name}"] = v
        self._last_eval_metrics = vals
        return vals

    def fit(
        self,
        num_epochs: int = 0,
        max_iter: int = 1000,
        display: int = 200,
        eval_interval: int = 1000,
        snapshot: int = 0,
        snapshot_prefix: str = "./snapshot",
    ) -> None:
        """Iteration-mode training loop (reference: Model::fit,
        src/pybind/model.cpp:862-1009). Epoch mode: num_epochs>0 runs
        epochs over the train reader instead of max_iter."""
        if not self._compiled:
            raise RuntimeError("call compile() first")
        for cb in self.callbacks:
            cb.on_training_start(self)
        self.start_data_reading()
        t0 = time.time()
        window_t0, window_iter = t0, 0
        if num_epochs > 0:
            max_iter = num_epochs * max(self.train_reader.num_batches, 1)
        if self.solver.perf_logging:
            self._perf_log("init_start")
            self._perf_log("run_start")
        stop = False
        for it in range(1, max_iter + 1):
            loss_dev = self.train_async()
            if display and it % display == 0:
                loss = float(loss_dev)  # single host sync per display window
                if not np.isfinite(loss):
                    raise RuntimeError(
                        f"NaN/Inf loss at iter {it} — aborting training "
                        "(reference: NaN guard, model.cpp:789-793)"
                    )
                dt = time.time() - window_t0
                ips = (it - window_iter) * self.solver.batchsize / max(dt, 1e-9)
                logger.info(
                    f"Iter: {it} Time: {dt:.3f}s Loss: {loss:.6f} "
                    f"lr: {self.lr_sch.get_next(it):.6f} ({ips:,.0f} ex/s)"
                )
                window_t0, window_iter = time.time(), it
            if eval_interval and it % eval_interval == 0:
                for cb in self.callbacks:
                    cb.on_eval_start(self, it)
                if self.solver.perf_logging:
                    self._perf_log("eval_start", iteration=it)
                vals = self.eval()
                if self.solver.perf_logging:
                    self._perf_log("eval_accuracy", iteration=it, **vals)
                logger.info(f"Evaluation at iter {it}: {vals}")
                for cb in self.callbacks:
                    stop = cb.on_eval_end(self, it, vals) or stop
                if self.metrics.check_earlystop(vals):
                    logger.info(
                        f"Hit target metric at iter {it}: {vals} — early stop"
                    )
                    stop = True
            if snapshot and it % snapshot == 0:
                self.download_params_to_files(snapshot_prefix, it)
            if stop:
                break
        for cb in self.callbacks:
            cb.on_training_end(self, self._iter)
        if self.solver.perf_logging:
            self._perf_log("run_stop", iteration=self._iter)
        total = time.time() - t0
        logger.info(
            f"fit done: {self._iter} iters in {total:.1f}s "
            f"({self._iter * self.solver.batchsize / max(total, 1e-9):,.0f} ex/s)"
        )

    # ----------------------------------------------------------- persistence
    def download_params_to_files(self, prefix: str, iteration: int) -> None:
        """Dump dense weights + opt states + per-table sparse models
        (reference: Model::download_params_to_files, model.cpp:1236-1328).
        `prefix` may carry a remote scheme (hdfs://, s3://, gs://) — all
        snapshot IO routes through io.filesystem (reference: fs-agnostic
        EmbeddingParameterIO, weight_io/fs_interface.cpp)."""
        out_dir = f"{prefix}_iter{iteration}"
        write = self.rm.is_master_process()  # all processes compute the
        # replicated exports; only process 0 touches the filesystem
        if write:
            iofs.makedirs(out_dir)
        flat = {}

        def _flatten(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _flatten(v, f"{prefix}{k}/")
            else:
                flat[prefix[:-1]] = np.asarray(tree)

        _flatten(self.state["dense_params"], "dense/")
        _flatten(self.state["dopt"], "dopt/")
        _flatten(self.state["net_state"], "net_state/")
        if write:
            iofs.save_npz(os.path.join(out_dir, "dense_model.npz"), **flat)
        if self.ec is not None and "eopt" in self.state:
            edir = os.path.join(out_dir, "emb_opt_states")
            if write:
                iofs.makedirs(edir)
            rep = jax.jit(
                lambda x: x, out_shardings=self.rm.replicated_sharding()
            )
            for gname, st in self.state["eopt"].items():
                for slot, arr in st.items():
                    host = np.asarray(rep(arr))
                    if write:
                        iofs.save_npy(
                            os.path.join(edir, f"{gname}.{slot}.npy"), host
                        )
        if self.ec is not None:
            for g in self.ec.plan.groups:
                for t in g.tables:
                    tdir = os.path.join(out_dir, f"sparse_{t.name}")
                    arr = self.ec.export_table(self.state["emb_tables"], t.name)
                    if write:
                        iofs.makedirs(tdir)
                        iofs.save_npy(os.path.join(tdir, "emb_vector.npy"), arr)
            # hot/cold-split tables: ALSO save the merged user-level view so
            # downstream consumers (hugectr2onnx, reference-format loaders)
            # see one [vocab, ev] table per configured name
            for user_name in self.ec.plan.table_splits:
                tdir = os.path.join(out_dir, f"sparse_{user_name}")
                arr = self.ec.export_table(self.state["emb_tables"], user_name)
                if write:
                    iofs.makedirs(tdir)
                    iofs.save_npy(os.path.join(tdir, "emb_vector.npy"), arr)
            # packed table+state groups: persist the full packed array so
            # the accum columns survive (eopt is empty for these groups)
            for name, arr in self.state["emb_tables"].items():
                if name in getattr(self.ec, "packed_groups", ()):
                    host = np.asarray(
                        jax.jit(
                            lambda x: x,
                            out_shardings=self.rm.replicated_sharding(),
                        )(arr)
                    )
                    if write:
                        iofs.save_npy(
                            os.path.join(out_dir, f"packed_{name}.npy"), host
                        )
            # dynamic-table key stores (exact key -> slot assignments)
            for name, arr in self.state["emb_tables"].items():
                if name.endswith("#keys"):
                    host = np.asarray(
                        jax.jit(
                            lambda x: x,
                            out_shardings=self.rm.replicated_sharding(),
                        )(arr)
                    )
                    if write:
                        iofs.save_npy(
                            os.path.join(
                                out_dir, f"keystore_{name.replace('#keys','')}.npy"
                            ),
                            host,
                        )
        # exact i64 -> int31 dynamic-key assignments (meaningless to reload
        # values without them — the device key store holds FOLDED keys)
        fold_maps = self._i64_fold_maps_arrays()
        if write and fold_maps:
            iofs.save_npz(
                os.path.join(out_dir, "i64_fold_maps.npz"), **fold_maps
            )
        if write:
            with iofs.open_file(os.path.join(out_dir, "meta.json"), "w") as f:
                json.dump(
                    {
                        "iteration": iteration,
                        "step": int(self.state["step"]),
                        # physical storage layout stamp: opt states / packed
                        # groups / key stores are saved as RAW storage
                        # arrays, whose row order depends on the per-table
                        # shard rotation — loading across a rotation flip
                        # would silently pair rows with the wrong state
                        "shard_rotation": int(self._rotated_layout()),
                    },
                    f,
                )
            logger.info(f"snapshot written to {out_dir}")

    def _rotated_layout(self) -> bool:
        """Whether the per-table shard rotation actually affects this
        model's physical storage layout (MP groups with >1 shard and a
        nonzero reduced rotation)."""
        if self.ec is None:
            return False
        for g in self.ec.plan.groups:
            if g.is_model_parallel and g.num_shards > 1:
                if any(int(r) % g.num_shards for r in g.table_rotation):
                    return True
        return False

    def load_params_from_files(self, out_dir: str) -> None:
        # layout-stamp check BEFORE touching any raw storage array: a
        # rotation mismatch would silently pair every row with the wrong
        # optimizer state / packed vector (per-table shard rotation moved
        # key->shard placement in round 4)
        meta_path = os.path.join(out_dir, "meta.json")
        if iofs.exists(meta_path):
            with iofs.open_file(meta_path, "r") as f:
                meta = json.load(f)
            saved_rot = int(meta.get("shard_rotation", 0))
            cur_rot = int(self._rotated_layout())
            if saved_rot != cur_rot:
                raise ValueError(
                    f"snapshot {out_dir} was written with shard_rotation="
                    f"{saved_rot} but this model compiled with "
                    f"{cur_rot}: raw storage layouts differ (opt states / "
                    "packed groups / key stores would silently misalign). "
                    "Set HCTR_TPU_SHARD_ROTATION="
                    f"{saved_rot or '0'} before building the model, or "
                    "re-export via embedding_dump (positional per-table "
                    "format, layout-independent)."
                )
        data = iofs.load_npz(os.path.join(out_dir, "dense_model.npz"))

        def _restore(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: _restore(v, f"{prefix}{k}/") for k, v in tree.items()}
            return jnp.asarray(data[prefix[:-1]])

        self.state["dense_params"] = jax.device_put(
            _restore(self.state["dense_params"], "dense/"),
            self.rm.replicated_sharding(),
        )
        self.state["dopt"] = jax.device_put(
            _restore(self.state["dopt"], "dopt/"), self.rm.replicated_sharding()
        )
        self.state["net_state"] = jax.device_put(
            _restore(self.state["net_state"], "net_state/"),
            self.rm.replicated_sharding(),
        )
        if self.ec is not None:
            for g in self.ec.plan.groups:
                for t in g.tables:
                    path = os.path.join(out_dir, f"sparse_{t.name}", "emb_vector.npy")
                    if iofs.exists(path):
                        self.state["emb_tables"] = self.ec.import_table(
                            self.state["emb_tables"], t.name, iofs.load_npy(path)
                        )
        if self.ec is not None:
            for name in list(self.state["emb_tables"]):
                if name in getattr(self.ec, "packed_groups", ()):
                    pth = os.path.join(out_dir, f"packed_{name}.npy")
                    if iofs.exists(pth):
                        self.state["emb_tables"][name] = jax.device_put(
                            jnp.asarray(iofs.load_npy(pth)),
                            self.state["emb_tables"][name].sharding,
                        )
            for name in list(self.state["emb_tables"]):
                if name.endswith("#keys"):
                    p = os.path.join(
                        out_dir, f"keystore_{name.replace('#keys','')}.npy"
                    )
                    if iofs.exists(p):
                        self.state["emb_tables"][name] = jax.device_put(
                            jnp.asarray(iofs.load_npy(p)),
                            self.state["emb_tables"][name].sharding,
                        )
            fmap_path = os.path.join(out_dir, "i64_fold_maps.npz")
            if iofs.exists(fmap_path):
                self._restore_i64_fold_maps(iofs.load_npz(fmap_path))
        edir = os.path.join(out_dir, "emb_opt_states")
        if self.ec is not None and iofs.isdir(edir):
            for gname, st in self.state["eopt"].items():
                for slot in st:
                    fpath = os.path.join(edir, f"{gname}.{slot}.npy")
                    if iofs.exists(fpath):
                        sharding = self.state["eopt"][gname][slot].sharding
                        self.state["eopt"][gname][slot] = jax.device_put(
                            jnp.asarray(iofs.load_npy(fpath)), sharding
                        )
        with iofs.open_file(os.path.join(out_dir, "meta.json"), "r") as f:
            meta = json.load(f)
        self.state["step"] = jnp.asarray(meta.get("step", 0), jnp.int32)
        self._iter = meta.get("iteration", 0)

    # ---------------------------------------- reference-parity persistence
    def save_params_to_files(self, prefix: str, iteration: int = 0) -> None:
        """Reference naming (Model::save_params_to_files, model.cpp) for
        download_params_to_files."""
        self.download_params_to_files(prefix, iteration)

    def _dense_npz(self, path: str) -> Dict[str, np.ndarray]:
        if path.endswith(".npz"):
            return iofs.load_npz(path)
        return iofs.load_npz(os.path.join(path, "dense_model.npz"))

    def load_dense_weights(self, path: str) -> None:
        """Load ONLY dense weights + layer state from a snapshot dir or a
        dense_model.npz (reference: Model::load_dense_weights for resume /
        fine-tune flows)."""
        data = self._dense_npz(path)

        def _restore(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: _restore(v, f"{prefix}{k}/") for k, v in tree.items()}
            return jnp.asarray(data[prefix[:-1]])

        rep = self.rm.replicated_sharding()
        self.state["dense_params"] = jax.device_put(
            _restore(self.state["dense_params"], "dense/"), rep
        )
        self.state["net_state"] = jax.device_put(
            _restore(self.state["net_state"], "net_state/"), rep
        )

    def load_dense_optimizer_states(self, path: str) -> None:
        """Load dense optimizer slots (reference:
        Model::load_dense_optimizer_states)."""
        data = self._dense_npz(path)

        def _restore(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: _restore(v, f"{prefix}{k}/") for k, v in tree.items()}
            return jnp.asarray(data[prefix[:-1]])

        self.state["dopt"] = jax.device_put(
            _restore(self.state["dopt"], "dopt/"),
            self.rm.replicated_sharding(),
        )

    def _sparse_sources(self, paths) -> Dict[str, str]:
        """Normalize load_sparse_* inputs to {table_name: npy path}."""
        if self.ec is None:
            return {}
        names = [t.name for g in self.ec.plan.groups for t in g.tables]
        names += list(self.ec.plan.table_splits)
        out: Dict[str, str] = {}
        if isinstance(paths, str):
            for n in names:
                p = os.path.join(paths, f"sparse_{n}", "emb_vector.npy")
                if iofs.exists(p):
                    out[n] = p
            # hot/cold-split sub-tables duplicate the merged user-level view
            # (snapshots carry both); importing both would write every split
            # table's device buffer twice — keep only the merged one
            for user in self.ec.plan.table_splits:
                if user in out:
                    for sub, _off in self.ec.plan.table_splits[user]:
                        out.pop(sub, None)
            return out
        if isinstance(paths, dict):
            return {k: v for k, v in paths.items()}
        for p in paths:  # list of per-embedding dirs (reference layout)
            base = os.path.basename(p.rstrip("/"))
            name = base[len("sparse_"):] if base.startswith("sparse_") else base
            f = os.path.join(p, "emb_vector.npy")
            out[name] = f if iofs.exists(f) else p
        return out

    def load_sparse_weights(self, sparse_embedding_files) -> None:
        """Load embedding tables from per-table folders / a snapshot dir /
        a {table: path} dict (reference: Model::load_sparse_weights)."""
        for name, path in self._sparse_sources(sparse_embedding_files).items():
            self.state["emb_tables"] = self.ec.import_table(
                self.state["emb_tables"], name, iofs.load_npy(path)
            )
            # per-table key store written by embedding_dump (dynamic tables)
            kpath = os.path.join(os.path.dirname(path), "key_store.npy")
            if iofs.exists(kpath):
                self.state["emb_tables"] = self.ec.import_key_store(
                    self.state["emb_tables"], name, iofs.load_npy(kpath)
                )
        if isinstance(sparse_embedding_files, str):
            # snapshot-dir form: restore whole-group dynamic key stores
            # (keystore_<group>.npy, written by download_params_to_files) so
            # positional values pair with the keys they were dumped under
            for name in list(self.state["emb_tables"]):
                if name.endswith("#keys"):
                    p = os.path.join(
                        sparse_embedding_files,
                        f"keystore_{name.replace('#keys', '')}.npy",
                    )
                    if iofs.exists(p):
                        self.state["emb_tables"][name] = jax.device_put(
                            jnp.asarray(iofs.load_npy(p)),
                            self.state["emb_tables"][name].sharding,
                        )

    def load_sparse_optimizer_states(self, path) -> None:
        """Load sparse optimizer slots from a snapshot dir's
        emb_opt_states/ or a {group.slot: path} dict (reference:
        Model::load_sparse_optimizer_states)."""
        if self.ec is None:
            return
        if isinstance(path, dict):
            items = path.items()
        else:
            edir = path if os.path.basename(
                path.rstrip("/")
            ) == "emb_opt_states" else os.path.join(path, "emb_opt_states")
            items = []
            for gname, st in self.state["eopt"].items():
                for slot in st:
                    p = os.path.join(edir, f"{gname}.{slot}.npy")
                    if iofs.exists(p):
                        items.append((f"{gname}.{slot}", p))
        for key, p in items:
            gname, slot = key.rsplit(".", 1)
            sharding = self.state["eopt"][gname][slot].sharding
            self.state["eopt"][gname][slot] = jax.device_put(
                jnp.asarray(iofs.load_npy(p)), sharding
            )

    def embedding_dump(self, dump_path: str, table_names=None) -> None:
        """Structured per-table dump (reference: Model::embedding_dump via
        EmbeddingParameterIO, model.cpp:521-666): writes
        ``{dump_path}/{table}/emb_vector.npy`` (+ key_store.npy for exact
        dynamic tables) for the selected tables."""
        if self.ec is None:
            raise RuntimeError("no embedding collection in this model")
        if table_names is None:
            table_names = [
                t.name
                for g in self.ec.plan.groups
                for t in g.tables
                if "::" not in t.name
            ] + list(self.ec.plan.table_splits)
        write = self.rm.is_master_process()
        for name in table_names:
            arr = self.ec.export_table(self.state["emb_tables"], name)
            ks = self.ec.export_key_store(self.state["emb_tables"], name)
            if write:
                tdir = os.path.join(dump_path, name)
                iofs.makedirs(tdir)
                iofs.save_npy(os.path.join(tdir, "emb_vector.npy"), arr)
                if ks is not None:
                    # dynamic tables: keys are the row alignment — without
                    # them the positional values are meaningless on reload
                    iofs.save_npy(os.path.join(tdir, "key_store.npy"), ks)

    def embedding_load(self, load_path: str, table_names=None) -> None:
        """Load per-table dumps written by embedding_dump (reference:
        Model::embedding_load)."""
        if self.ec is None:
            raise RuntimeError("no embedding collection in this model")
        if table_names is None:
            table_names = [
                d for d in iofs.listdir(load_path)
                if iofs.exists(os.path.join(load_path, d, "emb_vector.npy"))
            ]
        for name in table_names:
            vals = iofs.load_npy(os.path.join(load_path, name, "emb_vector.npy"))
            self.state["emb_tables"] = self.ec.import_table(
                self.state["emb_tables"], name, vals
            )
            kpath = os.path.join(load_path, name, "key_store.npy")
            if iofs.exists(kpath):
                self.state["emb_tables"] = self.ec.import_key_store(
                    self.state["emb_tables"], name, iofs.load_npy(kpath)
                )

    # -------------------------------------------- low-level training API
    def set_learning_rate(self, lr: float) -> None:
        """Explicit LR for subsequent steps (reference low-level API
        Model::set_learning_rate); lr == 0 freezes updates, lr < 0 restores
        the scheduler."""
        self.state["lr_override"] = jnp.asarray(float(lr), jnp.float32)

    def get_learning_rate_scheduler(self):
        """The host-side LearningRateScheduler (reference:
        Model::get_learning_rate_scheduler; use get_next(step))."""
        return self.lr_sch

    def reset_learning_rate_scheduler(
        self, base_lr, warmup_steps=1, decay_start=0, decay_steps=1,
        decay_power=2.0, end_lr=0.0,
    ) -> None:
        """Swap scheduler parameters mid-training (reference:
        Model::reset_learning_rate_scheduler). Rebuilds the jitted steps
        (the schedule is baked into the compiled program)."""
        from ..optim.lr_schedule import LearningRateScheduler

        self.lr_sch = LearningRateScheduler(
            base_lr, warmup_steps, decay_start, decay_steps, decay_power,
            end_lr,
        )
        self._build_steps()

    def get_current_loss(self) -> float:
        """Loss of the most recent train() call (reference:
        Model::get_current_loss)."""
        loss = getattr(self, "_last_loss", None)
        return float(loss) if loss is not None else 0.0

    def get_eval_metrics(self):
        """Metrics of the most recent eval() (reference:
        Model::get_eval_metrics)."""
        return dict(getattr(self, "_last_eval_metrics", {}))

    def get_data_reader_train(self):
        """Low-level reader handle with set_source/is_eof (reference:
        Model::get_data_reader_train, python_interface.md DataReader)."""
        return _DataReaderHandle(self, train=True)

    def get_data_reader_eval(self):
        return _DataReaderHandle(self, train=False)

    def set_source(self, source=None, eval_source: str = "") -> None:
        """Swap dataset sources mid-run (reference: Model::set_source —
        epoch-mode flows re-point the readers between epochs). Rebuilds the
        affected readers; training continues from the current state."""
        dsp = getattr(self.reader_params, "data_source_params", None)
        mk = dsp.make_uri if dsp is not None else (lambda s: s)
        if source is not None:
            # apply the same remote-FS prefixing as the constructor path
            # (DataReaderParams.__post_init__)
            self.reader_params.source = (
                [mk(source)] if isinstance(source, str)
                else [mk(s) for s in source]
            )
            self.train_reader = self._make_reader(train=True)
            if getattr(self, "_train_feeder", None) is not None:
                self._train_feeder.stop()
            self._train_iter = None
            self._train_feeder = None
            self._train_eof = False
        if eval_source:
            self.reader_params.eval_source = mk(eval_source)
            self.eval_reader = self._make_reader(train=False)
            self._eval_cache = None
            self._eval_cache_stacked = (None, 0)
            self._eval_eof = False

    def update_label_weights(self, label_names, label_weights) -> None:
        """Change multi-task label weights mid-training (reference:
        Model::update_label_weights, model.hpp). Re-jits the step functions
        — the weights are trace-time constants in the compiled program."""
        if len(label_names) != len(label_weights):
            raise ValueError("label_names and label_weights length mismatch")
        w = dict(zip(label_names, (float(x) for x in label_weights)))
        missing = [n for n in w if n not in {
            s.label_name for s in self.network.loss_specs
        }]
        if missing:
            raise ValueError(f"unknown label names: {missing}")
        for spec in self.network.loss_specs:
            if spec.label_name in w:
                spec.weight = w[spec.label_name]
        self.network.label_weights.update(w)
        if self.input is not None:
            self.input.label_weights = dict(self.network.label_weights)
        self._build_steps()

    def get_params_num(self) -> int:
        """Total trainable parameter count: dense leaves + embedding rows
        (reference: Model::get_params_num, model.hpp)."""
        n = sum(
            int(np.prod(x.shape))
            for x in jax.tree.leaves(self.state["dense_params"])
        )
        if self.ec is not None:
            for g in self.ec.plan.groups:
                # split sub-tables partition their merged table's vocab, so
                # summing per-table vocab counts each logical row once
                for ti in range(len(g.tables)):
                    n += int(g.table_vocab[ti]) * g.ev_size
        return n

    def copy_weights_for_evaluation(self) -> None:
        """No-op for parity (reference: copy_weights_from_train_layers_to
        _evaluate_layers — here train and eval share ONE parameter state, so
        evaluation always sees the latest weights)."""

    def read_a_batch(self, is_train: bool = True) -> bool:
        """Stage the next batch without training on it (reference:
        Model::read_a_batch low-level flow — the staged batch is what the
        next train() consumes); returns False once a non-repeating source
        is exhausted."""
        if is_train:
            self.start_data_reading()
            if getattr(self, "_staged_train_batch", None) is not None:
                logger.warning(
                    "read_a_batch: overwriting a staged train batch that "
                    "was never consumed by train()"
                )
            try:
                self._staged_train_batch = next(self._train_iter)
                fifo = getattr(self, "_train_rows_fifo", None)
                self._last_read_rows = fifo.popleft() if fifo else 0
                return True
            except StopIteration:
                self._train_eof = True
                self._staged_train_batch = None
                return False
        self._eval_feed_started = True
        it = getattr(self, "_peek_eval_iter", None)
        if it is None:
            it = self._peek_eval_iter = iter(self.eval_reader)
        try:
            b = next(it)
            rows = b.pop(ROWS_KEY, None) if isinstance(b, dict) else None
            self._last_read_rows = int(rows) if rows is not None else 0
            return True
        except StopIteration:
            self._eval_eof = True
            self._peek_eval_iter = None
            return False

    # -------------------------------------------------------------- utility
    def _perf_log(self, key: str, **kw) -> None:
        """MLPerf-style timeline event (reference: HCTR_LOG_ARGS perf_logging
        events in Model::fit, model.cpp:866-1000)."""
        import time as _time

        payload = {"key": key, "time_ms": int(_time.time() * 1000), **kw}
        logger.info(f":::MLLOG {json.dumps(payload)}")

    def check_overflow(self) -> Dict[str, float]:
        """Embedding health check (reference: Model::check_overflow)."""
        from ..utils.diagnose import check_embedding_overflow

        return check_embedding_overflow(self)

    def summary(self) -> str:
        lines = [
            "=" * 80,
            f"{'Layer Type':<28}{'Input':<26}{'Output':<26}",
            "=" * 80,
        ]
        if self.ec is not None:
            for user_top, tops in self._user_tops.items():
                lines.append(
                    f"{'EmbeddingCollection':<28}{'(sparse keys)':<26}{user_top:<26}"
                )
        for row in self.network.summary_rows():
            lines.append(f"{row[0]:<28}{row[1]:<26}{row[2]:<26}")
        lines.append("=" * 80)
        out = "\n".join(lines)
        logger.info("\n" + out)
        return out

    def graph_to_json(self, path: str) -> None:
        """Serialize the model graph (reference: Model::graph_to_json,
        model.cpp:382-437)."""

        def enc(o):
            if dataclasses.is_dataclass(o) and not isinstance(o, type):
                return dataclasses.asdict(o)
            if isinstance(o, (np.integer, np.floating)):
                return o.item()
            return str(o)

        ebcs = []
        for ebc in self.ebc_configs:
            tables = {}
            lookups = []
            for d in ebc.lookup_decls:
                tables[d.table.name] = {
                    "name": d.table.name,
                    "max_vocabulary_size": d.table.max_vocabulary_size,
                    "ev_size": d.table.ev_size,
                    "dynamic_capacity": d.table.dynamic_capacity,
                }
                lookups.append(
                    {
                        "table": d.table.name,
                        "bottom_name": d.bottom_name,
                        "top_name": d.top_name,
                        "combiner": d.combiner.value,
                    }
                )
            ebcs.append(
                {
                    "tables": list(tables.values()),
                    "lookups": lookups,
                    "shard_matrix": ebc.shard_matrix,
                    "shard_strategy": ebc.shard_strategy,
                }
            )
        graph = {
            "solver": dataclasses.asdict(self.solver),
            "input": dataclasses.asdict(self.input),
            "dense_layers": [dataclasses.asdict(d) for d in self.dense_layers],
            "sparse_embeddings": [
                dataclasses.asdict(se) for se in self.sparse_embeddings
            ],
            "embedding_collections": ebcs,
        }
        with iofs.open_file(path, "w") as f:
            json.dump(graph, f, default=enc, indent=2)

    @classmethod
    def construct_from_json(
        cls,
        graph_path: str,
        reader_params=None,
        optimizer: Optional[OptParams] = None,
        resource_manager: Optional[ResourceManager] = None,
        compile_model: bool = True,
    ) -> "Model":
        """Rebuild a Model from a graph_to_json dump (reference:
        Model::construct_from_json, model.cpp:382-437)."""
        from ..core.config import DataReaderSparseParam
        from ..embedding.config import EmbeddingCollectionConfig
        from ..parallel.plan import EmbeddingTableConfig

        with iofs.open_file(graph_path, "r") as f:
            graph = json.load(f)
        sol = graph["solver"]
        sol["metrics_spec"] = {
            Metric_t(k): v for k, v in sol.get("metrics_spec", {}).items()
        }
        solver = Solver(**sol)
        model = cls(
            solver,
            reader_params,
            optimizer or OptParams(),
            resource_manager=resource_manager,
        )
        inp = dict(graph["input"])
        inp["data_reader_sparse_param_array"] = [
            DataReaderSparseParam(
                top_name=p["top_name"],
                nnz_per_slot=p["nnz_per_slot"],
                is_fixed_length=p.get("is_fixed_length", True),
                slot_num=p["slot_num"],
            )
            for p in inp["data_reader_sparse_param_array"]
        ]
        model.add(Input(**inp))
        for e in graph.get("embedding_collections", []):
            tbls = {
                t["name"]: EmbeddingTableConfig(
                    name=t["name"],
                    max_vocabulary_size=t["max_vocabulary_size"],
                    ev_size=t["ev_size"],
                    dynamic_capacity=t.get("dynamic_capacity", 2**22),
                )
                for t in e["tables"]
            }
            ebc = EmbeddingCollectionConfig()
            for lk in e["lookups"]:
                ebc.embedding_lookup(
                    tbls[lk["table"]],
                    lk["bottom_name"],
                    lk["top_name"],
                    lk["combiner"],
                )
            if e.get("shard_strategy"):
                ebc.shard(
                    shard_matrix=e.get("shard_matrix")
                    or [[t for t in tbls]] * model.rm.num_devices,
                    shard_strategy=[(k, v) for k, v in e["shard_strategy"]],
                )
            model.add(ebc)
        for se in graph.get("sparse_embeddings", []):
            model.add(SparseEmbedding(**se))
        for d in graph["dense_layers"]:
            d = dict(d)
            d.pop("compute_config", None)
            ranges = d.get("ranges")
            if ranges:
                d["ranges"] = [tuple(r) for r in ranges]
            model.add(DenseLayer(**d))
        if compile_model:
            model.compile()
        return model

    # --------------------------------------------------------------- freeze
    def freeze_dense(self) -> None:
        """Stop dense-weight updates (reference: Model::freeze_dense,
        include/pybind/model.hpp:492-517)."""
        self._dense_frozen = True
        self._build_steps()

    def unfreeze_dense(self) -> None:
        self._dense_frozen = False
        self._build_steps()

    def freeze_embedding(self, embedding_name: Optional[str] = None) -> None:
        """Stop sparse updates (reference: Model::freeze_embedding).

        With `embedding_name` only that TABLE freezes (its slots are masked
        out of the backward row list); without, the whole collection."""
        if embedding_name is None:
            self._emb_frozen = True
        else:
            self.ec._find_table(embedding_name)  # validate
            self.ec.frozen_tables.add(embedding_name)
        self._build_steps()

    def unfreeze_embedding(self, embedding_name: Optional[str] = None) -> None:
        if embedding_name is None:
            self._emb_frozen = False
            if self.ec is not None:
                self.ec.frozen_tables.clear()
        else:
            self.ec.frozen_tables.discard(embedding_name)
        self._build_steps()

    def check_out_tensor(self, tensor_name: str, batch=None) -> np.ndarray:
        """Fetch an intermediate activation for one batch (reference:
        Model::check_out_tensor, model.cpp:1461-1505)."""
        if batch is None:
            self.start_data_reading()
            batch = next(self._train_iter)
        batch = self._decode_batch(batch)
        feature_keys = self._feature_keys(batch) if self.ec is not None else {}
        emb_outs = (
            self.ec.forward(
                self.state["emb_tables"], feature_keys,
                feature_weights=self._feature_weights(batch),
            )
            if self.ec is not None
            else {}
        )
        tensors = {
            n: batch[n]
            for n in (*self.batch_spec.label_names, self.batch_spec.dense_name)
        }
        tensors.update(self._user_tensors(emb_outs))
        ctx = LayerCtx(
            training=False, compute_dtype=self.solver.compute_dtype, rng=None
        )
        out, _ = self.network.apply(
            self.state["dense_params"], self.state["net_state"], tensors, ctx
        )
        return np.asarray(out[tensor_name])
