"""SOK-analog: standalone sparse-lookup library for external JAX code.

TPU-native analog of sparse_operation_kit (reference:
sparse_operation_kit/sparse_operation_kit/{distributed_variable.py,
dynamic_variable.py, lookup.py, optimizer.py, dump_load.py}): the reference
plugs HugeCTR's embedding engine into TensorFlow; this module exposes the
same capabilities to any JAX training loop, without the Model API.

Design note on gradients: TF represents sparse embedding grads as
IndexedSlices flowing into OptimizerWrapper. JAX cotangents are dense, so
materializing d(table) through jax.grad would allocate vocab-sized arrays.
Instead `lookup_sparse` is paired with `OptimizerWrapper.apply_gradients`,
which takes the LOOKUP OUTPUT cotangents (cheap, [B, ev]) and performs the
fused sort/dedup/per-row update — the same split the reference uses
(lookup custom grad -> sparse apply, lookup.py:122-682, optimizer.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import ResourceManager, default_resource_manager
from ..core.types import Combiner_t
from ..embedding.collection import EmbeddingCollection
from ..optim.params import OptParams
from ..parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)

__all__ = [
    "init",
    "Variable",
    "DynamicVariable",
    "lookup_sparse",
    "all2all_dense_embedding",
    "OptimizerWrapper",
    "dump",
    "load",
    "incremental_model_dump",
    "filter_variables",
]

_RM: Optional[ResourceManager] = None


def init(resource_manager: Optional[ResourceManager] = None) -> None:
    """Analog of sok.init (sparse_operation_kit/__init__.py:75): bind the
    device mesh. Without arguments uses all visible devices."""
    global _RM
    _RM = resource_manager or default_resource_manager()


def _rm() -> ResourceManager:
    global _RM
    if _RM is None:
        init()
    return _RM


class Variable:
    """Distributed (row-sharded mod-P) embedding table
    (reference: sok.Variable / DistributedVariable, distributed_variable.py).

    A stateful single-table wrapper over a private LookupEngine — the TF
    reference's Variables are stateful resources, so this object owns its
    storage + optimizer state and exposes lookup/apply/assign/to_numpy.
    `mode="localized:<i>"` maps to partial placement with one logical shard
    (the whole table resident per replica group), `"distributed"` to full
    mod-P row sharding."""

    def __init__(
        self,
        rows: int,
        ev: int,
        key: Optional[jax.Array] = None,
        name: str = "sok_var",
        max_hotness: int = 1,
        combiner: str = "sum",
        mode: str = "distributed",  # "distributed" | "localized:<gpu>"
        opt_params: Optional[OptParams] = None,
        rm: Optional[ResourceManager] = None,
        _table_cfg: Optional[EmbeddingTableConfig] = None,
    ):
        from ..core.types import Optimizer_t

        self.name = name
        self.rows = rows
        self.ev = ev
        cfg = _table_cfg or EmbeddingTableConfig(
            name=name, max_vocabulary_size=rows, ev_size=ev
        )
        opt = opt_params or OptParams(Optimizer_t.SGD, lr=1.0)
        self.engine = LookupEngine(
            [cfg], [max_hotness], [combiner], opt, rm=rm,
            shard_counts=(
                {name: 1} if mode.startswith("localized") else None
            ),
        )
        self.tables = self.engine.init(key if key is not None else jax.random.key(0))
        self.opt_state = self.engine.init_optimizer(self.tables)

    @classmethod
    def create(cls, rows: int, ev: int, key: Optional[jax.Array] = None, **kw):
        return cls(rows, ev, key, **kw)

    # ------------------------------------------------------------- compute
    def lookup(self, keys: jax.Array) -> jax.Array:
        """Pooled lookup ([B, hotness] -1-padded keys -> [B, ev])."""
        if keys.ndim == 1:
            keys = keys.reshape(-1, 1)
        return self.engine.lookup(self.tables, [keys])[0]

    def apply_gradients(self, keys, d_out, lr, step: int = 1) -> None:
        if keys.ndim == 1:
            keys = keys.reshape(-1, 1)
        self.tables, self.opt_state = self.engine.apply_gradients(
            self.tables, self.opt_state, [keys], [d_out], lr, step
        )

    # ------------------------------------------------------------------ IO
    def to_numpy(self) -> np.ndarray:
        return self.engine.ec.export_table(self.tables, self._table_name)

    def assign(self, values: np.ndarray) -> None:
        self.tables = self.engine.ec.import_table(
            self.tables, self._table_name, values
        )

    @property
    def _table_name(self) -> str:
        return self.engine.compiled.lookups[0].table.name

    @property
    def shape(self):
        return (self.rows, self.ev)


class DynamicVariable(Variable):
    """Growable exact-key table (reference: sok.DynamicVariable,
    dynamic_variable.py:34-305 with DET/HKV backends). Backed by the
    collection's exact dynamic table: a probed device key store with
    insert-on-backward, collision-free evict, and capacity growth by
    host-side rehash (`reserve`).

    backend="det" (default): every resident key lives in device HBM.
    backend="hkv": host-spill tier — the device store is a fixed-capacity
    WORKING SET while a host-memory master (the HierarchicalKV host-tier
    analog) holds every key ever trained, so the trained vocabulary can
    exceed device HBM. `lookup` stages host rows for the batch's keys into
    the working set (spilling the whole set back to the host master under
    capacity pressure); the backward pass inserts brand-new keys on-device
    exactly as in det mode, and they migrate to the host master at the next
    spill. Staging is host-driven between steps — the compiled-world analog
    of HKV's UVM traffic (third_party HierarchicalKV; dynamic_variable.py
    backend="hkv")."""

    def __init__(
        self,
        dimension: int,
        initial_capacity: int = 2**20,
        key: Optional[jax.Array] = None,
        name: str = "sok_dyn_var",
        max_hotness: int = 1,
        combiner: str = "sum",
        opt_params: Optional[OptParams] = None,
        rm: Optional[ResourceManager] = None,
        mode: str = "distributed",
        backend: str = "det",
        spill_watermark: float = 0.75,
        **kw,
    ):
        if kw:
            raise TypeError(f"DynamicVariable: unknown arguments {sorted(kw)}")
        if backend not in ("det", "hkv"):
            raise ValueError(f"backend must be 'det' or 'hkv', got {backend}")
        self.backend = backend
        self._spill_watermark = float(spill_watermark)
        # host master (hkv): key -> row in the host arrays. Rows freed by
        # evict() go on a free list — len(_host_index) is NOT a valid next
        # row (reusing it would clobber a live key's row after an evict).
        self._host_index: dict = {}
        self._host_free: list = []
        self._host_next: int = 0
        self._host_values: Optional[np.ndarray] = None
        self._host_opt: dict = {}
        cfg = EmbeddingTableConfig(
            name=name,
            max_vocabulary_size=-1,
            ev_size=dimension,
            dynamic_capacity=initial_capacity,
        )
        super().__init__(
            rows=initial_capacity,
            ev=dimension,
            key=key,
            name=name,
            max_hotness=max_hotness,
            combiner=combiner,
            mode=mode,
            opt_params=opt_params,
            rm=rm,
            _table_cfg=cfg,
        )
        self.dimension = dimension

    @property
    def capacity(self) -> int:
        g, ti = self.engine.ec._find_table(self._table_name)
        return int(g.table_vocab[ti])

    @property
    def size(self) -> int:
        """Number of resident keys (reference: DynamicVariable.size)."""
        g, _ = self.engine.ec._find_table(self._table_name)
        ks = self.engine.ec._host_key_store(self.tables, g)
        return int(
            (ks != int(self.engine.ec.EMPTY_KEY)).sum()
            // max(g.num_replicas, 1)
        )

    def reserve(self, new_capacity: int) -> None:
        """Grow capacity by host-side rehash between passes (det), or grow
        the device working set (hkv — host tier grows automatically)."""
        ec2, t2, s2 = self.engine.ec.grow_dynamic_capacity(
            self.tables, self.opt_state, self._table_name, new_capacity
        )
        self.engine.ec = ec2
        self.engine.compiled = ec2.plan
        self.tables, self.opt_state = t2, s2
        self.rows = new_capacity

    def evict(self, keys) -> None:
        self.tables, self.opt_state = self.engine.ec.evict(
            self.tables, self.opt_state, self._table_name, keys
        )
        if self.backend == "hkv":
            for k in np.asarray(keys).reshape(-1).tolist():
                row = self._host_index.pop(int(k), None)
                if row is not None:
                    self._host_free.append(row)

    # --------------------------------------------- static-mode conversion
    # Reference: sok.DynamicVariable.to_static/to_dynamic
    # (dynamic_variable.py:205-222) — snapshot the rows for a fixed key set
    # into a dense buffer so standard dense-optimizer code can train it,
    # then scatter the (updated) buffer back into the dynamic store.
    def is_static(self) -> bool:
        return getattr(self, "_static_indices", None) is not None

    def to_static(self, indices) -> np.ndarray:
        """Enter static mode: returns a dense [len(indices), ev] buffer of
        the rows for `indices` (keys never trained read as zeros). While
        static, lookup/apply_gradients are disabled; mutate the returned
        buffer via `assign` and call `to_dynamic()` to write it back."""
        if self.is_static():
            raise RuntimeError("to_static() must be called in dynamic mode.")
        keys = np.asarray(indices).reshape(-1)
        buf = np.asarray(
            self.lookup(jnp.asarray(keys.astype(np.int32))), dtype=np.float32
        )
        self._static_indices = keys
        self._static_values = buf
        return self._static_values

    def to_dynamic(self) -> None:
        """Leave static mode: upsert the static buffer's rows back into the
        dynamic store at their keys (growing residency as needed)."""
        if not self.is_static():
            raise RuntimeError("to_dynamic() must be called in static mode.")
        keys, vals = self._static_indices, self._static_values
        # keep the LAST occurrence of any duplicated key (assign semantics)
        _, last = np.unique(keys[::-1], return_index=True)
        sel = np.sort(len(keys) - 1 - last)
        self._write_rows(keys[sel], vals[sel])
        self._static_indices = None
        self._static_values = None

    def assign(self, values: np.ndarray) -> None:
        if self.is_static():
            values = np.asarray(values, np.float32)
            if values.shape != self._static_values.shape:
                raise ValueError(
                    f"static assign: shape {values.shape} != "
                    f"{self._static_values.shape}"
                )
            self._static_values = values
            return
        super().assign(values)

    def _write_rows(self, keys: np.ndarray, vals: np.ndarray) -> None:
        """Keyed upsert into the dynamic store (host-driven, between steps)."""
        from ..embedding.collection import _fold_reserved_key

        ec = self.engine.ec
        g, ti = ec._find_table(self._table_name)
        ks_name = f"{g.name}#keys"
        nks = np.array(ec._host_key_store(self.tables, g))
        placed = ec._host_find_keys(nks, g, ti, keys)
        missing = placed < 0
        if missing.any():
            ins = ec._host_insert_keys(nks, g, ti, keys[missing])
            if (ins < 0).any():
                raise RuntimeError(
                    "dynamic table capacity exhausted during to_dynamic(); "
                    "call reserve(new_capacity) first"
                )
            placed[missing] = ins
        self.tables = dict(self.tables)
        self.tables[g.name] = ec._scatter_all_replicas(
            self.tables[g.name], g, placed, np.asarray(vals, np.float32)
        )
        if missing.any():
            self.tables[ks_name] = ec._scatter_all_replicas(
                self.tables[ks_name], g, placed[missing],
                _fold_reserved_key(keys[missing].astype(np.int32)),
            )

    # ---------------------------------------------------- hkv host tier
    def _device_resident(self) -> np.ndarray:
        """Live keys in the device working set (host copy)."""
        ec = self.engine.ec
        g, ti = ec._find_table(self._table_name)
        ks = ec._host_key_store(self.tables, g)
        lo = int(g.local_offsets[ti])
        rows_t = int(g.rows_per_shard[ti])
        f = g.num_shards if g.is_model_parallel else 1
        segs = []
        for shard in range(f):
            base = shard * g.total_local_rows if g.is_model_parallel else 0
            seg = ks[base + lo : base + lo + rows_t]
            segs.append(seg[seg != int(ec.EMPTY_KEY)])
        return np.concatenate(segs) if segs else np.zeros(0, np.int32)

    def _host_upsert(self, keys: np.ndarray, vals: np.ndarray, st: dict):
        if self._host_values is None:
            cap = max(1024, 2 * len(keys))
            self._host_values = np.zeros((cap, self.ev), np.float32)
            self._host_opt = {
                slot: np.zeros((cap, a.shape[1]), np.float32)
                for slot, a in st.items()
            }
        need = sum(1 for k in keys if int(k) not in self._host_index)
        need_fresh = max(0, need - len(self._host_free))
        cap = self._host_values.shape[0]
        if self._host_next + need_fresh > cap:
            new_cap = max(2 * cap, self._host_next + need_fresh)
            self._host_values = np.resize(self._host_values, (new_cap, self.ev))
            self._host_values[cap:] = 0.0
            for slot in self._host_opt:
                w = self._host_opt[slot].shape[1]
                self._host_opt[slot] = np.resize(
                    self._host_opt[slot], (new_cap, w)
                )
                self._host_opt[slot][cap:] = 0.0
        for i, k in enumerate(np.asarray(keys).tolist()):
            k = int(k)
            row = self._host_index.get(k)
            if row is None:
                row = (
                    self._host_free.pop()
                    if self._host_free
                    else self._host_next
                )
                if row == self._host_next:
                    self._host_next += 1
                self._host_index[k] = row
            self._host_values[row] = vals[i]
            for slot, a in st.items():
                self._host_opt[slot][row] = a[i]

    def spill(self) -> None:
        """Flush the whole device working set to the host master and clear
        it (HKV device-cache eviction analog)."""
        ec = self.engine.ec
        g, ti = ec._find_table(self._table_name)
        live, vals, st = ec._collect_dynamic_entries(
            self.tables, self.opt_state, g, ti
        )
        if len(live):
            self._host_upsert(live, np.asarray(vals, np.float32), st)
            self.tables, self.opt_state = ec.evict(
                self.tables, self.opt_state, self._table_name, live
            )

    def _stage(self, keys: np.ndarray) -> None:
        """Bring host-master rows for `keys` into the device working set."""
        ec = self.engine.ec
        g, ti = ec._find_table(self._table_name)
        uniq = [int(k) for k in np.unique(keys[keys >= 0]).tolist()]

        def plan_stage():
            resident = set(self._device_resident().tolist())
            want, fresh = [], 0
            for k in uniq:
                if k in resident:
                    continue
                if k in self._host_index:
                    want.append(k)
                else:
                    fresh += 1  # will insert-on-backward; needs headroom too
            return resident, want, fresh

        resident, want, fresh = plan_stage()
        cap = int(g.table_vocab[ti])
        if len(resident) + len(want) + fresh > self._spill_watermark * cap:
            self.spill()
            # spill() evicted THIS batch's resident keys to the host master
            # too — replan so they are staged back rather than lost
            resident, want, fresh = plan_stage()
        if not want:
            return
        rows = np.asarray([self._host_index[k] for k in want])
        vals = self._host_values[rows]
        ks_name = f"{g.name}#keys"
        nks = np.array(ec._host_key_store(self.tables, g))
        placed = ec._host_insert_keys(nks, g, ti, np.asarray(want))
        ok = placed >= 0
        dst = placed[ok]
        if not len(dst):
            return
        self.tables = dict(self.tables)
        self.tables[g.name] = ec._scatter_all_replicas(
            self.tables[g.name], g, dst, vals[ok]
        )
        from ..embedding.collection import _fold_reserved_key

        self.tables[ks_name] = ec._scatter_all_replicas(
            self.tables[ks_name], g, dst,
            _fold_reserved_key(np.asarray(want, np.int32)[ok]),
        )
        for slot in self.opt_state.get(g.name, {}):
            self.opt_state = dict(self.opt_state)
            self.opt_state[g.name] = dict(self.opt_state[g.name])
            self.opt_state[g.name][slot] = ec._scatter_all_replicas(
                self.opt_state[g.name][slot], g, dst,
                self._host_opt[slot][rows][ok],
            )

    def lookup(self, keys: jax.Array) -> jax.Array:
        if self.is_static():
            raise RuntimeError(
                "variable is in static mode; call to_dynamic() first"
            )
        if self.backend == "hkv":
            self._stage(np.asarray(keys).reshape(-1))
        return super().lookup(keys)

    def apply_gradients(self, keys, d_out, lr, step: int = 1) -> None:
        if self.is_static():
            raise RuntimeError(
                "variable is in static mode; call to_dynamic() first"
            )
        # host-master rows must be resident BEFORE the update (stateful
        # optimizers read current values; insert-on-backward would otherwise
        # re-create the key from fresh init)
        if self.backend == "hkv":
            self._stage(np.asarray(keys).reshape(-1))
        super().apply_gradients(keys, d_out, lr, step)

    @property
    def host_size(self) -> int:
        """Keys resident in the host master tier (hkv backend)."""
        return len(self._host_index)

    @property
    def total_size(self) -> int:
        """Distinct trained keys across BOTH tiers (hkv backend)."""
        dev = set(self._device_resident().tolist())
        return len(dev | set(self._host_index.keys()))

    def export_merged(self) -> dict:
        """{key: vector} over both tiers; device-resident rows win."""
        out = {}
        if self._host_values is not None:
            for k, r in self._host_index.items():
                out[k] = np.array(self._host_values[r])
        ec = self.engine.ec
        g, ti = ec._find_table(self._table_name)
        live, vals, _st = ec._collect_dynamic_entries(
            self.tables, self.opt_state, g, ti
        )
        for i, k in enumerate(np.asarray(live).tolist()):
            out[int(k)] = np.asarray(vals[i], np.float32)
        return out


class DistributedVariable(Variable):
    """Row-sharded (key % P) variable — sok.Variable(mode="distributed")
    as an explicit class (reference: distributed_variable.py:126)."""

    def __init__(self, *args, **kw):
        kw["mode"] = "distributed"
        super().__init__(*args, **kw)


class LocalizedVariable(Variable):
    """Whole-table-per-owner variable (reference:
    distributed_variable.py:235 — `mode="localized:<gpu>"`). The TPU
    mapping is partial placement with ONE logical shard: every replica
    group holds the full table (shard_counts=1)."""

    def __init__(self, *args, target_gpu: int = 0, **kw):
        kw["mode"] = f"localized:{target_gpu}"
        super().__init__(*args, **kw)


def export(var: DynamicVariable):
    """(indices, values) of every resident key (reference: sok.export,
    dynamic_variable.py:465). hkv backend merges both tiers
    (device-resident rows win)."""
    if not isinstance(var, DynamicVariable):
        raise TypeError("sok.export expects a sok.DynamicVariable")
    if var.backend == "hkv":
        merged = var.export_merged()
        keys = np.asarray(sorted(merged), dtype=np.int64)
        vals = (
            np.stack([merged[int(k)] for k in keys])
            if len(keys)
            else np.zeros((0, var.ev), np.float32)
        )
        return keys, vals
    ec = var.engine.ec
    g, ti = ec._find_table(var._table_name)
    live, vals, _st = ec._collect_dynamic_entries(var.tables, var.opt_state, g, ti)
    return np.asarray(live, np.int64), np.asarray(vals, np.float32)


def assign(var: DynamicVariable, indices, values):
    """Upsert (indices, values) rows into a dynamic variable (reference:
    sok.assign, dynamic_variable.py:494)."""
    if not isinstance(var, DynamicVariable):
        raise TypeError("sok.assign expects a sok.DynamicVariable")
    keys = np.asarray(indices).reshape(-1)
    var._write_rows(keys, np.asarray(values, np.float32).reshape(len(keys), -1))
    return var


def sparse_read_and_evict(var: DynamicVariable, indices):
    """Read rows for `indices`, then migrate them out of the device working
    set into the host master tier (reference: sok.sparse_read_and_evict,
    lookup.py:75 — hybrid/HKV backend only)."""
    if not isinstance(var, DynamicVariable) or var.backend != "hkv":
        raise TypeError(
            "sparse_read_and_evict only works on backend='hkv' DynamicVariable"
        )
    keys = np.asarray(indices).reshape(-1)
    vals = np.asarray(var.lookup(jnp.asarray(keys.astype(np.int32))))
    ec = var.engine.ec
    g, ti = ec._find_table(var._table_name)
    live, dev_vals, st = ec._collect_dynamic_entries(
        var.tables, var.opt_state, g, ti
    )
    sel = np.isin(live, keys.astype(live.dtype))
    if sel.any():
        var._host_upsert(
            live[sel], np.asarray(dev_vals, np.float32)[sel],
            {slot: a[sel] for slot, a in st.items()},
        )
        var.tables, var.opt_state = ec.evict(
            var.tables, var.opt_state, var._table_name, live[sel]
        )
    return vals


class SGD:
    """Plain-SGD sparse optimizer (reference: sok.SGD, optimizer.py —
    scatter-sub of lr-scaled IndexedSlices). Gradients may be
    (values, indices) tuples or objects with .values/.indices."""

    def __init__(self, lr: float):
        self._lr = float(lr)

    @property
    def lr(self) -> float:
        return self._lr

    def apply_gradients(self, grads_and_vars, global_step=None, name=None):
        from ..core.types import Optimizer_t
        from ..optim.params import OptParams

        for g, v in grads_and_vars:
            if g is None:
                continue
            if hasattr(g, "values") and hasattr(g, "indices"):
                values, idx = g.values, g.indices
            elif isinstance(g, tuple):
                values, idx = g
            else:
                # dense ndarray gradient: applies to every row (TF dense-grad
                # on a variable semantics)
                values = jnp.asarray(g)
                idx = jnp.arange(values.shape[0], dtype=jnp.int32)
            # sok.SGD ALWAYS does the plain w[idx] -= lr*g scatter-sub
            # (reference: sok.SGD, optimizer.py) — the variable's own engine
            # optimizer is replaced, never silently applied in its place
            # (each Variable owns a private engine, so this is local to v)
            ec = v.engine.ec
            if any(
                ec.group_opt[gr.name].optimizer != Optimizer_t.SGD
                for gr in ec.plan.groups
            ):
                if getattr(ec, "packed_groups", None):
                    raise ValueError(
                        "sok.SGD cannot rebind a packed-storage variable "
                        "(its table layout carries the original optimizer's "
                        "accumulator); use sok.OptimizerWrapper instead"
                    )
                for gr in ec.plan.groups:
                    ec.group_opt[gr.name] = OptParams(Optimizer_t.SGD, lr=self._lr)
                v.opt_state = v.engine.init_optimizer(v.tables)
            v.apply_gradients(jnp.asarray(idx), jnp.asarray(values), self._lr)


class LookupEngine:
    """Owns tables + compiled plan for a set of lookups; the object returned
    by `build_lookup` and consumed by `lookup_sparse`."""

    def __init__(
        self,
        tables: Sequence[EmbeddingTableConfig],
        hotness: Sequence[int],
        combiners: Sequence[Union[str, Combiner_t]],
        opt: OptParams,
        rm: Optional[ResourceManager] = None,
        dp_tables: Sequence[str] = (),
        shard_counts: Optional[Dict[str, int]] = None,
        use_sp_weight: bool = False,
    ):
        self.rm = rm or _rm()
        # per-key weights (reference: lookup_sparse sp_weights /
        # PreprocessingForwardWithWeight, kit_src/lookup/ops/
        # embedding_collection.cc): lookups compile with a Concat combiner so
        # per-slot vectors are available; the user combiner (sum: Σ w·e,
        # mean: Σ w·e / Σ w — TF embedding_lookup_sparse semantics) is applied
        # over the weighted slots here, and apply_gradients routes
        # w-scaled per-slot cotangents back through the same Concat lookup.
        self.use_sp_weight = bool(use_sp_weight)
        self.user_combiners = [Combiner_t(c) for c in combiners]
        if self.use_sp_weight:
            if any(c == Combiner_t.Concat for c in self.user_combiners):
                raise ValueError("sp_weights require sum/mean combiners")
            combiners = [Combiner_t.Concat] * len(self.user_combiners)
        lookups = [
            LookupConfig(
                lookup_id=i,
                table=t,
                bottom_name=f"in{i}",
                top_name=f"out{i}",
                combiner=Combiner_t(c),
                max_hotness=h,
            )
            for i, (t, h, c) in enumerate(zip(tables, hotness, combiners))
        ]
        mp = [t.name for t in tables if t.name not in set(dp_tables)]
        plan = ShardingPlan(strategy=[("mp", mp), ("dp", list(dp_tables))])
        self.compiled = compile_plan(
            lookups, plan, num_shards=self.rm.data_parallel_size,
            shard_counts=shard_counts,
        )
        self.ec = EmbeddingCollection(self.compiled, self.rm, opt)
        self.n = len(lookups)

    def init(self, key: jax.Array) -> Dict[str, jax.Array]:
        return self.ec.init(key)

    def init_optimizer(self, tables) -> Dict[str, Dict[str, jax.Array]]:
        return self.ec.init_optimizer(tables)

    def _slot_weights(self, i: int, keys: jax.Array, sp_weights):
        """Per-slot effective weights w̃ [B, H]: invalid slots zeroed; mean
        combiner normalizes by Σw (TF embedding_lookup_sparse semantics)."""
        k = keys if keys.ndim == 2 else keys[:, None]
        valid = k != -1
        w = sp_weights[i] if sp_weights is not None and sp_weights[i] is not None else None
        if w is None:
            w = jnp.ones(k.shape, jnp.float32)
        elif w.ndim == 1:
            w = w[:, None]
        w = jnp.where(valid, w.astype(jnp.float32), 0.0)
        if self.user_combiners[i] == Combiner_t.Mean:
            w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return w

    def lookup(
        self,
        tables: Dict[str, jax.Array],
        keys: Sequence[jax.Array],
        sp_weights: Optional[Sequence[Optional[jax.Array]]] = None,
    ) -> List[jax.Array]:
        """Fused multi-table lookup (reference: sok.lookup_sparse,
        lookup.py:122): keys[i] is [B, hotness_i] with -1 padding; returns
        pooled [B, ev_i] per lookup, batch-sharded. With `sp_weights`
        (engine built with use_sp_weight=True) slot vectors are weighted:
        sum -> Σ w·e, mean -> Σ w·e / Σ w."""
        if sp_weights is not None and not self.use_sp_weight:
            raise ValueError(
                "pass use_sp_weight=True at engine build to use sp_weights"
            )
        # bottom names were rewritten to internal tops by compile
        feature_keys = {}
        for i, lk in enumerate(self.compiled.lookups):
            feature_keys[lk.bottom_name] = keys[i]
        outs = self.ec.forward(tables, feature_keys)
        flat = [outs[lk.top_name] for lk in self.compiled.lookups]
        if not self.use_sp_weight:
            return flat
        pooled = []
        for i, o in enumerate(flat):
            b = o.shape[0]
            ev = self.compiled.lookups[i].table.ev_size
            w = self._slot_weights(i, keys[i], sp_weights)
            pooled.append(
                jnp.einsum(
                    "bhe,bh->be", o.reshape(b, -1, ev), w.astype(o.dtype)
                )
            )
        return pooled

    def apply_gradients(
        self,
        tables: Dict[str, jax.Array],
        opt_state: Dict[str, Dict[str, jax.Array]],
        keys: Sequence[jax.Array],
        d_outs: Sequence[jax.Array],
        lr,
        step,
        sp_weights: Optional[Sequence[Optional[jax.Array]]] = None,
    ):
        if self.use_sp_weight:
            # route pooled cotangents to per-slot Concat cotangents:
            # d_slot[b,h] = w̃[b,h] · d_out[b]
            scaled = []
            for i, d in enumerate(d_outs):
                w = self._slot_weights(i, keys[i], sp_weights)
                b = d.shape[0]
                scaled.append(
                    (w.astype(d.dtype)[:, :, None] * d[:, None, :]).reshape(
                        b, -1
                    )
                )
            d_outs = scaled
        feature_keys = {
            lk.bottom_name: keys[i] for i, lk in enumerate(self.compiled.lookups)
        }
        grads = {
            lk.top_name: d_outs[i] for i, lk in enumerate(self.compiled.lookups)
        }
        return self.ec.backward_and_update(
            tables, opt_state, feature_keys, grads, lr, step
        )


def lookup_sparse(
    engine: LookupEngine,
    tables: Dict[str, jax.Array],
    keys: Sequence[jax.Array],
    sp_weights: Optional[Sequence[Optional[jax.Array]]] = None,
) -> List[jax.Array]:
    """Functional alias of LookupEngine.lookup (reference: sok.lookup_sparse,
    lookup.py:425 lookup_sparse_impl(params, sp_ids, sp_weights, ...))."""
    return engine.lookup(tables, keys, sp_weights=sp_weights)


def all2all_dense_embedding(
    engine: LookupEngine, tables: Dict[str, jax.Array], keys: jax.Array
) -> jax.Array:
    """Single-table non-pooled lookup (reference: sok.all2all_dense_embedding,
    lookup.py:122): keys [B] -> vectors [B, ev]."""
    return engine.lookup(tables, [keys.reshape(-1, 1)])[0]


class OptimizerWrapper:
    """Sparse-apply wrapper (reference: sok.OptimizerWrapper, optimizer.py):
    binds optimizer hyperparams to an engine and applies fused per-row
    updates from lookup-output cotangents."""

    def __init__(self, engine: LookupEngine, opt: Optional[OptParams] = None):
        self.engine = engine
        if opt is not None:
            for g in engine.ec.plan.groups:
                engine.ec.group_opt[g.name] = opt

    def initialize(self, tables):
        return self.engine.init_optimizer(tables)

    def apply_gradients(
        self, tables, opt_state, keys, d_outs, lr, step=1, sp_weights=None
    ):
        return self.engine.apply_gradients(
            tables, opt_state, keys, d_outs, lr, step, sp_weights=sp_weights
        )


def dump(path: str, engine: LookupEngine, tables: Dict[str, jax.Array]) -> None:
    """Dump all tables to `path` dir (reference: sok.dump, dump_load.py)."""
    import os

    os.makedirs(path, exist_ok=True)
    for g in engine.ec.plan.groups:
        for t in g.tables:
            arr = engine.ec.export_table(tables, t.name)
            np.save(os.path.join(path, f"{t.name}.npy"), arr)


def load(path: str, engine: LookupEngine, tables: Dict[str, jax.Array]):
    import os

    for g in engine.ec.plan.groups:
        for t in g.tables:
            f = os.path.join(path, f"{t.name}.npy")
            if os.path.exists(f):
                tables = engine.ec.import_table(tables, t.name, np.load(f))
    return tables


def incremental_model_dump(
    engine: LookupEngine,
    tables: Dict[str, jax.Array],
    touched_keys: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Dump only the rows named by `touched_keys` per table (reference:
    sok.incremental_model_dump, dump_load.py): {table: {keys, values}}."""
    out = {}
    for g in engine.ec.plan.groups:
        for ti, t in enumerate(g.tables):
            keys = np.asarray(touched_keys.get(t.name, []), dtype=np.int64)
            if keys.size == 0:
                continue
            full = engine.ec.export_table(tables, t.name)
            keys = keys[(keys >= 0) & (keys < full.shape[0])]
            out[t.name] = {"keys": keys, "values": full[keys]}
    return out


def filter_variables(variables: Sequence) -> Tuple[List, List]:
    """Split (sok_vars, other_vars) (reference: sok.filter_variables)."""
    sok_vars = [v for v in variables if isinstance(v, (LookupEngine, Variable))]
    others = [v for v in variables if not isinstance(v, (LookupEngine, Variable))]
    return sok_vars, others
