"""TPU-native embedding collection.

This is the analog of the reference's modern embedding engine
(HugeCTR/embedding/embedding_collection.*, model_parallel_embedding.cpp,
data_parallel_embedding.cpp, data_distributor/*), redesigned for XLA SPMD:

  Model-parallel groups (row-sharded tables over the ``data`` mesh axis):
    forward  = all_gather(keys) -> masked local gather + per-lookup pooling
               of partial sums -> psum_scatter(partials)
    backward = all_gather(d_out) -> per-slot gradient expansion -> masked
               row-gradient list -> sort/segment dedup -> per-row sparse
               optimizer update of the local shard.

  This replaces the reference's ragged NCCL all-to-all pipeline
  (filter_before_all2all -> all2all keys -> lookup -> all2all vectors ->
  combiner) with fixed-shape ICI collectives of identical asymptotic volume
  for fully-sharded tables: psum_scatter of pooled partials moves the same
  bytes the reference's vector all2all + local reduce does, and XLA overlaps
  it with the dense network automatically.

  Data-parallel groups (replicated small tables):
    forward  = local gather + pooling (no collective)
    backward = all_gather(row grads) -> identical sparse update on every
               device (keeps replicas bit-identical; analog of the
               reference's DP-wgrad allreduce, Stage::DPAllreduce).

Keys arrive in fixed-hotness layout [batch, hotness] padded with INVALID_KEY
(-1); this is the XLA-friendly equivalent of the reference's bucket-range CSR.
Dynamic tables (max_vocabulary_size == -1) use a fixed-capacity hashing-trick
placement (murmur-style mix), the compiled-world analog of the reference's
DynamicEmbeddingTable.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core.mesh import DATA_AXIS, DCN_AXIS, ICI_AXIS, ResourceManager
from ..core.types import Combiner_t, INVALID_KEY
from ..optim.params import OptParams
from ..parallel.plan import CompiledEmbeddingPlan, GroupPlan
from . import sparse_optimizer

Array = jax.Array


def _hash_mix(k: Array) -> Array:
    """Murmur3-finalizer integer mix for dynamic-table key placement."""
    k = k.astype(jnp.uint32)
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x85EBCA6B)
    k = k ^ (k >> 13)
    k = k * jnp.uint32(0xC2B2AE35)
    k = k ^ (k >> 16)
    return k


def _hash_mix_np(k: np.ndarray) -> np.ndarray:
    """Host (numpy) mirror of _hash_mix — MUST stay bit-identical (used by
    exact-evict probing and capacity growth)."""
    h = k.astype(np.uint32)
    h = h ^ (h >> 16)
    h = (h * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    h = h ^ (h >> 13)
    h = (h * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    h = h ^ (h >> 16)
    return h


def _fold_reserved_key(k32):
    """int32 key 2^31-1 is the store's EMPTY marker and can never be
    physically inserted (scatter-min keeps EMPTY); remap it to 2^31-2 so it
    behaves like a normal (possibly colliding) key."""
    empty = 2**31 - 1
    if isinstance(k32, np.ndarray):
        return np.where(k32 == empty, np.int32(empty - 1), k32)
    return jnp.where(k32 == empty, jnp.int32(empty - 1), k32)


class _GroupMeta:
    """Device-side constants for one group (captured into jit)."""

    def __init__(self, g: GroupPlan):
        self.plan = g
        self.slot_local_offset = jnp.asarray(g.slot_local_offset, dtype=jnp.int32)
        # int32 key math; i64 keys fold through the hash path. Vocab sizes
        # beyond 2^31 rows/table require jax_enable_x64 (future knob).
        self.slot_vocab = jnp.asarray(g.slot_vocab, dtype=jnp.int32)
        self.slot_rows = jnp.asarray(
            g.rows_per_shard[g.slot_table], dtype=jnp.int32
        )
        # per-table owner rotation, reduced mod the group's shard count f
        # (key k -> shard (k + rot) % f; see plan.table_shard_rotation)
        self.slot_rotation = jnp.asarray(
            g.slot_rotation % max(int(g.num_shards), 1), dtype=jnp.int32
        )
        self.slot_dynamic = jnp.asarray(g.slot_is_dynamic)
        self.any_dynamic = bool(g.slot_is_dynamic.any())
        self.any_static = bool((~g.slot_is_dynamic).any())


class EmbeddingCollection:
    """Owns compiled plan + mesh and builds the jittable fwd/bwd functions."""

    def __init__(
        self,
        plan: CompiledEmbeddingPlan,
        rm: ResourceManager,
        opt: OptParams,
        dtype=jnp.float32,
        comm_strategy=None,
    ):
        from ..core.types import CommunicationStrategy

        self.plan = plan
        self.rm = rm
        self.opt = opt
        self.dtype = dtype
        # optimizer state stays fp32 by default even for bf16 tables:
        # bf16 cannot accumulate Adam/RMSProp's small moment increments
        # (reference mixed precision likewise keeps fp32 optimizer math)
        import os as _os

        self.state_dtype = (
            jnp.bfloat16
            if _os.environ.get("HCTR_TPU_EMB_STATE_DTYPE", "") in ("bfloat16", "bf16")
            else jnp.float32
        )
        self.comm_strategy = CommunicationStrategy(
            comm_strategy or CommunicationStrategy.Uniform
        )
        # Engine knobs are captured ONCE here (not at trace time) so a
        # Solver's apply-and-restore of the HCTR_TPU_* env cannot leak into
        # models compiled later in the same process.
        self.knob_fwd_partition = _os.environ.get("HCTR_TPU_FWD_PARTITION", "1") != "0"
        self.knob_capacity_factor = float(
            _os.environ.get("HCTR_TPU_MP_CAPACITY_FACTOR", "0")
        )
        self.knob_segsum = _os.environ.get("HCTR_TPU_SEGSUM", "xla")
        _ucap = _os.environ.get("HCTR_TPU_UCAP_FACTOR", "0")
        # "auto": measure each rowop group's true unique-row count on the
        # first real batch (Model feeds it via auto_unique_caps) and size
        # the compaction window to measured x headroom. The lax.cond
        # fallback keeps exactness when a later batch overflows the window.
        self.knob_ucap_auto = _ucap == "auto"
        self.knob_ucap_factor = 0.0 if self.knob_ucap_auto else float(_ucap)
        self.knob_ucap_headroom = float(
            _os.environ.get("HCTR_TPU_UCAP_HEADROOM", "1.25")
        )
        self.knob_dense_update_rows = sparse_optimizer.dense_update_rows()
        self.knob_dense_grad_dtype = sparse_optimizer.dense_grad_dtype()
        self.knob_dense_key_ratio = sparse_optimizer.dense_key_ratio()
        self.unique_caps: Dict[str, int] = {}
        # measured VALID-key caps (auto mode): groups whose key lists are
        # mostly padding/out-of-window (hot-cold splits, sharded smalls)
        # slice the whole post-sort chain to the valid prefix (cond-exact)
        self.valid_caps: Dict[str, int] = {}
        # True once auto_unique_caps ran (may legitimately measure NO caps —
        # e.g. all-onehot plans — so the flag, not dict emptiness, gates it)
        self.ucap_measured = False
        self.knob_ucap_min_k = int(_os.environ.get("HCTR_TPU_UCAP_MIN_K", "0"))
        self.knob_ucap_drop = bool(_os.environ.get("HCTR_TPU_UCAP_DROP"))
        self.knob_packed_state = bool(_os.environ.get("HCTR_TPU_PACKED_STATE"))
        self.knob_rowwise_pack = (
            _os.environ.get("HCTR_TPU_ROWWISE_PACK", "0") == "1"
        )
        # hot/cold tier groups re-derive their windowed row lists from ONE
        # shared raw-key sort of the parent table (fwd + bwd of every tier
        # CSE to a single lax.sort); see _tier_sorted_rows
        self.knob_shared_tier_sort = (
            _os.environ.get("HCTR_TPU_SHARED_TIER_SORT", "1") != "0"
        )
        # size-aware scatter lowering (sparse_optimizer._scatter_streams)
        self.knob_scatter_auto = sparse_optimizer.scatter_auto_default()
        # folded [K, E+1] segsum temp budget (split above it — huge-K
        # shared groups would OOM on the 2x-padded folded temps)
        self.knob_segsum_fold_bytes = sparse_optimizer._segsum_fold_budget_bytes()
        # sorted-gather forward threshold for big-operand groups (bytes of
        # the group's storage; 0 = off, the DEFAULT). The isolated-op law
        # (sorted gathers ~6 ns/row at every operand size vs ~30 input-
        # order) does NOT survive the fused chain: on the 200-table case
        # (3.4 GB shared group) the sorted forward measured 4,508 ex/s vs
        # 6,417 masked — the masked gather fuses into the pool reduction
        # while the sorted path pays a separate full-K pool scatter-add
        # pass plus fill-mode select. Keep as an opt-in probe knob.
        self.knob_fwd_sorted_bytes = int(
            _os.environ.get("HCTR_TPU_FWD_SORTED_BYTES", "0")
        )
        # unique-key (dense-compression) MP exchange for concat-combiner
        # groups (reference: dense_model_parallel_embedding.hpp:61-110,
        # data_compression_operators.cu PartitionAndUniqueOperator): dedup
        # owned rows per (batch block, owner shard) pre-exchange, all_to_all
        # unique VECTORS only, expand locally. Capacity per (block, shard)
        # list comes from the measured auto caps (or the explicit env cap);
        # a psummed overflow flag cond-falls back to the dense psum path so
        # the exchange stays EXACT for any key distribution.
        self.knob_dense_exchange = (
            _os.environ.get("HCTR_TPU_DENSE_EXCHANGE", "1") != "0"
        )
        self.knob_dense_exchange_cap = int(
            _os.environ.get("HCTR_TPU_DENSE_EXCHANGE_CAP", "0")
        )
        self.dense_exchange_caps: Dict[str, int] = {}
        # one-hot engine backend: "xla" (default — measured 90.0k vs the
        # fused Pallas kernels' 88.7k ex/s on the DLRM bench; XLA's
        # compare-chain+matmul fusion wins at <=32k vocab, and the engine is
        # flops-capped at ~32-64k vocab either way) | "pallas" | "auto"
        self.knob_onehot_kernel = _os.environ.get("HCTR_TPU_ONEHOT_KERNEL", "xla")
        from ..parallel.plan import onehot_vocab_threshold

        # trace-time consumer (_onehot_counts) must see the SAME threshold
        # the plan was compiled with — capture here, never re-read the env
        self.knob_onehot_compare_max = onehot_vocab_threshold()
        # plan-SHAPING env as seen at compile time (Solver apply-and-restore
        # may remove these afterwards): grow_dynamic_capacity re-runs
        # compile_plan and must see the same layout knobs or the rebuilt
        # plan loses hot/cold splits / storage groups / onehot peeling
        self._plan_env = {
            k: _os.environ.get(k)
            for k in (
                "HCTR_TPU_HOT_ROWS", "HCTR_TPU_SUPERHOT_ROWS",
                "HCTR_TPU_WARM_ROWS", "HCTR_TPU_SPLIT_VOCAB",
                "HCTR_TPU_GROUP_ROWS", "HCTR_TPU_ONEHOT_VOCAB",
                "HCTR_TPU_ONEHOT_SCATTER_RATIO",
                "HCTR_TPU_ONEHOT_SCATTER_MAXV",
                "HCTR_TPU_SHARD_ROTATION",
            )
        }
        self._meta = {g.name: _GroupMeta(g) for g in plan.groups}
        # per-group optimizer (table-level override must be group-uniform)
        self.group_opt: Dict[str, OptParams] = {}
        for g in plan.groups:
            opts = {id(t.opt_params): t.opt_params for t in g.tables if t.opt_params}
            if len(opts) > 1:
                raise ValueError(
                    f"group {g.name}: tables with different opt_params must "
                    "not share a (placement, ev_size) group"
                )
            self.group_opt[g.name] = next(iter(opts.values())) if opts else opt
        # per-table freeze (reference: Model::freeze_embedding(name)):
        # frozen tables' slots are masked out of the backward row list
        self.frozen_tables: set = set()
        # packed table+optimizer-state storage (state rides in trailing
        # columns of the table array; see _compute_packed_kind)
        self.packed_kind = self._compute_packed_kind(plan)
        self.packed_groups = set(self.packed_kind)

    def _compute_packed_kind(self, plan) -> Dict[str, str]:
        """{group: "full" | "rowwise"} packed table+state storage layout.

        "full" ([R, 2E], HCTR_TPU_PACKED_STATE, AdaGrad): halves the trio's
        row ops but doubles the operand footprint — measured slower on v5e,
        off by default. "rowwise" ([R, E+1], HCTR_TPU_ROWWISE_PACK,
        RowWiseAdaGrad): the scalar accum rides as a 129th column so the
        accum update folds into the SAME scatter as the weight delta.
        MEASURED SLOWER on v5e at ev=128 (161k -> 70k ex/s on the DLRM
        bench): width E+1 breaks the 128-lane tile alignment, padding every
        [., 129] operand to 256 lanes — all table passes and row ops pay
        ~2x bytes. Off by default; only worth trying when ev_size is far
        from a lane-tile multiple. Both modes are exact and oracle-tested.
        Restricted to static rowop groups big enough to take the trio path
        (dense-sweep shards keep separate state — the sweep reads it as a
        full array)."""
        from ..core.types import Optimizer_t as _Opt

        out: Dict[str, str] = {}
        for g in plan.groups:
            if g.compute_kind != "rowop":
                continue
            kind = self.group_opt[g.name].optimizer
            if self.knob_packed_state and kind == _Opt.AdaGrad:
                out[g.name] = "full"
            elif (
                self.knob_rowwise_pack
                and kind == _Opt.RowWiseAdaGrad
                and not self._meta[g.name].any_dynamic
                and g.total_local_rows > self.knob_dense_update_rows
            ):
                out[g.name] = "rowwise"
        return out

    # ------------------------------------------------------------------ init
    def init(self, key: Array) -> Dict[str, Array]:
        """Initialize sharded table storage. Returns {group_name: [rows, ev]}."""
        tables = {}
        for g in self.plan.groups:
            key, sub = jax.random.split(key)
            sharding = (
                self.rm.row_sharding()
                if g.is_model_parallel
                else self.rm.replicated_sharding()
            )
            rows = g.total_storage_rows
            scales = self._row_init_scales(g)

            packed = self.packed_kind.get(g.name)
            accu0 = float(self.group_opt[g.name].initial_accu_value)

            def make(sub=sub, rows=rows, g=g, scales=scales, packed=packed,
                     accu0=accu0):
                # partial placement: generate the f-shard base then tile it
                # so every replica group holds bit-identical shard content
                base_rows = rows // g.num_replicas
                t = jax.random.uniform(
                    sub,
                    (base_rows, g.ev_size),
                    dtype=self.dtype,
                    minval=-1.0,
                    maxval=1.0,
                )
                if g.num_replicas > 1:
                    t = jnp.tile(t, (g.num_replicas, 1))
                t = t * jnp.asarray(scales, dtype=self.dtype)[:, None]
                if packed:
                    pcols = g.ev_size if packed == "full" else 1
                    t = jnp.concatenate(
                        [t, jnp.full((t.shape[0], pcols), accu0, t.dtype)],
                        axis=1,
                    )
                return t

            tables[g.name] = jax.jit(make, out_shardings=sharding)()
            if self._meta[g.name].any_dynamic:
                # exact dynamic-table key store, row-aligned with storage
                ks_sharding = (
                    self.rm.sharding(P(self.rm.data_axes))
                    if g.is_model_parallel
                    else self.rm.replicated_sharding()
                )
                tables[f"{g.name}#keys"] = jax.jit(
                    lambda rows=rows: jnp.full(
                        (rows,), int(self.EMPTY_KEY), jnp.int32
                    ),
                    out_shardings=ks_sharding,
                )()
        return tables

    def _row_init_scales(self, g: GroupPlan) -> np.ndarray:
        """Per-row uniform init scale; default 1/sqrt(ev_size) per table."""
        scales = np.zeros(g.total_storage_rows, dtype=np.float32)
        n_rep = g.mesh_size if g.is_model_parallel else 1
        for ti, t in enumerate(g.tables):
            s = t.init_scale if t.init_scale is not None else 1.0 / np.sqrt(t.ev_size)
            for shard in range(n_rep):
                base = shard * g.total_local_rows + int(g.local_offsets[ti])
                scales[base : base + int(g.rows_per_shard[ti])] = s
        return scales

    def init_optimizer(self, tables: Dict[str, Array]) -> Dict[str, Dict[str, Array]]:
        state = {}
        for g in self.plan.groups:
            if g.name in self.packed_groups:
                state[g.name] = {}  # accum lives inside the packed table
                continue
            sharding = (
                self.rm.row_sharding()
                if g.is_model_parallel
                else self.rm.replicated_sharding()
            )
            opt = self.group_opt[g.name]
            rows = g.total_storage_rows

            def make(rows=rows, g=g, opt=opt):
                return sparse_optimizer.init_state(
                    opt, rows, g.ev_size, self.state_dtype
                )

            st = jax.jit(make, out_shardings=None)()
            state[g.name] = jax.tree.map(
                lambda x: jax.device_put(x, sharding), st
            )
        return state

    def _is_packed(self, gname: str) -> bool:
        return gname in self.packed_groups

    def _weights_view(self, gname: str, rows: Array) -> Array:
        """Leading-E columns of gathered rows (packed groups carry accum in
        the trailing columns)."""
        if self._is_packed(gname):
            return rows[..., : self._meta[gname].plan.ev_size]
        return rows

    # ----------------------------------------------------------- collectives
    def _psum_scatter_batch(self, partial: Array) -> Array:
        """Reduce-scatter pooled partials over the data axes.

        On a hierarchical ("dcn", "ici") mesh with
        CommunicationStrategy.Hierarchical this decomposes into an
        intra-slice reduce-scatter FIRST and an inter-slice one after, so
        the slow DCN link carries 1/ici_size of the volume — the TPU analog
        of the reference's 2-level node-first exchange
        (hier_model_parallel_embedding.cpp:183-226,
        operators/hier_model_forward.cu). Bitwise-equal to the flat scatter
        (verified in tests); Uniform leaves the decomposition to XLA."""
        from ..core.types import CommunicationStrategy

        if (
            self.comm_strategy == CommunicationStrategy.Hierarchical
            and self.rm.is_hierarchical
        ):
            d, i = self.rm.num_slices, self.rm.slice_size
            bg, w = partial.shape
            bl = bg // (d * i)
            t = (
                partial.reshape(d, i, bl, w)
                .transpose(1, 0, 2, 3)
                .reshape(bg, w)
            )
            y = jax.lax.psum_scatter(
                t, ICI_AXIS, scatter_dimension=0, tiled=True
            )
            return jax.lax.psum_scatter(
                y, DCN_AXIS, scatter_dimension=0, tiled=True
            )
        return jax.lax.psum_scatter(
            partial, self.rm.data_axes, scatter_dimension=0, tiled=True
        )

    # ------------------------------------------------------------- slot math
    def _slot_placement(
        self, meta: _GroupMeta, keys: Array, num_shards: int, key_store=None
    ) -> Tuple[Array, Array, Array]:
        """Compute (valid, owner_shard, local_row) for [B, H] keys."""
        g = meta.plan
        valid = keys != INVALID_KEY
        k32 = keys.astype(jnp.int32)
        # static tables: wrap out-of-range keys (documented; keys should be
        # table-local already)
        k_static = jnp.where(valid, k32 % meta.slot_vocab[None, :], 0)
        owner_s = (
            (k_static + meta.slot_rotation[None, :]) % num_shards
        ).astype(jnp.int32)
        row_s = (k_static // num_shards).astype(jnp.int32)
        if meta.any_dynamic:
            dyn = meta.slot_dynamic[None, :]
            owner_d, row_d, found = self._dynamic_probe(
                meta, keys, num_shards, key_store
            )
            owner = jnp.where(dyn, owner_d, owner_s)
            row = jnp.where(dyn, row_d, row_s)
            if key_store is not None:
                # exact store: unplaced dynamic keys act as padding
                valid = valid & (~dyn | found)
        else:
            owner, row = owner_s, row_s
        local_row = row + meta.slot_local_offset[None, :]
        return valid, owner, local_row

    # ----------------------------------------------- exact dynamic tables
    # Reference: DynamicEmbeddingTable (embedding_storage/dynamic_embedding.cu
    # :1-588) — an exact growable device hash map. The TPU analog is a probed
    # open-addressing key store aligned row-for-row with the table storage:
    # key k hashes to a shard (owner) and a probe sequence of NUM_PROBES
    # consecutive local slots within its table's capacity; lookups compare
    # the stored keys, misses read as padding, and inserts (on the backward
    # pass) claim empty slots via scatter-min arbitration — collision-FREE
    # up to the probe depth, unlike the old hashing-trick aliasing.
    NUM_PROBES = 8
    EMPTY_KEY = np.int32(2**31 - 1)

    def _dynamic_probe(
        self, meta: _GroupMeta, keys: Array, num_shards: int, key_store
    ) -> Tuple[Array, Array, Array]:
        """(owner, local-table row, found) for dynamic slots.

        Without a key store (legacy hashing-trick mode) the hash IS the row
        and `found` is all-true."""
        if key_store is None:
            h = _hash_mix(keys)
            owner = (h % jnp.uint32(num_shards)).astype(jnp.int32)
            rows_t = meta.slot_rows[None, :].astype(jnp.uint32)
            base = ((h // jnp.uint32(num_shards)) % rows_t).astype(jnp.int32)
            return owner, base, jnp.ones_like(owner, dtype=bool)
        k32 = _fold_reserved_key(keys.astype(jnp.int32))
        h = _hash_mix(k32)
        owner = (h % jnp.uint32(num_shards)).astype(jnp.int32)
        rows_t = meta.slot_rows[None, :].astype(jnp.uint32)
        base = ((h // jnp.uint32(num_shards)) % rows_t).astype(jnp.int32)
        row = base
        found = jnp.zeros(keys.shape, dtype=bool)
        for j in range(self.NUM_PROBES):
            cand = (base + j) % meta.slot_rows[None, :]
            slot = cand + meta.slot_local_offset[None, :]
            stored = key_store.at[slot].get(mode="fill", fill_value=-1)
            hit = (~found) & (stored == k32)
            row = jnp.where(hit, cand, row)
            found = found | hit
        return owner, row, found

    def _dynamic_insert(
        self, meta: _GroupMeta, key_store: Array, keys: Array, mine_valid: Array,
        num_shards: int,
    ) -> Array:
        """Claim store slots for this shard's unplaced dynamic keys.

        scatter-min arbitration per probe round: contenders write their key
        into an empty slot with `min`, then re-read to learn the winner;
        losers move to the next probe. Keys still unplaced after NUM_PROBES
        rounds are dropped this step (capacity pressure — grow the table).

        A FULL probe runs first: evict() punches EMPTY holes at arbitrary
        probe positions, and a key already resident at a LATER slot must
        not re-insert into an earlier hole (first-hit probing would then
        find the fresh zeroed row and silently abandon the trained one)."""
        k32 = _fold_reserved_key(keys.astype(jnp.int32))
        h = _hash_mix(k32)
        rows_t = meta.slot_rows[None, :].astype(jnp.uint32)
        base = ((h // jnp.uint32(num_shards)) % rows_t).astype(jnp.int32)
        dyn = meta.slot_dynamic[None, :]
        sentinel = key_store.shape[0]
        _o, _r, already = self._dynamic_probe(
            meta, keys, num_shards, key_store
        )
        need = mine_valid & dyn & ~already
        for j in range(self.NUM_PROBES):
            cand = (base + j) % meta.slot_rows[None, :]
            slot = cand + meta.slot_local_offset[None, :]
            stored = key_store.at[slot].get(mode="fill", fill_value=-1)
            need = need & (stored != k32)  # already resident here
            empty = stored == int(self.EMPTY_KEY)
            tryslot = jnp.where(need & empty, slot, sentinel).reshape(-1)
            key_store = key_store.at[tryslot].min(
                k32.reshape(-1), mode="drop"
            )
            # re-read: arbitration winners leave the pool, losers probe on
            stored2 = key_store.at[slot].get(mode="fill", fill_value=-1)
            need = need & (stored2 != k32)
        return key_store

    # ------------------------------------------------------------ pooling
    def _mean_denom(self, g: GroupPlan, lm, valid, weights, dtype):
        """[B, 1] mean-combiner denominator: valid-key count, or sum of
        per-key weights for weighted lookups (reference:
        weighted_network_forward.cu:71 divides by sp_weight_sum)."""
        if weights is not None and lm.sp_weight_name:
            sw = jnp.sum(
                weights[:, lm.slot_begin : lm.slot_end].astype(dtype),
                axis=1,
                keepdims=True,
            )
            return jnp.where(sw == 0, jnp.asarray(1.0, dtype), sw)
        cnt = jnp.sum(
            valid[:, lm.slot_begin : lm.slot_end].astype(dtype),
            axis=1,
            keepdims=True,
        )
        return jnp.maximum(cnt, 1.0)

    def _group_weights(
        self, g: GroupPlan, feature_weights
    ) -> Optional[Array]:
        """[B, H] per-slot weights for a weighted group (None if the group
        has no weighted lookup). Unweighted lookups in a weighted group get
        weight 1.0; invalid-key masking happens at the use sites (weights
        multiply rows that are already validity-masked)."""
        if not g.has_weights:
            return None
        if feature_weights is None:
            raise ValueError(
                f"group {g.name} has weighted lookups; pass feature_weights "
                "to forward/backward_and_update"
            )
        cols = []
        b = None
        for lm in g.lookups:
            h = lm.slot_end - lm.slot_begin
            if lm.sp_weight_name:
                w = feature_weights[lm.sp_weight_name]
                if w.ndim == 1:
                    w = w[:, None]
                if w.shape[1] != h:
                    raise ValueError(
                        f"sp_weight {lm.sp_weight_name}: width {w.shape[1]} "
                        f"!= lookup hotness {h}"
                    )
                cols.append(w.astype(jnp.float32))
                b = w.shape[0]
            else:
                cols.append(None)
        b = b if b is not None else 1
        cols = [
            c
            if c is not None
            else jnp.ones((b, lm.slot_end - lm.slot_begin), jnp.float32)
            for c, lm in zip(cols, g.lookups)
        ]
        return jnp.concatenate(cols, axis=1)

    def _pool(
        self, g: GroupPlan, rows: Array, valid: Array, weights=None
    ) -> Array:
        """[B, H, E] masked rows -> [B, W] per-lookup pooled output.

        `weights` ([B, H] or None): rows are assumed ALREADY scaled by the
        per-key weight; it is only consulted for the mean denominator."""
        b = rows.shape[0]
        outs: List[Array] = []
        for lm in g.lookups:
            w = rows[:, lm.slot_begin : lm.slot_end, :]
            if lm.combiner == Combiner_t.Concat:
                outs.append(w.reshape(b, -1))
            else:
                s = jnp.sum(w, axis=1)
                if lm.combiner == Combiner_t.Mean:
                    s = s / self._mean_denom(g, lm, valid, weights, s.dtype)
                outs.append(s)
        return jnp.concatenate(outs, axis=1)

    def _grad_source(
        self, g: GroupPlan, d_out: Array, valid: Array, weights=None
    ) -> Tuple[Array, np.ndarray]:
        """[B, W] output grads -> compact gradient source.

        Returns (dsrc [B*S, E], gsrc [H]): the grad of the key in slot h of
        sample b is row ``b*S + gsrc[h]`` of dsrc. Sum/mean lookups share ONE
        source row per sample (never broadcast to [B, H, E] — the sort works
        on int pairs and gradient rows are gathered once, post-sort).
        Weighted lookups later scale per-key rows by w (see _row_grads);
        here only the mean denominator changes (sum of weights).
        """
        b = d_out.shape[0]
        parts: List[Array] = []
        gsrc = self._fwd_gsrc(g)  # same slot->source map as the forward
        for lm in g.lookups:
            d = d_out[:, lm.out_begin : lm.out_end]
            h = lm.slot_end - lm.slot_begin
            if lm.combiner == Combiner_t.Concat:
                parts.append(d.reshape(b, h, g.ev_size))
            else:
                d = d.reshape(b, 1, g.ev_size)
                if lm.combiner == Combiner_t.Mean:
                    d = d / self._mean_denom(
                        g, lm, valid, weights, d.dtype
                    )[..., None]
                parts.append(d)
        dsrc = jnp.concatenate(parts, axis=1).reshape(-1, g.ev_size)
        return dsrc, gsrc

    # ------------------------------------------------------------- forward
    def forward(
        self,
        tables: Dict[str, Array],
        feature_keys: Dict[str, Array],
        feature_weights: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Array]:
        """Embedding forward.

        Args:
          tables: {group_name: storage array} from `init`.
          feature_keys: {bottom_name: [B, hotness] int keys, -1 padded},
            batch-sharded over the data axis.
          feature_weights: {sp_weight_name: [B, hotness] float weights} for
            weighted lookups (reference sp_weight path,
            weighted_model_forward.cu); required iff any lookup declares
            sp_weight_name.

        Returns:
          {top_name: [B, out_width]} per-lookup outputs, batch-sharded.
        """
        group_outs: Dict[str, Array] = {}
        for g in self.plan.groups:
            keys = self._group_keys(g, feature_keys)
            w = self._group_weights(g, feature_weights)
            if w is not None:
                w = w * (keys != INVALID_KEY)
            if g.compute_kind == "onehot":
                # MXU engine: replicated table, batch-sharded keys; plain jnp
                # (XLA SPMD propagates shardings, no collective in fwd).
                # Weighted lookups carry per-key weights in the counts
                # matrix (round 5).
                group_outs[g.name] = self._onehot_fwd(
                    g.name, tables[g.name], keys, weights=w
                )
            elif g.is_model_parallel and self.rm.data_parallel_size > 1:
                ks = tables.get(f"{g.name}#keys")
                dense_ex = ks is None and self._dense_exchange_ok(g)
                in_specs = [
                    P(self.rm.data_axes, None),
                    P(self.rm.data_axes, None),
                ]
                args = [tables[g.name], keys]
                if ks is not None:
                    in_specs.append(P(self.rm.data_axes))
                    args.append(ks)
                if w is not None:
                    in_specs.append(P(self.rm.data_axes, None))
                    args.append(w)
                body = (
                    functools.partial(
                        self._mp_fwd_dense_local, g.name,
                        weighted=w is not None,
                    )
                    if dense_ex
                    else functools.partial(
                        self._mp_fwd_local, g.name,
                        with_store=ks is not None, weighted=w is not None,
                    )
                )
                fn = shard_map(
                    body,
                    mesh=self.rm.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=P(self.rm.data_axes, None),
                    check_vma=False,
                )
                group_outs[g.name] = fn(*args)
            else:
                # single shard or data-parallel: purely local
                group_outs[g.name] = self._dp_fwd(
                    g.name, tables[g.name], keys,
                    tables.get(f"{g.name}#keys"),
                    feature_keys=feature_keys,
                    weights=w,
                )
        # slice per-lookup tops
        outs: Dict[str, Array] = {}
        for g in self.plan.groups:
            go = group_outs[g.name]
            for lm in g.lookups:
                outs[lm.top_name] = go[:, lm.out_begin : lm.out_end]
        return self._merge_outputs(outs, feature_keys, feature_weights)

    def _group_keys(self, g: GroupPlan, feature_keys: Dict[str, Array]) -> Array:
        cols = []
        for lm in g.lookups:
            k = feature_keys[lm.bottom_name]
            if k.ndim == 1:
                k = k[:, None]
            if k.shape[1] != lm.hotness:
                raise ValueError(
                    f"feature {lm.bottom_name}: hotness {k.shape[1]} != "
                    f"lookup max_hotness {lm.hotness}"
                )
            if lm.key_lo > 0 or lm.key_hi >= 0 or lm.key_shift:
                # hot/cold key window: out-of-window keys act as padding
                hi = lm.key_hi if lm.key_hi >= 0 else jnp.iinfo(k.dtype).max
                in_win = (k >= lm.key_lo) & (k < hi)
                k = jnp.where(in_win, k - lm.key_shift, INVALID_KEY)
            cols.append(k)
        return jnp.concatenate(cols, axis=1)

    def _merge_denom(self, m, feature_keys, feature_weights, dtype) -> Array:
        """[B, 1] mean denominator for a tier merge: raw-valid key count,
        or the raw-valid sp-weight sum for weighted lookups (reference:
        weighted_network_forward.cu:71 divides by sp_weight_sum)."""
        k = feature_keys[m.bottom_name]
        if k.ndim == 1:
            k = k[:, None]
        valid = k != INVALID_KEY
        if m.sp_weight_name and feature_weights is not None:
            w = feature_weights[m.sp_weight_name]
            if w.ndim == 1:
                w = w[:, None]
            sw = jnp.sum(
                jnp.where(valid, w, 0.0).astype(dtype), axis=1, keepdims=True
            )
            return jnp.where(sw == 0, jnp.asarray(1.0, dtype), sw)
        cnt = jnp.sum(valid.astype(dtype), axis=1, keepdims=True)
        return jnp.maximum(cnt, 1.0)

    def _merge_outputs(
        self,
        outs: Dict[str, Array],
        feature_keys: Dict[str, Array],
        feature_weights=None,
    ) -> Dict[str, Array]:
        """Recombine hot/cold sub-lookup tops into the user-level top
        (out = hot + cold; mean divides by the ORIGINAL valid count — or
        the sp-weight sum for weighted lookups)."""
        for m in self.plan.merges:
            o = outs.pop(m.sub_tops[0])
            for sub in m.sub_tops[1:]:
                o = o + outs.pop(sub)
            if m.combiner == Combiner_t.Mean:
                o = o / self._merge_denom(
                    m, feature_keys, feature_weights, o.dtype
                )
            outs[m.top_name] = o
        return outs

    def _expand_d_outs(
        self,
        d_outs: Dict[str, Array],
        feature_keys: Dict[str, Array],
        feature_weights=None,
    ) -> Dict[str, Array]:
        """Route the user-level cotangent to both hot/cold sub-tops."""
        if not self.plan.merges:
            return d_outs
        d_outs = dict(d_outs)
        for m in self.plan.merges:
            d = d_outs.pop(m.top_name)
            if m.combiner == Combiner_t.Mean:
                d = d / self._merge_denom(
                    m, feature_keys, feature_weights, d.dtype
                )
            for sub in m.sub_tops:
                d_outs[sub] = d
        return d_outs

    def _mp_fwd_local(
        self, gname: str, table_shard: Array, keys_loc: Array, *rest,
        with_store: bool = False, weighted: bool = False,
    ) -> Array:
        rest = list(rest)
        key_store = rest.pop(0) if with_store else None
        w_loc = rest.pop(0) if weighted else None

        g = self._meta[gname].plan
        meta = self._meta[gname]
        n = self.rm.data_parallel_size
        f = g.num_shards  # partial placement: f logical shards, n/f replicas
        my = jax.lax.axis_index(self.rm.data_axes)
        keys = jax.lax.all_gather(keys_loc, self.rm.data_axes, axis=0, tiled=True)
        weights = (
            jax.lax.all_gather(w_loc, self.rm.data_axes, axis=0, tiled=True)
            if w_loc is not None
            else None
        )
        valid, owner, local_row = self._slot_placement(meta, keys, f, key_store)
        mine = valid & (owner == (my % f))
        if g.num_replicas > 1:
            # replica r of each shard serves a disjoint block of the global
            # batch so forward work still splits n ways (contributions are
            # disjoint; psum recombines them)
            bg = keys.shape[0]
            block = bg // g.num_replicas
            row_block = (
                jnp.arange(bg, dtype=jnp.int32) // jnp.int32(block)
            )[:, None]
            mine = mine & (row_block == (my // f).astype(jnp.int32))
        if self.knob_fwd_partition:
            # NOTE: with a finite HCTR_TPU_MP_CAPACITY_FACTOR, hot-key skew
            # can overflow a shard's capacity window and DROP owned rows —
            # exact by default (no slicing); bound capacity only for
            # benchmarking or when the skew budget is understood.
            # Owner-partitioned forward: sort (row, pool-slot) int pairs so
            # this shard's owned keys form a prefix, slice to the capacity
            # bound, gather only ~K/N rows and scatter-add them into the
            # pooled layout. Row-granular work shrinks ~N x per chip (the
            # masked-gather path processes the global K everywhere).
            # mean counting must use RAW key validity (global, identical on
            # every shard) — the exact-store `found` mask is shard-LOCAL and
            # would divide by a different count per shard
            return self._mp_fwd_partitioned(
                gname, table_shard, keys, keys != INVALID_KEY, mine, local_row,
                n, weights=weights,
            )
        safe = jnp.where(mine, local_row, 0)
        rows = self._weights_view(gname, table_shard[safe])
        if weights is not None:
            rows = rows * jnp.where(mine, weights, 0.0)[..., None].astype(
                table_shard.dtype
            )
        else:
            rows = rows * mine[..., None].astype(table_shard.dtype)
        partial = self._pool(g, rows, keys != INVALID_KEY, weights=weights)
        return self._psum_scatter_batch(partial)

    def _mp_fwd_partitioned(
        self, gname, table_shard, keys, valid, mine, local_row, n,
        weights=None,
    ) -> Array:
        meta = self._meta[gname]
        g = meta.plan
        bg = keys.shape[0]
        s_slots = g.grad_src_slots
        gsrc = self._fwd_gsrc(g)
        idx = jnp.where(mine, local_row, g.total_local_rows).reshape(-1)
        src = (
            jnp.arange(bg, dtype=jnp.int32)[:, None] * s_slots
            + jnp.asarray(gsrc)[None, :]
        ).reshape(-1)
        if weights is None:
            sidx, ssrc = jax.lax.sort((idx.astype(jnp.int32), src), num_keys=1)
            sw = None
        else:
            # per-key weights ride the sort as a third operand
            sidx, ssrc, sw = jax.lax.sort(
                (idx.astype(jnp.int32), src, weights.reshape(-1)), num_keys=1
            )
        k = sidx.shape[0]

        def pooled_from(si, ss, w_s):
            rows = self._weights_view(
                gname,
                table_shard.at[si].get(
                    mode="fill", fill_value=0, indices_are_sorted=True
                ),
            )
            if w_s is not None:
                rows = rows * w_s[:, None].astype(rows.dtype)
            return jnp.zeros(
                (bg * s_slots, g.ev_size), table_shard.dtype
            ).at[ss].add(rows)

        factor = self.knob_capacity_factor
        vcap = self.valid_caps.get(gname, 0)
        if n > 1 and factor > 0:
            # explicit capacity factor: static slice, drops on overflow
            # (opt-in; pick the factor like the reference picks comm-buffer
            # capacities)
            k_limit = min(k, ((int(k * factor / n) + 511) // 512) * 512)
            if k_limit < k:
                sidx = sidx[:k_limit]
                ssrc = ssrc[:k_limit]
                if sw is not None:
                    sw = sw[:k_limit]
            pooled = pooled_from(sidx, ssrc, sw)
        elif vcap and vcap < k:
            # measured owner-partition capacity (the EXACT default): this
            # shard's owned keys form a sorted prefix ~K/N long; gather and
            # pool only the measured window, cond-falling back to full K on
            # overflow — the forward twin of apply_sparse's valid_cap slice
            mine_count = jnp.sum((sidx < g.total_local_rows).astype(jnp.int32))
            pooled = jax.lax.cond(
                mine_count <= vcap,
                lambda: pooled_from(
                    sidx[:vcap], ssrc[:vcap],
                    None if sw is None else sw[:vcap],
                ),
                lambda: pooled_from(sidx, ssrc, sw),
            )
        else:
            pooled = pooled_from(sidx, ssrc, sw)
        pooled = pooled.reshape(bg, s_slots, g.ev_size)
        pooled = self._apply_mean_scaling(g, pooled, valid, weights=weights)
        partial = pooled.reshape(bg, g.out_width)
        return self._psum_scatter_batch(partial)

    # ------------------------- unique-key (dense-compression) MP exchange
    # Reference: DenseModelParallelEmbedding
    # (embedding/dense_model_parallel_embedding.hpp:61-110) +
    # PartitionAndUniqueOperator / CompressReverseIdxRange
    # (embedding/data_distributor/data_compression_operators.cu): for
    # per-key-output (concat) MP lookups the dense psum exchanges B*H*ev
    # mostly-zero values per device; instead dedup each (batch block, owner
    # shard) key list, all_to_all only the unique VECTORS, and expand
    # locally. TPU twist: no reverse-index exchange at all — both sides
    # derive the SAME sorted-unique row list from the all_gathered keys
    # (owner/local-row are pure key math for static tables), so the
    # receiver reconstructs positions with a searchsorted instead of
    # shipped indices. Capacity-bounded lists + a psummed overflow flag
    # cond-fall back to the dense psum path, keeping the exchange EXACT.

    def _dense_exchange_ok(self, g: GroupPlan) -> bool:
        return (
            self._dense_exchange_shape_ok(g)
            and self._dense_exchange_cap(g.name) > 0
        )

    def _dense_exchange_shape_ok(self, g: GroupPlan) -> bool:
        """Static flat-mesh full-placement all-concat rowop groups only."""
        if not self.knob_dense_exchange:
            return False
        if not (g.is_model_parallel and self.rm.data_parallel_size > 1):
            return False
        if g.compute_kind != "rowop" or self._meta[g.name].any_dynamic:
            return False
        if g.num_shards != self.rm.data_parallel_size or g.num_replicas != 1:
            return False
        if self.rm.is_hierarchical or self.rm.ev_parallel_size > 1:
            return False
        if self._is_packed(g.name):
            return False
        if any(lm.combiner != Combiner_t.Concat for lm in g.lookups):
            return False
        if self.frozen_tables and any(
            self._is_frozen(t.name) for t in g.tables
        ):
            return False
        return True

    def _dense_exchange_cap(self, gname: str) -> int:
        return self.knob_dense_exchange_cap or self.dense_exchange_caps.get(
            gname, 0
        )

    def _dense_lists(self, gname: str, keys: Array):
        """[n, f, C] sorted-unique local-row lists per (batch block, owner
        shard) + a global overflow flag; identical on every device (pure
        key math over the all_gathered keys — the analog of the reference's
        partition_and_unique hash table, computed WITHOUT one)."""
        meta = self._meta[gname]
        g = meta.plan
        f = g.num_shards
        cap = self._dense_exchange_cap(gname)
        n = self.rm.data_parallel_size
        bg = keys.shape[0]
        valid, owner, local_row = self._slot_placement(meta, keys, f)
        kpb = (bg // n) * keys.shape[1]
        sent_row = jnp.int32(g.total_local_rows)
        ow = jnp.where(valid, owner, f).reshape(n, kpb).astype(jnp.int32)
        rw = jnp.where(valid, local_row, sent_row).reshape(n, kpb).astype(
            jnp.int32
        )
        so, sr = jax.lax.sort((ow, rw), num_keys=2)  # lex, batched over n
        first = jnp.concatenate(
            [
                jnp.ones((n, 1), bool),
                (so[:, 1:] != so[:, :-1]) | (sr[:, 1:] != sr[:, :-1]),
            ],
            axis=1,
        )
        unew = first & (so < f)
        grank = jnp.cumsum(unew.astype(jnp.int32), axis=1) - 1
        cnt = jnp.stack(
            [
                jnp.sum((unew & (so == s)).astype(jnp.int32), axis=1)
                for s in range(f)
            ],
            axis=1,
        )  # [n, f]
        start = jnp.cumsum(cnt, axis=1) - cnt  # exclusive per-owner start
        start_e = jnp.take_along_axis(
            start, jnp.clip(so, 0, f - 1), axis=1
        )
        srank = grank - start_e
        dest = jnp.where(
            unew & (srank < cap), jnp.clip(so, 0, f - 1) * cap + srank, f * cap
        )
        lists = (
            jnp.full((n, f * cap), sent_row, jnp.int32)
            .at[jnp.arange(n, dtype=jnp.int32)[:, None], dest]
            .set(sr, mode="drop")
        )
        overflow = jnp.any(cnt > cap)
        return lists.reshape(n, f, cap), overflow

    def _dense_positions(self, gname: str, my_lists: Array, keys_loc: Array):
        """(flat recv index, valid) for each local key slot: position of its
        row in the owner's unique list (exact when no overflow — the cond
        guarantees every owned row is present)."""
        meta = self._meta[gname]
        g = meta.plan
        f = g.num_shards
        cap = my_lists.shape[1]
        valid, owner, local_row = self._slot_placement(meta, keys_loc, f)
        of = owner.reshape(-1)
        rf = local_row.reshape(-1).astype(jnp.int32)
        pos = jnp.zeros(rf.shape, jnp.int32)
        for s in range(f):
            ps = jnp.searchsorted(my_lists[s], rf).astype(jnp.int32)
            pos = jnp.where(of == s, ps, pos)
        flat = jnp.clip(of, 0, f - 1) * cap + jnp.minimum(pos, cap - 1)
        return flat, valid

    def _mp_fwd_dense_local(
        self, gname: str, table_shard: Array, keys_loc: Array, *rest,
        weighted: bool = False,
    ) -> Array:
        w_loc = rest[0] if weighted else None
        meta = self._meta[gname]
        g = meta.plan
        f = g.num_shards
        cap = self._dense_exchange_cap(gname)
        my = jax.lax.axis_index(self.rm.data_axes)
        keys = jax.lax.all_gather(
            keys_loc, self.rm.data_axes, axis=0, tiled=True
        )
        lists, overflow = self._dense_lists(gname, keys)
        over = jax.lax.psum(
            overflow.astype(jnp.int32), self.rm.data_axes
        ) > 0

        b_loc = keys_loc.shape[0]

        def compressed():
            # src role: vectors for every block's list owned by MY shard.
            # No indices_are_sorted flag: each block's cap-row list is
            # ascending but the FLATTENED [n, C] sequence restarts per
            # block, so the global-sort guarantee the flag asserts is false
            send = table_shard.at[jnp.take(lists, my, axis=1)].get(
                mode="fill", fill_value=0
            )  # [n, C, ev]
            recv = jax.lax.all_to_all(
                send, self.rm.data_axes, split_axis=0, concat_axis=0,
                tiled=True,
            )  # recv[s] = shard s's vectors for MY block
            my_lists = jnp.take(lists, my, axis=0)  # [f, C]
            flat, valid = self._dense_positions(gname, my_lists, keys_loc)
            vecs = recv.reshape(f * cap, g.ev_size)[flat]
            vecs = vecs * valid.reshape(-1, 1).astype(vecs.dtype)
            if w_loc is not None:
                vecs = vecs * jnp.where(valid, w_loc, 0.0).reshape(
                    -1, 1
                ).astype(vecs.dtype)
            return vecs.reshape(b_loc, g.out_width)

        def fallback():
            # dense psum path (identical math to _mp_fwd_local's default)
            valid, owner, local_row = self._slot_placement(meta, keys, f)
            mine = valid & (owner == my)
            weights = (
                jax.lax.all_gather(
                    w_loc, self.rm.data_axes, axis=0, tiled=True
                )
                if w_loc is not None
                else None
            )
            safe = jnp.where(mine, local_row, 0)
            rows = table_shard[safe]
            if weights is not None:
                rows = rows * jnp.where(mine, weights, 0.0)[..., None].astype(
                    table_shard.dtype
                )
            else:
                rows = rows * mine[..., None].astype(table_shard.dtype)
            partial = self._pool(g, rows, keys != INVALID_KEY, weights=weights)
            return self._psum_scatter_batch(partial)

        return jax.lax.cond(over, fallback, compressed)

    def _mp_bwd_dense_local(
        self, gname: str, table_shard: Array, state, keys_loc: Array,
        d_loc: Array, lr, step, *rest, weighted: bool = False,
    ):
        w_loc = rest[0] if weighted else None
        meta = self._meta[gname]
        g = meta.plan
        f = g.num_shards
        n = self.rm.data_parallel_size
        cap = self._dense_exchange_cap(gname)
        my = jax.lax.axis_index(self.rm.data_axes)
        keys = jax.lax.all_gather(
            keys_loc, self.rm.data_axes, axis=0, tiled=True
        )
        lists, overflow = self._dense_lists(gname, keys)
        over = jax.lax.psum(
            overflow.astype(jnp.int32), self.rm.data_axes
        ) > 0
        opt = self.group_opt[gname]
        b_loc = keys_loc.shape[0]

        def compressed():
            my_lists = jnp.take(lists, my, axis=0)
            flat, valid = self._dense_positions(gname, my_lists, keys_loc)
            dk = d_loc.reshape(b_loc, g.hotness_total, g.ev_size)
            if w_loc is not None:
                dk = dk * w_loc[..., None].astype(dk.dtype)
            tgt = jnp.where(valid.reshape(-1), flat, f * cap)
            gbuf = (
                jnp.zeros((f * cap, g.ev_size), jnp.float32)
                .at[tgt]
                .add(dk.reshape(-1, g.ev_size).astype(jnp.float32), mode="drop")
            )
            recv = jax.lax.all_to_all(
                gbuf.reshape(f, cap, g.ev_size),
                self.rm.data_axes, split_axis=0, concat_axis=0, tiled=True,
            )  # recv[d] = block d's grad sums for MY owned lists
            idx = jnp.take(lists, my, axis=1).reshape(-1)  # [n*C] + sentinel
            dsrc = recv.reshape(-1, g.ev_size).astype(self.dtype)
            src = jnp.arange(n * cap, dtype=jnp.int32)
            # init-captured knobs only (trace-time env reads would escape
            # Solver.compile()'s apply-and-restore window); the ucap/vcap
            # windows measured for the psum path don't transfer to the
            # already-compact [n*cap] list, and the dense key-ratio rule is
            # disabled for the same reason (no measured count for it)
            return sparse_optimizer.apply_sparse(
                opt, table_shard, state, idx, src, dsrc, lr, step,
                segsum=self.knob_segsum,
                scatter_auto=self.knob_scatter_auto,
                fold_budget=self.knob_segsum_fold_bytes,
                dense_rows=self.knob_dense_update_rows,
                dense_grad_dtype=self.knob_dense_grad_dtype,
                dense_ratio=0.0,
            )

        def fallback():
            d_group = jax.lax.all_gather(
                d_loc, self.rm.data_axes, axis=0, tiled=True
            )
            weights = (
                jax.lax.all_gather(
                    w_loc, self.rm.data_axes, axis=0, tiled=True
                )
                if w_loc is not None
                else None
            )
            idx, src, dsrc = self._row_grads(
                gname, keys, d_group, f, my, None, weights=weights
            )
            return sparse_optimizer.apply_sparse(
                opt, table_shard, state, idx, src, dsrc, lr, step,
                **self._opt_knobs(gname),
            )

        return jax.lax.cond(over, fallback, compressed)

    def _fwd_gsrc(self, g: GroupPlan) -> np.ndarray:
        """Per-slot pooled-accumulator slot id (identical construction to the
        backward gradient-source map in _grad_source)."""
        gsrc = np.zeros(g.hotness_total, dtype=np.int32)
        s_cursor = 0
        for lm in g.lookups:
            h = lm.slot_end - lm.slot_begin
            if lm.combiner == Combiner_t.Concat:
                gsrc[lm.slot_begin : lm.slot_end] = s_cursor + np.arange(h)
                s_cursor += h
            else:
                gsrc[lm.slot_begin : lm.slot_end] = s_cursor
                s_cursor += 1
        return gsrc

    def _apply_mean_scaling(self, g: GroupPlan, pooled, valid, weights=None):
        """Divide mean-combiner accumulator slots by the per-sample valid
        count — or the per-sample weight sum for weighted lookups (global
        count — every shard scales its partial identically, so the psum of
        partials equals mean)."""
        parts = []
        s_cursor = 0
        for lm in g.lookups:
            h = lm.slot_end - lm.slot_begin
            if lm.combiner == Combiner_t.Concat:
                parts.append(pooled[:, s_cursor : s_cursor + h])
                s_cursor += h
            else:
                p = pooled[:, s_cursor : s_cursor + 1]
                if lm.combiner == Combiner_t.Mean:
                    p = p / self._mean_denom(
                        g, lm, valid, weights, p.dtype
                    )[..., None]
                parts.append(p)
                s_cursor += 1
        return jnp.concatenate(parts, axis=1)

    # ------------------------------------------------- one-hot MXU engine
    def _onehot_counts(
        self, gname: str, keys: Array, dtype, weights: Optional[Array] = None
    ) -> Tuple[Dict[int, Array], Array]:
        """Per-lookup key-count matrices.

        Returns ({lookup_pos: counts [B, vocab]}, valid [B, H]). counts[b, r]
        is how many of sample b's keys in that lookup hit table row r (mean
        combiner divides later). For weighted lookups each hit contributes
        its per-key weight instead of 1, so the SAME counts matmul computes
        Σ wᵢeᵢ (reference: weighted_model_forward.cu per-key multiply).
        This is the TPU-first replacement for the reference's per-row
        generic_lookup kernels on small tables: the lookup becomes
        ``counts @ table`` on the MXU and the backward becomes
        ``countsᵀ @ d_out`` (reference semantics:
        embedding/operators/generic_lookup.cuh multi_to_one reduction)."""
        meta = self._meta[gname]
        g = meta.plan
        valid, _owner, local_row = self._slot_placement(meta, keys, 1)
        compare_max = self.knob_onehot_compare_max
        counts: Dict[int, Array] = {}
        for li, lm in enumerate(g.lookups):
            ti = lm.table_index
            off = int(g.local_offsets[ti])
            v = int(g.table_vocab[ti])
            k = local_row[:, lm.slot_begin : lm.slot_end] - off  # [B, h]
            val = valid[:, lm.slot_begin : lm.slot_end]
            w_lk = (
                weights[:, lm.slot_begin : lm.slot_end].astype(dtype)
                if weights is not None and lm.sp_weight_name
                else None
            )
            b = k.shape[0]
            if v > compare_max:
                # high-hotness big-vocab table (plan.onehot_scatter_ratio):
                # ONE scatter-add of B*H ones builds the counts matrix in
                # O(K) — the compare chain below is O(B*vocab*H). Invalid
                # slots index out of range and drop. bf16 holds the small
                # integer counts exactly (< 256 duplicates per sample).
                kk = jnp.where(val, k, v)
                contrib = (
                    w_lk if w_lk is not None else jnp.ones(kk.shape, dtype)
                )
                counts[li] = (
                    jnp.zeros((b, v), dtype)
                    .at[jnp.arange(b, dtype=jnp.int32)[:, None], kk]
                    .add(contrib, mode="drop")
                )
                continue
            iota = jnp.arange(v, dtype=jnp.int32)[None, :]
            cnt = None
            for h in range(lm.slot_end - lm.slot_begin):
                oh = (
                    (k[:, h : h + 1] == iota) & val[:, h : h + 1]
                ).astype(dtype)
                if w_lk is not None:
                    oh = oh * w_lk[:, h : h + 1]
                cnt = oh if cnt is None else cnt + oh
            counts[li] = cnt
        return counts, valid

    def _use_onehot_kernel(self) -> bool:
        k = self.knob_onehot_kernel
        if k == "pallas":
            return True
        if k == "xla":
            return False
        return jax.default_backend() == "tpu"

    def _onehot_local_keys(self, meta, keys, lm, g):
        """Table-local rows for one lookup; negatives act as padding."""
        valid, _o, local_row = self._slot_placement(meta, keys, 1)
        off = int(g.local_offsets[lm.table_index])
        k = local_row[:, lm.slot_begin : lm.slot_end] - off
        val = valid[:, lm.slot_begin : lm.slot_end]
        return jnp.where(val, k, -1), val

    def _onehot_fwd(
        self, gname: str, table: Array, keys: Array,
        weights: Optional[Array] = None,
    ) -> Array:
        meta = self._meta[gname]
        g = meta.plan
        # the fused Pallas kernels regenerate UNWEIGHTED one-hot tiles in
        # registers; weighted groups take the XLA counts path (the weight
        # multiply fuses into the counts build)
        if self._use_onehot_kernel() and weights is None:
            from ..ops.pallas.onehot_matmul import onehot_matmul_fwd

            outs: List[Array] = []
            for lm in g.lookups:
                ti = lm.table_index
                off = int(g.local_offsets[ti])
                v = int(g.table_vocab[ti])
                k_rel, val = self._onehot_local_keys(meta, keys, lm, g)
                vb = min(512, ((v + 127) // 128) * 128)
                o = onehot_matmul_fwd(k_rel, table[off : off + v], vb=vb)
                if lm.combiner == Combiner_t.Mean:
                    nval = jnp.sum(
                        val.astype(o.dtype), axis=1, keepdims=True
                    )
                    o = o / jnp.maximum(nval, 1.0)
                outs.append(o)
            return jnp.concatenate(outs, axis=1)
        counts, valid = self._onehot_counts(
            gname, keys, table.dtype, weights=weights
        )
        outs: List[Array] = []
        for li, lm in enumerate(g.lookups):
            ti = lm.table_index
            off = int(g.local_offsets[ti])
            v = int(g.table_vocab[ti])
            cnt = counts[li]
            if lm.combiner == Combiner_t.Mean:
                # weighted mean divides by the sp-weight sum
                cnt = cnt / self._mean_denom(g, lm, valid, weights, cnt.dtype)
            outs.append(
                jnp.dot(
                    cnt,
                    table[off : off + v],
                    preferred_element_type=table.dtype,
                )
            )
        return jnp.concatenate(outs, axis=1)

    def _onehot_grad(
        self, gname: str, table_dtype, keys: Array, d_group: Array,
        weights: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Dense [R, E] gradient + [R] touch counts for a one-hot group."""
        meta = self._meta[gname]
        g = meta.plan
        if self._use_onehot_kernel() and weights is None:
            return self._onehot_grad_pallas(gname, table_dtype, keys, d_group)
        counts, valid = self._onehot_counts(
            gname, keys, table_dtype, weights=weights
        )
        grad = jnp.zeros((g.total_local_rows, g.ev_size), table_dtype)
        colsum = jnp.zeros((g.total_local_rows,), jnp.float32)
        for li, lm in enumerate(g.lookups):
            if self._is_frozen(g.tables[lm.table_index].name):
                continue
            ti = lm.table_index
            off = int(g.local_offsets[ti])
            v = int(g.table_vocab[ti])
            cnt = counts[li]
            d = d_group[:, lm.out_begin : lm.out_end].astype(table_dtype)
            if lm.combiner == Combiner_t.Mean:
                d = d / self._mean_denom(g, lm, valid, weights, d.dtype)
            if weights is not None and lm.sp_weight_name:
                # SIGNED weights can cancel a touched row's plain column
                # sum while its gradient stays nonzero (different d per
                # sample) — touch counts sum |counts| in a separate matvec
                ge = jnp.dot(cnt.T, d, preferred_element_type=table_dtype)
                grad = grad.at[off : off + v].add(ge)
                touch = jnp.sum(jnp.abs(cnt).astype(jnp.float32), axis=0)
                colsum = colsum.at[off : off + v].add(touch)
                continue
            # ones-column trick: appending 1s to the cotangent folds the
            # touch-count column sum into the SAME cntT matmul, saving a
            # separate full read of the [B, vocab] counts matrix. touched
            # only needs colsum > 0, which bf16 partial sums preserve
            # (sums of positives never round to 0).
            d_ext = jnp.concatenate(
                [d, jnp.ones((d.shape[0], 1), d.dtype)], axis=1
            )
            ge = jnp.dot(cnt.T, d_ext, preferred_element_type=table_dtype)
            grad = grad.at[off : off + v].add(ge[:, :-1])
            colsum = colsum.at[off : off + v].add(
                ge[:, -1].astype(jnp.float32)
            )
        return grad, colsum

    def _onehot_grad_pallas(
        self, gname: str, table_dtype, keys: Array, d_group: Array
    ) -> Tuple[Array, Array]:
        """Fused-kernel wgrad: the one-hot tile is regenerated in registers
        per MXU block (ops/pallas/onehot_matmul.onehot_matmul_bwd), so the
        [B, vocab] counts matrix never materializes in HBM — the XLA
        compare/add chain is ~4 ms/step on the DLRM bench at batch 16384."""
        from ..ops.pallas.onehot_matmul import onehot_matmul_bwd

        meta = self._meta[gname]
        g = meta.plan
        grad = jnp.zeros((g.total_local_rows, g.ev_size), table_dtype)
        colsum = jnp.zeros((g.total_local_rows,), jnp.float32)
        for lm in g.lookups:
            if self._is_frozen(g.tables[lm.table_index].name):
                continue
            ti = lm.table_index
            off = int(g.local_offsets[ti])
            v = int(g.table_vocab[ti])
            k_rel, val = self._onehot_local_keys(meta, keys, lm, g)
            d = d_group[:, lm.out_begin : lm.out_end].astype(table_dtype)
            if lm.combiner == Combiner_t.Mean:
                nval = jnp.sum(val.astype(d.dtype), axis=1, keepdims=True)
                d = d / jnp.maximum(nval, 1.0)
            vb = min(512, ((v + 127) // 128) * 128)
            ge, cnt = onehot_matmul_bwd(k_rel, d, v, table_dtype, vb=vb)
            grad = grad.at[off : off + v].add(ge)
            colsum = colsum.at[off : off + v].add(cnt)
        return grad, colsum

    def _onehot_bwd_local(
        self, gname, table, state, keys_loc, d_loc, lr, step, *rest,
        weighted: bool = False,
    ):
        w_loc = rest[0] if weighted else None
        grad, colsum = self._onehot_grad(
            gname, table.dtype, keys_loc, d_loc, weights=w_loc
        )
        if self.rm.data_parallel_size > 1:
            grad = jax.lax.psum(grad, self.rm.data_axes)
            colsum = jax.lax.psum(colsum, self.rm.data_axes)
        touched = colsum > 0
        opt = self.group_opt[gname]
        return sparse_optimizer.apply_dense(
            opt, table, state, grad, touched, lr, step
        )

    def _dp_fwd(
        self, gname: str, table: Array, keys: Array, key_store=None,
        feature_keys=None, weights=None,
    ) -> Array:
        g = self._meta[gname].plan
        meta = self._meta[gname]
        vcap = self.valid_caps.get(gname, 0)
        if (vcap and vcap < keys.size) or self._fwd_sorted_big(g):
            # sorted-gather forward, two triggers:
            # (a) mostly-padding key list (hot/cold window): the valid
            #     prefix beats gathering every padded slot;
            # (b) multi-GB operand (many-table shared group): input-order
            #     gathers pay the ~30 ns/row TLB rate while SORTED gathers
            #     run ~6 ns/row at ANY operand size (measured, ROADMAP) —
            #     and the sort CSEs with the backward's, so the marginal
            #     cost is one pool scatter into a small [B*S, E] operand.
            return self._dp_fwd_compact(
                gname, table, keys, key_store, vcap,
                feature_keys=feature_keys, weights=weights,
            )
        valid, _owner, local_row = self._slot_placement(meta, keys, 1, key_store)
        safe = jnp.where(valid, local_row, 0)
        rows = self._weights_view(gname, table[safe])
        if weights is not None:
            rows = rows * jnp.where(valid, weights, 0.0)[..., None].astype(
                table.dtype
            )
        else:
            rows = rows * valid[..., None].astype(table.dtype)
        # mean counts use RAW validity (consistent across steps/shards even
        # when exact-store misses drop rows this step)
        return self._pool(g, rows, keys != INVALID_KEY, weights=weights)

    def _fwd_sorted_big(self, g: GroupPlan) -> bool:
        """Whether this group's storage is big enough that the forward
        should gather in sorted order (see _dp_fwd)."""
        thr = self.knob_fwd_sorted_bytes
        if not thr or g.compute_kind != "rowop":
            return False
        itemsize = 2 if self.dtype == jnp.bfloat16 else 4
        return g.total_storage_rows * g.ev_size * itemsize >= thr

    def _dp_fwd_compact(
        self, gname: str, table: Array, keys: Array, key_store, vcap: int,
        feature_keys=None, weights=None,
    ) -> Array:
        """Forward for groups whose [B, H] key list is mostly padding (e.g.
        the cold half of a hot/cold split): sort (row, pool-slot) pairs so
        valid keys form a prefix, slice to the measured valid cap (lax.cond
        full fallback keeps it exact), gather only that prefix and
        scatter-add into the pooled layout. The sort is constructed exactly
        like the backward's, so XLA CSEs the two."""
        meta = self._meta[gname]
        g = meta.plan
        b = keys.shape[0]
        sw = None
        if feature_keys is not None and weights is None and self._tier_shared_ok(g):
            s_slots = g.grad_src_slots
            sidx, ssrc = self._tier_sorted_rows(gname, feature_keys)
        else:
            valid, _owner, local_row = self._slot_placement(
                meta, keys, 1, key_store
            )
            s_slots = g.grad_src_slots
            gsrc = self._fwd_gsrc(g)
            idx = jnp.where(valid, local_row, g.total_local_rows).reshape(-1)
            src = (
                jnp.arange(b, dtype=jnp.int32)[:, None] * s_slots
                + jnp.asarray(gsrc)[None, :]
            ).reshape(-1)
            if weights is None:
                sidx, ssrc = jax.lax.sort(
                    (idx.astype(jnp.int32), src), num_keys=1
                )
            else:
                sidx, ssrc, sw = jax.lax.sort(
                    (idx.astype(jnp.int32), src, weights.reshape(-1)),
                    num_keys=1,
                )

        def pooled_from(si, ss, w_s):
            rows = self._weights_view(
                gname,
                table.at[si].get(
                    mode="fill", fill_value=0, indices_are_sorted=True
                ),
            )
            if w_s is not None:
                rows = rows * w_s[:, None].astype(rows.dtype)
            return jnp.zeros((b * s_slots, g.ev_size), table.dtype).at[ss].add(
                rows
            )

        if vcap and vcap < sidx.shape[0]:
            v_count = jnp.sum((sidx < g.total_local_rows).astype(jnp.int32))
            pooled = jax.lax.cond(
                v_count <= vcap,
                lambda: pooled_from(
                    sidx[:vcap], ssrc[:vcap], None if sw is None else sw[:vcap]
                ),
                lambda: pooled_from(sidx, ssrc, sw),
            )
        else:
            # big-operand sorted-gather trigger without a measured valid
            # cap: run the full sorted list (no cond)
            pooled = pooled_from(sidx, ssrc, sw)
        pooled = pooled.reshape(b, s_slots, g.ev_size)
        pooled = self._apply_mean_scaling(
            g, pooled, keys != INVALID_KEY, weights=weights
        )
        return pooled.reshape(b, g.out_width)

    # ------------------------------------------------- backward + update
    def backward_and_update(
        self,
        tables: Dict[str, Array],
        opt_state: Dict[str, Dict[str, Array]],
        feature_keys: Dict[str, Array],
        d_outs: Dict[str, Array],
        lr: Array,
        step: Array,
        feature_weights: Optional[Dict[str, Array]] = None,
    ) -> Tuple[Dict[str, Array], Dict[str, Dict[str, Array]]]:
        """Fused embedding backward + sparse optimizer update.

        d_outs: {top_name: [B, out_width]} cotangents from the dense network.
        feature_weights: per-key sparse weights (see `forward`) — row
        gradients scale by w_i (reference: weighted_model_backward.cu).
        """
        new_tables = dict(tables)
        new_state = dict(opt_state)
        lr = jnp.asarray(lr, dtype=self.dtype)
        step = jnp.asarray(step)
        d_outs = self._expand_d_outs(d_outs, feature_keys, feature_weights)
        for g in self.plan.groups:
            keys = self._group_keys(g, feature_keys)
            w = self._group_weights(g, feature_weights)
            if w is not None:
                w = w * (keys != INVALID_KEY)
            d_group = jnp.concatenate(
                [d_outs[lm.top_name].astype(self.dtype) for lm in g.lookups], axis=1
            )
            if g.compute_kind == "onehot":
                if self.rm.data_parallel_size > 1:
                    in_specs = [
                        P(),
                        jax.tree.map(lambda _: P(), opt_state[g.name]),
                        P(self.rm.data_axes, None),
                        P(self.rm.data_axes, None),
                        P(),
                        P(),
                    ]
                    args = [
                        tables[g.name], opt_state[g.name], keys, d_group,
                        lr, step,
                    ]
                    if w is not None:
                        in_specs.append(P(self.rm.data_axes, None))
                        args.append(w)
                    fn = shard_map(
                        functools.partial(
                            self._onehot_bwd_local, g.name,
                            weighted=w is not None,
                        ),
                        mesh=self.rm.mesh,
                        in_specs=tuple(in_specs),
                        out_specs=(
                            P(),
                            jax.tree.map(lambda _: P(), opt_state[g.name]),
                        ),
                        check_vma=False,
                    )
                    new_tables[g.name], new_state[g.name] = fn(*args)
                else:
                    new_tables[g.name], new_state[g.name] = self._onehot_bwd_local(
                        g.name, tables[g.name], opt_state[g.name], keys,
                        d_group, lr, step,
                        *([w] if w is not None else []),
                        weighted=w is not None,
                    )
            elif g.is_model_parallel and self.rm.data_parallel_size > 1:
                ks = tables.get(f"{g.name}#keys")
                st_spec = jax.tree.map(
                    lambda _: P(self.rm.data_axes, None), opt_state[g.name]
                )
                in_specs = [
                    P(self.rm.data_axes, None),
                    st_spec,
                    P(self.rm.data_axes, None),
                    P(self.rm.data_axes, None),
                    P(),
                    P(),
                ]
                out_specs = [P(self.rm.data_axes, None), st_spec]
                args = [tables[g.name], opt_state[g.name], keys, d_group, lr, step]
                if ks is not None:
                    in_specs.append(P(self.rm.data_axes))
                    out_specs.append(P(self.rm.data_axes))
                    args.append(ks)
                if w is not None:
                    in_specs.append(P(self.rm.data_axes, None))
                    args.append(w)
                body = (
                    functools.partial(
                        self._mp_bwd_dense_local, g.name,
                        weighted=w is not None,
                    )
                    if ks is None and self._dense_exchange_ok(g)
                    else functools.partial(
                        self._mp_bwd_local, g.name,
                        with_store=ks is not None, weighted=w is not None,
                    )
                )
                fn = shard_map(
                    body,
                    mesh=self.rm.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=tuple(out_specs),
                    check_vma=False,
                )
                out = fn(*args)
                new_tables[g.name], new_state[g.name] = out[0], out[1]
                if ks is not None:
                    new_tables[f"{g.name}#keys"] = out[2]
            elif self.rm.data_parallel_size > 1:
                ks = tables.get(f"{g.name}#keys")
                st_spec = jax.tree.map(lambda _: P(), opt_state[g.name])
                in_specs = [
                    P(),
                    st_spec,
                    P(self.rm.data_axes, None),
                    P(self.rm.data_axes, None),
                    P(),
                    P(),
                ]
                out_specs = [P(), st_spec]
                args = [tables[g.name], opt_state[g.name], keys, d_group, lr, step]
                if ks is not None:
                    in_specs.append(P())
                    out_specs.append(P())
                    args.append(ks)
                if w is not None:
                    in_specs.append(P(self.rm.data_axes, None))
                    args.append(w)
                fn = shard_map(
                    functools.partial(
                        self._dp_bwd_local, g.name,
                        with_store=ks is not None, weighted=w is not None,
                    ),
                    mesh=self.rm.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=tuple(out_specs),
                    check_vma=False,
                )
                out = fn(*args)
                new_tables[g.name], new_state[g.name] = out[0], out[1]
                if ks is not None:
                    new_tables[f"{g.name}#keys"] = out[2]
            elif self._tier_shared_ok(g):
                new_tables[g.name], new_state[g.name] = self._bwd_single_shared(
                    g.name, tables[g.name], opt_state[g.name], feature_keys,
                    d_group, lr, step,
                )
            else:
                ks = tables.get(f"{g.name}#keys")
                out = self._bwd_single(
                    g.name, tables[g.name], opt_state[g.name], keys, d_group,
                    lr, step, key_store=ks, weights=w,
                )
                new_tables[g.name], new_state[g.name] = out[0], out[1]
                if ks is not None:
                    new_tables[f"{g.name}#keys"] = out[2]
        return new_tables, new_state

    def _tier_shared_ok(self, g: GroupPlan) -> bool:
        """Whether this tier group can consume the shared parent-key sort.

        Single-shard static single-table rowop groups whose every lookup
        carries the same [key_lo, key_hi) window (i.e. hot/cold split tiers
        on one chip). Frozen tables fall back to the per-tier path (the
        shared construction has no slot mask)."""
        if not self.knob_shared_tier_sort:
            return False
        if self.rm.data_parallel_size != 1 or g.num_shards != 1:
            return False
        if g.compute_kind != "rowop" or self._meta[g.name].any_dynamic:
            return False
        if self.frozen_tables or len(g.tables) != 1:
            return False
        lks = g.lookups
        if not lks or any(lk.combiner != Combiner_t.Sum for lk in lks):
            return False
        if any(lk.sp_weight_name for lk in lks):
            # the shared raw-key sort carries no weight operand; weighted
            # tiers use the per-group sort (weights ride as a 3rd sort key)
            return False
        lo, hi = lks[0].key_lo, lks[0].key_hi
        if hi < 0:
            return False
        return all(
            lk.key_lo == lo and lk.key_hi == hi and lk.key_shift == lo
            for lk in lks
        )

    def _tier_sorted_rows(
        self, gname: str, feature_keys: Dict[str, Array]
    ) -> Tuple[Array, Array]:
        """Tier-local sorted (row ids, grad-source ids) from ONE shared sort.

        Sorts the parent table's RAW keys (identical construction for every
        sibling tier and for forward AND backward, so XLA CSEs all of them
        into a single lax.sort per split table per step — the hot and cold
        tiers of a 100-hot table each used to pay their own [B*H] sort).
        The tier's window [lo, hi) occupies a contiguous run of the sorted
        array starting at a dynamic offset; a roll moves it to the front so
        the result is sorted-with-sentinel exactly like the per-tier sort,
        and the existing measured-window cond machinery applies unchanged.
        """
        g = self._meta[gname].plan
        lo, hi = g.lookups[0].key_lo, g.lookups[0].key_hi
        cols = []
        for lm in g.lookups:
            k = feature_keys[lm.bottom_name]
            if k.ndim == 1:
                k = k[:, None]
            cols.append(k)
        raw = jnp.concatenate(cols, axis=1).astype(jnp.int32)
        b = raw.shape[0]
        s_slots = g.grad_src_slots
        gsrc = self._fwd_gsrc(g)
        kraw = jnp.where(
            raw != INVALID_KEY, raw, jnp.iinfo(jnp.int32).max
        ).reshape(-1)
        src = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * s_slots
            + jnp.asarray(gsrc)[None, :]
        ).reshape(-1)
        sidx, ssrc = jax.lax.sort((kraw, src), num_keys=1)
        p_lo = jnp.sum((sidx < lo).astype(jnp.int32))
        count = jnp.sum(((sidx >= lo) & (sidx < hi)).astype(jnp.int32))
        r_idx = jnp.roll(sidx, -p_lo)
        r_src = jnp.roll(ssrc, -p_lo)
        j = jnp.arange(sidx.shape[0], dtype=jnp.int32)
        sentinel = jnp.asarray(g.total_local_rows, jnp.int32)
        tier_idx = jnp.where(j < count, r_idx - lo, sentinel)
        return tier_idx, r_src

    def _row_grads(
        self, gname: str, keys: Array, d_group: Array, num_shards: int, my,
        key_store=None, weights=None,
    ) -> Tuple[Array, Array, Array]:
        """Shared bwd math: (flat row idx with sentinel, grad source row ids,
        compact grad source). Foreign/invalid keys carry the sentinel row and
        are dropped as whole segments downstream (no [K, E] mask multiply).

        Weighted groups expand to PER-KEY gradient rows (w_i * d) since keys
        sharing a pooled source row carry different weights (reference:
        weighted_model_backward.cu coordinate_sp_weight scaling)."""
        meta = self._meta[gname]
        g = meta.plan
        valid, owner, local_row = self._slot_placement(
            meta, keys, num_shards, key_store
        )
        mine = valid if my is None else (valid & (owner == my))
        if self.frozen_tables:
            unfrozen = jnp.asarray(
                np.array(
                    [not self._is_frozen(g.tables[ti].name)
                     for ti in g.slot_table]
                )
            )
            mine = mine & unfrozen[None, :]
        dsrc, gsrc = self._grad_source(
            g, d_group, keys != INVALID_KEY, weights=weights
        )
        n_src = g.grad_src_slots
        b = keys.shape[0]
        idx = jnp.where(mine, local_row, g.total_local_rows).reshape(-1)
        if weights is not None:
            # per-key grad rows: dsrc_key[b, h] = w[b, h] * dsrc[b, gsrc[h]]
            dk = dsrc.reshape(b, n_src, g.ev_size)[:, np.asarray(gsrc), :]
            dk = dk * weights[..., None].astype(dk.dtype)
            src = jnp.arange(b * g.hotness_total, dtype=jnp.int32)
            return idx, src, dk.reshape(-1, g.ev_size)
        src = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * n_src
            + jnp.asarray(gsrc)[None, :]
        )
        return idx, src.reshape(-1), dsrc

    def _mp_bwd_local(
        self, gname, table_shard, state, keys_loc, d_loc, lr, step, *rest,
        with_store: bool = False, weighted: bool = False,
    ):
        rest = list(rest)
        key_store = rest.pop(0) if with_store else None
        w_loc = rest.pop(0) if weighted else None

        my = jax.lax.axis_index(self.rm.data_axes)
        meta = self._meta[gname]
        f = meta.plan.num_shards  # partial placement shard count
        keys = jax.lax.all_gather(keys_loc, self.rm.data_axes, axis=0, tiled=True)
        d_group = jax.lax.all_gather(d_loc, self.rm.data_axes, axis=0, tiled=True)
        weights = (
            jax.lax.all_gather(w_loc, self.rm.data_axes, axis=0, tiled=True)
            if w_loc is not None
            else None
        )
        if key_store is not None:
            # insert-on-backward for exact dynamic tables: every replica of
            # a shard computes the identical insertion (deterministic
            # scatter-min arbitration), keeping stores bit-identical.
            # Ownership comes from the PROBE's (reserved-key-folded) hash so
            # insert and lookup always agree on the owning shard.
            owner_d, _, _ = self._dynamic_probe(meta, keys, f, key_store)
            mine_valid = (keys != INVALID_KEY) & (owner_d == (my % f))
            key_store = self._dynamic_insert(meta, key_store, keys, mine_valid, f)
        # every replica of shard s applies the FULL update for s, keeping
        # replica groups bit-identical (like DP wgrad allreduce)
        idx, src, dsrc = self._row_grads(
            gname, keys, d_group, f, my % f, key_store, weights=weights
        )
        opt = self.group_opt[gname]
        # owner-partition capacity: each shard's owned entries are a sorted
        # prefix, bounded by K/f x capacity factor (TPU analog of the
        # reference's all2all capacity buffers). EXACT by default (factor 0 =
        # no slicing): a finite factor trades hot-key-overflow gradient drops
        # for ~f x less row-granular work per chip — opt in via
        # HCTR_TPU_MP_CAPACITY_FACTOR when the skew budget is understood.
        k_limit = 0
        factor = self.knob_capacity_factor
        if f > 1 and factor > 0:
            k = int(idx.shape[0])
            k_limit = min(k, ((int(k * factor / f) + 511) // 512) * 512)
        new_t, new_s = sparse_optimizer.apply_sparse(
            opt, table_shard, state, idx, src, dsrc, lr, step,
            k_limit=k_limit, **self._opt_knobs(gname)
        )
        if key_store is not None:
            return new_t, new_s, key_store
        return new_t, new_s

    def _dp_bwd_local(
        self, gname, table, state, keys_loc, d_loc, lr, step, *rest,
        with_store: bool = False, weighted: bool = False,
    ):
        rest = list(rest)
        key_store = rest.pop(0) if with_store else None
        w_loc = rest.pop(0) if weighted else None
        # Replicated tables: every device applies the update for the GLOBAL
        # batch so replicas stay bit-identical (analog of DP wgrad allreduce).
        keys = jax.lax.all_gather(keys_loc, self.rm.data_axes, axis=0, tiled=True)
        d_group = jax.lax.all_gather(d_loc, self.rm.data_axes, axis=0, tiled=True)
        weights = (
            jax.lax.all_gather(w_loc, self.rm.data_axes, axis=0, tiled=True)
            if w_loc is not None
            else None
        )
        if key_store is not None:
            meta = self._meta[gname]
            key_store = self._dynamic_insert(
                meta, key_store, keys, keys != INVALID_KEY, 1
            )
        idx, src, dsrc = self._row_grads(
            gname, keys, d_group, 1, None, key_store, weights=weights
        )
        opt = self.group_opt[gname]
        new_t, new_s = sparse_optimizer.apply_sparse(
            opt, table, state, idx, src, dsrc, lr, step, **self._opt_knobs(gname)
        )
        if key_store is not None:
            return new_t, new_s, key_store
        return new_t, new_s

    def _bwd_single_shared(
        self, gname, table, state, feature_keys, d_group, lr, step
    ):
        """Backward for a split-tier group via the shared parent-key sort
        (Sum-combiner static tiers only — see _tier_shared_ok)."""
        g = self._meta[gname].plan
        tier_idx, tier_src = self._tier_sorted_rows(gname, feature_keys)
        dsrc, _gsrc = self._grad_source(g, d_group, None)
        opt = self.group_opt[gname]
        return sparse_optimizer.apply_sparse(
            opt, table, state, tier_idx, tier_src, dsrc, lr, step,
            presorted=True, **self._opt_knobs(gname)
        )

    def _bwd_single(
        self, gname, table, state, keys, d_group, lr, step, key_store=None,
        weights=None,
    ):
        if key_store is not None:
            meta = self._meta[gname]
            key_store = self._dynamic_insert(
                meta, key_store, keys, keys != INVALID_KEY, 1
            )
        idx, src, dsrc = self._row_grads(
            gname, keys, d_group, 1, None, key_store, weights=weights
        )
        opt = self.group_opt[gname]
        new_t, new_s = sparse_optimizer.apply_sparse(
            opt, table, state, idx, src, dsrc, lr, step, **self._opt_knobs(gname)
        )
        if key_store is not None:
            return new_t, new_s, key_store
        return new_t, new_s

    def _opt_knobs(self, gname: str):
        # dense key-ratio rule needs a trustworthy key count: without a
        # MEASURED valid cap, the fallback counts the padded [B, H] list
        # length — hot/cold window groups are mostly padding, and routing
        # them onto the R-proportional dense sweep is exactly the regime
        # the 0.3 threshold was tuned to avoid
        dense_ratio = self.knob_dense_key_ratio
        g = self._meta[gname].plan
        windowed = any(
            lm.key_lo > 0 or lm.key_hi >= 0 for lm in g.lookups
        )
        if not self.valid_caps.get(gname, 0):
            if windowed:
                dense_ratio = 0.0
            elif g.is_model_parallel and g.num_shards > 1:
                # MP backward sees the GLOBAL all-gathered key list but
                # each shard owns ~1/f of it; without a measured per-shard
                # valid count, demand f x more list entries
                dense_ratio *= g.num_shards
        return dict(
            segsum=self.knob_segsum,
            ucap_factor=self.knob_ucap_factor,
            ucap_min_k=self.knob_ucap_min_k,
            ucap_drop=self.knob_ucap_drop,
            ucap_cap=self.unique_caps.get(gname, 0),
            valid_cap=self.valid_caps.get(gname, 0),
            packed=self.packed_kind.get(gname, False),
            dense_rows=self.knob_dense_update_rows,
            dense_grad_dtype=self.knob_dense_grad_dtype,
            dense_ratio=dense_ratio,
            scatter_auto=self.knob_scatter_auto,
            fold_budget=self.knob_segsum_fold_bytes,
        )

    def auto_unique_caps(self, feature_keys) -> None:
        """Size each rowop group's unique-row compaction window from a real
        batch (HCTR_TPU_UCAP_FACTOR=auto). `feature_keys` is the host-side
        {bottom_name: [B, hotness] np.ndarray} batch. The measured per-shard
        unique count x headroom becomes the static window; apply_sparse's
        runtime cond still falls back to the exact full-K path whenever a
        later batch exceeds it, so this is a pure speedup. TPU analog of the
        reference's capacity planning for its fixed comm/sort buffers
        (embedding/data_distributor, max_hotness bounds)."""
        self.ucap_measured = True
        measured = []  # (group, keys_size, u_max, v_max)
        for g in self.plan.groups:
            meta = self._meta[g.name]
            if g.compute_kind != "rowop" or meta.any_dynamic:
                continue
            cols = []
            for lm in g.lookups:
                k = np.asarray(feature_keys[lm.bottom_name])
                if k.ndim == 1:
                    k = k[:, None]
                if lm.key_lo > 0 or lm.key_hi >= 0 or lm.key_shift:
                    hi = lm.key_hi if lm.key_hi >= 0 else np.iinfo(np.int64).max
                    k = np.where(
                        (k >= lm.key_lo) & (k < hi),
                        k - lm.key_shift,
                        int(INVALID_KEY),
                    )
                cols.append(k)
            keys = np.concatenate(cols, axis=1)
            valid = keys != INVALID_KEY
            f = g.num_shards if g.is_model_parallel else 1
            kk = keys.astype(np.int64) % np.asarray(g.slot_vocab)[None, :]
            owner = (kk + np.asarray(g.slot_rotation)[None, :]) % f
            local = kk // f + np.asarray(g.slot_local_offset)[None, :]
            gid = owner * int(g.total_local_rows) + local
            u_max, v_max = 0, 0
            for s in range(f):
                own = valid & (owner == s)
                u_max = max(u_max, int(np.unique(gid[own]).size))
                v_max = max(v_max, int(own.sum()))
            # dense-exchange capacity: max unique rows over every
            # (per-device batch block, owner shard) pair. The local batch
            # covers n/P device blocks exactly, so per-block maxima need NO
            # process scaling — just a max-reduce (see below).
            de_max = 0
            n = self.rm.data_parallel_size
            blocks = n // max(self.rm.num_processes, 1)
            if self._dense_exchange_shape_ok(g) and blocks >= 1:
                b = keys.shape[0]
                if b % blocks == 0:
                    bl = b // blocks
                    for d in range(blocks):
                        sl = slice(d * bl, (d + 1) * bl)
                        for s in range(f):
                            own = valid[sl] & (owner[sl] == s)
                            de_max = max(
                                de_max, int(np.unique(local[sl][own]).size)
                            )
            measured.append((g, keys.size, u_max, v_max, de_max))

        if self.rm.num_processes > 1 and measured:
            # multi-controller: every process measured its OWN batch shard.
            # Caps become static slice sizes in the jitted SPMD step, so all
            # controllers MUST compile identical programs: max-reduce the
            # per-process measurements (one collective for all groups), then
            # bound the global unique count by P * max_p(local uniques)
            # (>= sum of per-process uniques >= global unique count).
            from jax.experimental import multihost_utils

            arr = np.asarray(
                [[u, v, de] for _g, _s, u, v, de in measured], np.int64
            )
            arr = np.asarray(multihost_utils.process_allgather(arr))
            mx = arr.max(axis=0)
            # u/v bound GLOBAL-K quantities -> scale by P; dense-exchange
            # caps are per-device-block maxima -> plain max
            scaled = mx * self.rm.num_processes
            measured = [
                (g, size, int(scaled[i, 0]), int(scaled[i, 1]), int(mx[i, 2]))
                for i, (g, size, _u, _v, _de) in enumerate(measured)
            ]

        for g, keys_size, u_max, v_max, de_max in measured:
            cap = ((int(u_max * self.knob_ucap_headroom) + 511) // 512) * 512
            self.unique_caps[g.name] = max(cap, 512)
            if de_max > 0:
                de = ((int(de_max * self.knob_ucap_headroom) + 127) // 128) * 128
                self.dense_exchange_caps[g.name] = max(de, 128)
            vcap = ((int(v_max * self.knob_ucap_headroom) + 511) // 512) * 512
            # only worth a cond when a sizable share of the list is padding.
            # Multi-controller: u/v were scaled to GLOBAL bounds above, so
            # compare against the GLOBAL list size (the jitted step's key
            # list is the all-gathered P*keys_size) — a per-process gate
            # would be P x too strict and never engage
            global_size = keys_size * self.rm.num_processes
            if vcap < 0.8 * global_size:
                self.valid_caps[g.name] = max(vcap, 512)

    # ------------------------------------------------------------- IO paths
    def _is_frozen(self, table_name: str) -> bool:
        return (
            table_name in self.frozen_tables
            or table_name.split("::", 1)[0] in self.frozen_tables
        )

    def export_table(
        self, tables: Dict[str, Array], table_name: str
    ) -> np.ndarray:
        """Gather one logical table to a dense [vocab, ev] host array.

        Analog of EmbeddingParameterIO dump
        (embedding_storage/weight_io/parameter_IO.cpp). Hot/cold split
        tables are reassembled into the user-level [vocab, ev] view.
        """
        if table_name in self.plan.table_splits:
            parts = [
                self.export_table(tables, sub)
                for sub, _off in self.plan.table_splits[table_name]
            ]
            return np.concatenate(parts, axis=0)
        g, ti = self._find_table(table_name)
        vocab = int(g.table_vocab[ti])
        idx = self._table_storage_rows(g, ti, vocab)
        out = np.asarray(self._export_fn()(tables[g.name], jnp.asarray(idx)))
        if self._is_packed(g.name):
            out = out[:, : g.ev_size]
        return out

    def import_table(
        self, tables: Dict[str, Array], table_name: str, values: np.ndarray
    ) -> Dict[str, Array]:
        if table_name in self.plan.table_splits:
            subs = self.plan.table_splits[table_name]
            for i, (sub, off) in enumerate(subs):
                end = subs[i + 1][1] if i + 1 < len(subs) else values.shape[0]
                tables = self.import_table(tables, sub, values[off:end])
            return tables
        g, ti = self._find_table(table_name)
        vocab = int(g.table_vocab[ti])
        if values.shape != (vocab, g.ev_size):
            raise ValueError(
                f"table {table_name}: expected {(vocab, g.ev_size)}, "
                f"got {values.shape}"
            )
        idx = self._table_storage_rows(g, ti, vocab)
        vals = np.asarray(values)
        if g.is_model_parallel and g.num_replicas > 1:
            # partial placement: write every replica group identically
            stride = g.num_shards * g.total_local_rows
            idx = np.concatenate(
                [idx + r * stride for r in range(g.num_replicas)]
            )
            vals = np.tile(vals, (g.num_replicas, 1))
        new = dict(tables)
        if self._is_packed(g.name):
            new[g.name] = self._import_packed_fn(g.is_model_parallel)(
                tables[g.name],
                jnp.asarray(idx),
                jnp.asarray(vals, dtype=self.dtype),
            )
        else:
            new[g.name] = self._import_fn(g.is_model_parallel)(
                tables[g.name],
                jnp.asarray(idx),
                jnp.asarray(vals, dtype=self.dtype),
            )
        return new

    def export_key_store(
        self, tables: Dict[str, Array], table_name: str
    ) -> Optional[np.ndarray]:
        """Per-table slice of the exact dynamic-table key store, row-aligned
        with ``export_table``'s rows (reference: DynamicEmbeddingTable dump
        writes keys alongside vectors, dynamic_embedding.cu). Returns None
        for static tables — their key→row mapping is positional."""
        if table_name in self.plan.table_splits:
            return None  # split tables are static by construction
        g, ti = self._find_table(table_name)
        ks = tables.get(f"{g.name}#keys")
        if ks is None or not g.tables[ti].is_dynamic:
            return None
        vocab = int(g.table_vocab[ti])
        idx = self._table_storage_rows(g, ti, vocab)
        host = np.asarray(
            jax.jit(lambda x: x, out_shardings=self.rm.replicated_sharding())(ks)
        )
        return host[idx]

    def import_key_store(
        self, tables: Dict[str, Array], table_name: str, keys: np.ndarray
    ) -> Dict[str, Array]:
        """Restore a per-table key-store slice written by export_key_store.
        Without this, positionally imported dynamic-table values would pair
        with whatever key→row assignments the live store holds."""
        g, ti = self._find_table(table_name)
        ks = tables.get(f"{g.name}#keys")
        if ks is None or not g.tables[ti].is_dynamic:
            return tables
        vocab = int(g.table_vocab[ti])
        keys = np.asarray(keys)
        if keys.shape != (vocab,):
            raise ValueError(
                f"table {table_name}: expected key store shape {(vocab,)}, "
                f"got {keys.shape}"
            )
        idx = self._table_storage_rows(g, ti, vocab)
        if g.is_model_parallel and g.num_replicas > 1:
            stride = g.num_shards * g.total_local_rows
            idx = np.concatenate(
                [idx + r * stride for r in range(g.num_replicas)]
            )
            keys = np.tile(keys, g.num_replicas)
        host = np.asarray(
            jax.jit(lambda x: x, out_shardings=self.rm.replicated_sharding())(ks)
        ).copy()
        # fold the reserved key like every insert path: raw 2^31-1 would be
        # written as the store's EMPTY marker and become unreachable
        host[idx] = _fold_reserved_key(keys.astype(np.int32))
        new = dict(tables)
        new[f"{g.name}#keys"] = jax.device_put(
            jnp.asarray(host, jnp.int32), ks.sharding
        )
        return new

    def evict(
        self, tables, opt_state, table_name: str, keys
    ):
        """Evict rows for `keys` from a dynamic (hashed) table: embedding
        vectors and optimizer state reset to zero (reference:
        DynamicEmbeddingTable::evict, embedding_storage/dynamic_embedding.cu).
        Works on static tables too (row reset)."""

        if table_name in self.plan.table_splits:
            subs = self.plan.table_splits[table_name]
            # robust to empty input (np dtype float64) / float key arrays
            k = np.asarray(keys).reshape(-1).astype(np.int64)
            for i, (sub, lo) in enumerate(subs):
                hi = subs[i + 1][1] if i + 1 < len(subs) else np.iinfo(np.int64).max
                tables, opt_state = self.evict(
                    tables, opt_state, sub, k[(k >= lo) & (k < hi)] - lo
                )
            return tables, opt_state
        g, ti = self._find_table(table_name)
        n = g.num_shards if g.is_model_parallel else 1
        k32 = jnp.asarray(keys).reshape(-1).astype(jnp.int32)
        if g.tables[ti].is_dynamic and f"{g.name}#keys" in tables:
            # exact store: probe host-side for each key's slot, clear the
            # row, state AND store entry — collision-free (the old hashing
            # trick could clobber other keys' rows)
            return self._evict_dynamic_exact(
                tables, opt_state, g, ti, np.asarray(k32)
            )
        if g.tables[ti].is_dynamic:
            h = _hash_mix(k32)
            row = (
                (h // jnp.uint32(max(n, 1)))
                % jnp.uint32(int(g.rows_per_shard[ti]))
            ).astype(jnp.int32)
            owner = (h % jnp.uint32(max(n, 1))).astype(jnp.int32)
        else:
            kk = k32 % jnp.int32(int(g.table_vocab[ti]))
            row = kk // jnp.int32(max(n, 1))
            rot = int(g.table_rotation[ti]) % max(n, 1)
            owner = (kk + jnp.int32(rot)) % jnp.int32(max(n, 1))
        local = row + jnp.int32(int(g.local_offsets[ti]))
        if g.is_model_parallel:
            storage_row = owner * jnp.int32(g.total_local_rows) + local
            if g.num_replicas > 1:
                stride = jnp.int32(g.num_shards * g.total_local_rows)
                storage_row = (
                    storage_row[None, :]
                    + jnp.arange(g.num_replicas, dtype=jnp.int32)[:, None]
                    * stride
                ).reshape(-1)
        else:
            storage_row = local
        new_tables = dict(tables)
        new_tables[g.name] = tables[g.name].at[storage_row].set(0.0, mode="drop")
        new_state = dict(opt_state)
        if g.name in opt_state:
            new_state[g.name] = {
                k: v.at[storage_row].set(0.0, mode="drop")
                for k, v in opt_state[g.name].items()
            }
        return new_tables, new_state

    def _host_key_store(self, tables, g: GroupPlan) -> np.ndarray:
        cache = self._io_fn_cache()
        if "replicate" not in cache:
            # cached: host-spill staging reads the key store EVERY batch —
            # a fresh jax.jit per call retraces/relowers each time
            cache["replicate"] = jax.jit(
                lambda x: x, out_shardings=self.rm.replicated_sharding()
            )
        return np.asarray(cache["replicate"](tables[f"{g.name}#keys"]))

    def _dynamic_host_slots(
        self, ks_host: np.ndarray, g: GroupPlan, ti: int, keys: np.ndarray
    ) -> np.ndarray:
        """Host-side probe: storage slot (within shard-0 replica) per key;
        -1 if absent."""
        f = g.num_shards if g.is_model_parallel else 1
        keys = _fold_reserved_key(keys.astype(np.int32))
        h = _hash_mix_np(keys).astype(np.uint64)
        rows_t = np.uint64(int(g.rows_per_shard[ti]))
        owner = (h % np.uint64(f)).astype(np.int64)
        base = ((h // np.uint64(f)) % rows_t).astype(np.int64)
        off = int(g.local_offsets[ti])
        out = np.full(keys.shape, -1, dtype=np.int64)
        for j in range(self.NUM_PROBES):
            cand = (base + j) % int(rows_t)
            local = off + cand
            storage = (
                owner * g.total_local_rows + local
                if g.is_model_parallel
                else local
            )
            hit = (out < 0) & (ks_host[storage] == keys.astype(np.int32))
            out = np.where(hit, storage, out)
        return out

    def _evict_dynamic_exact(self, tables, opt_state, g, ti, keys):
        ks_host = self._host_key_store(tables, g)
        slots = self._dynamic_host_slots(ks_host, g, ti, keys)
        slots = slots[slots >= 0]
        if g.is_model_parallel and g.num_replicas > 1:
            stride = g.num_shards * g.total_local_rows
            slots = np.concatenate(
                [slots + r * stride for r in range(g.num_replicas)]
            )
        srow = jnp.asarray(slots, jnp.int32)
        new_tables = dict(tables)
        new_tables[g.name] = tables[g.name].at[srow].set(0.0, mode="drop")
        new_tables[f"{g.name}#keys"] = (
            tables[f"{g.name}#keys"]
            .at[srow]
            .set(int(self.EMPTY_KEY), mode="drop")
        )
        new_state = dict(opt_state)
        if g.name in opt_state:
            new_state[g.name] = {
                k: v.at[srow].set(0.0, mode="drop")
                for k, v in opt_state[g.name].items()
            }
        return new_tables, new_state

    def _live_slots(self, ks_host: np.ndarray, g, ti):
        """(replica-0 storage slots, live keys) of a dynamic table from a
        host key-store copy — shared by entry collection, growth, and the
        host-spill tier (one copy of the shard/offset layout arithmetic)."""
        lo = int(g.local_offsets[ti])
        rows_t = int(g.rows_per_shard[ti])
        f = g.num_shards if g.is_model_parallel else 1
        slots, live = [], []
        for shard in range(f):
            base = shard * g.total_local_rows if g.is_model_parallel else 0
            seg = ks_host[base + lo : base + lo + rows_t]
            idx = np.where(seg != int(self.EMPTY_KEY))[0]
            slots.append(base + lo + idx)
            live.append(seg[idx])
        slots = np.concatenate(slots) if slots else np.zeros(0, np.int64)
        live = np.concatenate(live) if live else np.zeros(0, np.int32)
        return slots, live

    def _collect_dynamic_entries(self, tables, opt_state, g, ti):
        """Host-side (keys, rows, state-slots) of a dynamic table's resident
        entries (replica-0 storage rows)."""
        ks_host = self._host_key_store(tables, g)
        slots, live = self._live_slots(ks_host, g, ti)
        rep = jax.jit(lambda x: x, out_shardings=self.rm.replicated_sharding())
        vals = np.asarray(rep(tables[g.name]))[slots]
        st = {
            k: np.asarray(rep(v))[slots]
            for k, v in opt_state.get(g.name, {}).items()
        }
        return live, vals, st

    def _host_find_keys(self, nks, ng, nti, keys):
        """Locate already-resident keys in a host copy of a key store with
        the device probe discipline; returns replica-0 storage slots
        (-1 = not resident). Counterpart of `_host_insert_keys` for reads."""
        nf = ng.num_shards if ng.is_model_parallel else 1
        keys = _fold_reserved_key(keys.astype(np.int32))
        h = _hash_mix_np(keys).astype(np.uint64)
        nrows = np.uint64(int(ng.rows_per_shard[nti]))
        owner = (h % np.uint64(nf)).astype(np.int64)
        base = ((h // np.uint64(nf)) % nrows).astype(np.int64)
        noff = int(ng.local_offsets[nti])
        found = np.full(keys.shape, -1, dtype=np.int64)
        for i in range(keys.shape[0]):
            for j in range(self.NUM_PROBES):
                cand = int((base[i] + j) % int(nrows))
                local = noff + cand
                storage = (
                    int(owner[i]) * ng.total_local_rows + local
                    if ng.is_model_parallel
                    else local
                )
                if nks[storage] == keys[i]:
                    found[i] = storage
                    break
                # NOTE: no early exit on an empty slot — the device probe
                # (_dynamic_probe) scans all NUM_PROBES slots, so keys
                # remain reachable across holes punched by evict()
        return found

    def _host_insert_keys(self, nks, ng, nti, keys):
        """Place keys into a host copy of a key store with the device probe
        discipline; returns replica-0 storage slots (-1 = dropped)."""
        nf = ng.num_shards if ng.is_model_parallel else 1
        keys = _fold_reserved_key(keys.astype(np.int32))
        h = _hash_mix_np(keys).astype(np.uint64)
        nrows = np.uint64(int(ng.rows_per_shard[nti]))
        owner = (h % np.uint64(nf)).astype(np.int64)
        base = ((h // np.uint64(nf)) % nrows).astype(np.int64)
        noff = int(ng.local_offsets[nti])
        placed = np.full(keys.shape, -1, dtype=np.int64)
        for i in range(keys.shape[0]):
            slots = []
            resident = -1
            for j in range(self.NUM_PROBES):
                cand = int((base[i] + j) % int(nrows))
                local = noff + cand
                storage = (
                    int(owner[i]) * ng.total_local_rows + local
                    if ng.is_model_parallel
                    else local
                )
                slots.append(storage)
                if nks[storage] == keys[i]:
                    resident = storage  # already placed (duplicate input or
                    break  # re-stage): never claim a second capacity slot
            if resident >= 0:
                placed[i] = resident
                continue
            for storage in slots:
                if nks[storage] == int(self.EMPTY_KEY):
                    nks[storage] = keys[i]
                    placed[i] = storage
                    break
        return placed

    def _scatter_all_replicas(self, arr, g, rows, vals):
        """Set `vals` at replica-0 storage `rows` in every replica group.

        The jitted scatter is cached per sharding (see _io_fn_cache) — a
        fresh jax.jit per call would retrace/recompile every invocation,
        which turns per-batch host-spill staging into a compile storm."""
        reps = g.num_replicas if g.is_model_parallel else 1
        stride = g.num_shards * g.total_local_rows
        all_rows = np.concatenate([rows + r * stride for r in range(reps)])
        all_vals = np.concatenate([vals] * reps, axis=0)
        cache = self._io_fn_cache()
        key = ("scatter_reps", arr.sharding)
        if key not in cache:
            cache[key] = jax.jit(
                lambda t, i, v: t.at[i].set(v), out_shardings=arr.sharding
            )
        return cache[key](
            arr,
            jnp.asarray(all_rows, jnp.int32),
            jnp.asarray(all_vals, dtype=arr.dtype),
        )

    def _scatter_all_replicas_multi(self, arrs, g, rows, vals_list):
        """`_scatter_all_replicas` over several row-aligned arrays (table,
        key store, optimizer slots) in ONE jitted dispatch — host-spill
        staging used to pay 3+n_opt_slots serial dispatches per batch,
        which dominates staging cost on dispatch-latency-bound hosts."""
        reps = g.num_replicas if g.is_model_parallel else 1
        stride = g.num_shards * g.total_local_rows
        all_rows = np.concatenate([rows + r * stride for r in range(reps)])
        cache = self._io_fn_cache()
        key = ("scatter_reps_multi", tuple(a.sharding for a in arrs))
        if key not in cache:
            cache[key] = jax.jit(
                lambda ts, i, vs: tuple(
                    t.at[i].set(v) for t, v in zip(ts, vs)
                ),
                out_shardings=tuple(a.sharding for a in arrs),
            )
        idx = jnp.asarray(all_rows, jnp.int32)
        vals = tuple(
            jnp.asarray(np.concatenate([v] * reps, axis=0), dtype=a.dtype)
            for v, a in zip(vals_list, arrs)
        )
        return cache[key](tuple(arrs), idx, vals)

    def _gather_rows_multi(self, arrs, rows):
        """Row-gather several aligned arrays in ONE jitted dispatch (the
        host-spill flush path's counterpart of `_scatter_all_replicas_multi`)."""
        cache = self._io_fn_cache()
        key = ("gather_rows_multi", tuple(a.sharding for a in arrs))
        if key not in cache:
            cache[key] = jax.jit(
                lambda ts, i: tuple(jnp.take(t, i, axis=0) for t in ts)
            )
        return cache[key](tuple(arrs), jnp.asarray(rows, jnp.int32))

    def grow_dynamic_capacity(
        self, tables, opt_state, table_name: str, new_capacity: int
    ):
        """Grow a dynamic table's capacity by host-side rehash.

        Returns (new_collection, new_tables, new_opt_state): the plan is
        recompiled with the larger capacity (shapes are static under jit, so
        growth happens BETWEEN passes — reference DynamicEmbeddingTable
        grows inside the kernel, dynamic_embedding.cu, which has no
        compiled-world analog). EVERY table's weights, optimizer state and
        key store carry over exactly — the grown table (and any dynamic
        table whose group layout shifted) is re-inserted key-by-key, static
        tables copy through export/import."""
        g, ti = self._find_table(table_name)
        if not g.tables[ti].is_dynamic:
            raise ValueError(f"{table_name} is not a dynamic table")
        old_cap = int(g.table_vocab[ti])
        if new_capacity <= old_cap:
            raise ValueError("new_capacity must exceed the current capacity")

        # collect every dynamic table's resident entries from the OLD layout
        dyn_entries = {}
        for gg in self.plan.groups:
            for tti, tt in enumerate(gg.tables):
                if tt.is_dynamic:
                    dyn_entries[tt.name] = (
                        self._collect_dynamic_entries(tables, opt_state, gg, tti)
                    )

        # rebuild the plan with the larger capacity, preserving per-table
        # shard counts (partial placement survives the recompile)
        import dataclasses as _dc

        new_lookups = []
        for lk in self.plan.lookups:
            if lk.table.name.split("::", 1)[0] == table_name.split("::", 1)[0]:
                t2 = _dc.replace(lk.table, dynamic_capacity=int(new_capacity))
                new_lookups.append(_dc.replace(lk, table=t2))
            else:
                new_lookups.append(lk)
        from ..parallel.plan import ShardingPlan, compile_plan

        strategy = []
        shard_counts = {}
        for gg in self.plan.groups:
            kind = "mp" if gg.is_model_parallel else "dp"
            names = [t.name.split("::", 1)[0] for t in gg.tables]
            strategy.append((kind, names))
            if gg.is_model_parallel:
                for n in names:
                    shard_counts[n] = gg.num_shards
        # re-apply the plan-shaping env captured at OUR compile time (the
        # Solver's apply-and-restore may have removed it since — without
        # this, the rebuilt plan would drop hot/cold splits, storage-group
        # splits and onehot peeling, crashing the migration loop below)
        import os as _os

        saved_env = {}
        for k, v in self._plan_env.items():
            saved_env[k] = _os.environ.get(k)
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v
        try:
            new_plan = compile_plan(
                new_lookups,
                ShardingPlan(strategy=strategy),
                num_shards=self.plan.num_shards,
                shard_counts=shard_counts,
            )
            new_ec = EmbeddingCollection(
                new_plan, self.rm, self.opt, dtype=self.dtype,
                comm_strategy=self.comm_strategy,
            )
        finally:
            for k, old in saved_env.items():
                if old is None:
                    _os.environ.pop(k, None)
                else:
                    _os.environ[k] = old
        new_ec.frozen_tables = set(self.frozen_tables)
        # keep the old collection's captured knobs (env may have moved on)
        for attr in (
            "state_dtype", "knob_fwd_partition", "knob_capacity_factor",
            "knob_segsum", "knob_ucap_factor", "knob_ucap_auto",
            "knob_ucap_headroom", "knob_ucap_min_k",
            "knob_ucap_drop", "knob_packed_state", "knob_rowwise_pack",
            "knob_shared_tier_sort", "knob_scatter_auto",
            "knob_segsum_fold_bytes", "knob_onehot_kernel",
            "knob_onehot_compare_max",
            "knob_dense_update_rows", "knob_dense_grad_dtype",
            "knob_dense_key_ratio", "knob_fwd_sorted_bytes",
        ):
            setattr(new_ec, attr, getattr(self, attr))
        # measured compaction windows carry over for groups that still
        # exist (they depend on batch key statistics, not capacity)
        new_names = {g.name for g in new_plan.groups}
        new_ec.unique_caps = {
            k: v for k, v in self.unique_caps.items() if k in new_names
        }
        new_ec.valid_caps = {
            k: v for k, v in self.valid_caps.items() if k in new_names
        }
        new_ec.dense_exchange_caps = {
            k: v for k, v in self.dense_exchange_caps.items() if k in new_names
        }
        new_ec.ucap_measured = self.ucap_measured
        new_ec.packed_kind = new_ec._compute_packed_kind(new_plan)
        new_ec.packed_groups = set(new_ec.packed_kind)
        new_tables = new_ec.init(jax.random.key(0))
        new_state = new_ec.init_optimizer(new_tables)

        # static tables: exact copy via export/import + per-row state copy
        rep_fn = jax.jit(
            lambda x: x, out_shardings=self.rm.replicated_sharding()
        )
        for gg in self.plan.groups:
            for tti, tt in enumerate(gg.tables):
                if tt.is_dynamic:
                    continue
                vocab = int(gg.table_vocab[tti])
                if self._is_packed(gg.name):
                    # copy FULL packed rows (weights + accum columns)
                    old_rows = self._table_storage_rows(gg, tti, vocab)
                    ngg, ntti = new_ec._find_table(tt.name)
                    new_rows = new_ec._table_storage_rows(ngg, ntti, vocab)
                    full = np.asarray(rep_fn(tables[gg.name]))[old_rows]
                    new_tables[ngg.name] = new_ec._scatter_all_replicas(
                        new_tables[ngg.name], ngg, new_rows, full
                    )
                    continue
                new_tables = new_ec.import_table(
                    new_tables,
                    tt.name,
                    self.export_table(tables, tt.name),
                )
                if gg.name in opt_state:
                    old_rows = self._table_storage_rows(gg, tti, vocab)
                    ngg, ntti = new_ec._find_table(tt.name)
                    new_rows = new_ec._table_storage_rows(ngg, ntti, vocab)
                    rep = jax.jit(
                        lambda x: x,
                        out_shardings=self.rm.replicated_sharding(),
                    )
                    for slot, arr in opt_state[gg.name].items():
                        vals = np.asarray(rep(arr))[old_rows]
                        new_state[ngg.name][slot] = (
                            new_ec._scatter_all_replicas(
                                new_state[ngg.name][slot], ngg, new_rows, vals
                            )
                        )

        # dynamic tables: re-insert live keys into the new stores
        for name, (live, vals, st) in dyn_entries.items():
            ngg, ntti = new_ec._find_table(name)
            nks = np.array(new_ec._host_key_store(new_tables, ngg))
            placed = new_ec._host_insert_keys(nks, ngg, ntti, live)
            ok = placed >= 0
            dst = placed[ok]
            new_tables[ngg.name] = new_ec._scatter_all_replicas(
                new_tables[ngg.name], ngg, dst, vals[ok]
            )
            ks_name = f"{ngg.name}#keys"
            new_tables[ks_name] = new_ec._scatter_all_replicas(
                new_tables[ks_name], ngg, dst,
                _fold_reserved_key(live[ok].astype(np.int32)),
            )
            for slot, host_vals in st.items():
                new_state[ngg.name][slot] = new_ec._scatter_all_replicas(
                    new_state[ngg.name][slot], ngg, dst, host_vals[ok]
                )
        return new_ec, new_tables, new_state


    # IO jit fns cache PER INSTANCE (a class-level lru_cache keyed on self
    # would pin every superseded EmbeddingCollection — grow/reserve replace
    # the collection repeatedly — plus its executables, for process life)
    def _io_fn_cache(self) -> dict:
        return self.__dict__.setdefault("_io_fns", {})

    def _export_fn(self):
        cache = self._io_fn_cache()
        if "export" not in cache:
            # jit with replicated output so exports work in multi-controller
            # runs (eager take on a multi-process-sharded array is not
            # addressable); cached so snapshots don't retrace per call
            cache["export"] = jax.jit(
                lambda t, i: jnp.take(t, i, axis=0),
                out_shardings=self.rm.replicated_sharding(),
            )
        return cache["export"]

    def _import_packed_fn(self, model_parallel: bool):
        cache = self._io_fn_cache()
        key = ("import_packed", model_parallel)
        if key not in cache:
            sharding = (
                self.rm.row_sharding()
                if model_parallel
                else self.rm.replicated_sharding()
            )

            def imp(t, i, v):
                # full-row read-modify-write keeps the accum columns (a
                # column-window scatter would hit XLA's slow path)
                old = t.at[i].get(mode="fill", fill_value=0)
                merged = jnp.concatenate([v, old[:, v.shape[1]:]], axis=1)
                return t.at[i].set(merged)

            cache[key] = jax.jit(imp, out_shardings=sharding)
        return cache[key]

    def _import_fn(self, model_parallel: bool):
        cache = self._io_fn_cache()
        key = ("import", model_parallel)
        if key not in cache:
            sharding = (
                self.rm.row_sharding()
                if model_parallel
                else self.rm.replicated_sharding()
            )
            cache[key] = jax.jit(
                lambda t, i, v: t.at[i].set(v), out_shardings=sharding
            )
        return cache[key]

    def _find_table(self, table_name: str) -> Tuple[GroupPlan, int]:
        for g in self.plan.groups:
            for ti, t in enumerate(g.tables):
                if t.name == table_name:
                    return g, ti
        raise KeyError(table_name)

    def _table_storage_rows(self, g: GroupPlan, ti: int, vocab: int) -> np.ndarray:
        keys = np.arange(vocab, dtype=np.int32)
        if g.is_model_parallel:
            rot = int(g.table_rotation[ti]) % max(g.num_shards, 1)
            shard = (keys + rot) % g.num_shards
            row = keys // g.num_shards
            return (shard * g.total_local_rows + int(g.local_offsets[ti]) + row).astype(
                np.int32
            )
        return (int(g.local_offsets[ti]) + keys).astype(np.int32)
