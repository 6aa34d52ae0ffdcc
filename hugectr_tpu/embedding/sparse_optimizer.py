"""Sparse (per-unique-row) embedding optimizers.

TPU-native analog of the reference's fused per-row update kernels
(HugeCTR/embedding_storage/optimizers.cuh:29-230). Duplicate row indices are
combined by sort + segment-sum ("local reduce", reference:
embedding/operators/index_calculation.cu) so stateful optimizers see exactly
one summed gradient per touched row; rows carrying the sentinel index (>= R)
are dropped by out-of-bounds scatter semantics.

Everything here is shape-static and jit-friendly: the dedup works on the
fixed-capacity [K] gradient list, not on a dynamic number of unique rows.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.types import Optimizer_t
from ..optim.params import OptParams

Array = jax.Array
State = Dict[str, Array]


def scatter_auto_default() -> bool:
    """Env default for the size-aware scatter lowering (captured ONCE at
    EmbeddingCollection.__init__ like every engine knob; direct apply_sparse
    callers get the env value at call time)."""
    import os

    return os.environ.get("HCTR_TPU_SCATTER_AUTO", "1") == "1"


def _scatter_streams(nbytes: int, n: int, auto: bool = True) -> bool:
    """Pick the XLA scatter lowering for a row-granular table write.

    Measured on v5e (bf16[R,128] row scatters, trace-verified):
    - WITH indices_are_sorted+unique_indices, XLA emits a full-operand
      streaming merge: cost ~= 2*operand_bytes / 495 GB/s + ~10 ns/row
      (independent of how few rows are written).
    - WITHOUT the flags, it emits per-row updates at ~70 ns/row with no
      operand pass (unsorted-capable path).
    Both the operand size and the scatter width are static at trace time, so
    each site picks the cheaper lowering. Flagged (streaming) wins for big
    windows into small operands; unflagged wins for small windows into
    multi-hundred-MB operands (e.g. a 10k-row delta into a 495 MB table:
    2.0 ms streamed vs 0.7 ms per-row). auto=False (HCTR_TPU_SCATTER_AUTO=0)
    restores the always-flagged behavior.
    """
    if not auto:
        return True
    est_streaming = 2.0 * nbytes / 495e9 + n * 10e-9
    est_per_row = n * 70e-9
    return est_streaming <= est_per_row


def init_state(opt: OptParams, rows: int, ev: int, dtype=jnp.float32) -> State:
    """Allocate per-row optimizer state for a [rows, ev] table shard."""
    kind = opt.optimizer
    z = lambda: jnp.zeros((rows, ev), dtype=dtype)
    if kind == Optimizer_t.SGD:
        return {}
    if kind in (Optimizer_t.MomentumSGD, Optimizer_t.Nesterov):
        return {"m": z()}
    if kind == Optimizer_t.AdaGrad:
        return {"accum": jnp.full((rows, ev), opt.initial_accu_value, dtype=dtype)}
    if kind == Optimizer_t.RowWiseAdaGrad:
        # one scalar per row (torchrec ROWWISE_ADAGRAD semantics): state
        # row ops move 1 element instead of ev — the gather/scatter pair of
        # the update trio runs on an [R, 1] operand
        return {"accum": jnp.full((rows, 1), opt.initial_accu_value, dtype=dtype)}
    if kind == Optimizer_t.RMSProp:
        return {"v": z()}
    if kind == Optimizer_t.Adam:
        return {"m": z(), "v": z()}
    if kind == Optimizer_t.FTRL:
        return {"z": z(), "n": z()}
    raise ValueError(f"unsupported sparse optimizer {kind}")


def dedup_rows(
    idx: Array, src: Array, dsrc: Array, sentinel: int, k_limit: int = 0,
    segsum: str = "xla", presorted: bool = False,
) -> Tuple[Array, Array, Array, bool]:
    """Combine gradients of duplicate rows.

    The gradient of the key at flat position i is ROW ``src[i]`` OF ``dsrc``
    (the compact per-(sample, grad-slot) cotangent array) — never
    materialized at [K, E] before sorting. Only int32 pairs go through the
    sort; gradient rows are gathered once, post-sort (analog of the
    reference's local-reduce: IndicesSort + segmented sum,
    embedding/operators/index_calculation.cu).

    Args:
      idx: [K] row indices; invalid/foreign entries == sentinel (their whole
        segment is dropped by out-of-bounds scatter semantics downstream).
      src: [K] int32 row index into dsrc giving each key's gradient row.
      dsrc: [S, E] gradient source rows.
      sentinel: out-of-range row id marking invalid entries.

    Returns:
      (row_idx, summed_grads, tail, is_unique):
        xla mode:  row_idx sorted+UNIQUE, summed = per-segment sums,
                   tail=None, is_unique=True.
        scan mode: row_idx = the sorted (DUPLICATED) row ids, summed =
                   inclusive segment scans (full sums at tail positions),
                   tail = bool mask of segment tails, is_unique=False.
                   Consumers must tail-mask and use ADD-form scatters —
                   sorted-with-duplicates keeps XLA's fast sorted-scatter
                   path (the unsorted-unique form regressed 3x).
    """
    k = idx.shape[0]
    if presorted:
        sidx, ssrc = idx, src
    else:
        sidx, ssrc = jax.lax.sort((idx, src), num_keys=1)
    if k_limit and k_limit < k:
        # owner-partition compaction: owned rows sort first (foreign entries
        # carry the sentinel); the static prefix bounds all later row ops.
        sidx = sidx[:k_limit]
        ssrc = ssrc[:k_limit]
        k = k_limit

    if segsum == "scan":
        # Streaming Pallas segmented scan: ONE sequential pass instead of the
        # scatter-add XLA lowers segment_sum to.
        from ..ops.pallas.segscan import segmented_sum_sorted

        block = 512
        pad = (-k) % block
        if pad:
            sidx_p = jnp.concatenate(
                [sidx, jnp.full((pad,), sentinel, sidx.dtype)]
            )
            ssrc_p = jnp.concatenate(
                [ssrc, jnp.full((pad,), dsrc.shape[0], ssrc.dtype)]
            )
        else:
            sidx_p, ssrc_p = sidx, ssrc
        sgrads = dsrc.at[ssrc_p].get(mode="fill", fill_value=0)
        head = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), sidx_p[1:] != sidx_p[:-1]]
        )
        summed = segmented_sum_sorted(sgrads, head, block=block)
        tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
        return sidx_p, summed, tail, False

    sgrads = dsrc.at[ssrc].get(mode="fill", fill_value=0)
    head = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sidx[1:] != sidx[:-1]]
    )
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # [K] segment ids in [0, K)
    # (The fused f32 row-id-column variant lives in apply_sparse directly so
    # the post-segsum slice/convert can defer into the cond window branch.)
    summed = jax.ops.segment_sum(
        sgrads, seg, num_segments=k, indices_are_sorted=True
    )
    # Representative row id per segment. Segment ids are contiguous from 0 so
    # empty segments (int-max fill) sit at the tail; remap them to DISTINCT
    # increasing out-of-range ids so the result is sorted AND unique — that
    # lets every downstream gather/scatter use the fast sorted-unique path.
    urow = jax.ops.segment_min(
        sidx, seg, num_segments=k, indices_are_sorted=True
    )
    urow = jnp.where(
        urow >= sentinel,
        jnp.asarray(sentinel, urow.dtype) + jnp.arange(k, dtype=urow.dtype),
        urow,
    )
    return urow, summed, None, True


def dense_update_rows() -> int:
    """Shard-row threshold below which sparse updates use the dense-sweep
    path (0 disables). Measured on v5e: row-granular scatter/gather cost is
    issue-bound (~10 ns/row) while a dense element-wise sweep runs at HBM
    bandwidth, so small shards update cheaper as scatter-into-dense-grad +
    apply_dense. Default covers the DLRM mid-size tables and hot-split
    prefixes (256k rows x 129 f32 grad buffer = 132 MB)."""
    import os

    return int(os.environ.get("HCTR_TPU_DENSE_UPDATE_ROWS", "262144"))


def dense_key_ratio() -> float:
    """K/R ratio above which the dense-sweep path beats the windowed
    sort/segsum chain even on BIG shards (0 disables the ratio rule).

    Measured on v5e (EBC benchmark cases, bf16+rowwise+ucap-auto):
    200-table K/R=0.55: dense 8,144 vs windowed 6,417 ex/s (+27%);
    180-table K/R=0.63: 2,251 vs 1,700 (+32%); 510-table K/R=0.33:
    8,594 vs 7,489 (+15%) — the windowed chain's per-key segsum-pair
    issues (~24 ns/key on the >2GB [K,E] temp) exceed the sweep's
    R-proportional HBM passes once keys are dense in rows. Flagship cold
    tiers (measured-valid K/R ~0.20-0.24) measure the other way, hence
    the 0.3 default. Only AdaGrad-family optimizers take this route
    (exact zero-grad no-op)."""
    import os

    return float(os.environ.get("HCTR_TPU_DENSE_KEY_RATIO", "0.3"))


def dense_grad_dtype():
    """Accumulation dtype of the dense-path [R, E] gradient buffer.

    float32 (default, exact) or bfloat16 (HCTR_TPU_DENSE_GRAD_DTYPE=
    bfloat16, AUC-gated like the other bf16 knobs): a [64k, 128] bf16
    buffer is 16 MB — inside the cheap small-operand scatter regime —
    while the f32 buffer (33 MB) is not; each scatter-add contribution
    rounds to bf16, so per-row sums of n duplicates carry ~2^-8*sqrt(n)
    relative error (the same magnitude the bf16 segsum path would)."""
    import os

    name = os.environ.get("HCTR_TPU_DENSE_GRAD_DTYPE", "float32")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _segsum_fold_budget_bytes() -> int:
    """Temp-memory budget for the folded [K, E+1] segment-sum form.

    The fold halves the trio's scatter count but pads every [K, E+1] temp
    to 2 lane tiles (2x bytes) and XLA holds ~3 of them live. Flagship
    per-table chains (K <= ~1.7M at batch 16384, ~2.6 GB folded) stay
    folded under the 4 GB default; many-table shared storage groups
    (K = B*total_hotness, tens of millions) split instead of OOMing HBM
    (measured: 200-table case at batch 2048 needs 13.6 GB of folded
    temps on a 16 GB chip)."""
    import os

    return int(
        os.environ.get("HCTR_TPU_SEGSUM_FOLD_BYTES", str(4 << 30))
    )


def unique_cap(k: int, factor: float = 0.0, min_k: int = 0) -> int:
    """Static capacity for the compacted unique-row prefix (xla segsum mode).

    Segment sums occupy a PREFIX of the [K] output (segment ids are a
    cumsum), so the per-unique-row optimizer ops can run on a sliced
    [U_cap] window instead of the full K. When the batch's true unique
    count exceeds the cap, apply_sparse falls back to the full-K path via
    lax.cond — the slice is a pure speedup, never a gradient drop (unlike
    the reference's fixed comm-buffer capacities). 0 disables."""
    if factor <= 0 or factor >= 1:
        return 0
    if min_k and k < min_k:
        return 0
    return min(k, ((int(k * factor) + 511) // 512) * 512)


def apply_dense(
    opt: OptParams,
    table: Array,
    state: State,
    grad: Array,
    touched: Array,
    lr: Array,
    step: Array,
) -> Tuple[Array, State]:
    """Dense full-table update with lazy-row semantics.

    Used by the one-hot MXU engine: `grad` is the dense [R, E] gradient
    (countsᵀ @ d_out) and `touched` a [R] bool marking rows hit this step.
    Rows with touched=False keep table AND state bit-identical — matching the
    reference's per-touched-row sparse kernels (optimizers.cuh:29-230) while
    the touched rows update as one fused element-wise sweep (VPU, no
    gather/scatter)."""
    kind = opt.optimizer
    g = grad.astype(jnp.promote_types(table.dtype, jnp.float32))
    t_mask = touched[:, None]

    def sel(new: Array, old: Array) -> Array:
        return jnp.where(t_mask, new.astype(old.dtype), old)

    if kind == Optimizer_t.SGD:
        return (table - lr * g).astype(table.dtype), state

    if kind == Optimizer_t.MomentumSGD:
        m = opt.momentum_factor * state["m"] - lr * g
        return sel(table + m, table), {"m": sel(m, state["m"])}

    if kind == Optimizer_t.Nesterov:
        m = opt.momentum_factor * state["m"] - lr * g
        delta = opt.momentum_factor * m - lr * g
        return sel(table + delta, table), {"m": sel(m, state["m"])}

    if kind == Optimizer_t.AdaGrad:
        accum = state["accum"] + g * g
        delta = -lr * g / (jnp.sqrt(accum) + opt.epsilon)
        return (table + delta).astype(table.dtype), {
            "accum": accum.astype(state["accum"].dtype)
        }

    if kind == Optimizer_t.RowWiseAdaGrad:
        g2 = jnp.mean(jnp.square(g), axis=1, keepdims=True)
        accum = state["accum"].astype(jnp.float32) + g2
        delta = -lr * g / (jnp.sqrt(accum) + opt.epsilon)
        return (table + delta).astype(table.dtype), {
            "accum": sel(accum, state["accum"])
        }

    if kind == Optimizer_t.RMSProp:
        v = opt.beta * state["v"] + (1.0 - opt.beta) * g * g
        delta = -lr * g / (jnp.sqrt(v) + opt.epsilon)
        return sel(table + delta, table), {"v": sel(v, state["v"])}

    if kind == Optimizer_t.Adam:
        # bias-correction scalars MUST be fp32: bf16 rounds beta2=0.999
        # to 0.996 and the early-step correction comes out 4x off (NaN blowup)
        t = step.astype(jnp.float32)
        m = opt.beta1 * state["m"] + (1.0 - opt.beta1) * g
        v = opt.beta2 * state["v"] + (1.0 - opt.beta2) * g * g
        mhat = m / (1.0 - opt.beta1**t)
        vhat = v / (1.0 - opt.beta2**t)
        delta = -lr * mhat / (jnp.sqrt(vhat) + opt.epsilon)
        return sel(table + delta, table), {
            "m": sel(m, state["m"]),
            "v": sel(v, state["v"]),
        }

    if kind == Optimizer_t.FTRL:
        w = table
        n_new = state["n"] + g * g
        sigma = (jnp.sqrt(n_new) - jnp.sqrt(state["n"])) / lr
        z_new = state["z"] + g - sigma * w
        denom = (opt.ftrl_beta + jnp.sqrt(n_new)) / lr + opt.lambda2
        w_new = jnp.where(
            jnp.abs(z_new) > opt.lambda1,
            -(z_new - jnp.sign(z_new) * opt.lambda1) / denom,
            jnp.zeros_like(z_new),
        )
        return sel(w_new, table), {
            "z": sel(z_new, state["z"]),
            "n": sel(n_new, state["n"]),
        }

    raise ValueError(f"unsupported sparse optimizer {kind}")


def apply_sparse(
    opt: OptParams,
    table: Array,
    state: State,
    idx: Array,
    src: Array,
    dsrc: Array,
    lr: Array,
    step: Array,
    k_limit: int = 0,
    segsum: str = "xla",
    ucap_factor: float = 0.0,
    ucap_min_k: int = 0,
    ucap_drop: bool = False,
    ucap_cap: int = 0,
    valid_cap: int = 0,
    packed: bool = False,
    dense_rows: int = -1,
    dense_grad_dtype=jnp.float32,
    presorted: bool = False,
    scatter_auto: Optional[bool] = None,
    fold_budget: Optional[int] = None,
    dense_ratio: Optional[float] = None,
) -> Tuple[Array, State]:
    """Apply one sparse update for (possibly duplicated) row gradients.

    presorted=True: (idx, src) already form the sorted-with-sentinel layout
    this function would produce by its own lax.sort (valid rows ascending in
    a prefix, sentinel >= R after) — e.g. the shared tier sort of a
    hot/cold split. The sort is skipped; everything downstream (valid-cap
    cond, segsum, measured windows) applies unchanged.

    packed=True: `table` is a packed [R, 2E] array (weights ‖ AdaGrad
    accum) and `state` is empty — the whole update is ONE gather + ONE
    ADD-form scatter of 2E-wide rows (half the row-granular ops of the
    separate-array trio).

    Args:
      table: [R, E] local table shard.
      state: per-row optimizer state dict of [R, E] arrays.
      idx: [K] row indices into table; invalid entries must be >= R.
      src: [K] row index into dsrc giving each key's gradient row.
      dsrc: [S, E] compact gradient source (already loss-scaled).
      lr: scalar learning rate.
      step: scalar global step (1-based) for Adam bias correction.
      k_limit: owner-partition capacity (multi-chip): after sorting, this
        shard's owned rows form a PREFIX (foreign/invalid entries carry the
        sentinel and sort last), so all row-granular work can run on a
        static [k_limit] slice instead of the global K — the TPU analog of
        the reference's all-to-all capacity buffers (max hotness bounds,
        embedding/data_distributor). 0 = no slicing. Overflow beyond the
        capacity drops those gradient contributions (pick the factor like
        the reference picks comm-buffer capacities).
    """
    rows = table.shape[0]
    idx = idx.astype(jnp.int32) if rows < 2**31 else idx
    kind = opt.optimizer
    if scatter_auto is None:  # direct callers: env; the collection passes
        scatter_auto = scatter_auto_default()  # its init-captured knob

    if kind == Optimizer_t.SGD:
        # Stateless: scatter-add is associative, so skip sort/dedup entirely
        # (XLA combines duplicate rows in the scatter itself).
        grads = dsrc.astype(table.dtype).at[src].get(mode="fill", fill_value=0)
        return (
            table.at[idx].add(-lr * grads, mode="drop"),
            state,
        )

    if packed == "rowwise":
        run = functools.partial(
            _apply_rows_rowwise_packed, opt, table, state, lr, True,
            scatter_auto=scatter_auto,
        )
    elif packed:
        run = functools.partial(
            _apply_rows_packed, opt, table, state, lr, True,
            scatter_auto=scatter_auto,
        )
    else:
        run = functools.partial(
            _apply_rows, opt, table, state, lr, step, True,
            scatter_auto=scatter_auto,
        )

    k = idx.shape[0]
    if dense_rows < 0:  # direct callers: env default; the collection passes
        dense_rows = dense_update_rows()  # its init-captured knob instead
    if dense_ratio is None:
        dense_ratio = dense_key_ratio()
    # ratio rule (see dense_key_ratio): key-dense big shards take the dense
    # sweep too — per-key segsum issues beat R-proportional sweep passes
    # once true keys >= ratio * R. Use the MEASURED valid count when the
    # key list is mostly padding (hot/cold windows), else the list length:
    # flagship cold tiers have k ~ R-sized lists but only ~0.2*R true keys
    # and must stay on the windowed chain. AdaGrad-family only (exact
    # zero-grad no-op keeps the buffer [R, E] with no touch column).
    k_eff = valid_cap if 0 < valid_cap < k else k
    ratio_dense = (
        dense_ratio > 0
        and rows > 0
        and k_eff >= rows * dense_ratio
        and kind in (Optimizer_t.AdaGrad, Optimizer_t.RowWiseAdaGrad)
    )
    if not packed and ((0 < rows <= dense_rows) or ratio_dense):
        # Small-shard DENSE update: scatter the (sorted) duplicate row
        # grads straight into a dense [R, E+1] f32 buffer — the extra
        # ones-column gives per-row touch counts in the SAME scatter — and
        # apply the optimizer as one element-wise sweep (apply_dense).
        # Replaces sort+segsum+windowed trio with ONE scatter + a cheap
        # dense pass; always exact (no capacity window, no cond). Dense
        # sweep traffic ~ a few x R*E bytes, so it wins whenever R is small
        # relative to K or to the big-operand row-op cost.
        if presorted:
            sidx, ssrc = idx, src
        else:
            sidx, ssrc = jax.lax.sort((idx, src), num_keys=1)
        if k_limit and k_limit < k:
            sidx = sidx[:k_limit]
            ssrc = ssrc[:k_limit]

        # AdaGrad-family updates are exact no-ops on zero summed gradient
        # (apply_dense: accum += 0, delta = 0), so `touched` can be derived
        # from the grad buffer itself and the scatter stays [R, E] — the
        # ones-column would add a second, 1/128-utilized (8,128) tile to
        # EVERY scattered row. Momentum/Adam decay even zero-grad touched
        # rows and FTRL recomputes w from z, so they keep the exact
        # touch-count column.
        noop_on_zero = kind in (
            Optimizer_t.AdaGrad, Optimizer_t.RowWiseAdaGrad
        )
        # bf16 buffer only where no exact touch-count column is needed; the
        # counts column must stay f32 (bf16 rounds integers above 256).
        buf_dtype = dense_grad_dtype if noop_on_zero else jnp.float32

        def dense_from(sidx, ssrc):
            sgrads = dsrc.at[ssrc].get(mode="fill", fill_value=0)
            ext = sgrads.astype(buf_dtype)
            if not noop_on_zero:
                ext = jnp.concatenate(
                    [ext, jnp.ones((sidx.shape[0], 1), jnp.float32)], axis=1
                )
            return jnp.zeros((rows, ext.shape[1]), buf_dtype).at[sidx].add(
                ext, mode="drop", indices_are_sorted=True
            )

        if 0 < valid_cap < int(sidx.shape[0]):
            # valid-prefix compaction (sentinels sort last; cond = exact)
            v_count = jnp.sum((sidx < rows).astype(jnp.int32))
            grad_ext = jax.lax.cond(
                v_count <= valid_cap,
                lambda: dense_from(sidx[:valid_cap], ssrc[:valid_cap]),
                lambda: dense_from(sidx, ssrc),
            )
        else:
            grad_ext = dense_from(sidx, ssrc)
        if noop_on_zero:
            grad = grad_ext
            touched = jnp.any(grad != 0, axis=1)
        else:
            grad = grad_ext[:, :-1]
            touched = grad_ext[:, -1] > 0
        return apply_dense(opt, table, state, grad, touched, lr, step)
    if segsum == "xla" and rows < (1 << 24):
        # Fused-column segment sum kept in its RAW f32 [*, E+1] form: the
        # row-id fixup, column slice and dtype cast happen INSIDE each cond
        # branch AFTER the window slice, so the common (window-fits) path
        # only post-processes [cap] rows instead of the full K.
        if presorted:
            sidx_f, ssrc_f = idx, src
        else:
            sidx_f, ssrc_f = jax.lax.sort((idx, src), num_keys=1)
        if k_limit and k_limit < k:
            sidx_f = sidx_f[:k_limit]
            ssrc_f = ssrc_f[:k_limit]
            k = k_limit

        def pipeline(sidx, ssrc):
            kk = sidx.shape[0]
            sgrads = dsrc.at[ssrc].get(mode="fill", fill_value=0)
            head = jnp.concatenate(
                [jnp.ones((1,), dtype=bool), sidx[1:] != sidx[:-1]]
            )
            seg = jnp.cumsum(head.astype(jnp.int32)) - 1
            rowid_src = jnp.where(head, sidx, 0).astype(jnp.float32)
            # Folded form: one extra f32 column carries the row id at
            # segment heads (only the head contributes, so the segment sum
            # IS the row id; exact in f32 for rows < 2^24 — the scatter is
            # per-row issue-bound, so one more column is ~free while a
            # separate segment_min scatter is not). BUT [K, E+1] breaks
            # 128-lane tiling: every temp pads to 2 lane tiles (2x bytes),
            # and XLA keeps ~3 such temps live — at huge K (many-table
            # shared storage groups, K = B*total_hotness) that is tens of
            # GB. Size-aware: above the budget, split into a [K, E] grad
            # segsum + a 1-D row-id segsum (layout-clean, no padding).
            budget = (
                fold_budget
                if fold_budget is not None
                else _segsum_fold_budget_bytes()
            )
            fold = kk * (sgrads.shape[1] + 1) * 4 * 3 <= budget
            if fold:
                ext = jnp.concatenate(
                    [sgrads.astype(jnp.float32), rowid_src[:, None]], axis=1
                )
                summed_ext = jax.ops.segment_sum(
                    ext, seg, num_segments=kk, indices_are_sorted=True
                )

                def take(sl):
                    ext_s = summed_ext[:sl] if sl is not None else summed_ext
                    return ext_s[:, :-1], ext_s[:, -1]
            else:
                summed_g = jax.ops.segment_sum(
                    sgrads.astype(jnp.float32), seg, num_segments=kk,
                    indices_are_sorted=True,
                )
                summed_r = jax.ops.segment_sum(
                    rowid_src, seg, num_segments=kk, indices_are_sorted=True
                )

                def take(sl):
                    if sl is None:
                        return summed_g, summed_r
                    return summed_g[:sl], summed_r[:sl]

            nseg = jnp.sum(head.astype(jnp.int32))

            def finish(g, urow_f):
                # g stays f32; optimizer casts at scatter
                k0 = g.shape[0]
                urow = urow_f.astype(sidx.dtype)
                # empty segments (>= nseg) and sentinel rows get distinct
                # increasing out-of-range ids: result stays sorted+unique
                j = jnp.arange(k0, dtype=sidx.dtype)
                urow = jnp.where(
                    (j < nseg) & (urow < rows),
                    urow,
                    jnp.asarray(rows, sidx.dtype) + j,
                )
                return urow, g

            if ucap_cap > 0:
                ucap = min(kk, ucap_cap)  # measured (UCAP_FACTOR=auto)
            else:
                ucap = unique_cap(kk, ucap_factor, ucap_min_k)
            if ucap and ucap < kk:
                if ucap_drop:
                    # capacity-drop mode: overflow segments beyond the cap
                    # lose their gradients (reference comm-buffer-capacity
                    # semantics); avoids the cond so scatters stay aliased
                    return run(*finish(*take(ucap)), None)
                # Real segments occupy a prefix; run the trio on the static
                # cap when it fits, exact full-K fallback otherwise.
                real_count = jnp.sum(
                    (head & (sidx < rows)).astype(jnp.int32)
                )
                return jax.lax.cond(
                    real_count <= ucap,
                    lambda: run(*finish(*take(ucap)), None),
                    lambda: run(*finish(*take(None)), None),
                )
            return run(*finish(*take(None)), None)

        if 0 < valid_cap < k:
            # Valid-prefix compaction (HCTR_TPU_UCAP_FACTOR=auto measures
            # it): invalid/foreign/out-of-window keys carry the sentinel
            # row id and sort LAST, so when the batch's valid count fits
            # the measured cap the ENTIRE post-sort chain (dsrc gather,
            # segment sum, trio) runs on a [valid_cap] slice. Exact: the
            # cond falls back to full-K. This is what makes mostly-padding
            # key lists (hot/cold split windows) cheap.
            v_count = jnp.sum((sidx_f < rows).astype(jnp.int32))
            return jax.lax.cond(
                v_count <= valid_cap,
                lambda: pipeline(sidx_f[:valid_cap], ssrc_f[:valid_cap]),
                lambda: pipeline(sidx_f, ssrc_f),
            )
        return pipeline(sidx_f, ssrc_f)

    uidx, g, tail, is_unique = dedup_rows(
        idx, src, dsrc.astype(table.dtype), sentinel=rows, k_limit=k_limit,
        segsum=segsum, presorted=presorted,
    )
    if not is_unique:
        if packed == "rowwise":
            run = functools.partial(
                _apply_rows_rowwise_packed, opt, table, state, lr, False,
                scatter_auto=scatter_auto,
            )
        elif packed:
            run = functools.partial(
                _apply_rows_packed, opt, table, state, lr, False,
                scatter_auto=scatter_auto,
            )
        else:
            run = functools.partial(
                _apply_rows, opt, table, state, lr, step, False,
                scatter_auto=scatter_auto,
            )
        return run(uidx, g, tail)
    # unique path without the fused f32 column (shards >= 2^24 rows)
    if ucap_cap > 0:
        ucap = min(int(uidx.shape[0]), ucap_cap)
    else:
        ucap = unique_cap(int(uidx.shape[0]), ucap_factor, ucap_min_k)
    if ucap and ucap < int(uidx.shape[0]):
        if ucap_drop:
            return run(uidx[:ucap], g[:ucap], None)
        u_count = jnp.sum((uidx < rows).astype(jnp.int32))
        return jax.lax.cond(
            u_count <= ucap,
            lambda: run(uidx[:ucap], g[:ucap], None),
            lambda: run(uidx, g, None),
        )
    return run(uidx, g, tail)


def _apply_rows_rowwise_packed(
    opt: OptParams,
    table: Array,
    state: State,
    lr: Array,
    is_unique: bool,
    uidx: Array,
    g: Array,
    tail,
    scatter_auto: bool = True,
) -> Tuple[Array, State]:
    """Packed [R, E+1] RowWiseAdaGrad apply (accum scalar as column E).

    The per-row accum delta (mean of g^2) rides in the SAME ADD-form scatter
    as the weight delta, so each touched row costs ONE scatter issue instead
    of two (plus the cheap [W] accum-column gather). Matches the torchrec
    ROWWISE_ADAGRAD math of the unpacked path; the only representational
    difference is that the stored accum increment is rounded to the table
    dtype before the add (exact in fp32 storage)."""
    if opt.optimizer != Optimizer_t.RowWiseAdaGrad:
        raise ValueError("rowwise-packed storage requires RowWiseAdaGrad")
    ev = table.shape[1] - 1
    mask = None if is_unique else tail[:, None]
    acc_col = jax.lax.slice_in_dim(table, ev, ev + 1, axis=1)
    accum_old = acc_col.at[uidx].get(
        mode="fill", fill_value=0,
        indices_are_sorted=True, unique_indices=is_unique,
    )
    g2 = jnp.mean(jnp.square(g.astype(jnp.float32)), axis=1, keepdims=True)
    if mask is not None:
        # dup mode: only segment tails carry full sums; non-tail rows must
        # contribute NOTHING to the accum (their g is zeroed below too)
        g2 = jnp.where(mask, g2, jnp.zeros_like(g2))
    accum = accum_old.astype(jnp.float32) + g2
    delta_w = -lr * g / (jnp.sqrt(accum).astype(g.dtype) + opt.epsilon)
    delta = jnp.concatenate(
        [delta_w.astype(table.dtype), g2.astype(table.dtype)], axis=1
    )
    if mask is not None:
        delta = jnp.where(mask, delta, jnp.zeros_like(delta))
    stream = _scatter_streams(
        table.size * table.dtype.itemsize, uidx.shape[0], scatter_auto
    )
    new_table = table.at[uidx].add(
        delta, mode="drop", indices_are_sorted=stream,
        unique_indices=is_unique and stream,
    )
    return new_table, state


def _apply_rows_packed(
    opt: OptParams,
    table: Array,
    state: State,
    lr: Array,
    is_unique: bool,
    uidx: Array,
    g: Array,
    tail,
    scatter_auto: bool = True,
) -> Tuple[Array, State]:
    """Packed [R, 2E] AdaGrad apply: one gather, one ADD-form scatter."""
    if opt.optimizer != Optimizer_t.AdaGrad:
        raise ValueError("packed storage currently supports AdaGrad only")
    ev = table.shape[1] // 2
    mask = None if is_unique else tail[:, None]
    rows = table.at[uidx].get(
        mode="fill", fill_value=0,
        indices_are_sorted=True, unique_indices=is_unique,
    )
    accum_old = rows[:, ev:]
    gg = g * g
    accum = accum_old + gg
    delta_w = -lr * g / (jnp.sqrt(accum) + opt.epsilon)
    delta = jnp.concatenate([delta_w, gg], axis=1).astype(table.dtype)
    if mask is not None:
        delta = jnp.where(mask, delta, jnp.zeros_like(delta))
    # size-aware lowering like every sibling apply path (the packed layout
    # DOUBLES operand bytes, doubling the flagged streaming-merge penalty
    # on small windows into big operands) — same flag policy as
    # _apply_rows.scatter_add
    stream = _scatter_streams(
        table.size * table.dtype.itemsize, uidx.shape[0], scatter_auto
    )
    new_table = table.at[uidx].add(
        delta, mode="drop", indices_are_sorted=stream,
        unique_indices=is_unique and stream,
    )
    return new_table, state


def _apply_rows(
    opt: OptParams,
    table: Array,
    state: State,
    lr: Array,
    step: Array,
    is_unique: bool,
    uidx: Array,
    g: Array,
    tail,
    scatter_auto: bool = True,
) -> Tuple[Array, State]:
    """Per-row optimizer math + scatters for one (possibly sliced) row set."""
    kind = opt.optimizer
    # In dup mode (Pallas segscan), uidx is sorted WITH duplicates and only
    # tail positions carry full segment sums; every write is expressed as a
    # tail-masked scatter-ADD so indices stay sorted (XLA's fast path) and
    # non-tail positions contribute zero.
    mask = None if is_unique else tail[:, None]

    def gather(a: Array) -> Array:
        return a.at[uidx].get(
            mode="fill",
            fill_value=0,
            indices_are_sorted=True,
            unique_indices=is_unique,
        )

    def scatter_add(a: Array, vals: Array) -> Array:
        vals = vals.astype(a.dtype)  # mixed state/table dtypes (fp32 state)
        if mask is not None:
            vals = jnp.where(mask, vals, jnp.zeros_like(vals))
        stream = _scatter_streams(
            a.size * a.dtype.itemsize, uidx.shape[0], scatter_auto
        )
        return a.at[uidx].add(
            vals, mode="drop", indices_are_sorted=stream,
            unique_indices=is_unique and stream,
        )

    def scatter_set(a: Array, vals: Array, old: Array) -> Array:
        """Overwrite rows: exact set in unique mode; add-of-delta in dup
        mode (old = gather(a), already computed by every caller)."""
        if is_unique:
            stream = _scatter_streams(
                a.size * a.dtype.itemsize, uidx.shape[0], scatter_auto
            )
            return a.at[uidx].set(
                vals.astype(a.dtype), mode="drop",
                indices_are_sorted=stream, unique_indices=stream,
            )
        return scatter_add(a, vals - old)

    if kind == Optimizer_t.MomentumSGD:
        m_old = gather(state["m"])
        m_rows = opt.momentum_factor * m_old - lr * g
        return (
            scatter_add(table, m_rows),
            {"m": scatter_set(state["m"], m_rows, m_old)},
        )

    if kind == Optimizer_t.Nesterov:
        m_old = gather(state["m"])
        m_new = opt.momentum_factor * m_old - lr * g
        delta = opt.momentum_factor * m_new - lr * g
        return (
            scatter_add(table, delta),
            {"m": scatter_set(state["m"], m_new, m_old)},
        )

    if kind == Optimizer_t.AdaGrad:
        accum_old = gather(state["accum"])
        accum = accum_old + g * g
        delta = -lr * g / (jnp.sqrt(accum) + opt.epsilon)
        return (
            scatter_add(table, delta),
            {"accum": scatter_set(state["accum"], accum, accum_old)},
        )

    if kind == Optimizer_t.RowWiseAdaGrad:
        # accum += mean(g^2) over the row; the division broadcasts the
        # per-row scale. mean in fp32 (a bf16 sum of 128 squares loses
        # mantissa fast).
        accum_old = gather(state["accum"])
        g2 = jnp.mean(
            jnp.square(g.astype(jnp.float32)), axis=1, keepdims=True
        )
        accum = accum_old.astype(jnp.float32) + g2
        delta = -lr * g / (jnp.sqrt(accum).astype(g.dtype) + opt.epsilon)
        return (
            scatter_add(table, delta),
            {"accum": scatter_set(state["accum"], accum, accum_old)},
        )

    if kind == Optimizer_t.RMSProp:
        v_old = gather(state["v"])
        v = opt.beta * v_old + (1.0 - opt.beta) * g * g
        delta = -lr * g / (jnp.sqrt(v) + opt.epsilon)
        return (
            scatter_add(table, delta),
            {"v": scatter_set(state["v"], v, v_old)},
        )

    if kind == Optimizer_t.Adam:
        # Lazy per-row moments with global-step bias correction
        # (Update_t::LazyGlobal semantics; untouched rows keep stale moments).
        # bias-correction scalars MUST be fp32: bf16 rounds beta2=0.999
        # to 0.996 and the early-step correction comes out 4x off (NaN blowup)
        t = step.astype(jnp.float32)
        m_old = gather(state["m"])
        v_old = gather(state["v"])
        m = opt.beta1 * m_old + (1.0 - opt.beta1) * g
        v = opt.beta2 * v_old + (1.0 - opt.beta2) * g * g
        mhat = m / (1.0 - opt.beta1**t)
        vhat = v / (1.0 - opt.beta2**t)
        delta = -lr * mhat / (jnp.sqrt(vhat) + opt.epsilon)
        return scatter_add(table, delta), {
            "m": scatter_set(state["m"], m, m_old),
            "v": scatter_set(state["v"], v, v_old),
        }

    if kind == Optimizer_t.FTRL:
        # FTRL-proximal (reference semantics: optimizers.cuh:205
        # ftrl_update_grad_kernel).
        w = gather(table)
        n_old = gather(state["n"])
        z_old = gather(state["z"])
        n_new = n_old + g * g
        sigma = (jnp.sqrt(n_new) - jnp.sqrt(n_old)) / lr
        z_new = z_old + g - sigma * w
        denom = (opt.ftrl_beta + jnp.sqrt(n_new)) / lr + opt.lambda2
        w_new = jnp.where(
            jnp.abs(z_new) > opt.lambda1,
            -(z_new - jnp.sign(z_new) * opt.lambda1) / denom,
            jnp.zeros_like(z_new),
        )
        return scatter_set(table, w_new, w), {
            "z": scatter_set(state["z"], z_new, z_old),
            "n": scatter_set(state["n"], n_new, n_old),
        }

    raise ValueError(f"unsupported sparse optimizer {kind}")
