"""Pallas streaming segmented-sum kernel.

Replaces ``jax.ops.segment_sum`` + ``segment_min`` in the sparse-embedding
local reduce (reference: segmented sum in
HugeCTR/embedding/operators/index_calculation.cu). XLA lowers segment_sum to
a row-granular scatter-add (~25ms for 2M rows on v5e); this kernel instead
makes ONE sequential pass over the sorted gradient stream — pure streaming
HBM traffic with an in-VMEM Hillis-Steele segmented scan per block and an
[1, E] carry in scratch across the sequential grid.

Output convention: ``out[i]`` holds the inclusive segmented running sum, so
the TAIL row of each segment carries the full segment sum. Downstream uses
``tail`` flags to address updates (unique but unsorted row ids), dropping
non-tail rows via out-of-range scatter semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; import lazily tolerated on CPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _segscan_kernel(heads_ref, vals_ref, out_ref, carry_ref, blk: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    v = vals_ref[...].astype(jnp.float32)  # [BK, E] f32 accumulation
    h = heads_ref[...].astype(jnp.float32)  # [BK, 1] 1.0 at segment heads
    s = h
    m = h  # max-scan of h: 1 once any head has appeared at or before row i
    d = 1
    while d < blk:
        # shift rows down by d; shifted-in rows: v=0, s=1 (block boundary)
        v_sh = jnp.concatenate([jnp.zeros_like(v[:d]), v[:-d]], axis=0)
        s_sh = jnp.concatenate([jnp.ones_like(s[:d]), s[:-d]], axis=0)
        m_sh = jnp.concatenate([jnp.zeros_like(m[:d]), m[:-d]], axis=0)
        v = v + v_sh * (1.0 - s)
        s = jnp.maximum(s, s_sh)
        m = jnp.maximum(m, m_sh)
        d *= 2
    # rows before the first head continue the carried segment
    pre = 1.0 - m  # [BK, 1]
    v = v + pre * carry_ref[...]
    carry_ref[...] = v[-1:, :]
    out_ref[...] = v.astype(out_ref.dtype)


def segmented_sum_sorted(vals: jax.Array, heads: jax.Array, block: int = 512):
    """Inclusive segmented sums of `vals` [K, E] along sorted segments.

    Args:
      vals: [K, E] values (rows sorted by segment).
      heads: [K] bool/int — True at the first row of each segment
        (heads[0] must be True).
      block: rows per grid step (multiple of 8).

    Returns [K, E]: tail rows carry full segment sums.
    """
    k, e = vals.shape
    assert k % block == 0, (k, block)
    heads2d = heads.reshape(k, 1).astype(jnp.float32)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_segscan_kernel, blk=block),
        grid=(k // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, e), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((k, e), vals.dtype),
        scratch_shapes=[pltpu.VMEM((1, e), jnp.float32)],
        input_output_aliases={1: 0},  # scan in place over the vals buffer
        interpret=interpret,
    )(heads2d, vals)
