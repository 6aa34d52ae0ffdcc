"""Fused one-hot matmul kernels for the small-table MXU embedding engine.

The XLA formulation of the one-hot engine materializes the [B, vocab]
counts matrix in HBM twice per step (forward counts @ table, backward
countsᵀ @ d_out) — ~4 ms on the DLRM bench. These kernels build the
one-hot tile IN REGISTERS (VPU compares over the hotness axis) and feed it
straight to the MXU, so the only HBM traffic is keys, table and
activations. Reference semantics: generic_lookup.cuh multi_to_one
reduction / its wgrad transpose.

Forward:  out[b, :]  = Σ_h [0 <= keys[b,h] < V] · table[keys[b,h], :]
Backward: grad[v, :] = Σ_{b,h} [keys[b,h] == v] · d[b, :]
          cnt[v]     = Σ_{b,h} [keys[b,h] == v]

Keys are table-LOCAL rows with any negative value acting as padding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pad_to(x, mult, axis, value):
    pad = (-x.shape[axis]) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _onehot_tile(keys, rowid):
    """[BB, VB] f32 tile: Σ_h (keys[:, h] == rowid)."""
    acc = None
    for hh in range(keys.shape[1]):
        m = (keys[:, hh : hh + 1] == rowid).astype(jnp.float32)
        acc = m if acc is None else acc + m
    return acc


def _fwd_kernel(keys_ref, table_ref, out_ref, acc_ref, *, vb):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rowid = j * vb + jax.lax.broadcasted_iota(jnp.int32, (1, vb), 1)
    oh = _onehot_tile(keys_ref[...], rowid)
    acc_ref[...] += jnp.dot(
        oh, table_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def onehot_matmul_fwd(
    keys: jax.Array, table: jax.Array, bb: int = 256, vb: int = 512
) -> jax.Array:
    """Pooled (sum-combiner) lookup: [B, h] local keys x [V, E] -> [B, E]."""
    b, _h = keys.shape
    v, e = table.shape
    keys_p = _pad_to(keys, bb, 0, -1)
    table_p = _pad_to(table, vb, 0, 0)
    bp, vp = keys_p.shape[0], table_p.shape[0]
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, vb=vb),
        grid=(bp // bb, vp // vb),
        in_specs=[
            pl.BlockSpec((bb, keys.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((vb, e), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bb, e), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, e), table.dtype),
        scratch_shapes=[_vmem((bb, e), jnp.float32, interpret)],
        interpret=interpret,
    )(keys_p, table_p)
    return out[:b]


def _vmem(shape, dtype, interpret):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


def _bwd_kernel(keys_ref, d_ref, grad_ref, cnt_ref, accg_ref, accc_ref, *, vb):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        accg_ref[...] = jnp.zeros_like(accg_ref)
        accc_ref[...] = jnp.zeros_like(accc_ref)

    jv = pl.program_id(0)
    rowid = jv * vb + jax.lax.broadcasted_iota(jnp.int32, (1, vb), 1)
    oh = _onehot_tile(keys_ref[...], rowid)  # [BB, VB]
    accg_ref[...] += jax.lax.dot_general(
        oh, d_ref[...].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    accc_ref[...] += jnp.sum(oh, axis=0, keepdims=True).T  # [VB, 1]

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        grad_ref[...] = accg_ref[...].astype(grad_ref.dtype)
        cnt_ref[...] = accc_ref[...]


def onehot_matmul_bwd(
    keys: jax.Array,
    d: jax.Array,
    vocab: int,
    out_dtype,
    bb: int = 256,
    vb: int = 512,
):
    """Dense wgrad + touch counts: [B, h] keys x [B, E] cotangents ->
    (grad [V, E], counts [V])."""
    b, _h = keys.shape
    e = d.shape[1]
    keys_p = _pad_to(keys, bb, 0, -1)
    d_p = _pad_to(d, bb, 0, 0)
    vp = vocab + ((-vocab) % vb)
    bp = keys_p.shape[0]
    interpret = jax.default_backend() != "tpu"
    grad, cnt = pl.pallas_call(
        functools.partial(_bwd_kernel, vb=vb),
        grid=(vp // vb, bp // bb),
        in_specs=[
            pl.BlockSpec((bb, keys.shape[1]), lambda j, i: (i, 0)),
            pl.BlockSpec((bb, e), lambda j, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((vb, e), lambda j, i: (j, 0)),
            pl.BlockSpec((vb, 1), lambda j, i: (j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vp, e), out_dtype),
            jax.ShapeDtypeStruct((vp, 1), jnp.float32),
        ],
        scratch_shapes=[
            _vmem((vb, e), jnp.float32, interpret),
            _vmem((vb, 1), jnp.float32, interpret),
        ],
        interpret=interpret,
    )(keys_p, d_p)
    return grad[:vocab], cnt[:vocab, 0]
