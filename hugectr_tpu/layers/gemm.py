"""GEMM-family layers: InnerProduct, fused MLP, MatrixMultiply, GRU.

The reference implements these with cuBLAS/cublasLt epilogue fusion
(HugeCTR/src/layers/fully_connected_layer*.cu, mlp_layer.cu,
functors/fused_gemm_functors.cu). On TPU a plain jnp.dot chain with bias+act
compiles to MXU matmuls with fused epilogues — XLA performs the
bias/activation fusion that cublasLt epilogues do by hand, so the "fused MLP"
is simply the loop below under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import DenseLayer
from ..core.types import Activation_t
from .base import LayerCtx, feature_size, make_initializer, register


def _act(kind: Activation_t, x):
    if kind == Activation_t.Relu:
        return jax.nn.relu(x)
    if kind == Activation_t.Sigmoid:
        return jax.nn.sigmoid(x)
    if kind == Activation_t.Tanh:
        return jnp.tanh(x)
    if kind == Activation_t.Elu:
        return jax.nn.elu(x)
    if kind == Activation_t.Gelu:
        return jax.nn.gelu(x)
    return x


def _dense(x, w, b, dtype):
    y = jnp.dot(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


# ----------------------------------------------------------------- inner product
def _ip_init(rng, cfg: DenseLayer, in_shapes):
    shape = in_shapes[0]
    # 3D input [B, S, I] -> per-step FC [B, S, O] (reference:
    # fully_connected_layer supports 3D for BST/DIN attention projections)
    fan_in = shape[-1] if len(shape) == 3 else feature_size(shape)
    fan_out = cfg.num_output
    r1, r2 = jax.random.split(rng)
    w_init = make_initializer(cfg.weight_init_type, fan_in, fan_out)
    b_init = make_initializer(cfg.bias_init_type, fan_in, fan_out, is_bias=True)
    params = {"weight": w_init(r1, (fan_in, fan_out))}
    if cfg.use_bias:
        params["bias"] = b_init(r2, (fan_out,))
    out_shape = (
        (shape[0], shape[1], fan_out) if len(shape) == 3 else (shape[0], fan_out)
    )
    return params, {}, [out_shape]


def _ip_apply(params, state, ins, cfg, ctx: LayerCtx):
    x = ins[0]
    if x.ndim != 3:
        x = x.reshape(x.shape[0], -1)
    y = _dense(x, params["weight"], params.get("bias"), ctx.compute_dtype)
    return [y.astype(ctx.compute_dtype)], state


register("InnerProduct")((_ip_init, _ip_apply))


# ------------------------------------------------------------------- fused MLP
def _mlp_layer_specs(cfg: DenseLayer):
    n = len(cfg.num_outputs)
    acts = cfg.activations or [cfg.act_type] * n
    biases = cfg.biases or [cfg.use_bias] * n
    return list(zip(cfg.num_outputs, acts, biases))


def _mlp_init(rng, cfg: DenseLayer, in_shapes):
    fan_in = sum(feature_size(s) for s in in_shapes)
    params = {}
    for i, (fan_out, _act_i, use_b) in enumerate(_mlp_layer_specs(cfg)):
        rng, r1, r2 = jax.random.split(rng, 3)
        w_init = make_initializer(cfg.weight_init_type, fan_in, fan_out)
        params[f"weight_{i}"] = w_init(r1, (fan_in, fan_out))
        if use_b:
            b_init = make_initializer(cfg.bias_init_type, fan_in, fan_out, is_bias=True)
            params[f"bias_{i}"] = b_init(r2, (fan_out,))
        fan_in = fan_out
    return params, {}, [(in_shapes[0][0], cfg.num_outputs[-1])]


def _mlp_apply(params, state, ins, cfg, ctx: LayerCtx):
    # multiple bottoms are concatenated on the feature axis (the reference's
    # interaction_grad auxiliary bottom is filtered out by the graph builder)
    xs = [x.reshape(x.shape[0], -1) for x in ins]
    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
    for i, (_n, act_i, use_b) in enumerate(_mlp_layer_specs(cfg)):
        b = params.get(f"bias_{i}") if use_b else None
        x = _dense(x, params[f"weight_{i}"], b, ctx.compute_dtype)
        x = _act(act_i, x).astype(ctx.compute_dtype)
    return [x], state


register("MLP")((_mlp_init, _mlp_apply))


# FusedInnerProduct: InnerProduct + ReLU fusion (reference:
# fused_fully_connected_layer.cu); on TPU it's the same MXU op with epilogue.
def _fip_init(rng, cfg, in_shapes):
    return _ip_init(rng, cfg, in_shapes)


def _fip_apply(params, state, ins, cfg, ctx):
    outs, state = _ip_apply(params, state, ins, cfg, ctx)
    return [jax.nn.relu(outs[0])], state


register("FusedInnerProduct")((_fip_init, _fip_apply))


# -------------------------------------------------------------- matrix multiply
def _mm_shape(cfg, in_shapes):
    a, b = in_shapes
    if len(a) == 2 and len(b) == 2:
        return [(a[0], b[1])]
    if len(a) == 3 and len(b) == 3:
        return [(a[0], a[1], b[2])]
    if len(a) == 2 and len(b) == 3:
        return [(a[0], b[1], b[2])]
    raise ValueError(f"MatrixMultiply: unsupported ranks {a} x {b}")


def _mm_apply(params, state, ins, cfg, ctx):
    a, b = (x.astype(ctx.compute_dtype) for x in ins)
    if a.ndim == 2 and b.ndim == 2:
        y = jnp.dot(a, b, preferred_element_type=jnp.float32)
    elif a.ndim == 3 and b.ndim == 3:
        if cfg.transpose_b:
            b = jnp.swapaxes(b, 1, 2)
        y = jnp.einsum("bmn,bnk->bmk", a, b, preferred_element_type=jnp.float32)
    else:
        y = jnp.einsum("bm,mgh->bgh", a, b, preferred_element_type=jnp.float32)
    return [y.astype(ctx.compute_dtype)], state


def _mm_init(rng, cfg, in_shapes):
    return {}, {}, _mm_shape(cfg, in_shapes)


register("MatrixMultiply")((_mm_init, _mm_apply))


# ------------------------------------------------------------------------ GRU
def _gru_init(rng, cfg: DenseLayer, in_shapes):
    v, h = cfg.vector_size, cfg.num_output
    rs = jax.random.split(rng, 4)
    w_init = make_initializer(cfg.weight_init_type, v, h)
    u_init = make_initializer(cfg.weight_init_type, h, h)
    b_init = make_initializer(cfg.bias_init_type, v, h, is_bias=True)
    params = {
        # gates: [z, r, n] stacked on the last axis
        "w": w_init(rs[0], (v, 3 * h)),
        "u": u_init(rs[1], (h, 3 * h)),
        "bw": b_init(rs[2], (3 * h,)),
        "bu": b_init(rs[3], (3 * h,)),
    }
    batch = cfg.batchsize or in_shapes[0][0]
    return params, {}, [(batch, cfg.SeqLength * h)]


def _gru_apply(params, state, ins, cfg, ctx: LayerCtx):
    """Standard GRU over [B, S, V] sequences (reference: src/layers/
    gru_layer.cu wraps cuDNN RNN; here an lax.scan over MXU matmuls)."""
    h_dim = cfg.num_output
    x = ins[0].reshape(-1, cfg.SeqLength, cfg.vector_size).astype(ctx.compute_dtype)
    b = x.shape[0]
    w, u = params["w"].astype(ctx.compute_dtype), params["u"].astype(ctx.compute_dtype)
    bw, bu = params["bw"], params["bu"]

    # precompute input projections for the whole sequence in one matmul
    xw = jnp.einsum("bsv,vh->bsh", x, w, preferred_element_type=jnp.float32) + bw

    def cell(h, xw_t):
        hu = jnp.dot(h, u, preferred_element_type=jnp.float32) + bu
        xz, xr, xn = jnp.split(xw_t, 3, axis=-1)
        hz, hr, hn = jnp.split(hu, 3, axis=-1)
        z = jax.nn.sigmoid(xz + hz)
        r = jax.nn.sigmoid(xr + hr)
        n = jnp.tanh(xn + r * hn)
        h_new = ((1.0 - z) * n + z * h).astype(ctx.compute_dtype)
        return h_new, h_new

    h0 = jnp.zeros((b, h_dim), dtype=ctx.compute_dtype)
    _, hs = jax.lax.scan(cell, h0, jnp.swapaxes(xw, 0, 1).astype(ctx.compute_dtype))
    out = jnp.swapaxes(hs, 0, 1).reshape(b, -1)  # [B, S*H]
    return [out], state


register("GRU")((_gru_init, _gru_apply))
