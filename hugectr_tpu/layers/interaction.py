"""CTR feature-interaction layers: DLRM Interaction, DCN MultiCross, FmOrder2,
MultiHeadAttention.

Reference behavior: HugeCTR/src/layers/interaction_layer.cu (DLRM pairwise
dot + concat), multi_cross_layer.cu (DCN v1/v2 incl. low-rank projection),
fm_order2_layer.cu, multi_head_attention_layer.cu. All expressed as batched
MXU matmuls; XLA fuses the epilogues (triangle extraction, concat).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DenseLayer
from .base import LayerCtx, make_initializer, register


# ----------------------------------------------------------------- interaction
def _interaction_shape(cfg, in_shapes):
    (b, e), (_, f, e2) = in_shapes[0], in_shapes[1]
    assert e == e2, f"Interaction: dense dim {e} != emb dim {e2}"
    out_dim = e + (f + 1) * f // 2 + 1  # +1 zero pad (reference layout)
    outs = [(b, out_dim)]
    if getattr(cfg, "_num_tops", 1) > 1:
        outs.append((b, out_dim))  # fp16 fused-MLP auxiliary (alias)
    return outs


def _interaction_init(rng, cfg, in_shapes):
    return {}, {}, _interaction_shape(cfg, in_shapes)


def _interaction_apply(params, state, ins, cfg, ctx: LayerCtx):
    """DLRM pairwise-dot interaction: concat [dense; embeddings] ->
    X @ X^T -> strictly-lower triangle -> [dense | dots | pad]."""
    dense, emb = ins[0], ins[1]
    b, e = dense.shape[0], dense.shape[-1]
    x = jnp.concatenate([dense[:, None, :], emb], axis=1).astype(ctx.compute_dtype)
    f1 = x.shape[1]  # num_feas + 1
    dots = jnp.einsum("bie,bje->bij", x, x, preferred_element_type=jnp.float32)
    iu, ju = np.tril_indices(f1, k=-1)  # strictly lower triangle, f1*(f1-1)/2
    flat = dots[:, jnp.asarray(iu), jnp.asarray(ju)].astype(ctx.compute_dtype)
    pad = jnp.zeros((b, 1), dtype=ctx.compute_dtype)
    out = jnp.concatenate([dense.astype(ctx.compute_dtype), flat, pad], axis=1)
    outs = [out]
    if getattr(cfg, "_num_tops", 1) > 1:
        outs.append(out)  # auxiliary alias for reference fused-MLP configs
    return outs, state


register("Interaction")((_interaction_init, _interaction_apply))


# ------------------------------------------------------------------ multicross
def _mc_init(rng, cfg: DenseLayer, in_shapes):
    n = in_shapes[0][-1]
    k = cfg.projection_dim
    params = {}
    for i in range(cfg.num_layers):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        b_init = make_initializer(cfg.bias_init_type, n, n, is_bias=True)
        if k and k > 0:  # DCN v2 low-rank: W = U @ V
            u_init = make_initializer(cfg.weight_init_type, n, k)
            v_init = make_initializer(cfg.weight_init_type, k, n)
            params[f"U_{i}"] = u_init(r1, (n, k))
            params[f"V_{i}"] = v_init(r2, (k, n))
        else:  # DCN v1: w in R^n
            w_init = make_initializer(cfg.weight_init_type, n, 1)
            params[f"w_{i}"] = w_init(r1, (n,))
        params[f"b_{i}"] = b_init(r3, (n,))
    return params, {}, [in_shapes[0]]


def _mc_apply(params, state, ins, cfg, ctx: LayerCtx):
    x0 = ins[0].astype(ctx.compute_dtype)
    x = x0
    k = cfg.projection_dim
    for i in range(cfg.num_layers):
        b = params[f"b_{i}"].astype(jnp.float32)
        if k and k > 0:
            u = params[f"U_{i}"].astype(ctx.compute_dtype)
            v = params[f"V_{i}"].astype(ctx.compute_dtype)
            xv = jnp.dot(x, u, preferred_element_type=jnp.float32).astype(
                ctx.compute_dtype
            )
            wx = jnp.dot(xv, v, preferred_element_type=jnp.float32) + b
            x = (x0 * wx.astype(ctx.compute_dtype) + x).astype(ctx.compute_dtype)
        else:
            w = params[f"w_{i}"].astype(ctx.compute_dtype)
            xw = jnp.dot(x, w, preferred_element_type=jnp.float32)  # [B]
            x = (x0 * xw[:, None].astype(ctx.compute_dtype) + b.astype(
                ctx.compute_dtype
            ) + x).astype(ctx.compute_dtype)
    return [x], state


register("MultiCross")((_mc_init, _mc_apply))


# -------------------------------------------------------------------- fm order2
def _fm_init(rng, cfg, in_shapes):
    return {}, {}, [(in_shapes[0][0], cfg.out_dim)]


def _fm_apply(params, state, ins, cfg, ctx: LayerCtx):
    """0.5 * ((sum_i v_i)^2 - sum_i v_i^2) over fields, per latent dim."""
    x = ins[0].astype(ctx.compute_dtype)
    b = x.shape[0]
    v = x.reshape(b, -1, cfg.out_dim)  # [B, fields, k]
    s = jnp.sum(v, axis=1)
    s2 = jnp.sum(v * v, axis=1)
    return [0.5 * (s * s - s2)], state


register("FmOrder2")((_fm_init, _fm_apply))


# ---------------------------------------------------------- multi-head attention
def _mha_shape(cfg, in_shapes):
    q = in_shapes[0]
    return [q]


def _mha_init(rng, cfg, in_shapes):
    return {}, {}, _mha_shape(cfg, in_shapes)


def _mha_apply(params, state, ins, cfg, ctx: LayerCtx):
    """Scaled dot-product attention with head split; projections are separate
    InnerProduct layers in reference configs (multi_head_attention_layer.cu)."""
    q, k, v = (x.astype(ctx.compute_dtype) for x in ins[:3])
    mask = ins[3] if len(ins) > 3 else None
    b, sf, d = q.shape
    st = k.shape[1]
    h = cfg.num_attention_heads
    dk = d // h

    def split(x, s):
        return x.reshape(b, s, h, dk).transpose(0, 2, 1, 3)  # [B,h,S,dk]

    qh, kh, vh = split(q, sf), split(k, st), split(v, st)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(dk))
    if mask is not None:
        scores = jnp.where(mask > 0, scores, jnp.asarray(-10000.0, scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1).astype(ctx.compute_dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    out = out.astype(ctx.compute_dtype).transpose(0, 2, 1, 3).reshape(b, sf, d)
    return [out], state


register("MultiHeadAttention")((_mha_init, _mha_apply))
