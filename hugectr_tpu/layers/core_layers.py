"""Plumbing, activation and normalization layers.

Semantics follow the reference layer zoo (HugeCTR/src/layers/*; behavior
specs from docs/source/api/hugectr_layer_book.md) expressed as XLA ops —
element-wise chains fuse automatically, so each of these is "free" when
adjacent to a matmul.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core.config import DenseLayer
from ..core.types import Initializer_t
from .base import LayerCtx, make_initializer, register, stateless


def _unary(fn):
    def apply(params, state, ins, cfg, ctx):
        return [fn(ins[0], cfg)], state

    return apply


def _same_shape(cfg, in_shapes):
    return [in_shapes[0]]


# --------------------------------------------------------------- activations
register("ReLU")((stateless(_same_shape), _unary(lambda x, c: jax.nn.relu(x))))
register("Sigmoid")((stateless(_same_shape), _unary(lambda x, c: jax.nn.sigmoid(x))))
register("ELU")(
    (stateless(_same_shape), _unary(lambda x, c: jax.nn.elu(x, alpha=c.elu_alpha)))
)
def _cast_apply(params, state, ins, cfg, ctx):
    # reference Cast converts fp32<->fp16 at mixed-precision graph borders
    # (src/layers/cast_layer.cu); the TPU analog casts to the session compute
    # dtype (bfloat16 under use_mixed_precision, else float32).
    return [ins[0].astype(ctx.compute_dtype)], state


register("Cast")((stateless(_same_shape), _cast_apply))


# Softmax: optional second input is a 0/1 mask; masked positions set to -10000
# before softmax (reference: src/layers/softmax_layer.cu two-input variant).
def _softmax_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    if len(ins) > 1:
        mask = ins[1]
        # broadcast [B,1,Sf,St] over heads
        x = jnp.where(mask > 0, x, jnp.asarray(-10000.0, x.dtype))
    return [jax.nn.softmax(x, axis=-1)], state


register("Softmax")((stateless(_same_shape), _softmax_apply))


# MaskedSoftmax: scaled + masked softmax used by BST attention blocks
# (reference: src/layers/masked_softmax_layer.cu).
def _masked_softmax_apply(params, state, ins, cfg, ctx):
    x, mask = ins
    scale = cfg.factor if cfg.factor else 1.0
    x = x * jnp.asarray(scale, x.dtype)
    x = jnp.where(mask > 0, x, jnp.asarray(-10000.0, x.dtype))
    return [jax.nn.softmax(x, axis=-1)], state


register("MaskedSoftmax")((stateless(_same_shape), _masked_softmax_apply))


# PReLU_Dice (reference: src/layers/prelu_dice_layer.cu): Dice activation —
# p = sigmoid((x - E[x]) / sqrt(Var[x] + eps)) over the batch axis,
# out = p*x + (1-p)*alpha*x.
def _dice_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    p = jax.nn.sigmoid((x - mean) * jax.lax.rsqrt(var + cfg.eps))
    return [p * x + (1.0 - p) * cfg.elu_alpha * x], state


register("PReLU_Dice")((stateless(_same_shape), _dice_apply))


# ------------------------------------------------------------------- dropout
def _dropout_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    if not ctx.training or cfg.dropout_rate <= 0.0:
        return [x], state
    keep = 1.0 - cfg.dropout_rate
    mask = jax.random.bernoulli(ctx.rng, keep, x.shape)
    return [jnp.where(mask, x / keep, 0.0).astype(x.dtype)], state


register("Dropout")((stateless(_same_shape), _dropout_apply))


# ------------------------------------------------------------------ reshape
def _reshape_shape(cfg, in_shapes):
    s = in_shapes[0]
    batch = s[0]
    total = batch
    for d in s[1:]:
        total *= d
    if cfg.shape:
        out = []
        seen_minus = False
        prod = 1
        for d in cfg.shape:
            if d == -1:
                seen_minus = True
            else:
                prod *= d
        out = [total // prod if d == -1 else d for d in cfg.shape]
        if not seen_minus and prod != total:
            raise ValueError(f"Reshape: shape {cfg.shape} incompatible with {s}")
        return [tuple(out)]
    if cfg.selected:
        # select slots from [B, n_slots, E] then flatten
        n_sel = len(cfg.selected_slots)
        return [(batch, n_sel * s[2])]
    leading = cfg.leading_dim if cfg.leading_dim else (total // batch)
    if cfg.time_step:
        return [(total // (leading * cfg.time_step), cfg.time_step, leading)]
    return [(total // leading, leading)]


def _reshape_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    if cfg.shape:
        return [x.reshape(cfg.shape)], state
    if cfg.selected:
        sel = x[:, jnp.asarray(cfg.selected_slots), :]
        return [sel.reshape(x.shape[0], -1)], state
    total = x.size
    leading = cfg.leading_dim if cfg.leading_dim else (total // x.shape[0])
    if cfg.time_step:
        return [x.reshape(-1, cfg.time_step, leading)], state
    return [x.reshape(-1, leading)], state


register("Reshape")((stateless(_reshape_shape), _reshape_apply))


# -------------------------------------------------------------------- select
def _select_shape(cfg, in_shapes):
    s = list(in_shapes[0])
    s[cfg.dim] = len(cfg.index)
    return [tuple(s)]


def _select_apply(params, state, ins, cfg, ctx):
    return [jnp.take(ins[0], jnp.asarray(cfg.index), axis=cfg.dim)], state


register("Select")((stateless(_select_shape), _select_apply))


# --------------------------------------------------------------------- slice
def _slice_shape(cfg, in_shapes):
    s = in_shapes[0]
    return [s[:-1] + (b - a,) for a, b in cfg.ranges]


def _slice_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    return [x[..., a:b] for a, b in cfg.ranges], state


register("Slice")((stateless(_slice_shape), _slice_apply))


# -------------------------------------------------------------------- concat
def _concat_shape(cfg, in_shapes):
    axis = cfg.axis
    out = list(in_shapes[0])
    out[axis] = sum(s[axis] for s in in_shapes)
    return [tuple(out)]


def _concat_apply(params, state, ins, cfg, ctx):
    return [jnp.concatenate(ins, axis=cfg.axis)], state


register("Concat")((stateless(_concat_shape), _concat_apply))


# ----------------------------------------------------------- add / sub / mul
register("Add")(
    (
        stateless(_same_shape),
        lambda p, s, ins, c, ctx: ([sum(ins[1:], ins[0])], s),
    )
)
register("Sub")(
    (stateless(_same_shape), lambda p, s, ins, c, ctx: ([ins[0] - ins[1]], s))
)
register("ElementwiseMultiply")(
    (stateless(_same_shape), lambda p, s, ins, c, ctx: ([ins[0] * ins[1]], s))
)


# ---------------------------------------------------------------- reductions
def _reduce_shape(cfg, in_shapes):
    s = list(in_shapes[0])
    s[cfg.axis] = 1
    return [tuple(s)]


register("ReduceSum")(
    (
        stateless(_reduce_shape),
        lambda p, s, ins, c, ctx: ([jnp.sum(ins[0], axis=c.axis, keepdims=True)], s),
    )
)
register("ReduceMean")(
    (
        stateless(_reduce_shape),
        lambda p, s, ins, c, ctx: ([jnp.mean(ins[0], axis=c.axis, keepdims=True)], s),
    )
)


# --------------------------------------------------------------------- scale
def _scale_shape_fn(cfg, in_shapes):
    b, n = in_shapes[0]
    f = int(cfg.factor)
    if cfg.axis == 0:
        return [(b, n * f)]
    return [(b * f, n)]


def _scale_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    f = int(cfg.factor)
    if cfg.axis == 0:
        # each element repeated f times consecutively (reference:
        # upscale_kernel axis==0, src/layers/scale_layer.cu:36-41)
        return [jnp.repeat(x, f, axis=1)], state
    # axis == 1: each sample's row repeated f times contiguously (reference:
    # upscale_kernel axis!=0, scale_layer.cu:42-48)
    return [jnp.repeat(x, f, axis=0)], state


register("Scale")((stateless(_scale_shape_fn), _scale_apply))


# -------------------------------------------------------------------- gather
def _gather_shape(cfg, in_shapes):
    return [(len(cfg.indices),) + in_shapes[0][1:]]


register("Gather")(
    (
        stateless(_gather_shape),
        lambda p, s, ins, c, ctx: ([ins[0][jnp.asarray(c.indices)]], s),
    )
)


# --------------------------------------------------- fused reshape + concat
def _frc_shape(cfg, in_shapes):
    b, feas_plus1, _ = in_shapes[0]
    tot = sum(s[2] for s in in_shapes)
    return [(b * (feas_plus1 - 1), tot), (b, tot)]


def _frc_apply(params, state, ins, cfg, ctx):
    # inputs [B, F+1, E_i] -> item_his [B*F, sum(E)], item [B, sum(E)]
    x = jnp.concatenate(ins, axis=2)
    his = x[:, :-1, :].reshape(-1, x.shape[2])
    item = x[:, -1, :]
    return [his, item], state


register("FusedReshapeConcat")((stateless(_frc_shape), _frc_apply))


def _frcg_shape(cfg, in_shapes):
    b, feas, _ = in_shapes[0]
    tot = sum(s[2] for s in in_shapes)
    return [(b * feas, tot)]


def _frcg_apply(params, state, ins, cfg, ctx):
    x = jnp.concatenate(ins, axis=2)
    return [x.reshape(-1, x.shape[2])], state


register("FusedReshapeConcatGeneral")((stateless(_frcg_shape), _frcg_apply))


# ------------------------------------------------------------- sequence mask
def _seqmask_shape(cfg, in_shapes):
    b = in_shapes[0][0]
    return [(b, 1, cfg.max_sequence_len_from, cfg.max_sequence_len_to)]


def _seqmask_apply(params, state, ins, cfg, ctx):
    len_from = ins[0].reshape(-1).astype(jnp.int32)
    len_to = ins[1].reshape(-1).astype(jnp.int32)
    i = jnp.arange(cfg.max_sequence_len_from)[None, :, None]
    j = jnp.arange(cfg.max_sequence_len_to)[None, None, :]
    mask = (i < len_from[:, None, None]) & (j < len_to[:, None, None])
    return [mask[:, None, :, :].astype(ctx.compute_dtype)], state


register("SequenceMask")((stateless(_seqmask_shape), _seqmask_apply))


# ---------------------------------------------------------------- batch norm
def _bn_init(rng, cfg, in_shapes):
    n = in_shapes[0][-1]
    r1, r2 = jax.random.split(rng)
    gamma_init = make_initializer(cfg.gamma_init_type, n, n)
    beta_init = make_initializer(cfg.beta_init_type, n, n, is_bias=True)
    gamma = (
        jnp.ones((n,), jnp.float32)
        if cfg.gamma_init_type == Initializer_t.Default
        else gamma_init(r1, (n,))
    )
    beta = beta_init(r2, (n,))
    params = {"gamma": gamma, "beta": beta}
    state = {
        "running_mean": jnp.zeros((n,), jnp.float32),
        "running_var": jnp.ones((n,), jnp.float32),
    }
    return params, state, [in_shapes[0]]


def _bn_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    xf = x.astype(jnp.float32)
    if ctx.training:
        mean = jnp.mean(xf, axis=0)
        var = jnp.var(xf, axis=0)
        # runningMean = runningMean*(1-factor) + newMean*factor
        new_state = {
            "running_mean": state["running_mean"] * (1 - cfg.factor)
            + mean * cfg.factor,
            "running_var": state["running_var"] * (1 - cfg.factor) + var * cfg.factor,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + cfg.eps)
    y = y * params["gamma"] + params["beta"]
    return [y.astype(x.dtype)], new_state


register("BatchNorm")((_bn_init, _bn_apply))


# ---------------------------------------------------------------- layer norm
def _ln_init(rng, cfg, in_shapes):
    n = in_shapes[0][-1]
    params = {"gamma": jnp.ones((n,), jnp.float32), "beta": jnp.zeros((n,), jnp.float32)}
    return params, {}, [in_shapes[0]]


def _ln_apply(params, state, ins, cfg, ctx):
    x = ins[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + cfg.eps)
    y = y * params["gamma"] + params["beta"]
    return [y.astype(x.dtype)], state


register("LayerNorm")((_ln_init, _ln_apply))


# ---------------------------------------------------------- weight multiply
def _wm_init(rng, cfg, in_shapes):
    slot_dim, vec_dim = cfg.weight_dims
    init = make_initializer(cfg.weight_init_type, slot_dim, vec_dim)
    params = {"weight": init(rng, (slot_dim, vec_dim))}
    return params, {}, [(in_shapes[0][0], slot_dim * vec_dim)]


def _wm_apply(params, state, ins, cfg, ctx):
    x = ins[0].astype(ctx.compute_dtype)  # [B, slot]
    w = params["weight"].astype(ctx.compute_dtype)  # [slot, vec]
    out = x[:, :, None] * w[None, :, :]
    return [out.reshape(x.shape[0], -1)], state


register("WeightMultiply")((_wm_init, _wm_apply))
