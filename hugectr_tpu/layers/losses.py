"""Loss layers and regularizers.

Reference behavior: HugeCTR/src/loss.cu (fused sigmoid+BCE, CE, multi-label
CE with per-target weights), src/regularizer.cu (L1/L2 scaled by 1/batch).
Loss layers emit PER-SAMPLE loss tensors; the Network reduces to scalars and
adds regularizer terms over all trainable weights.

The final sigmoid is fused with BCE (reference docs: "do NOT add a Sigmoid
layer before the loss") — loss bottoms are logits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import register, stateless


def _loss_shape(cfg, in_shapes):
    return [in_shapes[0]]


def _bce_apply(params, state, ins, cfg, ctx):
    logits, labels = ins[0].astype(jnp.float32), ins[1].astype(jnp.float32)
    logits = logits.reshape(labels.shape)
    # numerically stable sigmoid BCE via logaddexp: same values as the
    # max(l,0) - l*y + log1p(exp(-|l|)) form, but with the EXACT gradient
    # sigmoid(l) - y everywhere — the max/abs form's autodiff subgradient
    # at logits == 0 gives (1-y) instead of 0.5-y, silently zeroing
    # label-0 gradients on cold starts (zero-init bias + empty dynamic
    # tables put the whole first batch exactly there)
    loss = jnp.logaddexp(0.0, logits) - logits * labels
    return [loss], state


register("BinaryCrossEntropyLoss")((stateless(_loss_shape), _bce_apply))


def _ce_apply(params, state, ins, cfg, ctx):
    # two-class softmax CE over [B, 2] logits with one-hot [B, 2] labels
    logits, labels = ins[0].astype(jnp.float32), ins[1].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(labels * logp, axis=-1, keepdims=True)
    return [loss], state


register("CrossEntropyLoss")((stateless(_loss_shape), _ce_apply))


def _mce_apply(params, state, ins, cfg, ctx):
    # independent per-target sigmoid BCE with optional target weights
    # (logaddexp form — exact gradient at logits == 0, see _bce_apply)
    logits, labels = ins[0].astype(jnp.float32), ins[1].astype(jnp.float32)
    loss = jnp.logaddexp(0.0, logits) - logits * labels
    if cfg.target_weight_vec:
        loss = loss * jnp.asarray(cfg.target_weight_vec, dtype=loss.dtype)
    return [jnp.mean(loss, axis=-1, keepdims=True)], state


register("MultiCrossEntropyLoss")((stateless(_loss_shape), _mce_apply))


def regularizer_term(reg_type, lam: float, batch_size: int, weights) -> jax.Array:
    """L1/L2 regularizer value (reference: src/regularizers/l2_regularizer.cu
    do_compute_rterm — scaled by 1/batch_size; L2 additionally by 1/2).

    Scope intentionally covers ALL trainable dense params: the reference
    regularizer binds the full layer weight-tensor vector
    (add_dense_layer_helpers.cpp:72-79) and FC biases / BatchNorm gamma+beta
    ARE registered weights there (fully_connected_layer.cu:90-91,
    batch_norm_layer.cu:67-68), so summing every param leaf matches it."""
    from ..core.types import Regularizer_t

    if lam == 0.0 or reg_type == Regularizer_t.NonE:
        return jnp.asarray(0.0, jnp.float32)
    leaves = jax.tree.leaves(weights)
    if reg_type == Regularizer_t.L1:
        s = sum(jnp.sum(jnp.abs(w.astype(jnp.float32))) for w in leaves)
        return lam / batch_size * s
    s = sum(jnp.sum(jnp.square(w.astype(jnp.float32))) for w in leaves)
    return lam / (2.0 * batch_size) * s
