"""Dense-network optimizers.

Same seven optimizers as the reference (HugeCTR/src/optimizers/: SGD,
MomentumSGD, Nesterov, AdaGrad, RMSProp, Adam, FTRL) applied over the dense
parameter pytree. Formulas intentionally shared with the sparse per-row path
(embedding/sparse_optimizer.py) so dense and embedding updates agree.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..core.types import Optimizer_t
from .params import OptParams

Array = jax.Array
PyTree = Any


class DenseOptimizer:
    def __init__(self, opt: OptParams):
        if opt.optimizer == Optimizer_t.RowWiseAdaGrad:
            # RowWiseAdaGrad is an embedding-row optimizer; dense-layer
            # parameters use standard element-wise AdaGrad — matching the
            # MLPerf DLRM reference implementation (torchrec rowwise
            # embeddings + eager Adagrad dense).
            import dataclasses

            opt = dataclasses.replace(opt, optimizer=Optimizer_t.AdaGrad)
        self.opt = opt

    def init(self, params: PyTree) -> PyTree:
        z = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        kind = self.opt.optimizer
        if kind == Optimizer_t.SGD:
            return {}
        if kind in (Optimizer_t.MomentumSGD, Optimizer_t.Nesterov):
            return {"m": jax.tree.map(z, params)}
        if kind == Optimizer_t.AdaGrad:
            return {
                "accum": jax.tree.map(
                    lambda p: jnp.full_like(
                        p, self.opt.initial_accu_value, dtype=jnp.float32
                    ),
                    params,
                )
            }
        if kind == Optimizer_t.RMSProp:
            return {"v": jax.tree.map(z, params)}
        if kind == Optimizer_t.Adam:
            return {"m": jax.tree.map(z, params), "v": jax.tree.map(z, params)}
        if kind == Optimizer_t.FTRL:
            return {"z": jax.tree.map(z, params), "n": jax.tree.map(z, params)}
        raise ValueError(kind)

    def update(
        self, params: PyTree, state: PyTree, grads: PyTree, lr: Array, step: Array
    ) -> Tuple[PyTree, PyTree]:
        opt = self.opt
        kind = opt.optimizer
        lr = jnp.asarray(lr, jnp.float32)

        if kind == Optimizer_t.SGD:
            new_p = jax.tree.map(
                lambda p, g: p - (lr * g.astype(jnp.float32)).astype(p.dtype),
                params,
                grads,
            )
            return new_p, state

        if kind == Optimizer_t.MomentumSGD:
            new_m = jax.tree.map(
                lambda m, g: opt.momentum_factor * m - lr * g.astype(jnp.float32),
                state["m"],
                grads,
            )
            new_p = jax.tree.map(lambda p, m: p + m.astype(p.dtype), params, new_m)
            return new_p, {"m": new_m}

        if kind == Optimizer_t.Nesterov:
            new_m = jax.tree.map(
                lambda m, g: opt.momentum_factor * m - lr * g.astype(jnp.float32),
                state["m"],
                grads,
            )
            new_p = jax.tree.map(
                lambda p, m, g: p
                + (opt.momentum_factor * m - lr * g.astype(jnp.float32)).astype(
                    p.dtype
                ),
                params,
                new_m,
                grads,
            )
            return new_p, {"m": new_m}

        if kind == Optimizer_t.AdaGrad:
            new_acc = jax.tree.map(
                lambda a, g: a + jnp.square(g.astype(jnp.float32)),
                state["accum"],
                grads,
            )
            new_p = jax.tree.map(
                lambda p, g, a: p
                - (
                    lr * g.astype(jnp.float32) / (jnp.sqrt(a) + opt.epsilon)
                ).astype(p.dtype),
                params,
                grads,
                new_acc,
            )
            return new_p, {"accum": new_acc}

        if kind == Optimizer_t.RMSProp:
            new_v = jax.tree.map(
                lambda v, g: opt.beta * v
                + (1 - opt.beta) * jnp.square(g.astype(jnp.float32)),
                state["v"],
                grads,
            )
            new_p = jax.tree.map(
                lambda p, g, v: p
                - (
                    lr * g.astype(jnp.float32) / (jnp.sqrt(v) + opt.epsilon)
                ).astype(p.dtype),
                params,
                grads,
                new_v,
            )
            return new_p, {"v": new_v}

        if kind == Optimizer_t.Adam:
            t = step.astype(jnp.float32)
            new_m = jax.tree.map(
                lambda m, g: opt.beta1 * m + (1 - opt.beta1) * g.astype(jnp.float32),
                state["m"],
                grads,
            )
            new_v = jax.tree.map(
                lambda v, g: opt.beta2 * v
                + (1 - opt.beta2) * jnp.square(g.astype(jnp.float32)),
                state["v"],
                grads,
            )
            bc1 = 1.0 - opt.beta1**t
            bc2 = 1.0 - opt.beta2**t
            new_p = jax.tree.map(
                lambda p, m, v: p
                - (
                    lr * (m / bc1) / (jnp.sqrt(v / bc2) + opt.epsilon)
                ).astype(p.dtype),
                params,
                new_m,
                new_v,
            )
            return new_p, {"m": new_m, "v": new_v}

        if kind == Optimizer_t.FTRL:
            def upd(p, g, z, n):
                g = g.astype(jnp.float32)
                pf = p.astype(jnp.float32)
                n_new = n + g * g
                sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / lr
                z_new = z + g - sigma * pf
                denom = (opt.ftrl_beta + jnp.sqrt(n_new)) / lr + opt.lambda2
                w = jnp.where(
                    jnp.abs(z_new) > opt.lambda1,
                    -(z_new - jnp.sign(z_new) * opt.lambda1) / denom,
                    0.0,
                )
                return w.astype(p.dtype), z_new, n_new

            triples = jax.tree.map(upd, params, grads, state["z"], state["n"])
            new_p = jax.tree.map(lambda t3: t3[0], triples, is_leaf=lambda x: isinstance(x, tuple))
            new_z = jax.tree.map(lambda t3: t3[1], triples, is_leaf=lambda x: isinstance(x, tuple))
            new_n = jax.tree.map(lambda t3: t3[2], triples, is_leaf=lambda x: isinstance(x, tuple))
            return new_p, {"z": new_z, "n": new_n}

        raise ValueError(kind)
