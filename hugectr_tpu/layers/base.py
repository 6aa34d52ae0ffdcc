"""Layer registry, context and initializers.

Each layer is a pair of pure functions:
  init(rng, cfg, in_shapes)  -> (params, state, out_shapes)
  apply(params, state, inputs, cfg, ctx) -> (outputs, new_state)

`state` holds non-differentiable buffers (BatchNorm running stats).
Shapes carry the concrete batch dimension for parameter-shape inference only;
apply functions are batch-polymorphic.

Analog of the reference's Layer/TrainableLayer hierarchy
(HugeCTR/include/trainable_layer.hpp) in functional form.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DenseLayer
from ..core.types import Initializer_t

Array = jax.Array
Shape = Tuple[int, ...]
Params = Dict[str, Array]
State = Dict[str, Array]


@dataclasses.dataclass
class LayerCtx:
    training: bool
    compute_dtype: jnp.dtype
    rng: Optional[Array] = None  # dropout rng


InitFn = Callable[[Array, DenseLayer, List[Shape]], Tuple[Params, State, List[Shape]]]
ApplyFn = Callable[
    [Params, State, List[Array], DenseLayer, LayerCtx], Tuple[List[Array], State]
]


@dataclasses.dataclass
class LayerDef:
    init: InitFn
    apply: ApplyFn


LAYER_REGISTRY: Dict[str, LayerDef] = {}


def register(layer_type: str):
    def deco(cls_or_pair):
        if isinstance(cls_or_pair, tuple):
            init, apply = cls_or_pair
        else:
            init, apply = cls_or_pair.init, cls_or_pair.apply
        LAYER_REGISTRY[layer_type] = LayerDef(init=init, apply=apply)
        return cls_or_pair

    return deco


def stateless(init_shape_fn):
    """Wrap a pure shape-inference fn into a (no-params, no-state) init."""

    def init(rng, cfg, in_shapes):
        return {}, {}, init_shape_fn(cfg, in_shapes)

    return init


# ---------------------------------------------------------------- initializers
def make_initializer(
    kind: Initializer_t, fan_in: int, fan_out: int, is_bias: bool = False
):
    """Weight init schemes (reference semantics: Initializer_t,
    include/common.hpp:151; defaults follow common practice — weights
    Xavier-uniform, biases zero)."""

    kind = Initializer_t(kind)

    def fn(rng: Array, shape: Shape, dtype=jnp.float32) -> Array:
        if kind == Initializer_t.Zero:
            return jnp.zeros(shape, dtype)
        if kind == Initializer_t.Default:
            if is_bias:
                return jnp.zeros(shape, dtype)
            limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
            return jax.random.uniform(rng, shape, dtype, -limit, limit)
        if kind == Initializer_t.Uniform:
            limit = float(np.sqrt(1.0 / max(fan_in, 1)))
            return jax.random.uniform(rng, shape, dtype, -limit, limit)
        if kind == Initializer_t.XavierNorm:
            std = float(np.sqrt(2.0 / (fan_in + fan_out)))
            return std * jax.random.normal(rng, shape, dtype)
        if kind == Initializer_t.XavierUniform:
            limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
            return jax.random.uniform(rng, shape, dtype, -limit, limit)
        raise ValueError(kind)

    return fn


def feature_size(shape: Shape) -> int:
    """Product of non-batch dims."""
    n = 1
    for d in shape[1:]:
        n *= d
    return n
