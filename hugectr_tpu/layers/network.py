"""Dense network: graph builder + functional executor.

Analog of the reference's Network + graph_analysis
(HugeCTR/src/core23_network.cpp, src/pybind/model_compile.cpp:624-713):
layers execute in add-order over a named-tensor dictionary; referencing the
same tensor from several layers needs no auto-Slice insertion here (pure
functional reads). The reference's stream/event pipeline and CUDA-graph
capture collapse into XLA scheduling under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import DenseLayer, LOSS_LAYER_TYPES, Layer_t
from . import core_layers  # noqa: F401 (registry population)
from . import gemm  # noqa: F401
from . import interaction  # noqa: F401
from . import losses as loss_mod  # noqa: F401
from .base import LAYER_REGISTRY, LayerCtx
from .losses import regularizer_term

Array = jax.Array


@dataclasses.dataclass
class LossSpec:
    layer_name: str
    loss_type: str
    pred_name: str  # logits tensor
    label_name: str
    weight: float = 1.0
    use_regularizer: bool = False
    regularizer_type: object = None
    lam: float = 0.0


class Network:
    """Compiled dense network over a tensor-name graph."""

    def __init__(
        self,
        layers: List[DenseLayer],
        input_shapes: Dict[str, Tuple[int, ...]],
        label_weights: Optional[Dict[str, float]] = None,
        batch_size: int = 0,
    ):
        self.configs = list(layers)
        self.input_shapes = dict(input_shapes)
        self.label_weights = label_weights or {}
        self.batch_size = batch_size or next(iter(input_shapes.values()))[0]
        self.layer_names: List[str] = []
        self.loss_specs: List[LossSpec] = []
        self.aliases: Dict[str, str] = {}  # alias top -> real top
        self._analyze()

    # ------------------------------------------------------------- analysis
    def _analyze(self):
        known = set(self.input_shapes)
        for i, cfg in enumerate(self.configs):
            name = f"l{i}_{cfg.layer_type}"
            self.layer_names.append(name)
            # interaction_grad auxiliary top: alias of the first top
            # (reference fp16 fused-MLP pattern, hugectr_layer_book.md MLP ex.)
            if cfg.layer_type == Layer_t.Interaction and len(cfg.top_names) > 1:
                self.aliases[cfg.top_names[1]] = cfg.top_names[0]
            for b in cfg.bottom_names:
                real = self.aliases.get(b, b)
                if real not in known:
                    raise ValueError(
                        f"layer {name}: unknown bottom tensor {b!r}"
                    )
            for t in cfg.top_names:
                known.add(t)
            if cfg.layer_type in LOSS_LAYER_TYPES:
                pred = cfg.bottom_names[0]
                label = cfg.bottom_names[1]
                self.loss_specs.append(
                    LossSpec(
                        layer_name=name,
                        loss_type=cfg.layer_type,
                        pred_name=self.aliases.get(pred, pred),
                        label_name=label,
                        weight=self.label_weights.get(label, 1.0),
                        use_regularizer=cfg.use_regularizer,
                        regularizer_type=cfg.regularizer_type,
                        lam=cfg.lambda_,
                    )
                )

    def _effective_bottoms(self, cfg: DenseLayer) -> List[str]:
        bottoms = [self.aliases.get(b, b) for b in cfg.bottom_names]
        # drop duplicate alias bottoms (e.g. MLP over [interaction, its alias])
        seen, out = set(), []
        for b in bottoms:
            if b in seen and cfg.layer_type == Layer_t.MLP:
                continue
            seen.add(b)
            out.append(b)
        return out

    # ----------------------------------------------------------------- init
    def init(self, rng: Array) -> Tuple[Dict, Dict]:
        params: Dict[str, Dict] = {}
        state: Dict[str, Dict] = {}
        shapes = dict(self.input_shapes)
        for name, cfg in zip(self.layer_names, self.configs):
            impl = LAYER_REGISTRY.get(cfg.layer_type)
            if impl is None:
                raise NotImplementedError(f"layer type {cfg.layer_type}")
            rng, sub = jax.random.split(rng)
            cfg._num_tops = len(cfg.top_names)
            in_shapes = [shapes[b] for b in self._effective_bottoms(cfg)]
            p, s, out_shapes = impl.init(sub, cfg, in_shapes)
            if p:
                params[name] = p
            if s:
                state[name] = s
            for t, os in zip(cfg.top_names, out_shapes):
                shapes[t] = os
        self.tensor_shapes = shapes
        return params, state

    # ---------------------------------------------------------------- apply
    def apply(
        self,
        params: Dict,
        state: Dict,
        tensors: Dict[str, Array],
        ctx: LayerCtx,
    ) -> Tuple[Dict[str, Array], Dict]:
        """Run all layers; returns (tensor dict incl. per-sample losses,
        new state)."""
        import os

        # SKIP_DENSE_LAYERS="top1,top2": benchmark ablation — the named
        # layers' outputs are replaced with zeros so XLA dead-code
        # eliminates their compute (+ backward). Analog of the reference's
        # SKIP_BOTTOM_MLP/SKIP_TOP_MLP flags (model_pipeline.cpp:230-234);
        # read at trace time like every SKIP_* knob.
        skip_tops = {
            s for s in os.environ.get("SKIP_DENSE_LAYERS", "").split(",") if s
        }
        tensors = dict(tensors)
        new_state = dict(state)
        for li, (name, cfg) in enumerate(zip(self.layer_names, self.configs)):
            impl = LAYER_REGISTRY[cfg.layer_type]
            cfg._num_tops = len(cfg.top_names)
            ins = [tensors[b] for b in self._effective_bottoms(cfg)]
            layer_ctx = LayerCtx(
                training=ctx.training,
                compute_dtype=ctx.compute_dtype,
                rng=(
                    jax.random.fold_in(ctx.rng, li) if ctx.rng is not None else None
                ),
            )
            outs, s = impl.apply(
                params.get(name, {}), state.get(name, {}), ins, cfg, layer_ctx
            )
            if s:
                new_state[name] = s
            if skip_tops and all(t in skip_tops for t in cfg.top_names):
                outs = [jnp.zeros_like(o) for o in outs]
            for t, o in zip(cfg.top_names, outs):
                tensors[t] = o
        return tensors, new_state

    # ----------------------------------------------------------------- loss
    def compute_loss(
        self, params: Dict, tensors: Dict[str, Array], scaler: float = 1.0
    ) -> Array:
        """Scalar training loss: weighted mean of per-loss-layer means plus
        regularizer terms (reference: multi-task label weights,
        src/pybind/model_compile.cpp:764)."""
        total = jnp.asarray(0.0, jnp.float32)
        for spec in self.loss_specs:
            loss_t = tensors[f"__loss__{spec.layer_name}"]
            total = total + spec.weight * jnp.mean(loss_t.astype(jnp.float32))
            if spec.use_regularizer and spec.lam:
                total = total + regularizer_term(
                    spec.regularizer_type, spec.lam, self.batch_size, params
                )
        return total

    def forward_with_loss(
        self,
        params: Dict,
        state: Dict,
        tensors: Dict[str, Array],
        ctx: LayerCtx,
    ) -> Tuple[Array, Tuple[Dict[str, Array], Dict]]:
        out, new_state = self.apply(params, state, tensors, ctx)
        # stash per-sample losses under reserved names
        for spec in self.loss_specs:
            cfg = self.configs[self.layer_names.index(spec.layer_name)]
            out[f"__loss__{spec.layer_name}"] = out[cfg.top_names[0]]
        loss = self.compute_loss(params, out, 1.0)
        return loss, (out, new_state)

    # ------------------------------------------------------------- predictions
    def predictions(self, tensors: Dict[str, Array]) -> Dict[str, Array]:
        """Per-loss probability predictions for metrics (sigmoid fused into
        BCE in the reference; we apply it here for eval outputs)."""
        preds = {}
        for spec in self.loss_specs:
            logits = tensors[spec.pred_name].astype(jnp.float32)
            if spec.loss_type == Layer_t.CrossEntropyLoss:
                preds[spec.label_name] = jax.nn.softmax(logits, axis=-1)[..., :1]
            else:
                preds[spec.label_name] = jax.nn.sigmoid(logits)
        return preds

    def summary_rows(self) -> List[Tuple[str, str, str, str]]:
        rows = []
        for name, cfg in zip(self.layer_names, self.configs):
            in_s = ",".join(str(self.tensor_shapes.get(b)) for b in cfg.bottom_names)
            out_s = ",".join(str(self.tensor_shapes.get(t)) for t in cfg.top_names)
            rows.append(
                (cfg.layer_type, ";".join(cfg.bottom_names), ";".join(cfg.top_names),
                 f"{in_s} -> {out_s}")
            )
        return rows
