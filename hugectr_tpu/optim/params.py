"""Optimizer hyperparameter bundle shared by dense and sparse paths.

Semantics mirror the reference optimizer set (HugeCTR/src/optimizers/,
HugeCTR/embedding_storage/optimizers.cuh): SGD, MomentumSGD, Nesterov,
AdaGrad, RMSProp, Adam, FTRL.
"""
from __future__ import annotations

import dataclasses

from ..core.types import Optimizer_t, Update_t


@dataclasses.dataclass
class OptParams:
    optimizer: Optimizer_t = Optimizer_t.SGD
    lr: float = 0.001
    update_type: Update_t = Update_t.Global
    # MomentumSGD / Nesterov
    momentum_factor: float = 0.0
    # Adam
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-7
    # AdaGrad
    initial_accu_value: float = 0.0
    # RMSProp
    beta: float = 0.9
    # FTRL (reference: ftrl_update_grad_kernel,
    # embedding_storage/optimizers.cuh:205)
    lambda1: float = 0.0
    lambda2: float = 0.0
    ftrl_beta: float = 0.0
    # mixed precision loss scaler (kept for API parity; bf16 rarely needs it)
    scaler: float = 1.0
    # warmup / decay handled by LearningRateScheduler; lr passed per-step.

    def __post_init__(self):
        self.optimizer = Optimizer_t(self.optimizer)
        self.update_type = Update_t(self.update_type)
