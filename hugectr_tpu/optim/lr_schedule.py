"""Learning-rate scheduler: warmup + polynomial decay.

Reference semantics: HugeCTR/include/learning_rate_scheduler.hpp (host) and
gpu_learning_rate_scheduler.cu (device). Here a single jit-friendly function
of the step counter — usable both host-side (display) and inside the jitted
train step (the device-side analog).
"""
from __future__ import annotations

import jax.numpy as jnp


class LearningRateScheduler:
    def __init__(
        self,
        base_lr: float,
        warmup_steps: int = 1,
        decay_start: int = 0,
        decay_steps: int = 1,
        decay_power: float = 2.0,
        end_lr: float = 0.0,
    ):
        self.base_lr = base_lr
        self.warmup_steps = max(warmup_steps, 1)
        self.decay_start = decay_start
        self.decay_steps = max(decay_steps, 1)
        self.decay_power = decay_power
        self.end_lr = end_lr

    def __call__(self, step):
        """lr at (1-based) step; works on ints and traced arrays."""
        step = jnp.asarray(step, jnp.float32)
        warmup = self.base_lr * jnp.minimum(step, self.warmup_steps) / self.warmup_steps
        if self.decay_start > 0:
            after = jnp.clip(
                (step - self.decay_start) / self.decay_steps, 0.0, 1.0
            )
            decayed = (self.base_lr - self.end_lr) * jnp.power(
                1.0 - after, self.decay_power
            ) + self.end_lr
            return jnp.where(step < self.decay_start, warmup, decayed)
        return warmup

    def get_next(self, step: int) -> float:
        return float(self(step))
