"""Optimizer + LR schedule.

Matches the reference training law exactly (/root/reference/train.py:123-131):
  * Adam(lr) with torch defaults (betas 0.9/0.999, eps 1e-8)
  * per-step exponential decay with a hard floor:
      gamma = lr_decay_factor ** (1 / (lr_decay * 1000))
      lr(step) = lr0 * max(gamma**step, lr_min / lr0)
    stepped every iteration (the update at iteration k uses lr(k), since
    torch LambdaLR applies lambda(0) to the first optimizer.step()).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lr_schedule(learning_rate: float, lr_decay: float, lr_decay_factor: float,
                lr_min: float):
    import math

    # gamma**step in log space: fp32 pow() drifts ~0.3% by step 2e5, while
    # exp(step * ln(gamma)) stays at ~1e-7 relative error.
    log_gamma = math.log(float(lr_decay_factor)) / (float(lr_decay) * 1000.0)
    floor = lr_min / learning_rate

    def schedule(step):
        decay = jnp.exp(step.astype(jnp.float32) * log_gamma)
        return learning_rate * jnp.maximum(decay, floor)

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    schedule = lr_schedule(
        cfg.learning_rate, cfg.lr_decay, cfg.lr_decay_factor, cfg.lr_min
    )
    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
