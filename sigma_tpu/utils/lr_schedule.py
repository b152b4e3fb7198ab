"""LR schedules as optax-compatible callables.

Mirrors `/root/reference/utils/lr_policy.py`: linear warmup then polynomial
decay (power 0.9), plus the plain poly / multi-stage / linear variants.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_lr(start_lr: float, lr_power: float, total_iters: int,
                   warmup_steps: int):
    """WarmUpPolyLR (lr_policy.py:29-41)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_lr * step / max(warmup_steps, 1)
        poly = start_lr * jnp.maximum(
            0.0, 1.0 - step / float(total_iters)
        ) ** lr_power
        return jnp.where(step < warmup_steps, warm, poly)

    return schedule


def poly_lr(start_lr: float, lr_power: float, total_iters: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return start_lr * jnp.maximum(0.0, 1.0 - step / float(total_iters)) ** lr_power

    return schedule


def multi_stage_lr(lr_stages):
    """MultiStageLR (lr_policy.py:44-53): piecewise-constant by step
    boundaries; `lr_stages` = [(until_step, lr), ...]."""
    import jax.numpy as jnp

    bounds = jnp.asarray([b for b, _ in lr_stages], jnp.float32)
    values = jnp.asarray([v for _, v in lr_stages], jnp.float32)

    def schedule(step):
        idx = jnp.sum(jnp.asarray(step, jnp.float32) >= bounds)
        return values[jnp.clip(idx, 0, len(lr_stages) - 1)]

    return schedule


def linear_increase_lr(start_lr: float, end_lr: float, warm_iters: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return start_lr + step * (end_lr - start_lr) / warm_iters

    return schedule
