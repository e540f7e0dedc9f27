"""Learning-rate schedules as optax-compatible ``step -> lr`` callables.

Covers the reference scheduler set (``ponder/utils/scheduler.py:15-148``):
MultiStepLR, MultiStepWithWarmupLR, PolyLR, ExpLR, CosineAnnealingLR, OneCycleLR.
All are *rebased on total_steps* exactly like the reference trainer
(``ponder/engines/train.py:286``): configs give epoch-fractions or rely on the
trainer to inject ``total_steps``.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import numpy as np

from .registry import Registry

SCHEDULERS = Registry("schedulers")

Schedule = Callable[[int], float]


def _as_float(step):
    import jax.numpy as jnp

    return jnp.asarray(step, dtype=jnp.float32)


@SCHEDULERS.register_module(name="MultiStepLR")
def multi_step_lr(
    total_steps: int,
    base_lr: float,
    milestones: Sequence[float],
    gamma: float = 0.1,
) -> Schedule:
    """Step decay at epoch-fraction milestones (fractions of total_steps)."""
    boundaries = [int(m * total_steps) for m in milestones]

    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        n_passed = sum(jnp.where(s >= b, 1.0, 0.0) for b in boundaries)
        return base_lr * gamma**n_passed

    return schedule


@SCHEDULERS.register_module(name="MultiStepWithWarmupLR")
def multi_step_warmup_lr(
    total_steps: int,
    base_lr: float,
    milestones: Sequence[float],
    gamma: float = 0.1,
    warmup_rate: float = 0.05,
    warmup_scale: float = 1e-6,
) -> Schedule:
    warmup_steps = max(int(warmup_rate * total_steps), 1)
    base = multi_step_lr(total_steps, base_lr, milestones, gamma)

    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        alpha = jnp.clip(s / warmup_steps, 0.0, 1.0)
        warm = warmup_scale + (1.0 - warmup_scale) * alpha
        return base(step) * jnp.where(s < warmup_steps, warm, 1.0)

    return schedule


@SCHEDULERS.register_module(name="PolyLR")
def poly_lr(total_steps: int, base_lr: float, power: float = 0.9) -> Schedule:
    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        frac = jnp.clip(s / max(total_steps, 1), 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power

    return schedule


@SCHEDULERS.register_module(name="ExpLR")
def exp_lr(total_steps: int, base_lr: float, gamma: float = 0.95) -> Schedule:
    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        return base_lr * gamma ** (s / max(total_steps, 1))

    return schedule


@SCHEDULERS.register_module(name="CosineAnnealingLR")
def cosine_annealing_lr(
    total_steps: int, base_lr: float, eta_min: float = 0.0
) -> Schedule:
    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        frac = jnp.clip(s / max(total_steps, 1), 0.0, 1.0)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


@SCHEDULERS.register_module(name="OneCycleLR")
def one_cycle_lr(
    total_steps: int,
    max_lr,
    pct_start: float = 0.3,
    anneal_strategy: str = "cos",
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Schedule:
    """Two-phase one-cycle schedule (warmup to max_lr, anneal to max_lr/(div*final)).

    Matches torch.optim.lr_scheduler.OneCycleLR semantics used by the reference
    configs (``configs/scannet/pretrain-ponder-spunet-v1m1-0-base.py:163-170``).
    ``max_lr`` may be a list (per param group); the first entry drives the base
    schedule and groups are handled by the optimizer's per-group ratio.
    """
    if isinstance(max_lr, (list, tuple)):
        max_lr = float(max_lr[0])
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = max(int(pct_start * total_steps) - 1, 1)
    down_steps = max(total_steps - up_steps - 1, 1)

    def _anneal(lo, hi, frac):
        import jax.numpy as jnp

        if anneal_strategy == "cos":
            return hi + (lo - hi) * 0.5 * (1.0 - jnp.cos(jnp.pi * frac))
        return hi + (lo - hi) * frac  # linear

    def schedule(step):
        import jax.numpy as jnp

        s = _as_float(step)
        up_frac = jnp.clip(s / up_steps, 0.0, 1.0)
        down_frac = jnp.clip((s - up_steps) / down_steps, 0.0, 1.0)
        rising = _anneal(max_lr, initial_lr, up_frac)
        falling = _anneal(min_lr, max_lr, down_frac)
        return jnp.where(s <= up_steps, rising, falling)

    return schedule


def build_scheduler(cfg: dict, total_steps: int) -> Schedule:
    """Build a schedule fn from a config dict, injecting total_steps."""
    cfg = dict(cfg)
    cfg.setdefault("total_steps", total_steps)
    return SCHEDULERS.build(cfg)
