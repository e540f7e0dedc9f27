"""Ray/sample math for volume rendering — functional, fixed-shape.

Reference: /root/reference/ponder/models/ponder/render_utils/rays.py:5-227
(RayBundle / RaySamples / Frustums classes). Here rays are plain arrays and the
compositing math is pure functions over a trailing sample axis, so everything
vmaps over scenes and fuses under XLA:

  origins (..., R, 3), directions (..., R, 3), starts/ends (..., R, S).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_positions(
    origins: jnp.ndarray, directions: jnp.ndarray, starts: jnp.ndarray,
    ends: jnp.ndarray,
) -> jnp.ndarray:
    """Frustum centers: o + d * (s+e)/2 -> (..., R, S, 3)."""
    mid = 0.5 * (starts + ends)
    return origins[..., None, :] + directions[..., None, :] * mid[..., None]


def get_weights_from_alphas(alphas: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha compositing weights along the sample axis.

    alphas (..., S) -> (weights (..., S), transmittance (..., S)).
    w_i = alpha_i * prod_{j<i} (1 - alpha_j)   (reference rays.py:83-105).
    """
    one_minus = jnp.clip(1.0 - alphas, 1e-7, 1.0)
    trans = jnp.cumprod(one_minus, axis=-1)
    trans_shifted = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alphas * trans_shifted, trans_shifted


def get_weights_from_densities(
    densities: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VolSDF-style density compositing: alpha = 1 - exp(-sigma * delta)."""
    delta = jnp.maximum(ends - starts, 0.0)
    alphas = 1.0 - jnp.exp(-densities * delta)
    return get_weights_from_alphas(alphas)


def merge_ray_samples(
    starts_a: jnp.ndarray,
    ends_a: jnp.ndarray,
    starts_b: jnp.ndarray,
    ends_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge two sorted sample sets along a ray into one sorted set.

    Returns (starts (..., Sa+Sb), ends, sort index of the merged starts).
    Reference rays.py:118-188 (used by NeuS importance upsampling).
    """
    starts = jnp.concatenate([starts_a, starts_b], axis=-1)
    ends = jnp.concatenate([ends_a, ends_b], axis=-1)
    order = jnp.argsort(starts, axis=-1)
    starts = jnp.take_along_axis(starts, order, axis=-1)
    ends = jnp.take_along_axis(ends, order, axis=-1)
    # re-derive contiguous bins: ends become the next start (last keeps its end)
    new_ends = jnp.concatenate([starts[..., 1:], ends[..., -1:]], axis=-1)
    return starts, new_ends, order


def safe_norm(x: jnp.ndarray, axis=-1, keepdims=False, eps: float = 1e-8):
    """Differentiable-at-zero vector norm: sqrt(sum x^2 + eps^2)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps * eps)


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-8):
    """Normalize with a smooth zero-safe denominator (grad-finite at x=0)."""
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
