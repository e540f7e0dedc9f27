"""Output renderers: weighted compositing along rays (reference renderers.py:5-75)."""

from __future__ import annotations

import jax.numpy as jnp

from .rays import safe_normalize


def render_rgb(weights: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., S), (..., S, 3) -> (..., 3)."""
    return jnp.sum(weights[..., None] * rgb, axis=-2)


def render_depth(weights: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray
                 ) -> jnp.ndarray:
    """Expected termination depth; normalized by accumulated weight."""
    mid = 0.5 * (starts + ends)
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * mid, axis=-1) / jnp.maximum(acc, 1e-8)
    return jnp.clip(depth, jnp.min(mid, axis=-1), jnp.max(mid, axis=-1))


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-1)


def render_normal(weights: jnp.ndarray, gradients: jnp.ndarray) -> jnp.ndarray:
    """Composite (unnormalized) sdf gradients into a per-ray normal."""
    n = jnp.sum(weights[..., None] * gradients, axis=-2)
    return safe_normalize(n)


def render_semantic(weights: jnp.ndarray, semantic: jnp.ndarray) -> jnp.ndarray:
    """(..., S), (..., S, D) -> (..., D)."""
    return jnp.sum(weights[..., None] * semantic, axis=-2)
