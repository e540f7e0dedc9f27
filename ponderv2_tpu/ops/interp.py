"""Differentiable trilinear volume sampling — the smooth-sampler equivalent.

The reference vendors a 768-line CUDA kernel implementing forward, backward, and
backward-backward trilinear grid sampling with optional smoothstep weights
(/root/reference/libs/smooth-sampler/csrc/smooth_sampler_kernel.cu, used by the SDF
field at ponder/models/ponder/render_utils/fields/sdf_field.py:148-183). Here the
same op is ~60 lines of jnp: JAX autodiff supplies the double backward required by
the eikonal loss (grad of the SDF's input-gradient) for free, and XLA fuses the
gather + lerp chain.

Conventions match ``torch.nn.functional.grid_sample`` for 3D: the volume is
``(B, C, D, H, W)`` and normalized sample coordinates are ``(x, y, z) ∈ [-1, 1]``
with x indexing W (fastest), y indexing H, z indexing D.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample_3d(
    volume: jnp.ndarray,
    points: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    smoothstep: bool = False,
) -> jnp.ndarray:
    """Trilinearly sample ``volume (B, C, D, H, W)`` at ``points (B, M, 3)``.

    ``points`` are normalized (x, y, z) in [-1, 1] (torch grid_sample order).
    Returns (B, C, M). ``smoothstep=True`` applies the Hermite smoothstep to the
    interpolation fractions (SmoothSampler's mode), which makes the sampled field
    C1-continuous across voxel boundaries — what the SDF eikonal term needs.
    """
    B, C, D, H, W = volume.shape
    x = _unnormalize(points[..., 0], W, align_corners)
    y = _unnormalize(points[..., 1], H, align_corners)
    z = _unnormalize(points[..., 2], D, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = x - x0
    ty = y - y0
    tz = z - z0
    if smoothstep:
        tx = tx * tx * (3.0 - 2.0 * tx)
        ty = ty * ty * (3.0 - 2.0 * ty)
        tz = tz * tz * (3.0 - 2.0 * tz)

    def corner(ix, iy, iz):
        """Gather volume values at integer corner (ix, iy, iz) with padding."""
        if padding_mode == "border":
            cx = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            cy = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            cz = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
            valid = None
        else:  # zeros
            valid = (
                (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
            )
            cx = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            cy = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            cz = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        # volume (B, C, D, H, W); indices (B, M) -> out (B, C, M)
        out = jax.vmap(lambda v, a, b_, c_: v[:, a, b_, c_])(volume, cz, cy, cx)
        if valid is not None:
            out = jnp.where(valid[:, None, :], out, 0.0)
        return out

    out = jnp.zeros((B, C, points.shape[1]), dtype=volume.dtype)
    for dz in (0, 1):
        wz = (1.0 - tz) if dz == 0 else tz
        for dy in (0, 1):
            wy = (1.0 - ty) if dy == 0 else ty
            for dx in (0, 1):
                wx = (1.0 - tx) if dx == 0 else tx
                w = (wz * wy * wx)[:, None, :]
                out = out + w * corner(x0 + dx, y0 + dy, z0 + dz)
    return out


def sample_feature_volume(
    volume: jnp.ndarray,
    points: jnp.ndarray,
    concat_levels: int = 1,
    align_corners: bool = True,
    smoothstep: bool = True,
) -> jnp.ndarray:
    """Sample per-point features, optionally splitting channels into multi-"level"
    groups that are sampled identically then concatenated — matching the SDF
    field's half-channel level split (reference sdf_field.py:161-183).

    volume: (B, C, D, H, W); points: (B, M, 3) normalized. Returns (B, M, C).
    """
    del concat_levels  # channel groups sample identically; kept for API parity
    out = grid_sample_3d(
        volume, points, align_corners=align_corners, smoothstep=smoothstep
    )
    return jnp.swapaxes(out, 1, 2)
