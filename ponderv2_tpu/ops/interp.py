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

import os
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

    # TPU gathers are descriptor-bound (~60M rows/s on v5e regardless of row
    # bytes), so cut the descriptor count 8x: gather channels-last rows from
    # a volume whose rows hold the full 2x2x2 corner octet (concat + roll
    # along the three spatial axes) — ONE 8C-row gather per sample instead
    # of 8 corner gathers. Wrap rows (c* = size-1) are never gathered;
    # per-corner selection keeps padding semantics. The packed copy is an
    # 8x-volume HBM transient; degrade to the 4C (y, x) quad (2 gathers per
    # sample) then to the 2C x-pair (4 gathers) when it would be too large.
    vol_cl = jnp.moveaxis(volume, 1, -1)  # (B, D, H, W, C)
    vol2 = jnp.concatenate(
        [vol_cl, jnp.roll(vol_cl, -1, axis=3)], axis=-1
    )  # row w = [v(w), v(w + 1)]
    vol_bytes = volume.size * volume.dtype.itemsize
    pack_limit = int(
        os.environ.get("PONDER_SAMPLE_QUAD_LIMIT", 2_600_000_000)
    )
    use_pack8 = 8 * vol_bytes <= pack_limit
    use_quad = use_pack8 or 4 * vol_bytes <= pack_limit
    if use_quad:
        vol4 = jnp.concatenate(
            [vol2, jnp.roll(vol2, -1, axis=2)], axis=-1
        )  # (B, D, H, W, 4C): quarters [y,x], [y,x+1], [y+1,x], [y+1,x+1]
    if use_pack8:
        vol8 = jnp.concatenate(
            [vol4, jnp.roll(vol4, -1, axis=1)], axis=-1
        )  # (B, D, H, W, 8C): chunk 4*dz + 2*dy + dx

    cx_max = max(W - 2, 0)
    cy_max = max(H - 2, 0)

    def pair_x(ix0, iy, iz):
        """Both x-corners (ix0, ix0+1) at exact (iy, iz) from vol2."""
        cx = jnp.clip(ix0, 0, cx_max).astype(jnp.int32)
        cy = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        cz = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        row = jax.vmap(lambda v, a, b_, c_: v[a, b_, c_])(vol2, cz, cy, cx)
        lo, hi = row[..., :C], row[..., C:]
        outs = []
        for dx in (0, 1):
            ix = ix0 + dx
            if padding_mode == "border":
                ex = jnp.clip(ix, 0, W - 1)
                val = jnp.where((ex == cx)[:, :, None], lo, hi)
            else:  # zeros
                valid = (
                    (ix >= 0) & (ix < W)
                    & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
                )
                val = jnp.where((ix == cx)[:, :, None], lo, hi)
                val = jnp.where(valid[:, :, None], val, 0.0)
            outs.append(val)
        return outs

    def quad(ix0, iy0, iz):
        """The four (y, x) corners at depth iz -> dict[(dy, dx)] (B,M,C)."""
        if not use_quad:
            outs = {}
            for dy in (0, 1):
                lo, hi = pair_x(ix0, iy0 + dy, iz)
                outs[(dy, 0)], outs[(dy, 1)] = lo, hi
            return outs
        cx = jnp.clip(ix0, 0, cx_max).astype(jnp.int32)
        cy = jnp.clip(iy0, 0, cy_max).astype(jnp.int32)
        cz = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        row = jax.vmap(lambda v, a, b_, c_: v[a, b_, c_])(vol4, cz, cy, cx)
        quarters = [row[..., i * C:(i + 1) * C] for i in range(4)]
        outs = {}
        for dy in (0, 1):
            for dx in (0, 1):
                ix = ix0 + dx
                iy = iy0 + dy
                if padding_mode == "border":
                    ex = jnp.clip(ix, 0, W - 1)
                    ey = jnp.clip(iy, 0, H - 1)
                    qx = (ex == cx + 1)
                    qy = (ey == cy + 1)
                    mask_ok = None
                else:  # zeros
                    mask_ok = (
                        (ix >= 0) & (ix < W)
                        & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
                    )
                    qx = (ix == cx + 1)
                    qy = (iy == cy + 1)
                hi_x = qx[:, :, None]
                hi_y = qy[:, :, None]
                val = jnp.where(
                    hi_y,
                    jnp.where(hi_x, quarters[3], quarters[2]),
                    jnp.where(hi_x, quarters[1], quarters[0]),
                )
                if mask_ok is not None:
                    val = jnp.where(mask_ok[:, :, None], val, 0.0)
                outs[(dy, dx)] = val
        return outs

    cz_max = max(D - 2, 0)

    def octet(ix0, iy0, iz0):
        """All eight corners -> dict[(dz, dy, dx)] (B,M,C); ONE row gather."""
        cx = jnp.clip(ix0, 0, cx_max).astype(jnp.int32)
        cy = jnp.clip(iy0, 0, cy_max).astype(jnp.int32)
        cz = jnp.clip(iz0, 0, cz_max).astype(jnp.int32)
        row = jax.vmap(lambda v, a, b_, c_: v[a, b_, c_])(vol8, cz, cy, cx)
        chunks = [row[..., i * C:(i + 1) * C] for i in range(8)]
        outs = {}
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    ix, iy, iz = ix0 + dx, iy0 + dy, iz0 + dz
                    if padding_mode == "border":
                        qx = (jnp.clip(ix, 0, W - 1) == cx + 1)
                        qy = (jnp.clip(iy, 0, H - 1) == cy + 1)
                        qz = (jnp.clip(iz, 0, D - 1) == cz + 1)
                        mask_ok = None
                    else:  # zeros
                        mask_ok = (
                            (ix >= 0) & (ix < W)
                            & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
                        )
                        qx = (ix == cx + 1)
                        qy = (iy == cy + 1)
                        qz = (iz == cz + 1)
                    hi_x = qx[:, :, None]
                    hi_y = qy[:, :, None]
                    hi_z = qz[:, :, None]

                    def pick(lo, hi, flag):
                        return jnp.where(flag, hi, lo)

                    val = pick(
                        pick(pick(chunks[0], chunks[1], hi_x),
                             pick(chunks[2], chunks[3], hi_x), hi_y),
                        pick(pick(chunks[4], chunks[5], hi_x),
                             pick(chunks[6], chunks[7], hi_x), hi_y),
                        hi_z,
                    )
                    if mask_ok is not None:
                        val = jnp.where(mask_ok[:, :, None], val, 0.0)
                    outs[(dz, dy, dx)] = val
        return outs

    out = jnp.zeros((B, points.shape[1], C), dtype=volume.dtype)
    vals8 = octet(x0, y0, z0) if use_pack8 else None
    for dz in (0, 1):
        wz = (1.0 - tz) if dz == 0 else tz
        vals = vals8 if use_pack8 else quad(x0, y0, z0 + dz)
        for dy in (0, 1):
            wy = (1.0 - ty) if dy == 0 else ty
            for dx in (0, 1):
                wx = (1.0 - tx) if dx == 0 else tx
                w = (wz * wy * wx)[:, :, None]
                v = vals[(dz, dy, dx)] if use_pack8 else vals[(dy, dx)]
                out = out + w * v
    return jnp.swapaxes(out, 1, 2)  # (B, C, M)


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
