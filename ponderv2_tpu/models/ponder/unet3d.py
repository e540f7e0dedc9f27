"""Dense 3D projection networks applied to the voxelized feature volume.

Reference: /root/reference/ponder/models/ponder/unet3d.py (Abstract3DUNet 530-671;
v1m1 = DoubleConv 674-707; v1m2 = SingleConv + groupnorm(1) + regression mode —
the indoor-pretrain choice — 710-743; SimpleConv3D 16-34, used outdoor).

Volumes are channels-last (B, X, Y, Z, C) internally — the layout XLA's TPU conv
wants — with (B, C, X, Y, Z) adapters at the boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..builder import MODELS


class SingleConv(nn.Module):
    out_channels: int
    num_groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=self.num_groups)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    out_channels: int
    num_groups: int = 8
    encoder: bool = True

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 2 if self.encoder else self.out_channels
        mid = max(mid, 1)
        x = SingleConv(mid, self.num_groups)(x)
        x = SingleConv(self.out_channels, self.num_groups)(x)
        return x


def _f_maps(base: int, num_levels: int) -> Tuple[int, ...]:
    return tuple(base * 2**k for k in range(num_levels))


class Abstract3DUNet(nn.Module):
    in_channels: int
    out_channels: int
    f_maps: int = 32
    num_levels: int = 3
    num_groups: int = 1
    double_conv: bool = False
    final_sigmoid: bool = False
    is_segmentation: bool = False  # False = regression mode (no final activation)

    @nn.compact
    def __call__(self, volume: jnp.ndarray) -> jnp.ndarray:
        """(B, C, X, Y, Z) -> (B, out_channels, X, Y, Z)."""
        x = jnp.transpose(volume, (0, 2, 3, 4, 1))  # channels-last
        conv = DoubleConv if self.double_conv else SingleConv
        maps = _f_maps(self.f_maps, self.num_levels)

        skips = []
        for li, ch in enumerate(maps):
            if li > 0:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            if self.double_conv:
                x = conv(ch, self.num_groups, encoder=True, name=f"enc{li}")(x)
            else:
                x = conv(ch, self.num_groups, name=f"enc{li}")(x)
            skips.append(x)

        for li, ch in enumerate(reversed(maps[:-1])):
            skip = skips[-(li + 2)]
            # nearest-neighbor upsample ×2
            B, X, Y, Z, C = x.shape
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
            x = x[:, : skip.shape[1], : skip.shape[2], : skip.shape[3]]
            x = jnp.concatenate([x, skip], axis=-1)
            if self.double_conv:
                x = conv(ch, self.num_groups, encoder=False, name=f"dec{li}")(x)
            else:
                x = conv(ch, self.num_groups, name=f"dec{li}")(x)

        x = nn.Conv(self.out_channels, (1, 1, 1), name="final")(x)
        if self.is_segmentation and self.final_sigmoid:
            x = nn.sigmoid(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))


@MODELS.register_module(name="UNet3D-v1m1")
class UNet3Dv1m1(Abstract3DUNet):
    double_conv: bool = True
    num_groups: int = 8


@MODELS.register_module(name="UNet3D-v1m2")
class UNet3Dv1m2(Abstract3DUNet):
    """SingleConv, groupnorm(1), regression mode — the indoor pretrain projector.

    Reference defaults (unet3d.py:710-743): f_maps=32, num_levels=4."""

    double_conv: bool = False
    num_groups: int = 1
    num_levels: int = 4
    is_segmentation: bool = False


@MODELS.register_module(name="SimpleConv3D-v1m1")
class SimpleConv3D(nn.Module):
    """conv-norm-relu stack (outdoor projector, reference unet3d.py:16-34)."""

    in_channels: int = 32
    out_channels: int = 32
    num_layers: int = 2
    num_groups: int = 1

    @nn.compact
    def __call__(self, volume: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(volume, (0, 2, 3, 4, 1))
        for i in range(self.num_layers):
            x = SingleConv(self.out_channels, self.num_groups, name=f"conv{i}")(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
