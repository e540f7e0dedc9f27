"""Dense 3D projection networks applied to the voxelized feature volume.

Reference: /root/reference/ponder/models/ponder/unet3d.py (Abstract3DUNet
530-671; v1m1 = DoubleConv + interpolation/concat decoder 674-707; v1m2 =
SingleConv + TRANSPOSED-CONV/SUM decoder, regression mode — the indoor-pretrain
choice — 710-743; SimpleConv3D 16-34, used outdoor).

Parity-relevant structure (round-3 corrections):
- layer_order "bcr" (the reference default for both variants): BatchNorm3d on
  the INPUT channels, then bias-free Conv3d, then ReLU — not post-conv
  GroupNorm.
- decoder joining rule (reference Decoder, unet3d.py:359-446): DoubleConv
  basic modules use nearest interpolation + CONCAT (skip first); any other
  basic module — including v1m2's SingleConv — uses ConvTranspose3d(k3, s2)
  upsampling + SUMMATION joining.

Volumes are channels-last (B, X, Y, Z, C) internally — the layout XLA's TPU
conv wants — with (B, C, X, Y, Z) adapters at the boundary.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import MODELS


def _zpack_weights(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) -> (3, 3, (p+2)·Cin, p·Cout) banded block weights.

    Output z-slot ``zi`` consumes haloed input slots ``zi..zi+2`` (halo offset
    -1), i.e. original ``dz ∈ {-1, 0, 1}`` maps to halo slot ``zi + dz + 1``.
    """
    cin, cout = w.shape[3], w.shape[4]
    w2 = jnp.zeros((3, 3, (p + 2) * cin, p * cout), w.dtype)
    for zi in range(p):
        for dz in range(3):
            w2 = w2.at[
                :, :, (zi + dz) * cin:(zi + dz + 1) * cin,
                zi * cout:(zi + 1) * cout,
            ].set(w[:, :, dz])
    return w2


def _zpack_cost(p: int, cout: int) -> float:
    """Relative MXU cost of the z-packed formulation: FLOP overhead
    (p+2)/3 times output-lane padding waste (MXU lanes are 128 wide)."""
    return (p + 2) / 3.0 * max(1.0, 128.0 / (p * cout))


def _pick_zpack_p(z: int, cout: int) -> int:
    """Best packing factor for a k3 conv at depth ``z`` -> ``cout`` channels,
    or 0 when no candidate divides ``z``."""
    cands = [p for p in (1, 2, 4, 8) if z % p == 0 and p <= z]
    if not cands:
        return 0
    return min(cands, key=lambda p: _zpack_cost(p, cout))


def zpack_conv3d(x: jnp.ndarray, w: jnp.ndarray, p: int) -> jnp.ndarray:
    """3x3x3 'SAME' conv on an NDHWC-ish volume (B, X, Y, Z, Cin) expressed as
    a 2D (3, 3) conv with z packed into channels — full-lane MXU matmuls
    instead of XLA's native 3D conv (measured 6-12% of sustained matmul rate
    at UNet3D bench shapes; z-pack reaches ~80% at p=4).

    ``w`` is the canonical (3, 3, 3, Cin, Cout) kernel; ``p`` z-slices ride in
    the channel dim (z/p groups ride with batch), the k3 z-mixing becomes
    banded block weights via :func:`_zpack_weights`. Exact (same arithmetic,
    different summation order). Requires Z % p == 0.
    """
    bv, xx, yy, zz, cin = x.shape
    cout = w.shape[-1]
    zp = zz // p
    w2 = _zpack_weights(w, p)
    # halo: output group g needs input slots [g*p - 1, g*p + p] -> pad z by 1
    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    idx = jnp.arange(zp)[:, None] * p + jnp.arange(p + 2)[None, :]
    xh = xpad[:, :, :, idx.reshape(-1), :].reshape(
        bv, xx, yy, zp, (p + 2) * cin)
    xh = xh.transpose(0, 3, 1, 2, 4).reshape(bv * zp, xx, yy, (p + 2) * cin)
    y = jax.lax.conv_general_dilated(
        xh, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(bv, zp, xx, yy, p, cout).transpose(0, 2, 3, 1, 4, 5)
    return y.reshape(bv, xx, yy, zz, cout)


class Conv3x3(nn.Module):
    """3x3x3 'SAME' conv whose param tree matches ``nn.Conv`` (kernel of
    shape (3, 3, 3, Cin, Cout) + optional bias) but which lowers to the
    z-packed 2D formulation when profitable. PONDER_UNET_ZPACK=0 forces the
    plain XLA 3D conv."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # same default init as nn.Conv (lecun_normal over fan_in = Cin * k^3)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        p = _pick_zpack_p(x.shape[3], self.features)
        # below ~64x64 spatial the reshape/halo overhead outweighs the MXU
        # win (L2/L3 convs are <8 GFLOP); let XLA's conv handle those
        small = x.shape[1] * x.shape[2] < 64 * 64
        if p == 0 or small or os.environ.get("PONDER_UNET_ZPACK", "1") != "1":
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        else:
            y = zpack_conv3d(x.astype(dtype), kernel.astype(dtype), p)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def _subpixel_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cout, Cin) transposed-conv kernel (flax ConvTranspose
    ``transpose_kernel=True`` layout) -> (2, 2, 2, Cin, 8·Cout) stride-1
    kernel computing all 8 output-parity classes at input resolution.

    Derivation (per dim, torch ConvTranspose semantics out[o] = Σ_t
    w[t]·x[(o+1-t)/2]): even outputs o=2m read only tap t=1 at x[m]; odd
    outputs o=2m+1 read tap t=2 at x[m] and tap t=0 at x[m+1]. Verified
    exact (maxerr 0) against nn.ConvTranspose at the UNet3D decoder config.
    """
    cout, cin = w.shape[3], w.shape[4]
    k = jnp.zeros((2, 2, 2, cin, 8 * cout), w.dtype)
    tapmap = ({0: 1}, {0: 2, 1: 0})  # parity -> {input offset d: tap t}
    ei = 0
    for ex in (0, 1):
        for ey in (0, 1):
            for ez in (0, 1):
                for dx, tx in tapmap[ex].items():
                    for dy, ty in tapmap[ey].items():
                        for dz, tz in tapmap[ez].items():
                            k = k.at[
                                dx, dy, dz, :, ei * cout:(ei + 1) * cout
                            ].set(w[tx, ty, tz].T)
                ei += 1
    return k


class SubpixelConvTranspose(nn.Module):
    """ConvTranspose3d(k3, s2, torch p=1/op=1 — i.e. flax padding (1, 2)) as
    a stride-1 k2 conv + depth-to-space. XLA lowers conv_transpose by zero-
    stuffing the input 8x, so the MXU multiplies 87.5% zeros; the subpixel
    form does 64/27 of the *useful* taps all-dense instead (3.4x fewer MACs)
    with wide output lanes (8·Cout). Param tree identical to nn.ConvTranspose
    (kernel (3,3,3,Cout,Cin) + bias) so checkpoints convert unchanged."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, self.features, cin), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        b, xs, ys, zs, _ = x.shape
        k = _subpixel_kernel(kernel.astype(dtype))
        xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, k, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y.reshape(b, xs, ys, zs, 2, 2, 2, self.features)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, 2 * xs, 2 * ys, 2 * zs, self.features)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class SingleConv(nn.Module):
    """norm/conv/relu in configurable order (reference create_conv,
    unet3d.py:45-96). Supported orders: any sequence of 'b' (BatchNorm),
    'g' (GroupNorm), 'c' (3x3x3 conv), 'r' (ReLU). Conv bias iff no norm."""

    out_channels: int
    num_groups: int = 1
    order: str = "bcr"
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (norms stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = not ("g" in self.order or "b" in self.order)
        for ch in self.order:
            if ch == "c":
                x = Conv3x3(self.out_channels, use_bias=use_bias,
                            dtype=self.dtype, name="conv")(x)
            elif ch == "b":
                # flax computes batch stats with forced-f32 reductions even on
                # bf16 inputs (bf16 mean over 500k+ voxels loses ~all
                # mantissa); dtype=self.dtype keeps the normalized TENSOR in
                # compute dtype, halving HBM traffic on the L0 volumes
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype, name="batchnorm",
                )(x)
            elif ch == "g":
                x = nn.GroupNorm(num_groups=self.num_groups,
                                 name="groupnorm")(x)
            elif ch == "r":
                x = nn.relu(x)
            else:
                raise ValueError(f"unsupported layer order char {ch!r}")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs; encoder halves the mid width (reference
    unet3d.py:159-216, submodules SingleConv1/SingleConv2)."""

    out_channels: int
    num_groups: int = 8
    encoder: bool = True
    order: str = "bcr"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2 if self.encoder else self.out_channels
        mid = max(mid, 1)
        x = SingleConv(mid, self.num_groups, self.order, self.dtype,
                       name="SingleConv1")(x, train)
        x = SingleConv(self.out_channels, self.num_groups, self.order,
                       self.dtype, name="SingleConv2")(x, train)
        return x


def _f_maps(base: int, num_levels: int) -> Tuple[int, ...]:
    return tuple(base * 2**k for k in range(num_levels))


class Abstract3DUNet(nn.Module):
    in_channels: int
    out_channels: int
    f_maps: int = 32
    num_levels: int = 3
    num_groups: int = 1
    layer_order: str = "bcr"
    double_conv: bool = False
    final_sigmoid: bool = False
    is_segmentation: bool = False  # False = regression mode (no final activation)
    compute_dtype: Optional[jnp.dtype] = None  # conv compute dtype

    @nn.compact
    def __call__(self, volume: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, C, X, Y, Z) -> (B, out_channels, X, Y, Z)."""
        x = jnp.transpose(volume, (0, 2, 3, 4, 1))  # channels-last
        maps = _f_maps(self.f_maps, self.num_levels)

        skips = []
        for li, ch in enumerate(maps):
            if li > 0:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            if self.double_conv:
                x = DoubleConv(ch, self.num_groups, encoder=True,
                               order=self.layer_order,
                               dtype=self.compute_dtype, name=f"enc{li}")(
                    x, train)
            else:
                x = SingleConv(ch, self.num_groups, order=self.layer_order,
                               dtype=self.compute_dtype,
                               name=f"enc{li}")(x, train)
            skips.append(x)

        for li, ch in enumerate(reversed(maps[:-1])):
            skip = skips[-(li + 2)]
            if self.double_conv:
                # interpolation upsampling + concat joining (skip first)
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
                x = x[:, : skip.shape[1], : skip.shape[2], : skip.shape[3]]
                x = jnp.concatenate([skip, x], axis=-1)
                x = DoubleConv(ch, self.num_groups, encoder=False,
                               order=self.layer_order,
                               dtype=self.compute_dtype, name=f"dec{li}")(
                    x, train)
            else:
                # transposed-conv upsampling + summation joining (reference
                # Decoder else-branch, used by v1m2's SingleConv modules).
                # torch ConvTranspose3d(k=3, s=2, p=1, output_size=skip) ==
                # lax.conv_transpose with per-dim padding (k-1-p, k-1-p+op)
                # = (1, 2) and a flipped/transposed kernel
                # (transpose_kernel=True takes torch's (out, in) order)
                if os.environ.get("PONDER_UNET_SUBPIXEL", "1") == "1":
                    x = SubpixelConvTranspose(
                        ch, dtype=self.compute_dtype, name=f"dec{li}_up")(x)
                else:
                    x = nn.ConvTranspose(
                        ch, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 2), (1, 2), (1, 2)),
                        transpose_kernel=True,
                        dtype=self.compute_dtype,
                        name=f"dec{li}_up",
                    )(x)
                x = x[:, : skip.shape[1], : skip.shape[2], : skip.shape[3]]
                x = skip.astype(x.dtype) + x
                x = SingleConv(ch, self.num_groups, order=self.layer_order,
                               dtype=self.compute_dtype,
                               name=f"dec{li}")(x, train)

        x = nn.Conv(self.out_channels, (1, 1, 1),
                    dtype=self.compute_dtype, name="final")(x)
        if self.is_segmentation and self.final_sigmoid:
            x = nn.sigmoid(x)
        return jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))


@MODELS.register_module(name="UNet3D-v1m1")
class UNet3Dv1m1(Abstract3DUNet):
    double_conv: bool = True
    num_groups: int = 8
    num_levels: int = 4


@MODELS.register_module(name="UNet3D-v1m2")
class UNet3Dv1m2(Abstract3DUNet):
    """SingleConv + bcr + transposed-conv/sum decoder, regression mode — the
    indoor pretrain projector (reference unet3d.py:710-743 defaults:
    f_maps=32, num_levels=4, layer_order='bcr')."""

    double_conv: bool = False
    num_groups: int = 1
    num_levels: int = 4
    is_segmentation: bool = False


@MODELS.register_module(name="SimpleConv3D-v1m1")
class SimpleConv3D(nn.Module):
    """One conv (with bias) + BatchNorm + ReLU (outdoor projector, reference
    unet3d.py:16-34)."""

    in_channels: int = 32
    out_channels: int = 32
    kernel_size: int = 3

    @nn.compact
    def __call__(self, volume: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(volume, (0, 2, 3, 4, 1))
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                    padding="SAME", name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="batchnorm")(x)
        x = nn.relu(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
