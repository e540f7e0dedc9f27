"""Sparse conv flax modules over ops.spconv rulebooks."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.band_conv import band_eligible, band_subm_conv, build_band_plan
from ...ops.band_conv import BLOCK as BAND_BLOCK, WINDOW as BAND_WINDOW
from ...ops.sparse import SparseTensor, make_sparse_tensor
from ...ops.spconv import (
    StridedPlan,
    SubmPlan,
    apply_sparse_conv,
    apply_sparse_conv_windowed,
    build_inverse_rulebook,
    build_strided_plan,
    build_subm_rulebook,
    inverse_conv_packed,
    kernel_offsets,
    slab_pack,
    sparse_conv_gathered,
    strided_conv_packed,
    subm_conv_slab,
    subm_conv_symmetric,
    use_windowed_gather,
)


def sow_contract(module: nn.Module, flags) -> None:
    """Aggregate plan contract flags into ``diagnostics/contract_ok``.

    Train steps surface the flag as a metric; Trainer/bench raise when it is
    false — sortedness/window violations zero-poison conv outputs by design
    (ops.spconv/ops.band_conv) and must fail loudly, never train silently."""
    if flags:
        ok = jnp.all(jnp.stack(flags))
        module.sow("diagnostics", "contract_ok", ok,
                   reduce_fn=jnp.logical_and,
                   init_fn=lambda: jnp.asarray(True))


def _apply_conv(features, rulebook, w, mask, compute_dtype):
    """Strided/inverse conv application: gather-only custom VJP (dx via the
    inverted rulebook instead of XLA's feature scatter-add), with the
    windowed-gather dispatch on top (see ops.spconv)."""
    if use_windowed_gather(rulebook.shape[1], w.shape[1], w.shape[2]):
        return apply_sparse_conv_windowed(features, rulebook, w, mask, compute_dtype)
    dtype_token = jnp.zeros((0,), compute_dtype or features.dtype)
    return sparse_conv_gathered(features, rulebook, w, mask, dtype_token)


def _kernel_init(k3: int, cin: int):
    # torch kaiming-uniform default for conv weights: U(-b, b), b = sqrt(1/fan_in)
    fan_in = k3 * cin
    bound = (1.0 / fan_in) ** 0.5
    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SubMConv(nn.Module):
    """Submanifold sparse conv (spconv SubMConv3d equivalent)."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, st: SparseTensor, rulebook: Optional[jnp.ndarray] = None
    ) -> SparseTensor:
        k3 = len(kernel_offsets(self.kernel_size))
        cin = st.num_features
        w = self.param("kernel", _kernel_init(k3, cin), (k3, cin, self.out_channels))
        if rulebook is None:
            rulebook = build_subm_rulebook(
                st.coords, st.spatial_shape, st.batch_size, self.kernel_size
            )
        dtype_token = jnp.zeros((0,), self.compute_dtype or st.features.dtype)
        # SubmPlan and BandedRulebook both expose .legacy/.band
        legacy = getattr(rulebook, "legacy", rulebook)
        band_plan = getattr(rulebook, "band", None)
        eligible = band_eligible(cin, self.out_channels, self.kernel_size)
        if eligible and (band_plan is not None or
                         (legacy is not None and cin > 64)):
            # block-banded Pallas kernel: windows of contiguous rows DMA'd
            # per (block, tap-column), one-hot extraction on the MXU —
            # replaces the descriptor-bound 27N row gather (ops/band_conv.py;
            # narrow widths win since the fused dx+dW backward). Levels
            # attach a shared plan (attach_band_plan); inline build is the
            # fallback for wide convs only — for narrow ones a per-call 27N
            # relayout would eat the win, so they take the slab path below.
            plan = band_plan if band_plan is not None else build_band_plan(
                legacy, 3)
            out = band_subm_conv(
                (3, BAND_BLOCK, BAND_WINDOW), st.features, plan, w,
                st.mask, dtype_token,
            )
        elif isinstance(rulebook, SubmPlan) and cin <= 64:
            # slab plan: one row gather per tap-column, slab-gather backward.
            # Pays off at narrow widths where plain gathers are
            # descriptor-bound (measured v5e: k5/6ch 3.7x, k3/32ch 1.3-1.45x,
            # k3/96ch a wash) — wider convs take the plain path below.
            kx, ky, kz = (self.kernel_size,) * 3 if isinstance(
                self.kernel_size, int
            ) else tuple(self.kernel_size)
            cfg = (kx, ky, kz, slab_pack(kz, cin))
            out = subm_conv_slab(
                cfg, st.features, rulebook.r0, rulebook.selp, w, st.mask,
                dtype_token,
            )
        else:
            # gather-only backward via the mirrored rulebook (subm symmetry)
            out = subm_conv_symmetric(
                st.features, legacy, w, st.mask, dtype_token
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = jnp.where(st.mask[:, None], out + b, 0.0)
        return st.replace(features=out)


class StridedConv(nn.Module):
    """Downsampling sparse conv (spconv SparseConv3d equivalent)."""

    out_channels: int
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0
    out_capacity: Optional[int] = None
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, st: SparseTensor, plan: Optional[StridedPlan] = None
    ) -> SparseTensor:
        k3 = len(kernel_offsets(self.kernel_size))
        cin = st.num_features
        w = self.param("kernel", _kernel_init(k3, cin), (k3, cin, self.out_channels))
        if plan is None:
            plan = build_strided_plan(
                st.coords,
                st.spatial_shape,
                st.batch_size,
                self.kernel_size,
                self.stride,
                self.padding,
                self.out_capacity or st.capacity,
            )
        mask = plan.out_coords[:, 0] >= 0
        if plan.parent is not None:
            # input-major k==s form: one N_in scatter instead of K^3 x N_out
            # gathers (ops.spconv.strided_conv_packed)
            out = strided_conv_packed(
                st.features, plan.parent, plan.tap, w,
                plan.out_coords.shape[0], mask, self.compute_dtype,
            )
        else:
            out = _apply_conv(
                st.features, plan.rulebook, w, mask, self.compute_dtype
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = jnp.where(mask[:, None], out + b, 0.0)
        return make_sparse_tensor(out, plan.out_coords, plan.spatial_shape, st.batch_size)


class InverseConv(nn.Module):
    """Upsampling inverse sparse conv (spconv SparseInverseConv3d equivalent)."""

    out_channels: int
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        st: SparseTensor,
        fine_coords: jnp.ndarray,
        fine_spatial_shape: Tuple[int, int, int],
        rulebook: Optional[jnp.ndarray] = None,
        parent: Optional[jnp.ndarray] = None,
        tap: Optional[jnp.ndarray] = None,
    ) -> SparseTensor:
        k3 = len(kernel_offsets(self.kernel_size))
        cin = st.num_features
        w = self.param("kernel", _kernel_init(k3, cin), (k3, cin, self.out_channels))
        mask = fine_coords[:, 0] >= 0
        if parent is not None:
            # indice_key reuse, input-major: the downsample plan's
            # parent/tap arrays ARE the inverse conv's pairing — one
            # N_fine gather instead of K^3 x N_fine (7/8 inactive)
            out = inverse_conv_packed(
                st.features, parent, tap, w, mask, self.compute_dtype
            )
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.out_channels,)
                )
                out = jnp.where(mask[:, None], out + b, 0.0)
            return make_sparse_tensor(
                out, fine_coords, fine_spatial_shape, st.batch_size
            )
        if rulebook is None:
            rulebook = build_inverse_rulebook(
                st.coords,
                st.spatial_shape,
                st.batch_size,
                fine_coords,
                self.kernel_size,
                self.stride,
                self.padding,
            )
        out = _apply_conv(st.features, rulebook, w, mask, self.compute_dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = jnp.where(mask[:, None], out + b, 0.0)
        return make_sparse_tensor(out, fine_coords, fine_spatial_shape, st.batch_size)
