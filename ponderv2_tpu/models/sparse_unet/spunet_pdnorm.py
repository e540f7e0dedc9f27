"""SpUNet-v1m3: Prompt-Driven-Norm sparse U-Net for multi-dataset training.

Reference: /root/reference/ponder/models/sparse_unet/spconv_unet_v1m3_pdnorm.py
(PDBatchNorm 23-72, blocks threading (x, condition, context) 75-230). Every norm
is a per-condition decoupled BN with optional SiLU-Linear FiLM modulation from a
context embedding. The condition index is a *static* python int per jit trace —
each dataset gets its own specialized executable, which is exactly what we want
on TPU (no data-dependent branching).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import SparseTensor
from ...ops.spconv import (
    BandedRulebook,
    attach_band_rulebook,
    build_strided_plan,
    build_subm_rulebook,
    invert_strided_rulebook,
    plan_contract_flags,
)
from ...ops.scatter import segment_mean
from ..builder import MODELS
from ..norm import PDBatchNorm
from .layers import InverseConv, StridedConv, SubMConv, sow_contract
from .spunet import capacity_schedule


class PDBasicBlock(nn.Module):
    channels: int
    conditions: Tuple[str, ...]
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook, train, condition_idx, context):
        norm = partial(
            PDBatchNorm,
            conditions=self.conditions,
            decouple=self.decouple,
            adaptive=self.adaptive,
            context_channels=self.context_channels,
            eps=self.eps,
            momentum=self.momentum,
        )
        identity = st.features
        x = SubMConv(self.channels, 3, compute_dtype=self.compute_dtype,
                     name="conv1")(st, rulebook)
        h = norm(features=self.channels, name="bn1")(
            x.features, st.mask, train, condition_idx, context
        )
        h = nn.relu(h)
        x = SubMConv(self.channels, 3, compute_dtype=self.compute_dtype,
                     name="conv2")(st.replace(features=h), rulebook)
        h = norm(features=self.channels, name="bn2")(
            x.features, st.mask, train, condition_idx, context
        )
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False, name="proj")(identity)
            identity = norm(features=self.channels, name="proj_bn")(
                identity, st.mask, train, condition_idx, context
            )
        out = nn.relu(h + identity)
        return st.replace(features=jnp.where(st.mask[:, None], out, 0.0))


class _ScanPDBasicBlock(PDBasicBlock):
    """PDBasicBlock adapted to nn.scan's (carry, out) contract."""

    def __call__(self, st, rulebook, train, condition_idx, context):
        return super().__call__(st, rulebook, train, condition_idx, context), None


class PDBlockStack(nn.Module):
    """Stack of identical PD residual blocks compiled once via nn.scan
    (same compile-time collapse as spunet.BlockStack)."""

    channels: int
    num_blocks: int
    conditions: Tuple[str, ...]
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True

    @nn.compact
    def __call__(self, st, rulebook, train, condition_idx, context):
        body = _ScanPDBasicBlock
        if self.remat:
            body = nn.remat(body, static_argnums=(3, 4))
        scanned = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_blocks,
        )(
            channels=self.channels,
            conditions=self.conditions,
            decouple=self.decouple,
            adaptive=self.adaptive,
            context_channels=self.context_channels,
            eps=self.eps,
            momentum=self.momentum,
            compute_dtype=self.compute_dtype,
            name="blocks",
        )
        st, _ = scanned(st, rulebook, train, condition_idx, context)
        return st


@MODELS.register_module(name="SpUNet-v1m3")
class SpUNetPDNorm(nn.Module):
    in_channels: int = 6
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    cls_mode: bool = False
    conditions: Tuple[str, ...] = ("ScanNet", "S3DIS", "Structured3D")
    zero_init: bool = False  # accepted for config parity
    norm_decouple: bool = True
    norm_adaptive: bool = True
    norm_affine: bool = True
    context_channels: int = 256
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    capacities: Optional[Sequence[int]] = None
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True
    scan_blocks: bool = True  # nn.scan over same-shape blocks (compile-time win)

    @nn.compact
    def __call__(
        self,
        st: SparseTensor,
        train: bool = True,
        condition: str = None,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        condition_idx = (
            self.conditions.index(condition) if condition in self.conditions else 0
        )
        num_stages = len(self.layers) // 2
        caps = tuple(self.capacities) if self.capacities is not None else (
            capacity_schedule(st.capacity, num_stages)
        )
        norm = partial(
            PDBatchNorm,
            conditions=self.conditions,
            decouple=self.norm_decouple,
            adaptive=self.norm_adaptive,
            context_channels=self.context_channels,
            eps=self.bn_eps,
            momentum=self.bn_momentum,
        )
        block_cls = (
            nn.remat(PDBasicBlock, static_argnums=(3, 4))
            if self.remat else PDBasicBlock
        )
        block = partial(
            block_cls,
            conditions=self.conditions,
            decouple=self.norm_decouple,
            adaptive=self.norm_adaptive,
            context_channels=self.context_channels,
            eps=self.bn_eps,
            momentum=self.bn_momentum,
            compute_dtype=self.compute_dtype,
        )
        stack = partial(
            PDBlockStack,
            conditions=self.conditions,
            decouple=self.norm_decouple,
            adaptive=self.norm_adaptive,
            context_channels=self.context_channels,
            eps=self.bn_eps,
            momentum=self.bn_momentum,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
        )

        rb_stem = build_subm_rulebook(st.coords, st.spatial_shape, st.batch_size, 5)
        contract = plan_contract_flags(rb_stem)
        x = SubMConv(self.base_channels, 5, compute_dtype=self.compute_dtype,
                     name="stem_conv")(st, rb_stem)
        h = norm(features=self.base_channels, name="stem_bn")(
            x.features, x.mask, train, condition_idx, context
        )
        x = x.replace(features=nn.relu(h))

        skips = [x]
        subm_rulebooks = [None] * (num_stages + 1)
        down_plans = [None] * num_stages  # kept: decoder reuses the pairing
        for s in range(num_stages):
            plan = build_strided_plan(
                x.coords, x.spatial_shape, x.batch_size, 2, 2, 0, caps[s + 1]
            )
            down_plans[s] = plan
            x = StridedConv(self.channels[s], 2, 2, 0,
                            compute_dtype=self.compute_dtype, name=f"down{s}")(x, plan)
            h = norm(features=self.channels[s], name=f"down{s}_bn")(
                x.features, x.mask, train, condition_idx, context
            )
            x = x.replace(features=nn.relu(h))
            rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
            if self.channels[s] > 64:
                # wide blocks take the band conv; share one plan per level
                # (an inline build would re-run per scanned block)
                rb = attach_band_rulebook(rb)
            subm_rulebooks[s + 1] = rb
            contract += plan_contract_flags(rb)
            if self.scan_blocks:
                x = stack(channels=self.channels[s], num_blocks=self.layers[s],
                          name=f"enc{s}_blocks")(x, rb, train, condition_idx,
                                                 context)
            else:
                for b in range(self.layers[s]):
                    x = block(channels=self.channels[s], name=f"enc{s}_block{b}")(
                        x, rb, train, condition_idx, context
                    )
            skips.append(x)

        if self.cls_mode:
            sow_contract(self, contract)
            pooled = segment_mean(x.features, x.coords[:, 0], x.batch_size)
            if self.num_classes > 0:
                return nn.Dense(self.num_classes, name="final")(pooled)
            return pooled

        for s in range(num_stages):
            dec_channels = self.channels[num_stages + s]
            skip = skips[num_stages - 1 - s]
            # indice_key reuse: the inverse conv transposes the encoder's
            # down conv — packed parent/tap when available, else invert the
            # rulebook by scatter (no lookups either way)
            down = down_plans[num_stages - 1 - s]
            rb_inv = (None if down.parent is not None else
                      invert_strided_rulebook(down.rulebook, skip.capacity))
            x = InverseConv(dec_channels, 2, 2, 0,
                            compute_dtype=self.compute_dtype, name=f"up{s}")(
                x, skip.coords, skip.spatial_shape, rb_inv,
                down.parent, down.tap
            )
            h = norm(features=dec_channels, name=f"up{s}_bn")(
                x.features, x.mask, train, condition_idx, context
            )
            x = x.replace(features=nn.relu(h))
            feats = jnp.concatenate([x.features, skip.features], axis=1)
            x = x.replace(features=jnp.where(x.mask[:, None], feats, 0.0))
            level = num_stages - 1 - s
            rb = subm_rulebooks[level]
            if rb is None:
                rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
                subm_rulebooks[level] = rb
            if dec_channels > 64 and not isinstance(rb, BandedRulebook):
                rb = attach_band_rulebook(rb)
                subm_rulebooks[level] = rb
            contract += plan_contract_flags(rb)
            n_blocks = self.layers[num_stages + s]
            if self.scan_blocks:
                # first block changes width (skip concat): run it standalone
                x = block(channels=dec_channels, name=f"dec{s}_block0")(
                    x, rb, train, condition_idx, context
                )
                if n_blocks > 1:
                    x = stack(channels=dec_channels, num_blocks=n_blocks - 1,
                              name=f"dec{s}_blocks")(x, rb, train,
                                                     condition_idx, context)
            else:
                for b in range(n_blocks):
                    x = block(channels=dec_channels, name=f"dec{s}_block{b}")(
                        x, rb, train, condition_idx, context
                    )

        sow_contract(self, contract)
        if self.num_classes > 0:
            logits = nn.Dense(self.num_classes, name="final")(x.features)
            return jnp.where(x.mask[:, None], logits, 0.0)
        return x.features
