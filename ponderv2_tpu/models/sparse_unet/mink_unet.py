"""MinkUNet family: ResNet-style sparse U-Nets (alternate backbone line).

Reference: /root/reference/ponder/models/sparse_unet/mink_unet.py:161-443
(MinkowskiEngine-based 14/18/34/50/101 variants with A/B/C widths). Here the
family is expressed over the same rulebook sparse-conv substrate as SpUNet —
one generic U-Net parameterized by (block type, layer counts, plane widths),
with the reference's named variants registered as configs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import SparseTensor
from ...ops.spconv import (
    build_strided_plan,
    BandedRulebook,
    attach_band_rulebook,
    build_subm_rulebook,
    invert_strided_rulebook,
    plan_contract_flags,
)
from ..builder import MODELS
from ..norm import MaskedBatchNorm
from .layers import InverseConv, StridedConv, SubMConv, sow_contract
from .spunet import BasicBlock, BlockStack, capacity_schedule


class Bottleneck(nn.Module):
    channels: int  # output channels (= planes * expansion)
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook, train: bool) -> SparseTensor:
        planes = self.channels // self.expansion
        bn = partial(MaskedBatchNorm, eps=self.eps, momentum=self.momentum)
        identity = st.features
        h = nn.Dense(planes, use_bias=False, name="conv1")(st.features)
        h = nn.relu(bn(planes, name="bn1")(h, st.mask, train))
        x = SubMConv(planes, 3, compute_dtype=self.compute_dtype, name="conv2")(
            st.replace(features=h), rulebook
        )
        h = nn.relu(bn(planes, name="bn2")(x.features, st.mask, train))
        h = nn.Dense(self.channels, use_bias=False, name="conv3")(h)
        h = bn(self.channels, name="bn3")(h, st.mask, train)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False, name="proj")(identity)
            identity = bn(self.channels, name="proj_bn")(identity, st.mask, train)
        out = nn.relu(h + identity)
        return st.replace(features=jnp.where(st.mask[:, None], out, 0.0))


class MinkUNetBase(nn.Module):
    in_channels: int = 3
    out_channels: int = 20
    block_type: str = "basic"  # basic | bottleneck
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    capacities: Optional[Sequence[int]] = None
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True
    scan_blocks: bool = True  # nn.scan uniform basic-block stacks

    def _blocks(self, x, rb, train, ch, n_blocks, block_cls, prefix,
                first_standalone):
        """Run a stage's residual blocks; uniform basic stacks get nn.scan."""
        use_scan = self.scan_blocks and self.block_type == "basic"
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(3,))
        start = 0
        if first_standalone or not use_scan:
            k = 1 if (use_scan and first_standalone) else n_blocks
            for b in range(k):
                x = block_cls(ch, self.bn_eps, self.bn_momentum,
                              self.compute_dtype, name=f"{prefix}_b{b}")(
                    x, rb, train
                )
            start = k
        if use_scan and n_blocks - start > 0:
            x = BlockStack(ch, n_blocks - start, self.bn_eps, self.bn_momentum,
                           self.compute_dtype, self.remat,
                           name=f"{prefix}_blocks")(x, rb, train)
        return x

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True) -> jnp.ndarray:
        num_stages = len(self.layers) // 2
        expansion = 4 if self.block_type == "bottleneck" else 1
        block_cls = Bottleneck if self.block_type == "bottleneck" else BasicBlock
        caps = tuple(self.capacities) if self.capacities is not None else (
            capacity_schedule(st.capacity, num_stages)
        )
        bn = partial(MaskedBatchNorm, eps=self.bn_eps, momentum=self.bn_momentum)

        rb0 = build_subm_rulebook(st.coords, st.spatial_shape, st.batch_size, 5)
        contract = plan_contract_flags(rb0)
        x = SubMConv(self.init_dim, 5, compute_dtype=self.compute_dtype,
                     name="stem")(st, rb0)
        h = nn.relu(bn(self.init_dim, name="stem_bn")(x.features, x.mask, train))
        x = x.replace(features=h)

        skips = [x]
        rbs = [None] * (num_stages + 1)
        down_plans = [None] * num_stages  # kept: decoder reuses the pairing
        for s in range(num_stages):
            plan = build_strided_plan(
                x.coords, x.spatial_shape, x.batch_size, 2, 2, 0, caps[s + 1]
            )
            down_plans[s] = plan
            ch = self.planes[s] * expansion
            x = StridedConv(ch, 2, 2, 0, compute_dtype=self.compute_dtype,
                            name=f"down{s}")(x, plan)
            h = nn.relu(bn(ch, name=f"down{s}_bn")(x.features, x.mask, train))
            x = x.replace(features=h)
            rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
            if ch > 64:
                # wide blocks take the band conv; one shared plan per level
                rb = attach_band_rulebook(rb)
            rbs[s + 1] = rb
            contract += plan_contract_flags(rb)
            x = self._blocks(x, rb, train, ch, self.layers[s], block_cls,
                             f"enc{s}", first_standalone=False)
            skips.append(x)

        for s in range(num_stages):
            ch = self.planes[num_stages + s] * expansion
            skip = skips[num_stages - 1 - s]
            # indice_key reuse: the inverse conv transposes the encoder's
            # down conv — packed parent/tap when available, else invert the
            # rulebook by scatter (no lookups either way)
            down = down_plans[num_stages - 1 - s]
            rb_inv = (None if down.parent is not None else
                      invert_strided_rulebook(down.rulebook, skip.capacity))
            x = InverseConv(ch, 2, 2, 0, compute_dtype=self.compute_dtype,
                            name=f"up{s}")(x, skip.coords, skip.spatial_shape,
                                           rb_inv, down.parent, down.tap)
            h = nn.relu(bn(ch, name=f"up{s}_bn")(x.features, x.mask, train))
            feats = jnp.concatenate([h, skip.features], axis=1)
            x = x.replace(features=jnp.where(x.mask[:, None], feats, 0.0))
            level = num_stages - 1 - s
            rb = rbs[level]
            if rb is None:
                rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
                rbs[level] = rb
            if ch > 64 and not isinstance(rb, BandedRulebook):
                rb = attach_band_rulebook(rb)
                rbs[level] = rb
            contract += plan_contract_flags(rb)
            x = self._blocks(x, rb, train, ch, self.layers[num_stages + s],
                             block_cls, f"dec{s}", first_standalone=True)

        sow_contract(self, contract)
        if self.out_channels == 0:
            return x.features
        logits = nn.Dense(self.out_channels, name="final")(x.features)
        return jnp.where(x.mask[:, None], logits, 0.0)


_VARIANTS = {
    # name: (block, layers, planes)
    "MinkUNet14": ("basic", (1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18": ("basic", (2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet34": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet50": ("bottleneck", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet101": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet14A": ("basic", (1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14B": ("basic", (1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet14C": ("basic", (1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet14D": ("basic", (1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18A": ("basic", (2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18B": ("basic", (2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet18D": ("basic", (2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet34A": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet34B": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32)),
    "MinkUNet34C": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
}


def _register_variant(name, block, layer_counts, plane_widths):
    def factory(**kwargs):
        kwargs.setdefault("block_type", block)
        kwargs.setdefault("layers", layer_counts)
        kwargs.setdefault("planes", plane_widths)
        return MinkUNetBase(**kwargs)

    factory.__name__ = name
    MODELS.register_module(name=name, module=factory)
    return factory


for _name, (_block, _layers, _planes) in _VARIANTS.items():
    _register_variant(_name, _block, _layers, _planes)
