"""SpUNet: sparse-voxel U-Net backbone, TPU-native.

Re-architecture of the reference SpUNet-v1m1
(/root/reference/ponder/models/sparse_unet/spconv_unet_v1m1_base.py:86-278):
stem (submanifold k5) → 4 strided-conv encoder stages with BasicBlock residuals →
4 inverse-conv decoder stages with skip concat → linear head. Differences by
design, not accident:

- All voxel buffers are fixed-capacity (static shapes); per-level capacities form
  a geometric budget schedule (``capacity_schedule``).
- Rulebooks are built once per level per forward and shared by every block on that
  level — the explicit form of spconv's ``indice_key`` cache.
- BatchNorm is masked (valid voxels only) and globally synced under pjit.
- ``cls_mode`` mirrors the reference's encoder-only variant with global mean pool.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import SparseTensor
from ...ops.spconv import (
    build_strided_plan,
    build_subm_rulebook,
    invert_strided_rulebook,
    plan_contract_flags,
)
from ...ops.scatter import segment_mean
from ..builder import MODELS
from ..norm import MaskedBatchNorm
from .layers import InverseConv, StridedConv, SubMConv


class BasicBlock(nn.Module):
    """Residual block: subm k3 → BN → relu → subm k3 → BN, + identity, relu."""

    channels: int
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook, train: bool) -> SparseTensor:
        identity = st.features
        x = SubMConv(self.channels, 3, compute_dtype=self.compute_dtype, name="conv1")(
            st, rulebook
        )
        h = MaskedBatchNorm(self.channels, self.eps, self.momentum, name="bn1")(
            x.features, st.mask, train
        )
        h = nn.relu(h)
        x = SubMConv(self.channels, 3, compute_dtype=self.compute_dtype, name="conv2")(
            st.replace(features=h), rulebook
        )
        h = MaskedBatchNorm(self.channels, self.eps, self.momentum, name="bn2")(
            x.features, st.mask, train
        )
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False, name="proj")(identity)
            identity = MaskedBatchNorm(
                self.channels, self.eps, self.momentum, name="proj_bn"
            )(identity, st.mask, train)
        out = nn.relu(h + identity)
        out = jnp.where(st.mask[:, None], out, 0.0)
        return st.replace(features=out)


class ConvBNRelu(nn.Module):
    """conv + masked BN + relu as one remat-able unit.

    Rematting matters most at the stem: a k5 conv over (N, 6) inputs otherwise
    saves 125 gathered per-tap activations for backward — and XLA lane-pads the
    6-wide feature dim to 128, a 21x memory expansion (measured OOM at ScanNet
    scale). Recomputing the gathers in backward is nearly free.
    """

    kind: str = "subm"  # subm | strided | inverse
    channels: int = 32
    kernel_size: int = 3
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None
    out_spatial_shape: Optional[Tuple[int, int, int]] = None  # strided/inverse
    #   (kept as a STATIC attribute: shapes must not pass through remat args)

    @nn.compact
    def __call__(self, st: SparseTensor, aux, train: bool) -> SparseTensor:
        if self.kind == "subm":
            x = SubMConv(self.channels, self.kernel_size,
                         compute_dtype=self.compute_dtype, name="conv")(st, aux)
        elif self.kind == "strided":
            from ...ops.spconv import StridedPlan

            out_coords, rb, parent, tap = aux
            plan = StridedPlan(out_coords, rb, self.out_spatial_shape,
                               parent, tap)
            x = StridedConv(self.channels, 2, 2, 0,
                            compute_dtype=self.compute_dtype, name="conv")(st, plan)
        else:
            fine_coords, rb, parent, tap = aux
            x = InverseConv(self.channels, 2, 2, 0,
                            compute_dtype=self.compute_dtype, name="conv")(
                st, fine_coords, self.out_spatial_shape, rb, parent, tap
            )
        h = MaskedBatchNorm(self.channels, self.eps, self.momentum, name="bn")(
            x.features, x.mask, train
        )
        return x.replace(features=nn.relu(h))


class _ScanBasicBlock(BasicBlock):
    """BasicBlock adapted to nn.scan's (carry, out) contract."""

    def __call__(self, st, rulebook, train):
        return super().__call__(st, rulebook, train), None


class BlockStack(nn.Module):
    """A stack of identical residual blocks, compiled ONCE via nn.scan.

    The reference instantiates each block separately; XLA would trace/compile
    every one. Scanning over stacked parameters collapses N blocks into a single
    compiled body (params/batch_stats gain a leading block axis) — a large
    compile-time win for deep stages, with identical math.
    """

    channels: int
    num_blocks: int
    eps: float = 1e-3
    momentum: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook, train: bool) -> SparseTensor:
        body = _ScanBasicBlock
        if self.remat:
            body = nn.remat(body, static_argnums=(3,))
        scanned = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.num_blocks,
        )(self.channels, self.eps, self.momentum, self.compute_dtype,
          name="blocks")
        st, _ = scanned(st, rulebook, train)
        return st


def capacity_schedule(base_capacity: int, num_stages: int, decay: float = 2.0,
                      floor: int = 1024) -> Tuple[int, ...]:
    """Per-level voxel budgets: level 0 = base, each deeper level /= decay."""
    caps = []
    c = base_capacity
    for _ in range(num_stages + 1):
        caps.append(max(int(c), floor))
        c = c / decay
    return tuple(caps)


@MODELS.register_module(name="SpUNet-v1m1")
class SpUNet(nn.Module):
    in_channels: int = 6
    num_classes: int = 20
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    cls_mode: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    capacities: Optional[Sequence[int]] = None  # per-level budgets; default derived
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True  # rematerialize blocks: trade FLOPs for HBM (jax.checkpoint)
    scan_blocks: bool = True  # nn.scan over same-shape blocks (compile-time win)
    slab_conv: bool = True  # slab (z-run) rulebooks: 1 gather per tap-column

    def _sow_contract(self, flags):
        """Aggregate plan contract flags into ``diagnostics/contract_ok``.

        The train step surfaces it as a metric and the Trainer/bench raise
        when it goes false — a sortedness/window violation must fail loudly,
        never train on the zero-poisoned conv outputs."""
        if flags:
            ok = jnp.all(jnp.stack(flags))
            self.sow("diagnostics", "contract_ok", ok,
                     reduce_fn=jnp.logical_and,
                     init_fn=lambda: jnp.asarray(True))

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True,
                 plans=None) -> jnp.ndarray:
        from .plans import build_spunet_plans, level_spatial_shapes

        num_stages = len(self.layers) // 2
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(3,)) if self.remat else BasicBlock
        )
        caps = tuple(self.capacities) if self.capacities is not None else (
            capacity_schedule(st.capacity, num_stages)
        )
        unit_cls = (
            nn.remat(ConvBNRelu, static_argnums=(3,)) if self.remat else ConvBNRelu
        )
        unit = partial(unit_cls, eps=self.bn_eps, momentum=self.bn_momentum,
                       compute_dtype=self.compute_dtype)

        # ---- plans: every data-dependent rulebook (stem k5, per-level k3 +
        # band, strided, inverse) comes from ONE builder, either precomputed
        # by the input pipeline (host prefetch — ~70 ms/step off the device
        # timeline at bench shapes) or built inline here. Single source of
        # truth; see plans.py.
        if plans is None:
            plans = build_spunet_plans(st.coords, st.spatial_shape,
                                       st.batch_size, caps, self.channels,
                                       slab_conv=self.slab_conv)
        shapes = level_spatial_shapes(st.spatial_shape, num_stages)

        rb_stem = plans.stem
        contract = plan_contract_flags(rb_stem)
        x = unit(kind="subm", channels=self.base_channels, kernel_size=5,
                 name="stem")(st, rb_stem, train)

        # ---- encoder
        skips = [x]
        for s in range(num_stages):
            x = unit(kind="strided", channels=self.channels[s],
                     out_spatial_shape=shapes[s + 1],
                     name=f"down{s}")(x, plans.strided[s], train)
            rb = plans.subm[s]
            contract += plan_contract_flags(rb)
            if self.scan_blocks:
                x = BlockStack(self.channels[s], self.layers[s], self.bn_eps,
                               self.bn_momentum, self.compute_dtype, self.remat,
                               name=f"enc{s}_blocks")(x, rb, train)
            else:
                for b in range(self.layers[s]):
                    x = block_cls(self.channels[s], self.bn_eps, self.bn_momentum,
                                  self.compute_dtype, name=f"enc{s}_block{b}")(
                        x, rb, train
                    )
            skips.append(x)

        if self.cls_mode:
            self._sow_contract(contract)
            # global mean pool over valid voxels per scene -> classifier
            pooled = segment_mean(x.features, x.coords[:, 0], x.batch_size)
            return nn.Dense(self.num_classes, name="final")(pooled)

        # ---- decoder
        for s in range(num_stages):
            dec_channels = self.channels[num_stages + s]
            skip = skips[num_stages - 1 - s]
            # indice_key reuse: the inverse conv is the exact transpose of the
            # encoder's down conv over the same pairing — packed parent/tap
            # when available, else the scatter-inverted rulebook (plans.inv)
            level = num_stages - 1 - s
            _, _, parent, tap = plans.strided[level]
            x = unit(kind="inverse", channels=dec_channels,
                     out_spatial_shape=skip.spatial_shape, name=f"up{s}")(
                x, (skip.coords, plans.inv[s], parent, tap), train
            )
            # skip concat (reference: replace_feature(torch.cat(...)))
            feats = jnp.concatenate([x.features, skip.features], axis=1)
            feats = jnp.where(x.mask[:, None], feats, 0.0)
            x = x.replace(features=feats)
            # level-0 k3 plan = the k5 stem plan's inner 3x3x3 taps (same
            # coords, same table), derived in plans.l0
            rb = plans.l0 if level == 0 else plans.subm[level - 1]
            contract += plan_contract_flags(rb)
            n_blocks = self.layers[num_stages + s]
            if self.scan_blocks:
                # first block changes width (skip concat -> dec channels): run
                # it standalone; the remaining uniform blocks scan
                x = block_cls(dec_channels, self.bn_eps, self.bn_momentum,
                              self.compute_dtype, name=f"dec{s}_block0")(
                    x, rb, train
                )
                if n_blocks > 1:
                    x = BlockStack(dec_channels, n_blocks - 1, self.bn_eps,
                                   self.bn_momentum, self.compute_dtype,
                                   self.remat, name=f"dec{s}_blocks")(x, rb, train)
            else:
                for b in range(n_blocks):
                    x = block_cls(dec_channels, self.bn_eps, self.bn_momentum,
                                  self.compute_dtype, name=f"dec{s}_block{b}")(
                        x, rb, train
                    )

        self._sow_contract(contract)
        if self.num_classes == 0:
            # backbone mode: raw per-voxel features (reference num_classes=0
            # makes the final layer identity, spconv_unet_v1m1_base.py)
            return x.features
        logits = nn.Dense(self.num_classes, name="final")(x.features)
        return jnp.where(x.mask[:, None], logits, 0.0)


@MODELS.register_module(name="SpUNet-v1m2")
class SpUNetBNMomentum(SpUNet):
    """Config alias: reference v1m2 is v1m1 with configurable bn_momentum
    (spconv_unet_v1m2_bn_momentum.py) — already a first-class knob here."""


@MODELS.register_module(name="SpUNetNoSkipBase")
class SpUNetNoSkip(nn.Module):
    """Encoder-decoder WITHOUT skip concatenation (reference
    spconv_unet_v1m1_base.py:281-461) — used for ablations/projection variants."""

    in_channels: int = 6
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    capacities: Optional[Sequence[int]] = None
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = True

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True) -> jnp.ndarray:
        num_stages = len(self.layers) // 2
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(3,)) if self.remat else BasicBlock
        )
        caps = tuple(self.capacities) if self.capacities is not None else (
            capacity_schedule(st.capacity, num_stages)
        )
        bn = partial(MaskedBatchNorm, eps=self.bn_eps, momentum=self.bn_momentum)

        rb_stem = build_subm_rulebook(st.coords, st.spatial_shape, st.batch_size, 5)
        x = SubMConv(self.base_channels, 5, compute_dtype=self.compute_dtype,
                     name="stem_conv")(st, rb_stem)
        h = bn(self.base_channels, name="stem_bn")(x.features, x.mask, train)
        x = x.replace(features=nn.relu(h))

        coords_per_level = [x.coords]
        shapes_per_level = [x.spatial_shape]
        down_rulebooks = [None] * num_stages
        for s in range(num_stages):
            plan = build_strided_plan(
                x.coords, x.spatial_shape, x.batch_size, 2, 2, 0, caps[s + 1]
            )
            down_rulebooks[s] = plan.rulebook
            x = StridedConv(self.channels[s], 2, 2, 0,
                            compute_dtype=self.compute_dtype, name=f"down{s}")(x, plan)
            h = bn(self.channels[s], name=f"down{s}_bn")(x.features, x.mask, train)
            x = x.replace(features=nn.relu(h))
            rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
            for b in range(self.layers[s]):
                x = block_cls(self.channels[s], self.bn_eps, self.bn_momentum,
                              self.compute_dtype, name=f"enc{s}_block{b}")(
                    x, rb, train
                )
            coords_per_level.append(x.coords)
            shapes_per_level.append(x.spatial_shape)

        for s in range(num_stages):
            dec_channels = self.channels[num_stages + s]
            fine_coords = coords_per_level[num_stages - 1 - s]
            fine_shape = shapes_per_level[num_stages - 1 - s]
            rb_inv = invert_strided_rulebook(
                down_rulebooks[num_stages - 1 - s], fine_coords.shape[0]
            )
            x = InverseConv(dec_channels, 2, 2, 0,
                            compute_dtype=self.compute_dtype, name=f"up{s}")(
                x, fine_coords, fine_shape, rb_inv
            )
            h = bn(dec_channels, name=f"up{s}_bn")(x.features, x.mask, train)
            x = x.replace(features=nn.relu(h))
            rb = build_subm_rulebook(x.coords, x.spatial_shape, x.batch_size, 3)
            for b in range(self.layers[num_stages + s]):
                x = block_cls(dec_channels, self.bn_eps, self.bn_momentum,
                              self.compute_dtype, name=f"dec{s}_block{b}")(
                    x, rb, train
                )

        if self.num_classes > 0:
            logits = nn.Dense(self.num_classes, name="final")(x.features)
            return jnp.where(x.mask[:, None], logits, 0.0)
        return x.features
