"""SpUNet plan prefetch: build every data-dependent conv plan in one place.

All SpUNet rulebooks/plans derive purely from the (sorted) L0 voxel coords
plus static config (spatial shape, capacities, channel widths) — none of it
needs model parameters. Building them inside the jitted train step costs
~70 ms/step on a v5e at bench shapes (tools/experiments/probe_plan_cost.py);
built here they can instead be PRE-COMPUTED BY THE INPUT PIPELINE (host CPU,
overlapped with device compute) and fed to the step as ordinary array inputs.

This mirrors how the reference pays for spconv's rulebook builds inside its
CUDA forward (spconv indice-key cache, used via
/root/reference/ponder/models/sparse_unet/spconv_unet_v1m1_base.py:47-65) —
on TPU the natural split is: integer plan work on the host, dense MXU math
on the device.

``build_spunet_plans`` is the SINGLE source of truth: the model calls it
inline when no precomputed plans are supplied, so the two paths cannot
diverge (tested by tests/test_plans.py equality).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops import hashing as _hashing
from ...ops.spconv import (
    SubmPlan,
    attach_band_plan,
    build_strided_plan,
    build_subm_plan,
    build_subm_rulebook,
    derive_inner_subm_plan,
    downsample_shape,
    invert_strided_rulebook,
)


class SpUNetPlans(NamedTuple):
    """All conv plans for one SpUNet forward. Array-only pytree (static
    shapes like per-level spatial extents are NOT carried — the model
    recomputes them from config so the pytree can pass through jit)."""

    stem: Any  # SubmPlan (slab) or (K^3, N) legacy rulebook — k5 at L0
    strided: Tuple[Tuple[jnp.ndarray, ...], ...]  # (out_coords, rb, parent, tap)
    subm: Tuple[Any, ...]  # k3 plan per level 1..num_stages
    l0: Any  # k3 plan at L0 (stem-derived inner taps)
    inv: Tuple[Optional[jnp.ndarray], ...]  # inverse rulebooks per decoder
    #   stage; None when the packed parent/tap form covers the stage


def plan_capacities(
    base_capacity: int,
    num_stages: int,
    capacities: Optional[Sequence[int]] = None,
) -> Tuple[int, ...]:
    if capacities is not None:
        return tuple(capacities)
    from .spunet import capacity_schedule

    return capacity_schedule(base_capacity, num_stages)


def _build_subm(coords, spatial_shape, batch_size, kernel_size, slab_conv,
                with_legacy=True):
    """Slab plan when the dense-grid regime applies, else legacy rulebook
    (same selection as SpUNet._build_subm)."""
    if slab_conv and _hashing.dense_table_fits(spatial_shape, batch_size):
        return build_subm_plan(coords, spatial_shape, batch_size, kernel_size,
                               with_legacy=with_legacy)
    return build_subm_rulebook(coords, spatial_shape, batch_size, kernel_size)


def build_spunet_plans(
    coords: jnp.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    capacities: Sequence[int],
    channels: Sequence[int],
    slab_conv: bool = True,
    band_budgets: Optional[Tuple[int, int]] = None,
) -> SpUNetPlans:
    """Build every plan the SpUNet forward consumes, in model order.

    ``coords`` must be the SORTED (batch, x, y, z) voxel coords the backbone
    will run on (collate pre-sorts; ``sort_by_key`` otherwise). ``channels``
    is the full 2*num_stages channel tuple — wide levels (enc OR dec width
    > 64) get a band plan attached up front (harmless for narrow convs:
    eligibility is re-checked per conv at apply time).
    """
    num_stages = len(channels) // 2
    caps = tuple(capacities)
    pair_budget, entry_budget = band_budgets or (None, None)

    stem = _build_subm(coords, tuple(spatial_shape), batch_size, 5, slab_conv,
                       with_legacy=False)

    c, shape = coords, tuple(spatial_shape)
    strided, subm = [], []
    for s in range(num_stages):
        plan = build_strided_plan(c, shape, batch_size, 2, 2, 0, caps[s + 1])
        strided.append((plan.out_coords, plan.rulebook, plan.parent, plan.tap))
        c, shape = plan.out_coords, plan.spatial_shape
        rb = _build_subm(c, shape, batch_size, 3, slab_conv)
        # attach a band plan if the encoder blocks OR the decoder blocks at
        # this level would take the band path (decoder stage s runs at level
        # num_stages - 1 - s) — band_eligible folds in the env gates, so a
        # disabled band path skips the 27N relayout entirely
        from ...ops.band_conv import band_eligible

        dec_ch = channels[num_stages + (num_stages - 1 - (s + 1))] if (
            s + 1 < num_stages) else None
        wants_band = band_eligible(channels[s], channels[s], 3) or (
            dec_ch is not None and band_eligible(dec_ch, dec_ch, 3))
        if wants_band and isinstance(rb, SubmPlan):
            rb = attach_band_plan(rb, pair_budget, entry_budget)
        subm.append(rb)

    # actual per-level row counts: L0 is the input capacity (which may be
    # below the capacity-schedule floor), deeper levels are the strided
    # plans' output row counts
    level_rows = [coords.shape[0]] + [entry[0].shape[0] for entry in strided]
    inv = []
    for s in range(num_stages):
        level = num_stages - 1 - s
        if strided[level][2] is not None:
            # packed path: the downsample plan's parent/tap arrays ARE the
            # inverse pairing (spconv indice_key reuse) — no rulebook needed
            inv.append(None)
        else:
            inv.append(invert_strided_rulebook(strided[level][1],
                                               level_rows[level]))

    if isinstance(stem, SubmPlan):
        l0 = derive_inner_subm_plan(stem, 5)
    else:
        inner = [
            (dx * 5 + dy) * 5 + dz
            for dx in (1, 2, 3) for dy in (1, 2, 3) for dz in (1, 2, 3)
        ]
        l0 = stem[jnp.asarray(inner)]
    from ...ops.band_conv import band_eligible as _beligible

    last_ch = channels[2 * num_stages - 1]
    if _beligible(last_ch, last_ch, 3) and isinstance(l0, SubmPlan):
        l0 = attach_band_plan(l0, pair_budget, entry_budget)

    return SpUNetPlans(stem=stem, strided=tuple(strided), subm=tuple(subm),
                       l0=l0, inv=tuple(inv))


def level_spatial_shapes(spatial_shape: Sequence[int],
                         num_stages: int) -> Tuple[Tuple[int, int, int], ...]:
    """Static per-level spatial shapes (L0..L_num_stages)."""
    shapes = [tuple(int(d) for d in spatial_shape)]
    for _ in range(num_stages):
        shapes.append(downsample_shape(shapes[-1], 2, 2, 0))
    return tuple(shapes)


def band_ok_flags(plans: SpUNetPlans):
    """The band plans' overflow-budget flags (empty if no band plans)."""
    flags = []
    for p in list(plans.subm) + [plans.l0]:
        band = getattr(p, "band", None)
        if band is not None:
            flags.append(band.ok)
    return flags


def host_build_spunet_plans(grid_coord, batch, spatial_shape, batch_size,
                            capacities, channels, slab_conv=True,
                            band_budgets=None, max_doublings=4):
    """Input-pipeline entry point: build plans on the HOST (CPU backend) from
    collated numpy arrays. Returns a numpy-leaf SpUNetPlans ready to ship to
    the device as step inputs. Compiled once per (shape, config) via jit on
    the CPU backend, so dataloader workers amortize the trace.

    Band overflow budgets AUTO-SIZE here: when a scene is denser than the
    starting budgets (band plan ``ok`` False), the build retries with both
    budgets doubled (up to ``max_doublings``), so pathological scenes degrade
    to a bigger overflow residual instead of a loud in-step stop. Budgets
    double exactly (power-of-two buckets), so the device step recompiles at
    most ``max_doublings`` times over a whole run."""
    import os

    import numpy as np

    cpu = jax.local_devices(backend="cpu")[0]
    batch = np.asarray(batch).astype(np.int32)
    coords = np.concatenate(
        [batch[:, None], np.asarray(grid_coord)], axis=1
    ).astype(np.int32)
    # mirror make_sparse_tensor: padding rows (batch < 0) become all -1
    coords = np.where((batch >= 0)[:, None], coords, -1)
    coords = jnp.asarray(coords)

    if band_budgets is None:
        band_budgets = (
            int(os.environ.get("PONDER_BAND_PAIR_BUDGET", "96")),
            int(os.environ.get("PONDER_BAND_ENTRY_BUDGET", "8192")),
        )
    pair, entry = band_budgets
    for attempt in range(max_doublings + 1):
        fn = _host_jit_cache_get(
            tuple(spatial_shape), int(batch_size), tuple(capacities),
            tuple(channels), bool(slab_conv), (int(pair), int(entry)))
        with jax.default_device(cpu):
            out = fn(coords)
        flags = band_ok_flags(out)
        if not flags or all(bool(f) for f in flags) or attempt == max_doublings:
            break
        pair, entry = pair * 2, entry * 2
    return jax.tree.map(lambda x: np.asarray(x), out)


_HOST_JIT_CACHE: dict = {}


def _host_jit_cache_get(spatial_shape, batch_size, capacities, channels,
                        slab_conv, band_budgets):
    key = (spatial_shape, batch_size, capacities, channels, slab_conv,
           band_budgets)
    if key not in _HOST_JIT_CACHE:
        cpu = jax.local_devices(backend="cpu")[0]
        _HOST_JIT_CACHE[key] = jax.jit(
            lambda c: build_spunet_plans(
                c, spatial_shape, batch_size, capacities, channels, slab_conv,
                band_budgets=band_budgets,
            ),
            device=cpu,
        )
    return _HOST_JIT_CACHE[key]
