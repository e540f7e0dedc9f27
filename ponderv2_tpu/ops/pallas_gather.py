"""Pallas TPU kernels: windowed gather-GEMM for sparse convolution.

The XLA row gather that feeds sparse-conv taps is descriptor-bound on TPU
(~60M rows/s measured on v5e — 17-40 GB/s effective for 64-512 B rows, far
below the ~800 GB/s HBM peak). Rulebooks are per-tap monotone over their
valid entries (rows sorted by ravel key + constant tap offset), so a block
of B output rows reads inputs from a narrow window.

Design (shaped by measurement — see tools/probe_pallas_profile.py):
- Per-step window DMAs cost ~4.6 us regardless of size, so taps are
  processed in GROUPS sharing one window pair: all ky*kz taps of a fixed
  dx offset read nearly-identical windows (y/z shifts move the ravel key
  by a few rows), cutting grid steps and DMA churn 9-25x vs per-tap.
- Window placement is scalar-prefetched (PrefetchScalarGridSpec): the
  per-(group, block) aligned window index drives the BlockSpec index maps.
- Row selection is a TRANSPOSED one-hot (iota on sublanes, rulebook block
  lane-major) fused into MXU matmuls, two-level to keep lanes busy:
  features are viewed as (rows/8, 8C) so the one-hot picks 8-row slabs at
  full lane width, then a per-row (row % 8) mask extracts the row. The
  per-row masks come from an identity-matrix matmul transpose (a
  sublane-major rulebook input DMA measured +2.3 us/step; the 512x512
  identity stays resident in VMEM).
- The group's taps contract in ONE (B, TG*cin) @ (TG*cin, cout) matmul.

Exactness: a window of two aligned Wb blocks covers any block whose valid
entries span < Wb + 1 rows; coverage is checked outside the kernel (cheap
int reductions) and the caller falls back to the plain gather for the
whole layer via ``lax.cond`` when any block overflows — results are always
exact, never silently dropped.

Replaces the CUDA gather/scatter rulebook application inside spconv (used
by /root/reference/ponder/models/sparse_unet/spconv_unet_v1m1_base.py:47-225).

Mosaic constraints found the hard way (this remote-compile setup): 1-D
int32 input blocks crash the compiler; in-kernel transposes/reshapes are
unavailable (hence the transposed one-hot and host-side reshapes); block
shapes must tile to (8k, 128k) or match the array dims exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8  # rows per slab; features are viewed as (rows/SLAB, SLAB*C)


def _interpret() -> bool:
    # CPU test runs execute the kernels in interpreter mode
    return jax.default_backend() == "cpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def padded_rows(n_in: int, wb: int) -> int:
    """Rows the feature array must be padded to (static)."""
    return (_cdiv(n_in, wb) + 1) * wb


class WindowGeometry(NamedTuple):
    rbb: jnp.ndarray  # (G, nb, TG, block) int32, lane-major tap blocks
    w0: jnp.ndarray  # (G, nb) int32 aligned window block index per group
    covered: jnp.ndarray  # () bool: every (group, block) fits its window


def prepare_geometry(
    rulebook: jnp.ndarray, n_in: int, block: int, wb: int, group: int
) -> WindowGeometry:
    """Group taps [g*group, (g+1)*group) under shared per-block windows."""
    k3, n_out = rulebook.shape
    assert k3 % group == 0
    ngroups = k3 // group
    nb = _cdiv(n_out, block)
    rbb = jnp.pad(
        rulebook, ((0, 0), (0, nb * block - n_out)), constant_values=-1
    ).reshape(ngroups, group, nb, block)
    valid = rbb >= 0
    big = jnp.iinfo(jnp.int32).max
    mn = jnp.min(jnp.where(valid, rbb, big), axis=(1, 3))  # (G, nb)
    mx = jnp.max(jnp.where(valid, rbb, -1), axis=(1, 3))
    n_pad = padded_rows(n_in, wb)
    w0 = jnp.clip(jnp.where(mn == big, 0, mn) // wb, 0, n_pad // wb - 2)
    covered = jnp.all(mx < (w0 + 2) * wb)
    rbb = rbb.transpose(0, 2, 1, 3)  # (G, nb, TG, block)
    # pad the tap dim to a sublane multiple (odd sublane counts upset Mosaic)
    tg_pad = _cdiv(group, SLAB) * SLAB
    rbb = jnp.pad(
        rbb, ((0, 0), (0, 0), (0, tg_pad - group), (0, 0)),
        constant_values=-1,
    )
    return WindowGeometry(rbb, w0, covered)


def pad_features(features: jnp.ndarray, n_pad: int, dtype) -> jnp.ndarray:
    """Cast + pad rows, viewed as (n_pad/SLAB, SLAB*C) for the slab gather."""
    n, c = features.shape
    f = jnp.pad(features.astype(dtype), ((0, n_pad - n), (0, 0)))
    return f.reshape(n_pad // SLAB, SLAB * c)


def _gather_group(w0_ref, rb_ref, eye_ref, lo_ref, hi_ref, g_id, j, wb, cin,
                  group, out_dtype):
    """Windowed two-level gather of a tap group -> (B, group*cin)."""
    rb = rb_ref[0, 0]  # (TG_pad, B) int32, taps on sublanes, rows on lanes
    tg, block = group, rb.shape[1]
    wb8 = wb // SLAB
    base8 = w0_ref[g_id, j] * wb8
    cols = []
    for t in range(tg):
        idx = rb[t:t + 1, :]  # (1, B)
        slab = idx // SLAB
        s_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (wb8, block), 0) + base8
        )
        d = slab - s_lo
        oh_lo = (d == 0).astype(out_dtype)
        oh_hi = (d == wb8).astype(out_dtype)
        g8 = jax.lax.dot_general(
            oh_lo, lo_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g8 = g8 + jax.lax.dot_general(
            oh_hi, hi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, SLAB*cin)
        # per-row slab position, sublane-major via identity-matmul transpose
        # (values 1..SLAB valid, 0 invalid; bf16-exact). The value row is
        # broadcast to SLAB lanes first — Mosaic's matmul lowering rejects a
        # free dimension of 1.
        v = jnp.where(idx >= 0, idx % SLAB + 1, 0).astype(out_dtype)  # (1, B)
        v8 = jnp.broadcast_to(v, (SLAB, block))
        col8 = jax.lax.dot_general(
            eye_ref[:], v8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, SLAB) — identical columns
        g = jnp.zeros((block, cin), jnp.float32)
        for r in range(SLAB):
            g = g + jnp.where(
                col8[:, r:r + 1] == r + 1, g8[:, r * cin:(r + 1) * cin], 0.0
            )
        cols.append(g.astype(out_dtype))
    return jnp.concatenate(cols, axis=1)  # (B, TG*cin)


def _fwd_kernel(w0_ref, rb_ref, eye_ref, lo_ref, hi_ref, w_ref, out_ref,
                *, wb, cin, group):
    g_id = pl.program_id(1)

    @pl.when(g_id == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    j = pl.program_id(0)
    g = _gather_group(w0_ref, rb_ref, eye_ref, lo_ref, hi_ref, g_id, j, wb,
                      cin, group, lo_ref.dtype)
    out_ref[:] += jnp.dot(g, w_ref[0], preferred_element_type=jnp.float32)


def windowed_conv_fwd(
    feats8: jnp.ndarray,  # (n_pad/SLAB, SLAB*cin) compute-dtype (pad_features)
    geom: WindowGeometry,
    weights: jnp.ndarray,  # (K3, cin, cout) compute-dtype
    wb: int,
) -> jnp.ndarray:
    """Accumulated conv output (nb*B, cout) f32."""
    ngroups, nb, tg_pad, block = geom.rbb.shape
    k3, cin, cout = weights.shape
    group = k3 // ngroups
    wb8, c8 = wb // SLAB, SLAB * cin
    wg = weights.reshape(ngroups, group * cin, cout)
    eye = jnp.eye(block, dtype=feats8.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # w0
        grid=(nb, ngroups),
        in_specs=[
            pl.BlockSpec((1, 1, tg_pad, block), lambda j, g, w0: (g, j, 0, 0)),
            pl.BlockSpec((block, block), lambda j, g, w0: (0, 0)),
            pl.BlockSpec((wb8, c8), lambda j, g, w0: (w0[g, j], 0)),
            pl.BlockSpec((wb8, c8), lambda j, g, w0: (w0[g, j] + 1, 0)),
            pl.BlockSpec((1, group * cin, cout), lambda j, g, w0: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, cout), lambda j, g, w0: (j, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, wb=wb, cin=cin, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * block, cout), jnp.float32),
        interpret=_interpret(),
    )(geom.w0, geom.rbb, eye, feats8, feats8, wg)


def _dw_kernel(w0_ref, rb_ref, eye_ref, lo_ref, hi_ref, g_ref, dw_ref,
               *, wb, cin, group):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    g_id = pl.program_id(0)
    gx = _gather_group(w0_ref, rb_ref, eye_ref, lo_ref, hi_ref, g_id, j, wb,
                       cin, group, lo_ref.dtype)
    dw_ref[0] += jax.lax.dot_general(
        gx, g_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def windowed_conv_dw(
    feats8: jnp.ndarray,  # (n_pad/SLAB, SLAB*cin)
    geom: WindowGeometry,
    g: jnp.ndarray,  # (nb*B, cout) compute-dtype cotangent
    wb: int,
    group: int,
) -> jnp.ndarray:
    """dW (K3, cin, cout) f32: dW[t] = sum_j gather_t(x)_j^T @ g_j."""
    ngroups, nb, tg_pad, block = geom.rbb.shape
    cin = feats8.shape[1] // SLAB
    cout = g.shape[1]
    wb8, c8 = wb // SLAB, SLAB * cin
    eye = jnp.eye(block, dtype=feats8.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups, nb),  # j inner: the dW group block is revisited
        in_specs=[
            pl.BlockSpec((1, 1, tg_pad, block),
                         lambda g_, j, w0: (g_, j, 0, 0)),
            pl.BlockSpec((block, block), lambda g_, j, w0: (0, 0)),
            pl.BlockSpec((wb8, c8), lambda g_, j, w0: (w0[g_, j], 0)),
            pl.BlockSpec((wb8, c8), lambda g_, j, w0: (w0[g_, j] + 1, 0)),
            pl.BlockSpec((block, cout), lambda g_, j, w0: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, group * cin, cout), lambda g_, j, w0: (g_, 0, 0)
        ),
    )
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, wb=wb, cin=cin, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ngroups, group * cin, cout), jnp.float32
        ),
        interpret=_interpret(),
    )(geom.w0, geom.rbb, eye, feats8, feats8, g)
    return dw.reshape(ngroups * group, cin, cout)
