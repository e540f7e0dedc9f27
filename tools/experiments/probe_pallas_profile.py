"""Profile the windowed kernel's per-step cost by ablation."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, B, WB, C, K3 = 163840, 512, 1024, 32, 27
    SLAB = 8
    nb = N // B
    wb8, c8 = WB // SLAB, SLAB * C
    rng = np.random.RandomState(0)
    n_pad = (N // WB + 1) * WB
    feats8 = jnp.asarray(
        rng.randn(n_pad // SLAB, c8).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(K3, C, C) * 0.05).astype(np.float32)).astype(
        jnp.bfloat16
    )
    rb = np.clip(
        np.sort(np.arange(N)[None, :].repeat(K3, 0)
                + rng.randint(-300, 300, (K3, N)), axis=1), 0, N - 1
    ).astype(np.int32)
    rb[rng.rand(K3, N) < 0.3] = -1
    rbb = jnp.asarray(rb.reshape(K3, nb, 1, B))
    rbc = jnp.asarray(rb.reshape(K3, nb, B, 1))
    w0 = jnp.clip(
        jnp.min(jnp.where(rbb[:, :, 0] >= 0, rbb[:, :, 0], 2**30), axis=2)
        // WB, 0, n_pad // WB - 2,
    ).astype(jnp.int32)

    def timeit(f, iters=20):
        out = f()
        jax.block_until_ready(out)
        float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        float(out.ravel()[0])
        return (time.perf_counter() - t0) / iters

    def run(name, fn):
        try:
            t = timeit(jax.jit(fn))
            print(f"{name}: {t*1e3:.2f} ms ({t/ (nb*K3) *1e6:.2f} us/step)")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    # V1: full current kernel (rb lane + rbc sublane + 2 dyn windows + matmuls)
    def kern_full(w0_ref, rb_ref, rbc_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = pl.program_id(0)
        idx = rb_ref[0, 0]
        slab = idx // SLAB
        base8 = w0_ref[t, j] * wb8
        s_lo = jax.lax.broadcasted_iota(jnp.int32, (wb8, B), 0) + base8
        d = slab - s_lo
        oh_lo = (d == 0).astype(jnp.bfloat16)
        oh_hi = (d == wb8).astype(jnp.bfloat16)
        g8 = jax.lax.dot_general(
            oh_lo, lo_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g8 = g8 + jax.lax.dot_general(
            oh_hi, hi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        idxc = rbc_ref[0, 0]
        vc = idxc >= 0
        g = jnp.zeros((B, C), jnp.float32)
        for r in range(SLAB):
            m = (idxc % SLAB == r) & vc
            g = g + jnp.where(m, g8[:, r * C:(r + 1) * C], 0.0)
        out_ref[:] += jnp.dot(g.astype(jnp.bfloat16), w_ref[0],
                              preferred_element_type=jnp.float32)

    def make(kern, specs, args):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb, K3),
            in_specs=specs,
            out_specs=pl.BlockSpec((B, C), lambda j, t, w0: (j, 0)),
        )
        return lambda: pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(w0, *args)

    sp_rb = pl.BlockSpec((1, 1, 1, B), lambda j, t, w0: (t, j, 0, 0))
    sp_rbc = pl.BlockSpec((1, 1, B, 1), lambda j, t, w0: (t, j, 0, 0))
    sp_lo = pl.BlockSpec((wb8, c8), lambda j, t, w0: (w0[t, j], 0))
    sp_hi = pl.BlockSpec((wb8, c8), lambda j, t, w0: (w0[t, j] + 1, 0))
    sp_lo_static = pl.BlockSpec((wb8, c8), lambda j, t, w0: (0, 0))
    sp_hi_static = pl.BlockSpec((wb8, c8), lambda j, t, w0: (1, 0))
    sp_w = pl.BlockSpec((1, C, C), lambda j, t, w0: (t, 0, 0))

    run("V1 full", make(kern_full, [sp_rb, sp_rbc, sp_lo, sp_hi, sp_w],
                        (rbb, rbc, feats8, feats8, w)))

    # V2: no rbc input (skip level-2 select; wrong numerics, perf only)
    def kern_norbc(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = pl.program_id(0)
        idx = rb_ref[0, 0]
        slab = idx // SLAB
        base8 = w0_ref[t, j] * wb8
        s_lo = jax.lax.broadcasted_iota(jnp.int32, (wb8, B), 0) + base8
        d = slab - s_lo
        oh_lo = (d == 0).astype(jnp.bfloat16)
        oh_hi = (d == wb8).astype(jnp.bfloat16)
        g8 = jax.lax.dot_general(
            oh_lo, lo_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g8 = g8 + jax.lax.dot_general(
            oh_hi, hi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] += jnp.dot(g8[:, :C].astype(jnp.bfloat16), w_ref[0],
                              preferred_element_type=jnp.float32)

    run("V2 no-rbc", make(kern_norbc, [sp_rb, sp_lo, sp_hi, sp_w],
                          (rbb, feats8, feats8, w)))

    # V3: static windows (no data-dependent DMA)
    run("V3 static-windows", make(kern_norbc,
                                  [sp_rb, sp_lo_static, sp_hi_static, sp_w],
                                  (rbb, feats8, feats8, w)))

    # V4: single window (lo only)
    def kern_lo(w0_ref, rb_ref, lo_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = pl.program_id(0)
        idx = rb_ref[0, 0]
        slab = idx // SLAB
        base8 = w0_ref[t, j] * wb8
        s_lo = jax.lax.broadcasted_iota(jnp.int32, (wb8, B), 0) + base8
        oh_lo = (slab - s_lo == 0).astype(jnp.bfloat16)
        g8 = jax.lax.dot_general(
            oh_lo, lo_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] += jnp.dot(g8[:, :C].astype(jnp.bfloat16), w_ref[0],
                              preferred_element_type=jnp.float32)

    run("V4 single-window", make(kern_lo, [sp_rb, sp_lo, sp_w],
                                 (rbb, feats8, w)))

    # V5: no one-hot matmul at all (pure DMA + conv matmul)
    def kern_dma(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.dot(lo_ref[:B // SLAB, :].reshape(B // SLAB * SLAB, C)[:B].astype(
            jnp.bfloat16)[:, :C], w_ref[0], preferred_element_type=jnp.float32)

    # note: reshape may fail; fall back to slicing lanes
    def kern_dma2(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = jnp.zeros((B, C), jnp.float32)
        out_ref[:] += acc + jnp.sum(lo_ref[0, :C]) + jnp.sum(hi_ref[0, :C])

    run("V5 dma-only", make(kern_dma2, [sp_rb, sp_lo, sp_hi, sp_w],
                            (rbb, feats8, feats8, w)))


if __name__ == "__main__":
    main()
