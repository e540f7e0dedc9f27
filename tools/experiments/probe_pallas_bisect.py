"""Bisect the Mosaic compile failure of the windowed conv kernel."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("INTERP", "0") == "1"
    N, B, WB, C, K3 = 8192, 512, 1024, 32, 4
    nb = N // B
    rng = np.random.RandomState(0)
    rb = np.clip(
        np.sort(np.arange(N)[None, :].repeat(K3, 0)
                + rng.randint(-40, 40, (K3, N)), axis=1), 0, N - 1
    ).astype(np.int32)
    rb[rng.rand(K3, N) < 0.3] = -1
    rbb = jnp.asarray(rb.reshape(K3, nb, B))
    w0 = jnp.clip(
        jnp.min(jnp.where(rbb >= 0, rbb, 2**30), axis=2) // WB, 0,
        (N + WB) // WB - 2,
    )
    n_pad = (N // WB + 1) * WB
    feats = jnp.asarray(rng.randn(n_pad, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray((rng.randn(K3, C, C) * 0.05).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def variant(name, kernel_body):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, K3),
            in_specs=[
                pl.BlockSpec((B,), lambda j, t, w0: (t * nb + j,)),
                pl.BlockSpec((WB, C), lambda j, t, w0: (w0[t, j], 0)),
                pl.BlockSpec((WB, C), lambda j, t, w0: (w0[t, j] + 1, 0)),
                pl.BlockSpec((1, C, C), lambda j, t, w0: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, C), lambda j, t, w0: (j, 0)),
        )
        f = jax.jit(lambda: pl.pallas_call(
            kernel_body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
            interpret=interp,
        )(w0, rbb.reshape(-1), feats, feats, w))
        try:
            out = f()
            jax.block_until_ready(out)
            print(f"{name}: OK sum={float(jnp.sum(out)):.3f}")
            return out
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
            return None

    # v0: just zero + copy lo window head
    def k0(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += lo_ref[:B, :].astype(jnp.float32)

    # v1: one-hot lo only, no weights matmul
    def k1(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = pl.program_id(0)
        idx = rb_ref[:]
        base = w0_ref[t, j] * WB
        valid = (idx >= 0)[:, None]
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, WB), 1)
        local = (idx - base)[:, None]
        oh_lo = ((local == iota) & valid).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(oh_lo, lo_ref[:],
                              preferred_element_type=jnp.float32)

    # v2: full kernel
    def k2(w0_ref, rb_ref, lo_ref, hi_ref, w_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = pl.program_id(0)
        idx = rb_ref[:]
        base = w0_ref[t, j] * WB
        valid = (idx >= 0)[:, None]
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, WB), 1)
        local = (idx - base)[:, None]
        oh_lo = ((local == iota) & valid).astype(jnp.bfloat16)
        oh_hi = ((local - WB == iota) & valid).astype(jnp.bfloat16)
        g = jnp.dot(oh_lo, lo_ref[:], preferred_element_type=jnp.float32)
        g = g + jnp.dot(oh_hi, hi_ref[:], preferred_element_type=jnp.float32)
        out_ref[:] += jnp.dot(g.astype(jnp.bfloat16), w_ref[0],
                              preferred_element_type=jnp.float32)

    variant("v0 window-copy", k0)
    variant("v1 onehot-lo", k1)
    out = variant("v2 full", k2)

    if out is not None:
        # reference
        fc = feats[:N]
        ref = jnp.zeros((N, C), jnp.float32)
        for t in range(K3):
            idx = jnp.asarray(rb[t])
            gr = jnp.where((idx >= 0)[:, None],
                           feats[jnp.where(idx >= 0, idx, 0)], 0)
            ref = ref + jnp.dot(gr, w[t], preferred_element_type=jnp.float32)
        err = float(jnp.abs(ref - out).max() / (jnp.abs(ref).max() + 1e-9))
        print(f"v2 relerr vs plain: {err:.2e}")


if __name__ == "__main__":
    main()
