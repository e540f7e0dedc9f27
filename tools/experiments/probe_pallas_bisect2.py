"""Bisect 2: which grid-spec feature kills the remote Mosaic compile?"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, B, WB, C = 8192, 512, 1024, 32
    nb = N // B
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(N + WB, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w0 = jnp.asarray(rng.randint(0, N // WB, (nb,)).astype(np.int32))

    def run(name, make):
        try:
            out = jax.jit(make)()
            jax.block_until_ready(out)
            print(f"{name}: OK sum={float(jnp.sum(out.astype(jnp.float32))):.2f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    # A: plain GridSpec, static maps, revisit accumulate
    def a():
        def k(lo_ref, out_ref):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += lo_ref[:B, :].astype(jnp.float32)

        return pl.pallas_call(
            k,
            grid=(nb, 4),
            in_specs=[pl.BlockSpec((WB, C), lambda j, t: (j % (N // WB), 0))],
            out_specs=pl.BlockSpec((B, C), lambda j, t: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(feats)

    # B: PrefetchScalarGridSpec, static maps
    def b():
        def k(w0_ref, lo_ref, out_ref):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += lo_ref[:B, :].astype(jnp.float32)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, 4),
            in_specs=[pl.BlockSpec((WB, C), lambda j, t, w0: (j % (N // WB), 0))],
            out_specs=pl.BlockSpec((B, C), lambda j, t, w0: (j, 0)),
        )
        return pl.pallas_call(
            k, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(w0, feats)

    # C: PrefetchScalarGridSpec, data-dependent window map
    def c():
        def k(w0_ref, lo_ref, out_ref):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += lo_ref[:B, :].astype(jnp.float32)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, 4),
            in_specs=[pl.BlockSpec((WB, C), lambda j, t, w0: (w0[j], 0))],
            out_specs=pl.BlockSpec((B, C), lambda j, t, w0: (j, 0)),
        )
        return pl.pallas_call(
            k, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(w0, feats)

    # D: like C plus a 1-D int32 input block
    def d():
        rb = jnp.zeros((nb * 4 * B,), jnp.int32)

        def k(w0_ref, rb_ref, lo_ref, out_ref):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += lo_ref[:B, :].astype(jnp.float32) + (
                rb_ref[0].astype(jnp.float32)
            )

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, 4),
            in_specs=[
                pl.BlockSpec((B,), lambda j, t, w0: (t * nb + j,)),
                pl.BlockSpec((WB, C), lambda j, t, w0: (w0[j], 0)),
            ],
            out_specs=pl.BlockSpec((B, C), lambda j, t, w0: (j, 0)),
        )
        return pl.pallas_call(
            k, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(w0, rb, feats)

    run("A grid+static+revisit", a)
    run("B prefetch+static", b)
    run("C prefetch+dynamic-window", c)
    run("D +1d-int32-block", d)


if __name__ == "__main__":
    main()
