"""Bisect 3: which grouped-kernel construct kills the remote compile?"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, TG = 512, 32, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 8 * C).astype(np.float32)).astype(jnp.bfloat16)
    rb = jnp.asarray(rng.randint(-1, B, (TG, B)).astype(np.int32))
    eye = jnp.eye(B, dtype=jnp.bfloat16)

    def run(name, kern, specs, args, out_shape):
        try:
            f = jax.jit(lambda: pl.pallas_call(
                kern, grid=(4,),
                in_specs=specs,
                out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape)),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )())
            out = f()
            jax.block_until_ready(out)
            print(f"{name}: OK {float(out.ravel()[0]):.3f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    def run_args(name, kern, specs, args, out_shape):
        try:
            f = jax.jit(lambda: pl.pallas_call(
                kern, grid=(4,),
                in_specs=specs,
                out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape)),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )(*args))
            out = f()
            jax.block_until_ready(out)
            print(f"{name}: OK {float(out.ravel()[0]):.3f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    # A: eye-transpose matmul
    def ka(rb_ref, eye_ref, out_ref):
        idx = rb_ref[0:1, :]
        v = jnp.where(idx >= 0, idx % 8 + 1, 0).astype(jnp.bfloat16)
        v8 = jnp.broadcast_to(v, (8, B))
        col8 = jax.lax.dot_general(
            eye_ref[:], v8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = col8
    run_args("A eye-transpose", ka, [full, full], (rb, eye), (B, 8))

    # B: lane concat of 9 pieces
    def kb(x_ref, out_ref):
        cols = [x_ref[:, i * C:(i + 1) * C] for i in range(8)] + [
            x_ref[:, :C]]
        out_ref[:] = jnp.concatenate(
            [c.astype(jnp.bfloat16) for c in cols], axis=1
        ).astype(jnp.float32)
    run_args("B lane-concat9", kb, [full], (x,), (B, 9 * C))

    # C: sublane slice of (16, B) rb + compare
    def kc(rb_ref, out_ref):
        acc = jnp.zeros((B, 8), jnp.float32)
        for t in range(9):
            idx = rb_ref[t:t + 1, :]
            acc = acc + jnp.broadcast_to(
                (idx >= 0).astype(jnp.float32), (8, B)
            ).T[:, :8] * 0  # transpose? no — avoid; just reduce
        out_ref[:] = acc
    # C simplified: sum over sublane slices
    def kc2(rb_ref, out_ref):
        acc = jnp.zeros((1, B), jnp.float32)
        for t in range(9):
            acc = acc + rb_ref[t:t + 1, :].astype(jnp.float32)
        out_ref[:] = acc
    run_args("C sublane-slices", kc2, [full], (rb,), (1, B))

    # D: weights block (1, 9*C, C) style matmul
    w = jnp.asarray(rng.randn(1, 9 * C, C).astype(np.float32)).astype(
        jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, 9 * C).astype(np.float32)).astype(
        jnp.bfloat16)

    def kd(g_ref, w_ref, out_ref):
        out_ref[:] = jnp.dot(g_ref[:], w_ref[0],
                             preferred_element_type=jnp.float32)
    run_args("D grouped-weights-matmul", kd, [full, full], (g, w), (B, C))


if __name__ == "__main__":
    main()
