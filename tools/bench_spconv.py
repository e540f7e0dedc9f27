"""Sparse-conv microbenchmark: realistic surface-scene rulebooks on the current
device. Used to choose the apply_sparse_conv variant and track kernel perf.

Usage: python tools/bench_spconv.py [--n 98304]
"""

import argparse
import time
from functools import partial

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=98304)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ponderv2_tpu.ops.sparse import unique_voxels
    from ponderv2_tpu.ops.spconv import apply_sparse_conv, build_subm_rulebook

    rng = np.random.RandomState(0)
    SHAPE = (512, 512, 128)
    N = args.n

    # surface-like scene: near-planar 2D manifold => realistic tap locality
    m = N * 2
    xy = rng.rand(m, 2) * (np.array(SHAPE[:2]) - 1)
    z = np.sin(xy[:, 0] / 30) * 20 + np.cos(xy[:, 1] / 40) * 15 + 40 + rng.randn(m) * 2
    coords = np.concatenate([np.zeros((m, 1)), xy, z[:, None]], 1).astype(np.int32)
    coords = np.clip(coords, [0, 0, 0, 0],
                     [0, SHAPE[0] - 1, SHAPE[1] - 1, SHAPE[2] - 1])

    @jax.jit
    def build(coords):
        uc, _, _ = unique_voxels(coords, SHAPE, 1, N)
        return uc, build_subm_rulebook(uc, SHAPE, 1, 3)

    t0 = time.perf_counter()
    uc, rb = build(jnp.asarray(coords))
    jax.block_until_ready(rb)
    t1 = time.perf_counter()
    rb2 = build(jnp.asarray(coords))[1]
    jax.block_until_ready(rb2)
    t2 = time.perf_counter()
    print(f"devices: {jax.devices()}")
    print(f"rulebook build: compile+run {t1 - t0:.2f}s, steady {t2 - t1:.3f}s; "
          f"valid tap frac {float((np.asarray(rb) >= 0).mean()):.3f}")

    def bench(cin, cout, dtype, variant):
        feats = jnp.asarray(rng.randn(N, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        mask = jnp.ones((N,), bool)
        f = jax.jit(partial(apply_sparse_conv, precision_dtype=dtype,
                            variant=variant))
        out = f(feats, rb, w, mask)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(feats, rb, w, mask)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{cin}->{cout} {variant} {'bf16' if dtype else 'f32'}: "
              f"{dt * 1e3:.2f} ms, {2 * 27 * N * cin * cout / dt / 1e12:.2f} TFLOP/s")

    for variant in ("batched", "loop"):
        for cin, cout in ((32, 32), (96, 96)):
            bench(cin, cout, jnp.bfloat16, variant)


if __name__ == "__main__":
    main()
