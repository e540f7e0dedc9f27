"""Microbench: subm rulebook build (dense z-run path) at bench shapes."""

import os
import sys
import time

import numpy as np

# NOTE: setting PYTHONPATH breaks the axon TPU plugin registration in this
# image; tools add the repo root to sys.path themselves instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ponderv2_tpu.ops.spconv import build_subm_rulebook

    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    batch, shape = 2, (544, 544, 192)
    n = 204800
    # surface-like coords: cluster z around a few planes per (x, y)
    coords = np.stack(
        [
            rng.randint(0, batch, n),
            rng.randint(0, 500, n),
            rng.randint(0, 500, n),
            (rng.randint(0, 60, n) + rng.randint(0, 4, n) * 40),
        ],
        axis=1,
    ).astype(np.int32)
    coords = np.unique(coords, axis=0)
    pad = n - len(coords)
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    coords = jnp.asarray(coords)

    for kernel in (3, 5):
        f = jax.jit(
            lambda c, k=kernel: build_subm_rulebook(c, shape, batch, k)
        )
        out = f(coords)
        jax.block_until_ready(out)
        # index ON DEVICE: np.asarray(out) would fetch the whole rulebook
        # (100+ MB) through the tunnel and dominate the timing
        float(out[0, 0])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = f(coords)
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"k{kernel} subm rulebook @ {len(coords)}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
