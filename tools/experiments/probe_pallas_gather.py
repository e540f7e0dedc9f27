"""Probe: does Mosaic/Pallas TPU support in-VMEM row gathers (jnp.take)?

Decides the implementation strategy for the fused gather-GEMM sparse-conv
kernel. Tries several gather formulations inside a kernel and reports which
compile and their timing vs the XLA baseline.
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, T = 16384, 128, 1024
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.randint(0, N, (N,))).astype(np.int32))

    idx3d = idx.reshape(N // T, 8, T // 8)  # (tiles, 8, 128): TPU-tileable

    def kernel_take(feat_ref, idx_ref, out_ref):
        rows = idx_ref[0].reshape(T)
        out_ref[:] = jnp.take(feat_ref[:], rows, axis=0)

    def run_take():
        return pl.pallas_call(
            kernel_take,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full feature table
                pl.BlockSpec((1, 8, T // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(feats, idx3d)

    try:
        out = jax.jit(run_take)()
        jax.block_until_ready(out)
        ok = np.allclose(np.asarray(out), np.asarray(feats)[np.asarray(idx)])
        t0 = time.perf_counter()
        for _ in range(50):
            out = jax.jit(run_take)()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"take-in-kernel: OK correct={ok} {dt*1e3:.3f} ms")
    except Exception as e:
        print(f"take-in-kernel: FAIL {type(e).__name__}: {str(e)[:300]}")

    # XLA baseline
    f = jax.jit(lambda feats, idx: feats[idx])
    out = f(feats, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(feats, idx)
    jax.block_until_ready(out)
    print(f"xla gather baseline: {(time.perf_counter()-t0)/50*1e3:.3f} ms")


def probe_full_length():
    """Permutation-style gather: indices length == table length (subm conv form)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C = 16384, 128
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.randint(0, N, (N,))).astype(np.int32))
    idx2d = idx.reshape(N // 128, 128)

    def kernel(feat_ref, idx_ref, out_ref):
        rows = idx_ref[:].reshape(N)
        gidx = jnp.broadcast_to(rows[:, None], (N, C))
        out_ref[:] = jnp.take_along_axis(feat_ref[:], gidx, axis=0)

    def run():
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(feats, idx2d)

    try:
        f = jax.jit(run)
        out = f()
        jax.block_until_ready(out)
        ok = np.array_equal(np.asarray(out), np.asarray(feats)[np.asarray(idx)])
        t0 = time.perf_counter()
        for _ in range(100):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 100
        gb = N * C * 4 * 2 / 1e9
        print(f"full-length take: OK correct={ok} {dt*1e3:.3f} ms "
              f"({gb/dt:.0f} GB/s effective)")
    except Exception as e:
        print(f"full-length take: FAIL {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
    probe_full_length()
