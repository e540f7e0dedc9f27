"""Probe: TPU gather cost model for sparse-conv feature gathers.

Questions (round-3 perf lever):
1. Is the row gather tile-read-bound? (feats (N,C) bf16 stored as (8,128)
   tiles; if gathering a row reads its whole tile, time is flat in C<=128
   and proportional to descriptor count only.)
2. Does a packed-row gather (operand reshaped (N/8, 8C): one descriptor
   fetches 8 consecutive voxel rows lane-dense) cost the same per descriptor?
   If yes, fetching z-run slabs via 2 packed descriptors per tap-column
   replaces kz row descriptors per column.
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    N = 204_800
    key = jax.random.PRNGKey(0)
    M = 27 * N  # k3-conv descriptor count

    print("== row gather: time vs C (fixed 27N descriptors) ==", flush=True)
    for C in (8, 32, 64, 128, 256):
        feats = jax.random.normal(key, (N, C), jnp.bfloat16)
        idx = jax.random.randint(key, (M,), 0, N)
        t = timeit(jax.jit(lambda f, i: f[i]), feats, idx)
        gb = M * C * 2 / 1e9
        print(f"  C={C:4d}: {t:7.2f} ms  useful {gb/t*1e3:6.1f} GB/s", flush=True)

    print("== row gather: time vs descriptor count (C=32) ==", flush=True)
    feats = jax.random.normal(key, (N, 32), jnp.bfloat16)
    for mult in (9, 18, 27):
        idx = jax.random.randint(key, (mult * N,), 0, N)
        t = timeit(jax.jit(lambda f, i: f[i]), feats, idx)
        print(f"  {mult}N desc: {t:7.2f} ms ({mult*N/t/1e3:8.0f}k desc/ms)",
              flush=True)

    print("== packed-row gather: (N/8, 8C) operand, C=32 ==", flush=True)
    # one descriptor fetches 8 consecutive voxel rows, lane-dense (256 lanes)
    fp = jax.random.normal(key, (N // 8, 8 * 32), jnp.bfloat16)
    for mult in (9, 18, 27):
        idx = jax.random.randint(key, (mult * N,), 0, N // 8)
        t = timeit(jax.jit(lambda f, i: f[i]), fp, idx)
        print(f"  {mult}N desc x 8rows: {t:7.2f} ms "
              f"({mult*N/t/1e3:8.0f}k desc/ms)", flush=True)

    print("== random vs sorted(local) indices, C=32, 27N ==", flush=True)
    idx_r = jax.random.randint(key, (M,), 0, N)
    idx_s = jnp.sort(idx_r)
    # 'local': index stream roughly follows the output position (conv-like)
    base = (jnp.arange(M, dtype=jnp.int32) // 27)
    jit_g = jax.jit(lambda f, i: f[i])
    idx_l = jnp.clip(base + jax.random.randint(key, (M,), -64, 64), 0, N - 1)
    print(f"  random: {timeit(jit_g, feats, idx_r):7.2f} ms | "
          f"sorted: {timeit(jit_g, feats, idx_s):7.2f} ms | "
          f"local:  {timeit(jit_g, feats, idx_l):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
