"""Probe: per-dispatch floor of the remote-TPU tunnel, and matmul rate vs
size — calibrates every other probe (a ~6 ms fixed cost would inflate all
small-op measurements and misdirect optimization)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(c, *args, iters=16):
    out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 128), jnp.float32)
    c0 = jax.jit(lambda a: jnp.sum(a * 1.0001)).lower(x).compile()
    print(f"tiny op         {timeit(c0, x):7.3f} ms  (dispatch floor)",
          flush=True)

    for n in (1024, 2048, 4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        c = jax.jit(
            lambda u, v: jnp.sum(jnp.dot(u, v).astype(jnp.float32) ** 2)
        ).lower(a, b).compile()
        t = timeit(c, a, b)
        gf = 2 * n ** 3 / 1e9
        print(f"matmul {n}x{n}: {t:7.3f} ms = {gf / t:6.1f} TFLOP/s "
              f"({gf:5.0f} GF)", flush=True)

    # chained matmuls in ONE call: amortizes any per-call cost
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    def chain(u, v):
        acc = u
        for _ in range(8):
            acc = jnp.dot(acc, v)
        return jnp.sum(acc.astype(jnp.float32) ** 2)

    c = jax.jit(chain).lower(a, b).compile()
    t = timeit(c, a, b)
    gf = 8 * 2 * 4096 ** 3 / 1e9
    print(f"8-chained 4096 matmuls: {t:7.3f} ms = {gf / t:6.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
