"""Probe: rulebook lookup cost — 1-D scalar gather from a 113M-cell table vs
row gather from a bitmap-word table (cells/32 rows of [prefix, w0, w1, pad]).

Also times the table builds themselves.
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    CELLS = 2 * 544 * 544 * 192  # bs2 bench geometry = 113.6M
    N = 204_800
    Q = 25 * N  # k5 stem column-lookup count
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, CELLS)
    queries = jax.random.randint(key, (Q,), 0, CELLS - 64)

    # -- current: int32 dense table, scalar gather
    def build_dense(keys):
        return jnp.zeros((CELLS,), jnp.int32).at[keys].set(1)

    def scalar_lookup(tab, q):
        return tab[q]

    tab = jax.jit(build_dense)(keys)
    print(f"dense build: {timeit(jax.jit(build_dense), keys):7.2f} ms", flush=True)
    print(f"scalar lookup 25N: {timeit(jax.jit(scalar_lookup), tab, queries):7.2f} ms",
          flush=True)

    # -- scalar gather but from a (CELLS/8, 8) reshaped table + lane select
    def row8_lookup(tab8, q):
        r = tab8[q >> 3]  # (Q, 8)
        lane = (q & 7)[:, None]
        return jnp.sum(jnp.where(jnp.arange(8)[None, :] == lane, r, 0), axis=1)

    tab8 = tab.reshape(-1, 8)
    print(f"row8 lookup 25N:   {timeit(jax.jit(row8_lookup), tab8, queries):7.2f} ms",
          flush=True)

    # -- bitmap table: (W, 4) int32 rows [prefix, w0, w1, 0]
    def build_bitmap(keys):
        W = CELLS // 32
        words = jnp.zeros((W + 2,), jnp.uint32).at[keys >> 5].add(
            jnp.uint32(1) << (keys & 31).astype(jnp.uint32)
        )
        pc = jax.lax.population_count(words[:W]).astype(jnp.int32)
        # exclusive cumsum (cheap at 3.5M)
        prefix = jnp.cumsum(pc) - pc
        fused = jnp.stack(
            [prefix, words[:W].astype(jnp.int32), words[1:W + 1].astype(jnp.int32),
             jnp.zeros_like(prefix)], axis=1)
        return fused

    def bitmap_lookup(fused, q):
        i = q >> 5
        s = (q & 31).astype(jnp.uint32)
        row = fused[i]  # (Q, 4)
        prefix, w0, w1 = row[:, 0], row[:, 1].astype(jnp.uint32), row[:, 2].astype(jnp.uint32)
        rank = prefix + jax.lax.population_count(
            w0 & ((jnp.uint32(1) << s) - 1)
        ).astype(jnp.int32)
        lo = w0 >> s
        hi = jnp.where(s > 24, w1 << (jnp.uint32(32) - s), jnp.uint32(0))
        occ8 = ((lo | hi) & 0xFF).astype(jnp.int32)
        return rank, occ8

    fused = jax.jit(build_bitmap)(keys)
    print(f"bitmap build: {timeit(jax.jit(build_bitmap), keys):7.2f} ms", flush=True)
    print(f"bitmap lookup 25N: {timeit(jax.jit(bitmap_lookup), fused, queries):7.2f} ms",
          flush=True)

    # sanity: rank should match dense-rank semantics
    dense_rank = jnp.cumsum(tab) - tab
    r, o = jax.jit(bitmap_lookup)(fused, queries[:1000])
    ref = dense_rank[queries[:1000]]
    print("rank exact:", bool(jnp.all(r == ref)), flush=True)


if __name__ == "__main__":
    main()
