"""Probe: split grid_sample_3d's 16.9 ms fwd (68k points, (2,128,128,128,32)
volume) into quad-operand construction vs gather vs index math; try a flat
linear-index gather variant.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(c, *args, iters=8):
    out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    B, C, X, Y, Z = 2, 128, 128, 128, 32
    M = 68096
    volume = jax.random.normal(key, (B, C, X, Y, Z), jnp.float32)
    pts = jax.random.uniform(key, (B, M, 3), jnp.float32)  # [0,1]

    # --- full grid_sample_3d (current path, bf16 compute like the field)
    from ponderv2_tpu.ops.interp import grid_sample_3d

    def full(vol, p):
        grid = p * 2.0 - 1.0
        v = jnp.transpose(vol.astype(jnp.bfloat16), (0, 1, 4, 3, 2))
        return jnp.sum(grid_sample_3d(v, grid, align_corners=True,
                                      smoothstep=True).astype(jnp.float32) ** 2)

    c = jax.jit(full).lower(volume, pts).compile()
    print(f"grid_sample_3d fwd        {timeit(c, volume, pts):7.2f} ms",
          flush=True)
    cg = jax.jit(jax.grad(full, argnums=(0,))).lower(volume, pts).compile()
    print(f"grid_sample_3d d/dvol     {timeit(cg, volume, pts):7.2f} ms",
          flush=True)

    # --- quad operand construction alone (moveaxis + 2x concat/roll)
    def quad_build(vol):
        vol_cl = jnp.moveaxis(vol.astype(jnp.bfloat16), 1, -1)
        vol2 = jnp.concatenate([vol_cl, jnp.roll(vol_cl, -1, axis=3)], -1)
        vol4 = jnp.concatenate([vol2, jnp.roll(vol2, -1, axis=2)], -1)
        return jnp.sum(vol4[..., ::64].astype(jnp.float32))

    cq = jax.jit(quad_build).lower(volume).compile()
    print(f"quad operand build        {timeit(cq, volume):7.2f} ms",
          flush=True)

    # --- gather given a PREBUILT quad operand, 3-D advanced indexing
    vol_cl = jnp.moveaxis(volume.astype(jnp.bfloat16), 1, -1)
    vol2 = jnp.concatenate([vol_cl, jnp.roll(vol_cl, -1, axis=3)], -1)
    vol4 = jnp.concatenate([vol2, jnp.roll(vol2, -1, axis=2)], -1)  # (B,X,Y,Z,4C) order irrelevant here
    iz = jax.random.randint(key, (B, 2 * M), 0, X - 1)
    iy = jax.random.randint(key, (B, 2 * M), 0, Y - 1)
    ix = jax.random.randint(key, (B, 2 * M), 0, Z - 1)

    def g3(v4, a, b_, c_):
        row = jax.vmap(lambda v, i, j, k: v[i, j, k])(v4, a, b_, c_)
        return jnp.sum(row.astype(jnp.float32) ** 2)

    c3 = jax.jit(g3).lower(vol4, iz, iy, ix).compile()
    print(f"2M gathers, 3-D index     {timeit(c3, vol4, iz, iy, ix):7.2f} ms",
          flush=True)

    # --- same gather with FLAT linear index
    vol4f = vol4.reshape(B, -1, vol4.shape[-1])
    lin = (iz * Y + iy) * Z + ix

    def gf(v4, li):
        row = jax.vmap(lambda v, i: v[i])(v4, li)
        return jnp.sum(row.astype(jnp.float32) ** 2)

    cf = jax.jit(gf).lower(vol4f, lin).compile()
    print(f"2M gathers, flat index    {timeit(cf, vol4f, lin):7.2f} ms",
          flush=True)

    # --- plain 8-gather variant (no quad): 8M narrow C-rows from vol_cl
    volf = vol_cl.reshape(B, -1, C)
    lin8 = jax.random.randint(key, (B, 8 * M), 0, X * Y * Z)
    c8 = jax.jit(gf).lower(volf, lin8).compile()
    print(f"8M gathers, flat C-rows   {timeit(c8, volf, lin8):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
