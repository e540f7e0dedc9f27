"""Probe: block-banded Pallas subm conv vs plain gather conv (wide k3 convs).

Bench-step context: the wide (cin > 64) k3 subm convs take the plain
gather path today (slab doubled-pack rows exceed the descriptor sweet
spot); this probe measures the band kernel against that path at each
U-Net level's real (N, C) shape, and checks exactness on-device.
"""

import sys, os, time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ponderv2_tpu.ops.sparse import make_sparse_tensor
from ponderv2_tpu.ops.spconv import (
    build_subm_rulebook, subm_conv_symmetric,
)
from ponderv2_tpu.ops.band_conv import (
    BLOCK, WINDOW, band_subm_conv, build_band_plan,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def scene(n_valid, cap, shape, batch, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.stack([
        rng.randint(0, batch, n_valid), rng.randint(0, shape[0], n_valid),
        rng.randint(0, shape[1], n_valid), rng.randint(0, shape[2], n_valid),
    ], 1)
    coords = np.unique(coords, axis=0).astype(np.int32)
    coords = np.concatenate(
        [coords, np.full((cap - len(coords), 4), -1, np.int32)])
    return coords


LEVELS = [
    # (shape, cap, n_valid, cin, cout)   bench bs2 level geometry
    ((544, 544, 192), 204_800, 170_000, 96, 96),    # dec level-0 blocks
    ((544, 544, 192), 204_800, 170_000, 128, 96),   # dec level-0 block0 (concat)
    ((272, 272, 96), 102_400, 95_000, 96, 96),      # level-1 dec
    ((136, 136, 48), 51_200, 48_000, 128, 128),     # level-2 enc/dec
    ((68, 68, 24), 25_600, 24_000, 256, 256),       # level-3 enc/dec
]


def main():
    batch = 2
    kernel = 3
    token = jnp.zeros((0,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    print(f"band BLOCK={BLOCK} WINDOW={WINDOW}", flush=True)

    for shape, cap, n_valid, cin, cout in LEVELS:
        coords = jnp.asarray(scene(n_valid, cap, shape, batch))
        feats = jax.random.normal(key, (cap, cin), jnp.float32)
        st = make_sparse_tensor(feats, coords, shape, batch)
        w = jax.random.normal(key, (kernel**3, cin, cout), jnp.float32) * 0.05

        rb = jax.jit(
            lambda c: build_subm_rulebook(c, shape, batch, kernel)
        )(coords)
        plan = jax.jit(lambda r: build_band_plan(r, kernel))(rb)
        ok = bool(plan.ok)
        cfg = (kernel, BLOCK, WINDOW)

        f_plain = jax.jit(
            lambda f, r, w: subm_conv_symmetric(f, r, w, st.mask, token))
        f_band = jax.jit(
            lambda f, pln, w: band_subm_conv(cfg, f, pln, w, st.mask, token))

        # exactness on-device (bf16 compute both paths)
        o_p = f_plain(feats, rb, w)
        o_b = f_band(feats, plan, w)
        err = float(jnp.max(jnp.abs(o_p - o_b)))
        scale = float(jnp.max(jnp.abs(o_p)))

        def g_plain(f, r, ww):
            return jnp.sum(subm_conv_symmetric(f, r, ww, st.mask, token) ** 2)

        def g_band(f, pln, ww):
            return jnp.sum(band_subm_conv(
                cfg, f, pln, ww, st.mask, token) ** 2)

        fb_plain = jax.jit(jax.grad(g_plain, argnums=(0, 2)))
        fb_band = jax.jit(jax.grad(g_band, argnums=(0, 2)))

        t_pf = timeit(f_plain, feats, rb, w)
        t_bf = timeit(f_band, feats, plan, w)
        t_pb = timeit(fb_plain, feats, rb, w, iters=10)
        t_bb = timeit(fb_band, feats, plan, w, iters=10)
        t_plan = timeit(
            jax.jit(lambda r: build_band_plan(r, kernel).w0), rb, iters=10)
        print(
            f"N={cap:6d} {cin:3d}->{cout:3d} ok={ok} err={err:.3e}/{scale:.2e}: "
            f"fwd plain {t_pf:6.2f} band {t_bf:6.2f} ({t_pf/t_bf:4.2f}x) | "
            f"fwd+bwd plain {t_pb:6.2f} band {t_bb:6.2f} ({t_pb/t_bb:4.2f}x) | "
            f"plan {t_plan:5.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
