"""Probe: fused slab conv vs plain gather conv at bench layer shapes (v5e)."""

import sys, os, time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ponderv2_tpu.ops.sparse import make_sparse_tensor
from ponderv2_tpu.ops.spconv import (
    build_subm_plan, build_subm_rulebook, slab_pack, subm_conv_slab,
    subm_conv_symmetric,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def scene(n_valid, cap, shape, batch):
    rng = np.random.RandomState(0)
    coords = np.stack([
        rng.randint(0, batch, n_valid), rng.randint(0, shape[0], n_valid),
        rng.randint(0, shape[1], n_valid), rng.randint(0, shape[2], n_valid),
    ], 1)
    coords = np.unique(coords, axis=0).astype(np.int32)
    coords = np.concatenate(
        [coords, np.full((cap - len(coords), 4), -1, np.int32)])
    return coords


def main():
    batch = 2
    shape = (544, 544, 192)
    cap = 204_800
    coords = jnp.asarray(scene(170_000, cap, shape, batch))
    token = jnp.zeros((0,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    for kernel, cin, cout in ((3, 32, 32), (3, 96, 96), (5, 6, 32)):
        feats = jax.random.normal(key, (cap, cin), jnp.float32)
        st = make_sparse_tensor(feats, coords, shape, batch)
        w = jax.random.normal(key, (kernel**3, cin, cout), jnp.float32) * 0.05
        pack = slab_pack(kernel, cin)
        cfg = (kernel, kernel, kernel, pack)

        plan = jax.jit(
            lambda c: build_subm_plan(c, shape, batch, kernel)
        )(coords)
        rb = plan.legacy

        f_plain = jax.jit(
            lambda f, r, w: subm_conv_symmetric(f, r, w, st.mask, token))
        f_slab = jax.jit(
            lambda f, p_r0, p_sel, w: subm_conv_slab(
                cfg, f, p_r0, p_sel, w, st.mask, token))

        def g_plain(f, r, w):
            return jnp.sum(subm_conv_symmetric(f, r, w, st.mask, token) ** 2)

        def g_slab(f, p_r0, p_sel, w):
            return jnp.sum(
                subm_conv_slab(cfg, f, p_r0, p_sel, w, st.mask, token) ** 2)

        fb_plain = jax.jit(jax.grad(g_plain, argnums=(0, 2)))
        fb_slab = jax.jit(jax.grad(g_slab, argnums=(0, 3)))

        t_pf = timeit(f_plain, feats, rb, w)
        t_sf = timeit(f_slab, feats, plan.r0, plan.selp, w)
        t_pb = timeit(fb_plain, feats, rb, w, iters=10)
        t_sb = timeit(fb_slab, feats, plan.r0, plan.selp, w, iters=10)
        print(
            f"k{kernel} {cin}->{cout} pack{pack}: "
            f"fwd plain {t_pf:6.2f} slab {t_sf:6.2f} ({t_pf/t_sf:4.2f}x) | "
            f"fwd+bwd plain {t_pb:6.2f} slab {t_sb:6.2f} ({t_pb/t_sb:4.2f}x)",
            flush=True,
        )

    # rulebook builds: bitmap plan vs legacy builder
    for kernel in (3, 5):
        t_plan = timeit(
            jax.jit(lambda c: build_subm_plan(c, shape, batch, kernel).r0),
            coords, iters=10)
        t_legacy = timeit(
            jax.jit(lambda c: build_subm_rulebook(c, shape, batch, kernel)),
            coords, iters=10)
        print(f"k{kernel} rulebook: slab-plan {t_plan:6.2f} ms | "
              f"legacy {t_legacy:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
