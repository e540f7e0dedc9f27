"""Probe: band conv at NARROW channels (32/64) vs the slab path, real
bench coords. Round 3 only measured band at >=96ch; L0/L1 slab convs are
now the biggest backbone slice (27.4 / 14.9 ms f+g x 10 convs)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def timeit(c, *args, iters=8):
    out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ponderv2_tpu.ops.band_conv import (
        BLOCK, WINDOW, band_subm_conv, build_band_plan,
    )
    from ponderv2_tpu.ops.sparse import make_sparse_tensor, sort_by_key
    from ponderv2_tpu.ops.spconv import (
        build_subm_plan, build_subm_rulebook, slab_pack, subm_conv_slab,
    )

    arrays = B.build_workload(2, 100000)
    g = np.asarray(arrays["grid_coord"])
    b = np.asarray(arrays["batch"])
    live = b >= 0
    spatial0 = np.array([544, 544, 192])
    token = jnp.zeros((0,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    for l, cin, cap in ((0, 32, 204800), (1, 64, 102400)):
        c = np.unique(np.concatenate(
            [b[live, None], g[live] >> l], axis=1), axis=0).astype(np.int32)
        c = c[:cap]
        n = len(c)
        c = np.concatenate([c, np.full((cap - n, 4), -1, np.int32)])
        shape = tuple(spatial0 >> l)
        feats = jax.random.normal(key, (cap, cin), jnp.float32)
        st = make_sparse_tensor(feats, jnp.asarray(c), shape, 2)
        st, _ = sort_by_key(st)
        w = jax.random.normal(key, (27, cin, cin), jnp.float32) * 0.05

        rb = jax.jit(lambda cc: build_subm_rulebook(cc, shape, 2, 3))(
            st.coords)
        plan = jax.jit(lambda r: build_band_plan(r, 3))(rb)
        print(f"L{l} {cin}ch n={n}: band ok={bool(plan.ok)} "
              f"ovf={int((plan.ov_i >= 0).sum())}", flush=True)
        cfg = (3, BLOCK, WINDOW)
        fb = jax.jit(lambda x, ww: band_subm_conv(
            cfg, x, plan, ww, st.mask, token))
        fbg = jax.jit(jax.grad(
            lambda x, ww: jnp.sum(fb(x, ww).astype(jnp.float32) ** 2),
            argnums=(0, 1)))

        sp = jax.jit(lambda cc: build_subm_plan(cc, shape, 2, 3))(st.coords)
        cfgs = (3, 3, 3, slab_pack(3, cin))
        fs = jax.jit(lambda x, ww: subm_conv_slab(
            cfgs, x, sp.r0, sp.selp, ww, st.mask, token))
        fsg = jax.jit(jax.grad(
            lambda x, ww: jnp.sum(fs(x, ww).astype(jnp.float32) ** 2),
            argnums=(0, 1)))

        # numerics cross-check before timing
        ob = np.asarray(fb(st.features, w), np.float32)
        os_ = np.asarray(fs(st.features, w), np.float32)
        err = np.abs(ob - os_).max() / max(np.abs(os_).max(), 1e-9)
        print(f"  band vs slab rel err {err:.2e}", flush=True)

        print(f"  band fwd {timeit(fb, st.features, w):6.2f}  "
              f"f+g {timeit(fbg, st.features, w):6.2f} ms", flush=True)
        print(f"  slab fwd {timeit(fs, st.features, w):6.2f}  "
              f"f+g {timeit(fsg, st.features, w):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
