"""Probe: per-level, per-conv-kind attribution of the SpUNet backbone at
bench shapes on the real chip, using the bench scenes' own voxel coords
(downsampled per level as the strided convs would).

For each level: subm k3 conv through the model's chosen path (band / slab /
plain), the k2s2 strided conv, and the k2 inverse conv — fwd and fwd+grad.
Plus the plan/rulebook build costs. Prints one table; pick the biggest
slice before writing any kernel.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def timeit(c, *args, iters=8):
    out = c(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    # value-fetch to defeat tunnel async
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ponderv2_tpu.ops.band_conv import (
        BLOCK, WINDOW, band_eligible, band_subm_conv, build_band_plan,
    )
    from ponderv2_tpu.ops.sparse import make_sparse_tensor, sort_by_key
    from ponderv2_tpu.ops.spconv import (
        build_inverse_rulebook, build_strided_plan, build_subm_plan,
        build_subm_rulebook, slab_pack, subm_conv_slab, subm_conv_symmetric,
        sparse_conv_gathered,
    )

    arrays = B.build_workload(2, 100000)
    g = np.asarray(arrays["grid_coord"])
    b = np.asarray(arrays["batch"])
    live = b >= 0
    spatial0 = np.array([544, 544, 192])

    chans = [32, 64, 128, 256]
    caps = [204800, 102400, 51200, 25600]
    token = jnp.zeros((0,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    # per-level coords: level l voxels = unique(grid // 2^l) (strided conv
    # output coords ARE this, recursively)
    levels = []
    for l in range(4):
        c = np.unique(
            np.concatenate([b[live, None], g[live] >> l], axis=1), axis=0
        ).astype(np.int32)
        cap = caps[l]
        c = c[:cap]
        n = len(c)
        c = np.concatenate([c, np.full((cap - n, 4), -1, np.int32)])
        levels.append((jnp.asarray(c), tuple(spatial0 >> l), n))
        print(f"level {l}: n={n} cap={cap} ch={chans[l]}", flush=True)

    print("\n=== subm k3 convs (model path) ===", flush=True)
    for l, (coords, shape, n) in enumerate(levels):
        cin = cout = chans[l]
        feats = jax.random.normal(key, (caps[l], cin), jnp.float32)
        st = make_sparse_tensor(feats, coords, shape, 2)
        st, _ = sort_by_key(st)
        if band_eligible(cin, cout, 3):
            rb = jax.jit(lambda c: build_subm_rulebook(c, shape, 2, 3))(
                st.coords)
            plan = jax.jit(lambda r: build_band_plan(r, 3))(rb)
            cfg = (3, BLOCK, WINDOW)
            f = jax.jit(lambda x, w: band_subm_conv(
                cfg, x, plan, w, st.mask, token))
            kind = "band"
        else:
            sp = jax.jit(lambda c: build_subm_plan(c, shape, 2, 3))(st.coords)
            cfgs = (3, 3, 3, slab_pack(3, cin))
            f = jax.jit(lambda x, w: subm_conv_slab(
                cfgs, x, sp.r0, sp.selp, w, st.mask, token))
            kind = "slab"
        w = jax.random.normal(key, (27, cin, cout), jnp.float32) * 0.05
        fg = jax.jit(jax.grad(
            lambda x, ww: jnp.sum(f(x, ww).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        t_f = timeit(f, st.features, w)
        t_fg = timeit(fg, st.features, w)
        print(f"L{l} {kind} {cin}ch n={n}: fwd {t_f:6.2f} ms  f+g {t_fg:6.2f} ms",
              flush=True)

    print("\n=== strided k2s2 convs (plain gather path) ===", flush=True)
    for l in range(3):
        coords, shape, n = levels[l]
        cin, cout = chans[l], chans[l + 1]
        feats = jax.random.normal(key, (caps[l], cin), jnp.float32)
        st = make_sparse_tensor(feats, coords, shape, 2)
        st, _ = sort_by_key(st)
        plan = jax.jit(lambda c: build_strided_plan(
            c, shape, 2, 2, 2, 0, caps[l + 1]))(st.coords)
        mask = plan.out_coords[:, 0] >= 0
        w = jax.random.normal(key, (8, cin, cout), jnp.float32) * 0.05
        f = jax.jit(lambda x, ww: sparse_conv_gathered(
            x, plan.rulebook, ww, mask, token))
        fg = jax.jit(jax.grad(
            lambda x, ww: jnp.sum(f(x, ww).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        t_plan = timeit(
            jax.jit(lambda c: build_strided_plan(
                c, shape, 2, 2, 2, 0, caps[l + 1])), st.coords, iters=4)
        t_f = timeit(f, st.features, w)
        t_fg = timeit(fg, st.features, w)
        print(f"L{l}->L{l+1} {cin}->{cout}ch n={n}: plan {t_plan:6.2f} "
              f"fwd {t_f:6.2f}  f+g {t_fg:6.2f} ms", flush=True)

    print("\n=== inverse k2 convs (plain gather path) ===", flush=True)
    for l in range(3):
        coarse, cshape, nc = levels[l + 1]
        fine, fshape, nf = levels[l]
        cin, cout = chans[l + 1], chans[l]
        feats = jax.random.normal(key, (caps[l + 1], cin), jnp.float32)
        stc = make_sparse_tensor(feats, coarse, cshape, 2)
        stc, _ = sort_by_key(stc)
        stf = make_sparse_tensor(
            jnp.zeros((caps[l], 1)), fine, fshape, 2)
        stf, _ = sort_by_key(stf)
        rb = jax.jit(lambda c, fc: build_inverse_rulebook(
            c, cshape, 2, fc, 2, 2, 0))(stc.coords, stf.coords)
        mask = stf.coords[:, 0] >= 0
        w = jax.random.normal(key, (8, cin, cout), jnp.float32) * 0.05
        f = jax.jit(lambda x, ww: sparse_conv_gathered(
            x, rb, ww, mask, token))
        fg = jax.jit(jax.grad(
            lambda x, ww: jnp.sum(f(x, ww).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        t_rb = timeit(
            jax.jit(lambda c, fc: build_inverse_rulebook(
                c, cshape, 2, fc, 2, 2, 0)), stc.coords, stf.coords, iters=4)
        t_f = timeit(f, stc.features, w)
        t_fg = timeit(fg, stc.features, w)
        print(f"L{l+1}->L{l} {cin}->{cout}ch nf={nf}: rb {t_rb:6.2f} "
              f"fwd {t_f:6.2f}  f+g {t_fg:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
