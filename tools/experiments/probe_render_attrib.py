"""Probe: split the post-backbone 218 ms (f+g) into volume scatter,
UNet3D projection, ray sampling, and NeuS render+losses on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def timeit_scalar(c, *args, iters=6):
    out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ponderv2_tpu.models import build_model

    batch_size = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(batch_size, 100000)
    static_ctx = dict(spatial_shape=(544, 544, 192), batch_size=batch_size)
    model = build_model(B.build_model_cfg())
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, a: model.init(r, {**a, **static_ctx, "rng": r}, train=False)
    )(rng, arrays)
    vars_all = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "constants": variables.get("constants", {})}

    # fixed backbone output
    from ponderv2_tpu.models.default import batch_to_sparse_tensor
    from ponderv2_tpu.ops.sparse import sort_by_key

    def backbone_fn(params, a):
        def m(mdl, inp):
            st = batch_to_sparse_tensor(inp)
            st_s, inv = sort_by_key(st)
            return mdl.backbone_net(st_s, train=True)[inv]

        out, _ = model.apply({**vars_all, "params": params},
                             {**a, **static_ctx}, method=m,
                             mutable=["batch_stats"])
        return out

    feat = jax.block_until_ready(jax.jit(backbone_fn)(
        variables["params"], arrays))

    def part(which):
        def m(mdl, sparse_feat, inp):
            coord = inp["coord"].astype(jnp.float32)
            bt = inp["batch"]
            Bsz = int(inp["batch_size"])
            loc, scale, z_shift = mdl._unit_cube_params(coord, bt, Bsz)
            p_norm = mdl._normalize_points(coord, bt, loc, scale, z_shift)
            volume = mdl._build_volume(sparse_feat, p_norm, bt, Bsz)
            if which == "volume":
                return jnp.sum(volume.astype(jnp.float32) ** 2)
            volume = mdl.proj_net(volume, train=True)
            if which == "proj":
                return jnp.sum(volume.astype(jnp.float32) ** 2)
            ray_dict = mdl._sample_rays(
                inp, loc, scale, z_shift, inp["rng"], True)
            pad = 1.0 + mdl.padding
            ray_o = (ray_dict["ray_o"] / pad) + 0.5
            if which == "rays":
                return jnp.sum(ray_o ** 2) + jnp.sum(ray_dict["ray_d"] ** 2)
            out = mdl.render_model(volume, ray_o, ray_dict["ray_d"],
                                   train=True, rng=inp["rng"])
            emb = (mdl.class_embedding.value
                   if hasattr(mdl, "class_embedding") else None)
            losses = mdl.render_model.get_loss(out, ray_dict, emb)
            return losses["render_loss"]

        def fn(params, f, a):
            out, _ = model.apply(
                {**vars_all, "params": params}, f,
                {**a, **static_ctx, "rng": rng}, method=m,
                mutable=["batch_stats"])
            return jnp.asarray(out, jnp.float32)

        return fn

    prev = 0.0
    prev_g = 0.0
    for which in ("volume", "proj", "rays", "render"):
        fn = part(which)
        c = jax.jit(fn).lower(variables["params"], feat, arrays).compile()
        t = timeit_scalar(c, variables["params"], feat, arrays)
        cg = jax.jit(jax.grad(fn, argnums=(0, 1))).lower(
            variables["params"], feat, arrays).compile()
        tg = timeit_scalar(cg, variables["params"], feat, arrays)
        print(f"{which:8s} cumulative fwd {t:7.1f} ms (+{t - prev:6.1f})   "
              f"f+g {tg:7.1f} ms (+{tg - prev_g:6.1f})", flush=True)
        prev, prev_g = t, tg


if __name__ == "__main__":
    main()
