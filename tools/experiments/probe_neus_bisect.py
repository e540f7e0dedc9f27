"""Probe: bisect the ~94 ms (f+g) NeuS render at bench shapes.

Variants: full render; stop_gradient on the sdf spatial gradient (kills the
eikonal second-order term); field eval without the sampler round; trilinear
sampling alone. Shapes: volume (2, 128, 128, 128, 32), 256 rays/scene,
96+36 samples — the bench render workload.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit_scalar(c, *args, iters=6):
    out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ponderv2_tpu.models.ponder.render.surface_models import NeuSModel

    key = jax.random.PRNGKey(0)
    B, R = 2, 256
    volume = jax.random.normal(key, (B, 128, 128, 128, 32), jnp.float32)
    origins = jax.random.uniform(key, (B, R, 3), jnp.float32) * 0.4 + 0.3
    dirs = jax.random.normal(key, (B, R, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    model = NeuSModel(
        field=dict(hidden_dim=128, num_layers=2, geo_feat_dim=64,
                   semantic_dim=512, share_volume=False,
                   compute_dtype=jnp.bfloat16),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(type="NeuSSampler", num_samples=96,
                     num_samples_importance=36, num_upsample_steps=1),
        loss=dict(),
    )
    variables = model.init(key, volume, origins, dirs, train=False)

    def full(params, vol):
        out = model.apply({"params": params}, vol, origins, dirs, train=True,
                          rng=jax.random.PRNGKey(1))
        s = sum(jnp.sum(v.astype(jnp.float32) ** 2)
                for k, v in out.items()
                if k in ("rgb", "depth", "semantic", "gradients", "sdf"))
        return s

    def field_only(params, vol):
        # final field eval on uniform bins only: no sampler sdf round
        def m(mdl, vol, o, d):
            nears, fars = mdl._collider(o, d)
            u = jnp.linspace(0.0, 1.0, 133)
            bins = nears[..., None] + (fars - nears)[..., None] * u
            starts, ends = bins[..., :-1], bins[..., 1:]
            return mdl.sdf_field(vol, o, d, starts, ends)

        out = model.apply({"params": params}, vol, origins, dirs, method=m)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                   for k, v in out.items()
                   if k in ("rgb", "semantic", "gradients", "sdf"))

    def sample_only(params, vol):
        def m(mdl, vol, o, d):
            nears, fars = mdl._collider(o, d)
            u = jnp.linspace(0.0, 1.0, 133)
            bins = nears[..., None] + (fars - nears)[..., None] * u
            mid = 0.5 * (bins[..., :-1] + bins[..., 1:])
            pos = o[..., None, :] + d[..., None, :] * mid[..., None]
            return mdl.sdf_field.sample_features(vol, pos)

        out = model.apply({"params": params}, vol, origins, dirs, method=m)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    for name, fn in (("full", full), ("field_only", field_only),
                     ("sample_only", sample_only)):
        c = jax.jit(fn).lower(variables["params"], volume).compile()
        t = timeit_scalar(c, variables["params"], volume)
        cg = jax.jit(jax.grad(fn, argnums=(0, 1))).lower(
            variables["params"], volume).compile()
        tg = timeit_scalar(cg, variables["params"], volume)
        print(f"{name:12s} fwd {t:7.1f} ms   f+g {tg:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
