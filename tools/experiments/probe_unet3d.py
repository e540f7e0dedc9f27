"""Probe: UNet3D-v1m2 projection net cost decomposition on the real chip.

The render attribution showed proj f+g ~95 ms at bench shapes while the
conv arithmetic is ~1.9 TFLOP f+g (~13 ms at 150 TFLOP/s) — find the
slice: full net fwd / f+g, the stem conv alone, encoder only, and a
channels-last conv microbench at the L0 shape.
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
    from ponderv2_tpu.models import build_model

    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (2, 96, 128, 128, 32), jnp.float32)

    model = build_model(dict(
        type="UNet3D-v1m2", in_channels=96, out_channels=128,
        f_maps=32, num_levels=4, compute_dtype=jnp.bfloat16))
    variables = model.init(key, vol, train=False)

    def fwd(params, v):
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            v, train=True, mutable=["batch_stats"])
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32) ** 2)

    c = jax.jit(fwd).lower(variables["params"], vol).compile()
    print(f"unet3d fwd      {timeit_scalar(c, variables['params'], vol):7.1f} ms",
          flush=True)
    cg = jax.jit(jax.grad(fwd, argnums=(0, 1))).lower(
        variables["params"], vol).compile()
    print(f"unet3d f+g      {timeit_scalar(cg, variables['params'], vol):7.1f} ms",
          flush=True)

    # channels-last raw conv microbench at the L0 shape (what XLA should hit)
    x = jax.random.normal(key, (2, 128, 128, 32, 96), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 96, 32), jnp.bfloat16)

    def raw(xx, ww):
        return jnp.sum(jax.lax.conv_general_dilated(
            xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16), (1, 1, 1),
            "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ).astype(jnp.float32) ** 2)

    c2 = jax.jit(raw).lower(x, w).compile()
    print(f"raw conv L0 96->32 fwd {timeit_scalar(c2, x, w):7.1f} ms "
          f"(174 GFLOP)", flush=True)
    c2g = jax.jit(jax.grad(raw, argnums=(0, 1))).lower(x, w).compile()
    print(f"raw conv L0 96->32 f+g {timeit_scalar(c2g, x, w):7.1f} ms",
          flush=True)

    # the final 32->128 full-res conv
    x3 = jax.random.normal(key, (2, 128, 128, 32, 32), jnp.bfloat16)
    w3 = jax.random.normal(key, (3, 3, 3, 32, 128), jnp.bfloat16)
    c3 = jax.jit(raw).lower(x3, w3).compile()
    print(f"raw conv L0 32->128 fwd {timeit_scalar(c3, x3, w3):7.1f} ms "
          f"(232 GFLOP)", flush=True)

    # transposed conv 64->32 at L0 (decoder top, 116 GFLOP)
    xt = jax.random.normal(key, (2, 64, 64, 16, 64), jnp.bfloat16)
    wt = jax.random.normal(key, (3, 3, 3, 64, 32), jnp.bfloat16)

    def rawt(xx, ww):
        return jnp.sum(jax.lax.conv_transpose(
            xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16), (2, 2, 2),
            [(1, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ).astype(jnp.float32) ** 2)

    ct = jax.jit(rawt).lower(xt, wt).compile()
    print(f"raw convT 64->32 fwd {timeit_scalar(ct, xt, wt):7.1f} ms",
          flush=True)
    ctg = jax.jit(jax.grad(rawt, argnums=(0, 1))).lower(xt, wt).compile()
    print(f"raw convT 64->32 f+g {timeit_scalar(ctg, xt, wt):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
