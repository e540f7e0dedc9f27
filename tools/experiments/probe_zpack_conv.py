"""Probe: z-packed 3D conv prototype vs XLA's native 3D conv.

XLA's NDHWC 3D conv sustains 6-12% of MXU peak at the UNet3D-v1m2 bench
shapes (96->32 @ 13.1 ms for 174 GFLOP). Hypothesis: pack p z-slices into
channels and express the k3 z-mixing inside a 2D (3,3) conv with banded
block weights — 2x the nominal FLOPs at p=4 but full-lane, full-depth
MXU matmuls.

Also calibrates the chip's actual sustained matmul rate so conv
efficiency is judged against reality, not the datasheet.
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


def zpack_weights(w, p, cin, cout):
    """(3,3,3,Cin,Cout) -> (3,3,(p+2)Cin, p*Cout) banded block weights.

    Output z-slot zi consumes haloed input slots zi..zi+2 (halo offset -1),
    i.e. original dz in {-1,0,1} maps to halo slot zi + dz + 1."""
    W2 = np.zeros((3, 3, (p + 2) * cin, p * cout), w.dtype)
    for zi in range(p):
        for dz in range(3):
            W2[:, :, (zi + dz) * cin:(zi + dz + 1) * cin,
               zi * cout:(zi + 1) * cout] = w[:, :, dz]
    return jnp.asarray(W2)


def zpack_conv(x, w2, p):
    """x (B, X, Y, Z, C) NDHWC-ish; w2 from zpack_weights -> same layout out."""
    Bv, X, Y, Z, C = x.shape
    Zp = Z // p
    cout = w2.shape[-1] // p
    # halo: slots [g*p-1, g*p+p] per group -> pad z by 1 both sides
    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    # gather each group's p+2 slots: build (B, X, Y, Zp, (p+2)*C)
    idx = (jnp.arange(Zp)[:, None] * p + jnp.arange(p + 2)[None, :])  # halo'd
    xh = xpad[:, :, :, idx.reshape(-1), :].reshape(Bv, X, Y, Zp, (p + 2) * C)
    # 2D conv over (X, Y), Zp riding with batch
    xh = xh.transpose(0, 3, 1, 2, 4).reshape(Bv * Zp, X, Y, (p + 2) * C)
    y = jax.lax.conv_general_dilated(
        xh, w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(Bv, Zp, X, Y, p, cout).transpose(0, 2, 3, 1, 4, 5)
    return y.reshape(Bv, X, Y, Z, cout)


def main():
    key = jax.random.PRNGKey(0)

    # --- calibration: big matmul sustained rate
    a = jax.random.normal(key, (8192, 4096), jnp.bfloat16)
    bm = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    def mm(aa, bb):
        return jnp.sum(jnp.dot(aa, bb).astype(jnp.float32) ** 2)

    c = jax.jit(mm).lower(a, bm).compile()
    t = timeit(c, a, bm)
    gf = 2 * 8192 * 4096 * 4096 / 1e9
    print(f"calib matmul: {t:6.2f} ms = {gf / t:6.1f} TFLOP/s", flush=True)

    # --- plain vs packed conv at UNet3D shapes
    shapes = [
        ("L0 96->32", (2, 128, 128, 32, 96), 32),
        ("L0 32->128", (2, 128, 128, 32, 32), 128),
        ("L1 32->64", (2, 64, 64, 16, 32), 64),
    ]
    for name, xs, cout in shapes:
        cin = xs[-1]
        x = jax.random.normal(key, xs, jnp.bfloat16)
        w = (np.random.RandomState(0).randn(3, 3, 3, cin, cout)
             .astype(np.float32) * 0.05).astype(jnp.bfloat16)
        wj = jnp.asarray(w)

        def plain(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        p = 4
        w2 = zpack_weights(np.asarray(w, np.float32).astype(np.float32), p,
                           cin, cout).astype(jnp.bfloat16)

        # numerics check
        y0 = np.asarray(jax.jit(plain)(x, wj), np.float32)
        y1 = np.asarray(jax.jit(
            lambda xx, ww: zpack_conv(xx, ww, p))(x, w2), np.float32)
        err = np.abs(y0 - y1).max() / max(np.abs(y0).max(), 1e-9)
        print(f"{name}: zpack rel err {err:.2e}", flush=True)

        f0 = jax.jit(lambda xx, ww: jnp.sum(
            plain(xx, ww).astype(jnp.float32) ** 2))
        f1 = jax.jit(lambda xx, ww: jnp.sum(
            zpack_conv(xx, ww, p).astype(jnp.float32) ** 2))
        c0 = f0.lower(x, wj).compile()
        c1 = f1.lower(x, w2).compile()
        g0 = jax.jit(jax.grad(f0, argnums=(0, 1))).lower(x, wj).compile()
        g1 = jax.jit(jax.grad(f1, argnums=(0, 1))).lower(x, w2).compile()
        gflop = 2 * np.prod(xs[:-1]) * 27 * cin * cout / 1e9
        t0 = timeit(c0, x, wj)
        t1 = timeit(c1, x, w2)
        t0g = timeit(g0, x, wj)
        t1g = timeit(g1, x, w2)
        print(f"{name} ({gflop:5.0f} GF): plain fwd {t0:6.2f} f+g {t0g:6.2f}"
              f" | zpack fwd {t1:6.2f} f+g {t1g:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
