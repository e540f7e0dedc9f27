"""Probe: Pallas windowed gather-GEMM conv kernels vs plain XLA gather."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=30):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    # device-indexed scalar fetch: np.asarray would drag the full output
    # through the tunnel and dominate the timing
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_monotone_rulebook(n, k3, rng, miss=0.3, group=9):
    # group-coherent shifts, like real rulebooks: taps within a leading
    # offset group differ by a few rows (y/z ravel steps), groups by a lot
    rbs = []
    for t in range(k3):
        shift = rng.randint(-600, 600) if t % group == 0 else shift
        idx = np.arange(n) + shift + t % group * 3 + rng.randint(-8, 8, n)
        idx = np.clip(np.sort(idx), 0, n - 1)
        invalid = rng.rand(n) < miss
        rbs.append(np.where(invalid, -1, idx))
    return np.stack(rbs).astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from ponderv2_tpu.ops.pallas_gather import (
        pad_features, padded_rows, prepare_geometry, windowed_conv_dw,
        windowed_conv_fwd,
    )

    print(f"devices: {jax.devices()} backend={jax.default_backend()}")
    N = 163840
    B, WB = 512, 1024
    rng = np.random.RandomState(0)

    only = os.environ.get("PROBE_ONLY")
    skip_dw = os.environ.get("PROBE_SKIP_DW", "0") == "1"
    for k3, cin, cout, group in [(27, 32, 32, 9), (27, 96, 96, 9),
                                 (125, 8, 32, 25)]:
        if only and str(k3) + "-" + str(cin) != only:
            continue
        group = int(os.environ.get("PROBE_GROUP", group))
        rb = jnp.asarray(make_monotone_rulebook(N, k3, rng, group=group))
        feats = jnp.asarray(rng.randn(N, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k3, cin, cout).astype(np.float32) * 0.05)

        def plain(feats, rb, w):
            fc = feats.astype(jnp.bfloat16)
            out = jnp.zeros((N, cout), jnp.float32)
            for t in range(k3):
                idx = rb[t]
                g = jnp.where((idx >= 0)[:, None],
                              fc[jnp.where(idx >= 0, idx, 0)], 0)
                out = out + jnp.dot(g, w[t].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            return out

        geom0 = jax.jit(
            lambda rb: prepare_geometry(rb, N, B, WB, group)
        )(rb)

        def pallas_fwd(feats, geom, w):
            f8 = pad_features(feats, padded_rows(N, WB), jnp.bfloat16)
            out = windowed_conv_fwd(f8, geom, w.astype(jnp.bfloat16), WB, group)
            return out[:N], geom.covered

        def pallas_dw(feats, geom, g):
            f8 = pad_features(feats, padded_rows(N, WB), jnp.bfloat16)
            nb = geom.rbb.shape[1]
            gc = jnp.pad(g.astype(jnp.bfloat16),
                         ((0, nb * geom.rbb.shape[3] - N), (0, 0)))
            return windowed_conv_dw(f8, geom, gc, WB, group)
        tgeo = timeit(
            jax.jit(lambda rb: prepare_geometry(rb, N, B, WB, group)), rb)
        print(f"k3={k3}: geometry prep {tgeo*1e3:.2f} ms")

        fp = jax.jit(plain)
        fw = jax.jit(pallas_fwd)
        try:
            op = fp(feats, rb, w)
            ow, cov = fw(feats, geom0, w)
            err = float(jnp.abs(op - ow).max() / (jnp.abs(op).max() + 1e-9))
            tp = timeit(fp, feats, rb, w)
            tw = timeit(fw, feats, geom0, w)
            print(f"k3={k3} c={cin}->{cout}: plain {tp*1e3:.2f} ms | "
                  f"pallas {tw*1e3:.2f} ms ({tp/tw:.2f}x) relerr={err:.2e} "
                  f"covered={bool(cov)}")
        except Exception as e:
            print(f"k3={k3} c={cin}->{cout}: FWD FAIL "
                  f"{type(e).__name__}: {str(e)[:300]}")
            continue

        # dW
        if skip_dw:
            continue
        g = jnp.asarray(rng.randn(N, cout).astype(np.float32))
        def dw_ref(feats, rb, g):
            fc = feats.astype(jnp.bfloat16)
            gc = g.astype(jnp.bfloat16)
            outs = []
            for t in range(k3):
                idx = rb[t]
                xg = jnp.where((idx >= 0)[:, None],
                               fc[jnp.where(idx >= 0, idx, 0)], 0)
                outs.append(jax.lax.dot_general(
                    xg, gc, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return jnp.stack(outs)

        fdr = jax.jit(dw_ref)
        fdw = jax.jit(pallas_dw)
        try:
            odr = fdr(feats, rb, g)
            odw = fdw(feats, geom0, g)
            err = float(jnp.abs(odr - odw).max() / (jnp.abs(odr).max() + 1e-9))
            tdr = timeit(fdr, feats, rb, g)
            tdw = timeit(fdw, feats, geom0, g)
            print(f"  dW: plain {tdr*1e3:.2f} ms | pallas {tdw*1e3:.2f} ms "
                  f"({tdr/tdw:.2f}x) relerr={err:.2e}")
        except Exception as e:
            print(f"  dW FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
