"""Probe: windowed one-hot gather vs XLA row gather, and z-run slice gathers.

Sparse-conv rulebooks are per-tap monotone over their valid entries (sorted
voxel keys + a fixed ravel offset preserve order), so a block of B output rows
reads input rows from a narrow window. This probes whether converting the
HBM-latency-bound row gather into contiguous window loads + one-hot MXU
matmuls wins on the real chip, and whether 1-D slice gathers (for the dense
rulebook table's contiguous z-runs) beat scalar gathers.
"""

import time

import numpy as np


def timeit(f, *args, iters=30):
    out = f(*args)
    import jax

    jax.block_until_ready(out)
    # force value fetch through the tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_monotone_rulebook(n, k3, rng, miss=0.3):
    """Per-tap strictly-monotone valid indices with misses, like real subm."""
    rbs = []
    for t in range(k3):
        shift = rng.randint(-600, 600)
        idx = np.arange(n) + shift + rng.randint(-8, 8, n)
        idx = np.clip(np.sort(idx), 0, n - 1)
        invalid = rng.rand(n) < miss
        rbs.append(np.where(invalid, -1, idx))
    return np.stack(rbs).astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")
    N, K3 = 163840, 27
    B, W = 512, 1024
    rng = np.random.RandomState(0)
    rb = jnp.asarray(make_monotone_rulebook(N, K3, rng))

    for C in (32, 96):
        feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
        w = jnp.asarray(rng.randn(K3, C, C).astype(np.float32) * 0.05)

        def plain(feats, rb, w):
            feats_c = feats.astype(jnp.bfloat16)
            self_idx = jnp.arange(N, dtype=jnp.int32)
            out = jnp.zeros((N, C), jnp.float32)
            for t in range(K3):
                idx = rb[t]
                safe = jnp.where(idx >= 0, idx, self_idx)
                g = jnp.where((idx >= 0)[:, None], feats_c[safe], 0)
                out = out + jnp.dot(g, w[t].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            return out

        nb = N // B
        rbb = rb.reshape(K3, nb, B)
        valid = rbb >= 0
        mn = jnp.where(valid, rbb, np.iinfo(np.int32).max).min(axis=2)
        starts = jnp.clip(jnp.where(mn == np.iinfo(np.int32).max, 0, mn),
                          0, N - W)
        iota_w = jnp.arange(W, dtype=jnp.int32)

        def windowed(feats, rbb, starts, w):
            feats_c = feats.astype(jnp.bfloat16)
            wc = w.astype(jnp.bfloat16)

            def block(j):
                acc = jnp.zeros((B, C), jnp.float32)
                for t in range(K3):
                    s = starts[t, j]
                    win = jax.lax.dynamic_slice(feats_c, (s, 0), (W, C))
                    idx = rbb[t, j]
                    local = idx - s
                    oh = ((local[:, None] == iota_w[None, :])
                          & (idx >= 0)[:, None]).astype(jnp.bfloat16)
                    g = jnp.dot(oh, win, preferred_element_type=jnp.bfloat16)
                    acc = acc + jnp.dot(g, wc[t],
                                        preferred_element_type=jnp.float32)
                return acc

            return jax.lax.map(block, jnp.arange(nb)).reshape(N, C)

        fp = jax.jit(plain)
        fw = jax.jit(windowed)
        op = fp(feats, rb, w)
        ow = fw(feats, rbb, starts, w)
        # overflow accounting: entries whose window missed contribute zero
        ovf = int(((rbb - starts[:, :, None] >= W) & valid).sum())
        err = float(jnp.abs(op - ow).max() / (jnp.abs(op).max() + 1e-9))
        tp = timeit(fp, feats, rb, w)
        tw = timeit(fw, feats, rbb, starts, w)
        print(f"C={C}: plain {tp*1e3:.2f} ms | windowed {tw*1e3:.2f} ms "
              f"({tp/tw:.2f}x) relerr={err:.2e} overflow={ovf}")

    # ---- slice gather probe (dense rulebook z-runs) ----
    T = 60_000_000  # dense table size
    table = jnp.asarray(rng.randint(-1, 50, T).astype(np.int32))
    M = 163840 * 25  # 25 z-runs per voxel
    starts1 = jnp.asarray(rng.randint(0, T - 8, M).astype(np.int32))

    def scalar_gather(table, starts):
        # 5 scalar gathers per run = the current dense-table path shape
        return sum(table[starts + d] for d in range(5))

    def slice_gather(table, starts):
        out = jax.lax.gather(
            table, starts[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(8,), mode="clip",
        )
        return out[:, :5].sum(axis=1)

    fsc = jax.jit(scalar_gather)
    fsl = jax.jit(slice_gather)
    osc = fsc(table, starts1)
    osl = fsl(table, starts1)
    ok = bool(jnp.array_equal(osc, osl))
    tsc = timeit(fsc, table, starts1, iters=10)
    tsl = timeit(fsl, table, starts1, iters=10)
    print(f"slice-gather: scalar5 {tsc*1e3:.1f} ms | slice8 {tsl*1e3:.1f} ms "
          f"({tsc/tsl:.2f}x) equal={ok} "
          f"(scalar rate {5*M/tsc/1e6:.0f}M/s, runs {M/tsl/1e6:.0f}M/s)")


if __name__ == "__main__":
    main()
