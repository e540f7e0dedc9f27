"""Probe: total on-chip cost of ALL SpUNet plan/rulebook builds at bench
shapes — the amount a host-side plan prefetch would remove from the step.

Replicates the model's build sequence (spunet.py stage loop): k5 stem slab
plan, per-stage strided plans (chained through out_coords), per-level k3
subm plans with band attach for wide levels, inverse rulebook inversions,
and the L0 inner-k3 derivation + band attach.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def build_all(coords, spatial_shape, batch_size, caps, channels):
    from ponderv2_tpu.ops.spconv import (
        attach_band_plan, build_strided_plan, build_subm_plan,
        derive_inner_subm_plan, invert_strided_rulebook,
    )

    num_stages = 4
    out = {}
    out["stem"] = build_subm_plan(coords, spatial_shape, batch_size, 5,
                                  with_legacy=False)
    c, shape = coords, spatial_shape
    strided, subm, inv = [], [], []
    for s in range(num_stages):
        plan = build_strided_plan(c, shape, batch_size, 2, 2, 0, caps[s + 1])
        strided.append(plan)
        c, shape = plan.out_coords, plan.spatial_shape
        rb = build_subm_plan(c, shape, batch_size, 3)
        if channels[s] > 64:
            rb = attach_band_plan(rb)
        subm.append(rb)
    for s in range(num_stages):
        inv.append(invert_strided_rulebook(
            strided[num_stages - 1 - s].rulebook, caps[num_stages - 1 - s]))
    l0 = derive_inner_subm_plan(out["stem"], 5)
    if channels[num_stages + 3] > 64:  # dec final channels (96)
        l0 = attach_band_plan(l0)
    # L1 decoder channels (96) > 64 but subm[0] was built at 32ch: attach band
    subm0b = attach_band_plan(subm[0]) if channels[num_stages + 2] > 64 else subm[0]
    out.update(strided=tuple(strided), subm=tuple(subm), inv=tuple(inv),
               l0=l0, subm0b=subm0b)
    return out


def main():
    bs = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(bs, 100000)
    from ponderv2_tpu.ops.sparse import make_sparse_tensor, sort_by_key

    caps = tuple(c * bs for c in (102400, 51200, 20480, 5120, 1280))
    channels = (32, 64, 128, 256, 256, 128, 96, 96)
    st = make_sparse_tensor(
        jnp.zeros((arrays["grid_coord"].shape[0], 1)),
        jnp.concatenate(
            [np.asarray(arrays["batch"])[:, None],
             np.asarray(arrays["grid_coord"])], axis=1).astype(jnp.int32),
        (544, 544, 192), bs)
    st, _ = sort_by_key(st)

    fn = jax.jit(lambda c: build_all(c, (544, 544, 192), bs, caps, channels))
    t0 = time.perf_counter()
    out = fn(st.coords)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(st.coords)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"ALL plan builds: {dt:.1f} ms  (would move to host prefetch)",
          flush=True)


if __name__ == "__main__":
    main()
