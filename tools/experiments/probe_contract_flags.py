"""Probe: evaluate every plan contract flag (sorted_ok / band ok) per level
at bench shapes, to locate which one trips the bench's contract gate."""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench as B
from ponderv2_tpu.models.default import batch_to_sparse_tensor
from ponderv2_tpu.ops.sparse import sort_by_key
from ponderv2_tpu.ops.spconv import (
    SubmPlan, attach_band_plan, build_strided_plan, build_subm_plan,
)


def main():
    batch_size = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(
        batch_size, int(os.environ.get("BENCH_POINTS", "100000")))
    spatial_shape = (544, 544, 192)
    st = batch_to_sparse_tensor(
        {**arrays, "spatial_shape": spatial_shape, "batch_size": batch_size})
    # bench model uses assume_sorted=True -> no device sort; mimic both
    if os.environ.get("PROBE_SORT", "0") == "1":
        st, _ = sort_by_key(st)

    channels = (32, 64, 128, 256, 256, 128, 96, 96)
    num_stages = 4
    caps = [st.capacity]
    for _ in range(num_stages):
        caps.append(max(caps[-1] // 2, 1024))

    @jax.jit
    def flags_fn(coords0, mask0):
        out = {}
        rb_stem = build_subm_plan(coords0, spatial_shape, batch_size, 5,
                                  with_legacy=False)
        out["stem.sorted_ok"] = rb_stem.sorted_ok
        coords, shape = coords0, spatial_shape
        for s in range(num_stages):
            plan = build_strided_plan(coords, shape, batch_size, 2, 2, 0,
                                      caps[s + 1])
            coords, shape = plan.out_coords, plan.spatial_shape
            rb = build_subm_plan(coords, shape, batch_size, 3)
            out[f"enc{s}.sorted_ok"] = rb.sorted_ok
            if channels[s] > 64:
                rb = attach_band_plan(rb)
                out[f"enc{s}.band_ok"] = rb.band.ok
                # also record worst span
                from ponderv2_tpu.ops.band_conv import WINDOW, BLOCK
                leg = rb.legacy
                npad = rb.band.rbt.shape[0]
                rpad = jnp.pad(leg, ((0, 0), (0, npad - leg.shape[1])),
                               constant_values=-1)
                rcol = rpad.reshape(9, 3, npad // BLOCK, BLOCK)
                valid = rcol >= 0
                big = jnp.iinfo(jnp.int32).max
                lo = jnp.min(jnp.where(valid, rcol, big), axis=(1, 3))
                hi = jnp.max(jnp.where(valid, rcol, -1), axis=(1, 3))
                lo = jnp.where(lo == big, 0, lo)
                span = jnp.max(jnp.where(hi >= 0, hi - (lo & ~7) + 1, 0))
                out[f"enc{s}.max_span"] = span
        return out

    out = flags_fn(st.coords, st.mask)
    for k, v in out.items():
        print(f"{k:>20} = {v}")


if __name__ == "__main__":
    main()


def span_stats():
    """Per-level distribution of (col, block) span overflow vs window size."""
    batch_size = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(
        batch_size, int(os.environ.get("BENCH_POINTS", "100000")))
    spatial_shape = (544, 544, 192)
    st = batch_to_sparse_tensor(
        {**arrays, "spatial_shape": spatial_shape, "batch_size": batch_size})
    num_stages = 4
    caps = [st.capacity]
    for _ in range(num_stages):
        caps.append(max(caps[-1] // 2, 1024))
    BLOCK = 256

    @jax.jit
    def spans_fn(coords0):
        out = {}
        coords, shape = coords0, spatial_shape
        for s in range(num_stages):
            plan = build_strided_plan(coords, shape, batch_size, 2, 2, 0,
                                      caps[s + 1])
            coords, shape = plan.out_coords, plan.spatial_shape
            rb = build_subm_plan(coords, shape, batch_size, 3)
            leg = rb.legacy
            n = leg.shape[1]
            npad = -(-n // BLOCK) * BLOCK
            rpad = jnp.pad(leg, ((0, 0), (0, npad - n)), constant_values=-1)
            rcol = rpad.reshape(9, 3, npad // BLOCK, BLOCK)
            valid = rcol >= 0
            big = jnp.iinfo(jnp.int32).max
            lo = jnp.min(jnp.where(valid, rcol, big), axis=(1, 3))
            hi = jnp.max(jnp.where(valid, rcol, -1), axis=(1, 3))
            lo = jnp.where(lo == big, 0, lo)
            span = jnp.where(hi >= 0, hi - (lo & ~7) + 1, 0)  # (9, nb)
            out[f"enc{s}"] = span
        return out

    spans = spans_fn(st.coords)
    for k, span in spans.items():
        span = jax.device_get(span)
        tot = span.size
        line = [f"{k}: pairs={tot}"]
        for w in (384, 512, 768, 1024, 1536):
            line.append(f">{w}: {(span > w).sum()}")
        line.append(f"max={span.max()}")
        print("  ".join(line))


if __name__ == "__main__" and os.environ.get("PROBE_SPANS", "0") == "1":
    span_stats()
