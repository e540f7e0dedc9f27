"""Probe: block-span statistics for a windowed (band) trilinear sampler.

Feasibility check for replacing the descriptor-bound volume-sample gathers in
the NeuS render with block-windowed extraction matmuls (the band-conv trick
applied to ray samples): sort each scene's samples by raveled volume-voxel
key; over a block of BM consecutive sorted samples, all 8 trilinear corners
fall in two narrow windows (y0/y1 bands, x-major raveling). Reports the span
distribution and the overflow fraction at candidate window sizes.

Ray geometry is the REAL bench workload's (synthetic RGBD cameras, valid-depth
pixel picking, AABB near/far), with 96 uniform + 36 surface-clustered samples
approximating the NeuS importance round.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def main():
    bs = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(bs, 100000)
    depth = np.asarray(arrays["depth"], np.float32)  # (B, V, H, W)
    intr = np.asarray(arrays["intrinsic"], np.float32)
    extr = np.asarray(arrays["extrinsic"], np.float32)
    coord = np.asarray(arrays["coord"], np.float32)
    batch = np.asarray(arrays["batch"])
    Bn, V, H, W = depth.shape

    # unit-cube params (PonderIndoor._unit_cube_params: center xy, min z, the
    # reference to_unit_cube semantics) — approximate with min/max box
    rng = np.random.default_rng(0)
    rays_o, rays_d, t_gt = [], [], []
    for b in range(Bn):
        pts = coord[batch == b]
        lo, hi = pts.min(0), pts.max(0)
        loc = np.array([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, lo[2]])
        scale = 1.0 / max(hi - lo)
        o_list, d_list, t_list = [], [], []
        for v in range(V):
            K = intr[b, v, :3, :3]
            pose = np.linalg.inv(extr[b, v])
            R, t = pose[:3, :3], pose[:3, 3]
            val = np.argwhere(depth[b, v] > 0)
            if len(val) == 0:
                continue
            pick = val[rng.choice(len(val), size=min(256, len(val)),
                                  replace=False)]
            pix = np.stack([pick[:, 1], pick[:, 0], np.ones(len(pick))],
                           axis=1).astype(np.float32)
            d_cam = pix @ np.linalg.inv(K).T
            d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
            d_w = d_cam @ R.T
            o = (t - loc) * scale + 0.0
            o_list.append(np.repeat(o[None], len(pick), 0))
            d_list.append(d_w)
            cos = d_w @ R[:, 2]
            t_list.append(depth[b, v][pick[:, 0], pick[:, 1]] / np.maximum(
                cos, 1e-6) * scale)
        rays_o.append(np.concatenate(o_list))
        rays_d.append(np.concatenate(d_list))
        t_gt.append(np.concatenate(t_list))

    pad = 1.1
    X, Y, Z = 128, 128, 32
    HALO = Y * Z + Z + 2  # dx + dy + dz corner reach, x-major z-fastest ravel
    keys = []
    for b in range(Bn):
        o = rays_o[b] / pad + 0.5  # into [0,1]
        d = rays_d[b]
        # AABB near/far in unit cube
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (0.0 - o) / d
            t1 = (1.0 - o) / d
        tmin = np.minimum(t0, t1).max(1)
        tmax = np.maximum(t0, t1).min(1)
        tmin = np.maximum(tmin, 0.01)
        tmax = np.maximum(tmax, tmin + 1e-3)
        su = tmin[:, None] + (tmax - tmin)[:, None] * (
            (np.arange(96) + 0.5) / 96)[None]
        # importance approx: 36 samples near the gt surface depth
        ts = np.clip(t_gt[b] * pad, tmin, tmax)
        si = ts[:, None] + (np.linspace(-0.03, 0.03, 36))[None]
        s = np.sort(np.concatenate([su, si], axis=1), axis=1)  # (R, 132)
        pos = o[:, None, :] + d[:, None, :] * s[..., None]  # (R, S, 3)
        pos = pos.reshape(-1, 3)
        # align_corners unnormalize to [0, size-1]
        fx = np.clip(pos[:, 0], 0, 1) * (X - 1)
        fy = np.clip(pos[:, 1], 0, 1) * (Y - 1)
        fz = np.clip(pos[:, 2], 0, 1) * (Z - 1)
        ix, iy, iz = (np.floor(v).astype(np.int64) for v in (fx, fy, fz))
        key = (ix * Y + iy) * Z + iz  # x-major, z fastest (collate order)
        keys.append(np.sort(key))

    for BM in (1024, 4096, 8192, 16384, 32768):
        spans_all = []
        for b in range(Bn):
            key = keys[b]
            M = len(key)
            nb = M // BM
            kb = key[: nb * BM].reshape(nb, BM)
            span = kb.max(1) - kb.min(1) + HALO  # slab rows needed, lo-aligned
            spans_all.append(span)
        span = np.concatenate(spans_all)
        print(f"BM={BM}: slab-span p50={np.percentile(span,50):.0f} "
              f"p90={np.percentile(span,90):.0f} p99={np.percentile(span,99):.0f} "
              f"max={span.max()}  (rows of C; HALO={HALO})")
        # per-entry overflow at candidate static slab sizes (lo-aligned)
        for V in (32768, 49152, 65536, 98304, 131072):
            ovf = 0
            for b in range(Bn):
                key = keys[b]
                nb = len(key) // BM
                kb = key[: nb * BM].reshape(nb, BM)
                ovf += int(((kb - kb.min(1, keepdims=True)) > V - HALO).sum())
            tot = sum(len(k) // BM * BM for k in keys)
            print(f"   V={V}: overflow entries = {ovf} ({ovf/tot*100:.2f}%)")


if __name__ == "__main__":
    main()
