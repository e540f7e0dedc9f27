"""Trilinear sampler vs torch.nn.functional.grid_sample oracle + gradcheck.

This mirrors the reference's own validation harness for its CUDA sampler
(libs/smooth-sampler/smooth_sampler/modules.py:104-156): value equivalence against
grid_sample and finite-difference checks of first and second derivatives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ponderv2_tpu.ops.interp import grid_sample_3d


def torch_oracle(vol, pts, align_corners, padding_mode):
    import torch
    import torch.nn.functional as F

    v = torch.from_numpy(vol)
    g = torch.from_numpy(pts).reshape(vol.shape[0], 1, 1, -1, 3)
    out = F.grid_sample(
        v, g, mode="bilinear", padding_mode=padding_mode, align_corners=align_corners
    )
    return out.reshape(vol.shape[0], vol.shape[1], -1).numpy()


class TestGridSample3D:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_matches_torch(self, rng, align_corners, padding_mode):
        vol = rng.randn(2, 3, 5, 6, 7).astype(np.float32)
        pts = (rng.rand(2, 50, 3).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
        ref = torch_oracle(vol, pts, align_corners, padding_mode)
        out = np.asarray(
            grid_sample_3d(
                jnp.asarray(vol), jnp.asarray(pts),
                align_corners=align_corners, padding_mode=padding_mode,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_first_and_second_derivatives(self, rng):
        """Smoothstep mode: finite-difference check of d/dp and d²/dp² paths."""
        vol = jnp.asarray(rng.randn(1, 1, 4, 4, 4).astype(np.float64))
        p0 = jnp.asarray(rng.rand(1, 4, 3) * 1.2 - 0.6)

        def f(p):
            return jnp.sum(grid_sample_3d(vol, p, smoothstep=True))

        # f32 arithmetic: central differences need a mid-size eps and loose rtol
        g = jax.grad(f)(p0)
        eps = 1e-3
        for i in range(3):
            dp = jnp.zeros_like(p0).at[0, 1, i].set(eps)
            fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
            np.testing.assert_allclose(float(g[0, 1, i]), float(fd), rtol=5e-3, atol=1e-4)

        # second derivative (the eikonal double-backward path)
        def gsum(p):
            return jnp.sum(jax.grad(f)(p) ** 2)

        h = jax.grad(gsum)(p0)
        dp = jnp.zeros_like(p0).at[0, 2, 0].set(eps)
        fd2 = (gsum(p0 + dp) - gsum(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(float(h[0, 2, 0]), float(fd2), rtol=2e-2, atol=1e-3)

    def test_smoothstep_continuity_at_voxel_boundary(self, rng):
        """The spatial gradient must be continuous across voxel faces in
        smoothstep mode (it is not, for plain trilinear)."""
        vol = jnp.asarray(rng.randn(1, 1, 4, 4, 4).astype(np.float32))

        def g(px):
            f = lambda p: jnp.sum(
                grid_sample_3d(vol, p.reshape(1, 1, 3), smoothstep=True)
            )
            return jax.grad(f)(px)

        # voxel boundary in x (align_corners grid: boundaries at multiples of 1/3)
        x_b = -1.0 + 2.0 / 3.0
        p_lo = jnp.asarray([x_b - 1e-4, 0.1, 0.1])
        p_hi = jnp.asarray([x_b + 1e-4, 0.1, 0.1])
        np.testing.assert_allclose(
            np.asarray(g(p_lo)), np.asarray(g(p_hi)), atol=1e-2
        )


def test_pair_fallback_matches_quad(rng, monkeypatch):
    """The low-memory x-pair path must equal the quad path exactly."""
    vol = rng.randn(2, 3, 5, 6, 7).astype(np.float32)
    pts = (rng.rand(2, 64, 3).astype(np.float32) * 2.4 - 1.2)
    for mode in ("zeros", "border"):
        ref = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts),
                                        padding_mode=mode))
        monkeypatch.setenv("PONDER_SAMPLE_QUAD_LIMIT", "0")
        got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts),
                                        padding_mode=mode))
        monkeypatch.delenv("PONDER_SAMPLE_QUAD_LIMIT")
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
