"""UNet3D MXU formulations: z-packed k3 conv and subpixel transposed conv.

Both re-express the reference's dense 3D convs (reference unet3d.py:45-96
conv modules, 359-446 ConvTranspose3d decoder) as full-lane 2D convs; these
tests pin them to the plain XLA lowerings they replace — exact in f32 up to
summation order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest


class TestZPackConv:
    @pytest.mark.parametrize("z,cin,cout,p", [
        (8, 6, 8, 1), (8, 6, 8, 2), (8, 6, 8, 4), (16, 5, 3, 4), (4, 8, 16, 2),
    ])
    def test_matches_plain_conv(self, rng, z, cin, cout, p):
        from ponderv2_tpu.models.ponder.unet3d import zpack_conv3d

        x = jnp.asarray(rng.randn(2, 7, 9, z, cin).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, 3, cin, cout) * 0.2)
                        .astype(np.float32))
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = zpack_conv3d(x, w, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match(self, rng):
        from ponderv2_tpu.models.ponder.unet3d import zpack_conv3d

        x = jnp.asarray(rng.randn(1, 6, 6, 8, 4).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, 3, 4, 8) * 0.2).astype(np.float32))

        def loss_plain(xx, ww):
            y = jax.lax.conv_general_dilated(
                xx, ww, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return jnp.sum(y ** 2)

        def loss_pack(xx, ww):
            return jnp.sum(zpack_conv3d(xx, ww, 4) ** 2)

        gx0, gw0 = jax.grad(loss_plain, argnums=(0, 1))(x, w)
        gx1, gw1 = jax.grad(loss_pack, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                   rtol=1e-4, atol=1e-4)

    def test_p_selection(self):
        from ponderv2_tpu.models.ponder.unet3d import _pick_zpack_p

        assert _pick_zpack_p(32, 32) == 4   # fill 128 lanes, 2x FLOPs
        assert _pick_zpack_p(16, 64) == 2   # fill 128 lanes, 1.33x FLOPs
        assert _pick_zpack_p(8, 128) == 1   # lanes already full, exact FLOPs
        assert _pick_zpack_p(7, 32) == 1    # only p=1 divides odd depth


class TestSubpixelConvTranspose:
    @pytest.mark.parametrize("cin,cout", [(3, 2), (8, 4)])
    def test_matches_conv_transpose(self, rng, cin, cout):
        from ponderv2_tpu.models.ponder.unet3d import SubpixelConvTranspose

        x = jnp.asarray(rng.randn(2, 5, 6, 4, cin).astype(np.float32))
        ref_mod = nn.ConvTranspose(
            cout, (3, 3, 3), strides=(2, 2, 2),
            padding=((1, 2), (1, 2), (1, 2)), transpose_kernel=True)
        v = ref_mod.init(jax.random.PRNGKey(0), x)
        want = ref_mod.apply(v, x)
        got = SubpixelConvTranspose(cout).apply(v, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_param_tree_matches(self, rng):
        from ponderv2_tpu.models.ponder.unet3d import SubpixelConvTranspose

        x = jnp.asarray(rng.randn(1, 4, 4, 4, 3).astype(np.float32))
        ref = nn.ConvTranspose(5, (3, 3, 3), strides=(2, 2, 2),
                               padding=((1, 2),) * 3, transpose_kernel=True)
        v_ref = jax.tree.map(np.shape, ref.init(jax.random.PRNGKey(0), x))
        v_sub = jax.tree.map(
            np.shape,
            SubpixelConvTranspose(5).init(jax.random.PRNGKey(0), x))
        assert v_ref == v_sub


class TestUNetFormulationsEndToEnd:
    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_fast_paths_match_plain(self, rng, monkeypatch):
        """Full UNet3D-v1m2 forward: zpack+subpixel on vs both off, same
        params, at a spatial size that engages the zpack path (X*Y >= 64^2)."""
        from ponderv2_tpu.models import build_model

        cfg = dict(type="UNet3D-v1m2", in_channels=6, out_channels=8,
                   f_maps=8, num_levels=3)
        vol = jnp.asarray(rng.randn(1, 6, 64, 64, 8).astype(np.float32))

        monkeypatch.setenv("PONDER_UNET_ZPACK", "0")
        monkeypatch.setenv("PONDER_UNET_SUBPIXEL", "0")
        plain = build_model(dict(cfg))
        v = plain.init(jax.random.PRNGKey(0), vol, train=False)
        want = plain.apply(v, vol, train=False)

        monkeypatch.setenv("PONDER_UNET_ZPACK", "1")
        monkeypatch.setenv("PONDER_UNET_SUBPIXEL", "1")
        fast = build_model(dict(cfg))
        got = fast.apply(v, vol, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
