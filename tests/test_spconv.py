"""Sparse conv vs dense numpy oracle: submanifold, strided, inverse variants."""

import numpy as np
import jax.numpy as jnp
import pytest

from ponderv2_tpu.ops.sparse import make_sparse_tensor
from ponderv2_tpu.ops.spconv import (
    build_strided_plan,
    build_subm_rulebook,
    downsample_shape,
    inverse_conv,
    kernel_offsets,
    strided_conv,
    subm_conv,
)


def make_scene(rng, n, shape, batch, cin, pad_rows=6):
    coords = np.unique(
        np.stack(
            [
                rng.randint(0, batch, n),
                rng.randint(0, shape[0], n),
                rng.randint(0, shape[1], n),
                rng.randint(0, shape[2], n),
            ],
            axis=1,
        ),
        axis=0,
    ).astype(np.int32)
    feats = rng.randn(len(coords), cin).astype(np.float32)
    coords = np.concatenate([coords, np.full((pad_rows, 4), -1, np.int32)])
    feats = np.concatenate([feats, np.zeros((pad_rows, cin), np.float32)])
    return coords, feats


def densify(coords, feats, shape, batch):
    cin = feats.shape[1]
    dense = np.zeros((batch, *shape, cin), np.float32)
    for c, f in zip(coords, feats):
        if c[0] >= 0:
            dense[c[0], c[1], c[2], c[3]] += f
    return dense


def dense_conv_at(dense, out_site, weights, kernel, stride, pad):
    """Oracle: value of a (sparse-semantics) conv at one output site."""
    b, p = out_site[0], np.array(out_site[1:])
    acc = np.zeros(weights.shape[-1], np.float32)
    for k, off in enumerate(kernel_offsets(kernel)):
        q = p * np.array(stride) - np.array(pad) + np.array(off)
        if (q >= 0).all() and (q < np.array(dense.shape[1:4])).all():
            acc += dense[b, q[0], q[1], q[2]] @ weights[k]
    return acc


class TestSubmConv:
    @pytest.mark.parametrize("kernel", [3, 5])
    def test_matches_dense_oracle(self, rng, kernel):
        shape, batch, cin, cout = (10, 10, 10), 2, 4, 6
        coords, feats = make_scene(rng, 60, shape, batch, cin)
        weights = rng.randn(kernel**3, cin, cout).astype(np.float32) * 0.2
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        out = np.asarray(subm_conv(st, jnp.asarray(weights), kernel_size=kernel).features)

        dense = densify(coords, feats, shape, batch)
        pad = ((kernel - 1) // 2,) * 3
        for i, c in enumerate(coords):
            if c[0] < 0:
                assert (out[i] == 0).all()
                continue
            ref = dense_conv_at(dense, c, weights, kernel, (1, 1, 1), pad)
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)

    def test_rulebook_reuse(self, rng):
        shape, batch = (8, 8, 8), 1
        coords, feats = make_scene(rng, 30, shape, batch, 4)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        rb = build_subm_rulebook(st.coords, shape, batch, 3)
        w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))
        out1 = subm_conv(st, w, rulebook=rb).features
        out2 = subm_conv(st, w).features
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_batch_isolation(self, rng):
        """A voxel in scene 0 must not see neighbors from scene 1."""
        shape = (4, 4, 4)
        coords = np.array([[0, 1, 1, 1], [1, 1, 1, 2]], np.int32)
        feats = np.array([[1.0], [100.0]], np.float32)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, 2)
        w = jnp.ones((27, 1, 1), dtype=jnp.float32)
        out = np.asarray(subm_conv(st, w).features)
        assert out[0, 0] == 1.0 and out[1, 0] == 100.0


class TestStridedConv:
    def test_k2s2_matches_oracle(self, rng):
        shape, batch, cin, cout = (8, 8, 8), 2, 3, 5
        coords, feats = make_scene(rng, 50, shape, batch, cin)
        weights = rng.randn(8, cin, cout).astype(np.float32) * 0.3
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        out_st = strided_conv(
            st, jnp.asarray(weights), kernel_size=2, stride=2, padding=0,
            out_capacity=64,
        )
        assert out_st.spatial_shape == (4, 4, 4)
        out_coords = np.asarray(out_st.coords)
        out = np.asarray(out_st.features)

        # expected output set: every b, v//2 of an occupied voxel
        occ = coords[coords[:, 0] >= 0]
        expected = np.unique(
            np.concatenate([occ[:, :1], occ[:, 1:] // 2], axis=1), axis=0
        )
        got = out_coords[out_coords[:, 0] >= 0]
        np.testing.assert_array_equal(np.sort(got, axis=0), np.sort(expected, axis=0))

        dense = densify(coords, feats, shape, batch)
        for i, c in enumerate(out_coords):
            if c[0] < 0:
                continue
            ref = dense_conv_at(dense, c, weights, 2, (2, 2, 2), (0, 0, 0))
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)

    def test_k3s2p1(self, rng):
        """Stem-style strided conv with padding (nuScenes SpUNet uses k3 s2 p1)."""
        shape, batch, cin, cout = (9, 9, 9), 1, 2, 3
        coords, feats = make_scene(rng, 40, shape, batch, cin)
        weights = rng.randn(27, cin, cout).astype(np.float32) * 0.3
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        out_st = strided_conv(
            st, jnp.asarray(weights), kernel_size=3, stride=2, padding=1,
            out_capacity=64,
        )
        assert out_st.spatial_shape == downsample_shape(shape, 3, 2, 1)
        dense = densify(coords, feats, shape, batch)
        out_coords = np.asarray(out_st.coords)
        out = np.asarray(out_st.features)
        for i, c in enumerate(out_coords):
            if c[0] < 0:
                continue
            ref = dense_conv_at(dense, c, weights, 3, (2, 2, 2), (1, 1, 1))
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)


class TestInverseConv:
    def test_k2s2_roundtrip_coords_and_values(self, rng):
        """Down k2s2 then inverse k2s2 restores the fine coordinate set; values
        match the transposed-conv oracle."""
        shape, batch, cin, cmid, cout = (8, 8, 8), 2, 3, 4, 2
        coords, feats = make_scene(rng, 50, shape, batch, cin)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        w_down = rng.randn(8, cin, cmid).astype(np.float32) * 0.3
        down = strided_conv(st, jnp.asarray(w_down), kernel_size=2, stride=2,
                            padding=0, out_capacity=64)
        w_up = rng.randn(8, cmid, cout).astype(np.float32) * 0.3
        up = inverse_conv(
            down, jnp.asarray(w_up), fine_coords=st.coords,
            fine_spatial_shape=shape, kernel_size=2, stride=2, padding=0,
        )
        assert up.spatial_shape == shape
        np.testing.assert_array_equal(np.asarray(up.coords), coords)

        dense_coarse = densify(np.asarray(down.coords), np.asarray(down.features),
                               (4, 4, 4), batch)
        out = np.asarray(up.features)
        for i, c in enumerate(coords):
            if c[0] < 0:
                assert (out[i] == 0).all()
                continue
            # inverse conv: tap d reads coarse (f + p - d)/s when exact
            acc = np.zeros(cout, np.float32)
            for k, off in enumerate(kernel_offsets(2)):
                num = c[1:] - np.array(off)
                if (num % 2 == 0).all():
                    q = num // 2
                    if (q >= 0).all() and (q < 4).all():
                        acc += dense_coarse[c[0], q[0], q[1], q[2]] @ w_up[k]
            np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-4)


class TestGradients:
    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_grads_flow_and_match_fd(self, rng):
        import jax

        shape, batch, cin, cout = (6, 6, 6), 1, 2, 2
        coords, feats = make_scene(rng, 20, shape, batch, cin)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.3)

        def loss(w, f):
            out = subm_conv(st.replace(features=f), w).features
            return jnp.sum(out**2)

        gw, gf = jax.grad(loss, argnums=(0, 1))(w, st.features)
        # finite differences on a few weight entries
        eps = 1e-3
        for idx in [(0, 0, 0), (13, 1, 1), (26, 0, 1)]:
            wp = w.at[idx].add(eps)
            wm = w.at[idx].add(-eps)
            fd = (loss(wp, st.features) - loss(wm, st.features)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(gw[idx]), float(fd), rtol=2e-2)
        assert np.abs(np.asarray(gf)).sum() > 0


class TestSymmetricVJP:
    def test_grads_match_autodiff(self, rng):
        """Custom mirrored-gather backward must equal plain autodiff grads."""
        import jax
        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, build_subm_rulebook, subm_conv_symmetric,
        )

        shape, batch, cin, cout = (8, 8, 8), 2, 3, 4
        coords, feats = make_scene(rng, 40, shape, batch, cin)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        rb = build_subm_rulebook(st.coords, shape, batch, 3)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.3)
        tok = jnp.zeros((0,), jnp.float32)

        def loss_ref(f, w):
            out = apply_sparse_conv(f, rb, w, st.mask, None, variant="loop")
            return jnp.sum(out * jnp.cos(out))

        def loss_sym(f, w):
            out = subm_conv_symmetric(f, rb, w, st.mask, tok)
            return jnp.sum(out * jnp.cos(out))

        gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(st.features, w)
        gf_sym, gw_sym = jax.grad(loss_sym, argnums=(0, 1))(st.features, w)
        np.testing.assert_allclose(np.asarray(gf_sym), np.asarray(gf_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_sym), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-5)


class TestWindowedGather:
    """Windowed one-hot gather-GEMM must be exact vs the plain gather path,
    including blocks that overflow their window (per-block lax.cond fallback)
    and fully unsorted rulebooks (everything falls back)."""

    def _setup(self, rng, n=600, shape=(16, 16, 16), batch=2, cin=3, cout=5):
        coords, feats = make_scene(rng, n, shape, batch, cin)
        st = make_sparse_tensor(
            jnp.asarray(feats), jnp.asarray(coords), shape, batch
        )
        rb = build_subm_rulebook(st.coords, shape, batch, 3)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.3)
        return st, rb, w

    @pytest.mark.parametrize("window,block", [(256, 128), (128, 128), (8, 8)])
    def test_matches_plain(self, rng, window, block):
        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, apply_sparse_conv_windowed,
        )

        st, rb, w = self._setup(rng)
        ref = apply_sparse_conv(st.features, rb, w, st.mask, None)
        got = apply_sparse_conv_windowed(
            st.features, rb, w, st.mask, None, window=window, block=block
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_unsorted_rulebook_falls_back_exactly(self, rng):
        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, apply_sparse_conv_windowed, windowed_coverage,
        )

        st, rb, w = self._setup(rng)
        perm = rng.permutation(rb.shape[1])
        rb_shuf = jnp.asarray(np.asarray(rb)[:, perm])
        mask_shuf = jnp.asarray(np.asarray(st.mask)[perm])
        ref = apply_sparse_conv(st.features, rb_shuf, w, mask_shuf, None)
        got = apply_sparse_conv_windowed(
            st.features, rb_shuf, w, mask_shuf, None, window=64, block=64
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        assert float(windowed_coverage(rb_shuf, st.capacity, 64, 64)) < 0.5

    def test_windowed_dw_matches_autodiff(self, rng):
        import jax
        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, _windowed_dw,
        )

        st, rb, w = self._setup(rng)
        g = jnp.asarray(
            rng.randn(rb.shape[1], w.shape[2]).astype(np.float32)
        )
        g = jnp.where(st.mask[:, None], g, 0.0)
        dw_ref = jax.grad(
            lambda w: jnp.sum(
                apply_sparse_conv(st.features, rb, w, st.mask, None) * g
            )
        )(w)
        dw = _windowed_dw(st.features, rb, g, jnp.float32,
                          window=128, block=128)
        np.testing.assert_allclose(
            np.asarray(dw), np.asarray(dw_ref), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_full_vjp_windowed_branch(self, rng, monkeypatch):
        """Force the windowed branch of subm_conv_symmetric and check grads
        against plain autodiff."""
        import jax
        import ponderv2_tpu.ops.spconv as sp

        st, rb, w = self._setup(rng, n=900, shape=(18, 18, 18))
        monkeypatch.setattr(
            sp, "use_windowed_gather", lambda n, ci, co: True
        )
        tok = jnp.zeros((0,), jnp.float32)

        def loss_sym(f, w):
            out = sp.subm_conv_symmetric(f, rb, w, st.mask, tok)
            return jnp.sum(out * jnp.cos(out))

        def loss_ref(f, w):
            out = sp.apply_sparse_conv(f, rb, w, st.mask, None, variant="loop")
            return jnp.sum(out * jnp.cos(out))

        gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(st.features, w)
        gf, gw = jax.grad(loss_sym, argnums=(0, 1))(st.features, w)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-5)


class TestGatheredVJP:
    def test_strided_and_inverse_grads_match_autodiff(self, rng):
        """Gather-only backward (inverted rulebook) == plain autodiff."""
        import jax
        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, build_strided_plan, sparse_conv_gathered,
        )

        shape, batch, cin, cout = (8, 8, 8), 2, 3, 4
        coords, feats = make_scene(rng, 50, shape, batch, cin)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
        plan = build_strided_plan(st.coords, shape, batch, 2, 2, 0, st.capacity)
        w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.3)
        mask = plan.out_coords[:, 0] >= 0
        tok = jnp.zeros((0,), jnp.float32)

        def loss_ref(f, w):
            out = apply_sparse_conv(f, plan.rulebook, w, mask, None)
            return jnp.sum(jnp.sin(out))

        def loss_vjp(f, w):
            out = sparse_conv_gathered(f, plan.rulebook, w, mask, tok)
            return jnp.sum(jnp.sin(out))

        gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(st.features, w)
        gf, gw = jax.grad(loss_vjp, argnums=(0, 1))(st.features, w)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-5)


class TestSlabPlan:
    """Slab (z-run) subm plans: one gather per tap-column (round-3 fast path)."""

    def _plan_and_ref(self, rng, kernel, shape=(10, 10, 10), batch=2, cin=4,
                      n=60):
        from ponderv2_tpu.ops.spconv import build_subm_plan

        coords, feats = make_scene(rng, n, shape, batch, cin)
        plan = build_subm_plan(jnp.asarray(coords), shape, batch, kernel)
        rb = build_subm_rulebook(jnp.asarray(coords), shape, batch, kernel)
        return coords, feats, plan, rb

    @pytest.mark.parametrize("kernel", [
        3, pytest.param(5, marks=pytest.mark.slow)])
    def test_legacy_matches_rulebook(self, rng, kernel):
        coords, feats, plan, rb = self._plan_and_ref(rng, kernel)
        assert bool(plan.sorted_ok)
        np.testing.assert_array_equal(np.asarray(plan.legacy), np.asarray(rb))

    @pytest.mark.parametrize("kernel,cin", [
        (3, 4), (3, 40), pytest.param(5, 4, marks=pytest.mark.slow)])
    def test_slab_conv_matches_plain(self, rng, kernel, cin):
        from ponderv2_tpu.ops.spconv import slab_pack, subm_conv_slab

        shape, batch, cout = (10, 10, 10), 2, 6
        coords, feats, plan, rb = self._plan_and_ref(
            rng, kernel, shape, batch, cin
        )
        weights = jnp.asarray(
            rng.randn(kernel**3, cin, cout).astype(np.float32) * 0.2
        )
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                                shape, batch)
        ref = subm_conv(st, weights, rulebook=rb, kernel_size=kernel).features
        cfg = (kernel, kernel, kernel, slab_pack(kernel, cin))
        token = jnp.zeros((0,), jnp.float32)
        out = subm_conv_slab(cfg, st.features, plan.r0, plan.selp, weights,
                             st.mask, token)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_slab_grads_match_plain_autodiff(self, rng):
        import jax

        from ponderv2_tpu.ops.spconv import (
            apply_sparse_conv, slab_pack, subm_conv_slab,
        )

        kernel, cin, cout = 3, 5, 3
        shape, batch = (8, 8, 8), 2
        coords, feats, plan, rb = self._plan_and_ref(
            rng, kernel, shape, batch, cin, n=40
        )
        weights = jnp.asarray(
            rng.randn(kernel**3, cin, cout).astype(np.float32) * 0.2
        )
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                                shape, batch)
        token = jnp.zeros((0,), jnp.float32)

        def loss_slab(f, w):
            cfg = (kernel, kernel, kernel, slab_pack(kernel, cin))
            out = subm_conv_slab(cfg, f, plan.r0, plan.selp, w, st.mask,
                                 token)
            return jnp.sum(out * out)

        def loss_plain(f, w):
            out = apply_sparse_conv(f, rb, w, st.mask)
            return jnp.sum(out * out)

        gf_s, gw_s = jax.grad(loss_slab, argnums=(0, 1))(st.features, weights)
        gf_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(st.features, weights)
        np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_p),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-4)

    def test_unsorted_detected_legacy_correct_slab_poisoned(self, rng):
        """Contract violation (unsorted rows): the plan flags it, ``legacy``
        stays exactly correct (the cond fallback rebuilds via lookups), and
        the slab encoding is poisoned to all-zero outputs — loud, not
        silently wrong."""
        from ponderv2_tpu.ops.spconv import (
            build_subm_plan, slab_pack, subm_conv_slab,
        )

        kernel, cin, cout = 3, 4, 6
        shape, batch = (8, 8, 8), 2
        coords, feats = make_scene(rng, 40, shape, batch, cin)
        perm = rng.permutation(len(coords))
        coords, feats = coords[perm], feats[perm]
        plan = build_subm_plan(jnp.asarray(coords), shape, batch, kernel)
        assert not bool(plan.sorted_ok)
        rb = build_subm_rulebook(jnp.asarray(coords), shape, batch, kernel)
        np.testing.assert_array_equal(np.asarray(plan.legacy), np.asarray(rb))
        weights = jnp.asarray(
            rng.randn(kernel**3, cin, cout).astype(np.float32) * 0.2
        )
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                                shape, batch)
        cfg = (kernel, kernel, kernel, slab_pack(kernel, cin))
        token = jnp.zeros((0,), jnp.float32)
        out = subm_conv_slab(cfg, st.features, plan.r0, plan.selp, weights,
                             st.mask, token)
        assert np.abs(np.asarray(out)).sum() == 0

    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_derive_inner_plan_matches_k3(self, rng):
        from ponderv2_tpu.ops.spconv import (
            build_subm_plan, derive_inner_subm_plan,
        )

        shape, batch = (10, 10, 10), 2
        coords, feats = make_scene(rng, 60, shape, batch, 4)
        plan5 = build_subm_plan(jnp.asarray(coords), shape, batch, 5)
        plan3 = build_subm_plan(jnp.asarray(coords), shape, batch, 3)
        derived = derive_inner_subm_plan(plan5, 5)
        np.testing.assert_array_equal(np.asarray(derived.legacy),
                                      np.asarray(plan3.legacy))
        np.testing.assert_array_equal(np.asarray(derived.r0),
                                      np.asarray(plan3.r0))
        np.testing.assert_array_equal(np.asarray(derived.selp),
                                      np.asarray(plan3.selp))


class TestBitmapTable:
    def test_runs_match_packed(self, rng):
        from ponderv2_tpu.ops import hashing

        shape, batch = (12, 12, 12), 2
        coords, _ = make_scene(rng, 120, shape, batch, 1)
        cj = jnp.asarray(coords)
        bt = hashing.build_bitmap_table(cj, shape, batch)
        pt = hashing.build_packed_table(cj, shape, batch)
        rng2 = np.random.RandomState(1)
        base = np.stack(
            [
                rng2.randint(0, batch, 300),
                rng2.randint(-1, shape[0] + 1, 300),
                rng2.randint(-1, shape[1] + 1, 300),
                rng2.randint(-2, shape[2] + 1, 300),
            ],
            axis=1,
        ).astype(np.int32)
        got = hashing.lookup_runs_bitmap(bt, jnp.asarray(base), shape, 5)
        ref = hashing.lookup_runs_packed(pt, jnp.asarray(base), shape, 5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_derive_inner_plan_without_legacy(self, rng):
        """with_legacy=False stem plans: the derived k3 plan synthesizes its
        own (correct) legacy rulebook arithmetically."""
        from ponderv2_tpu.ops.spconv import (
            build_subm_plan, derive_inner_subm_plan,
        )

        shape, batch = (10, 10, 10), 2
        coords, _ = make_scene(rng, 60, shape, batch, 4)
        plan5 = build_subm_plan(jnp.asarray(coords), shape, batch, 5,
                                with_legacy=False)
        assert plan5.legacy is None
        plan3 = build_subm_plan(jnp.asarray(coords), shape, batch, 3)
        derived = derive_inner_subm_plan(plan5, 5)
        np.testing.assert_array_equal(np.asarray(derived.legacy),
                                      np.asarray(plan3.legacy))


class TestBandConv:
    """Block-banded Pallas subm conv (ops.band_conv) vs the plain path.

    Runs in Pallas interpret mode on CPU; the same kernels compile for TPU
    (Mosaic constraints documented in the module)."""

    def _scene(self, rng, kernel=3, shape=(10, 10, 10), batch=2, cin=5,
               cout=7, n=60):
        coords, feats = make_scene(rng, n, shape, batch, cin)
        rb = build_subm_rulebook(jnp.asarray(coords), shape, batch, kernel)
        weights = jnp.asarray(
            rng.randn(kernel**3, cin, cout).astype(np.float32) * 0.2
        )
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                                shape, batch)
        return st, rb, weights

    @pytest.mark.parametrize("cin,cout", [(5, 7), (40, 24)])
    def test_matches_plain(self, rng, cin, cout):
        from ponderv2_tpu.ops.band_conv import band_subm_conv, build_band_plan

        kernel = 3
        st, rb, weights = self._scene(rng, kernel, cin=cin, cout=cout)
        ref = subm_conv(st, weights, rulebook=rb, kernel_size=kernel).features
        block, window = 8, 32
        plan = build_band_plan(rb, kernel, block=block, window=window)
        assert bool(plan.ok)
        token = jnp.zeros((0,), jnp.float32)
        out = band_subm_conv((kernel, block, window), st.features, plan,
                             weights, st.mask, token)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_plain_autodiff(self, rng):
        import jax

        from ponderv2_tpu.ops.band_conv import band_subm_conv, build_band_plan
        from ponderv2_tpu.ops.spconv import apply_sparse_conv

        kernel, cin, cout = 3, 5, 3
        st, rb, weights = self._scene(rng, kernel, cin=cin, cout=cout, n=40,
                                      shape=(8, 8, 8))
        block, window = 8, 32
        plan = build_band_plan(rb, kernel, block=block, window=window)
        assert bool(plan.ok)
        token = jnp.zeros((0,), jnp.float32)

        def loss_band(f, w):
            out = band_subm_conv((kernel, block, window), f, plan,
                                 w, st.mask, token)
            return jnp.sum(out * out)

        def loss_plain(f, w):
            out = apply_sparse_conv(f, rb, w, st.mask)
            return jnp.sum(out * out)

        gf_b, gw_b = jax.grad(loss_band, argnums=(0, 1))(st.features, weights)
        gf_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(st.features, weights)
        np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_p),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("fused", [
        "1", pytest.param("0", marks=pytest.mark.slow)])
    def test_fused_and_split_backward_match(self, rng, fused, monkeypatch):
        """The fused dx+dW kernel and the split (dx core + dW kernel) path
        must both reproduce the plain conv's autodiff grads."""
        import jax

        from ponderv2_tpu.ops.band_conv import band_subm_conv, build_band_plan
        from ponderv2_tpu.ops.spconv import apply_sparse_conv

        monkeypatch.setenv("PONDER_BAND_FUSED_BWD", fused)
        kernel, cin, cout = 3, 12, 9
        st, rb, weights = self._scene(rng, kernel, cin=cin, cout=cout, n=50,
                                      shape=(9, 9, 9))
        block, window = 8, 32
        plan = build_band_plan(rb, kernel, block=block, window=window)
        assert bool(plan.ok)
        token = jnp.zeros((0,), jnp.float32)

        def loss_band(f, w):
            out = band_subm_conv((kernel, block, window), f, plan,
                                 w, st.mask, token)
            return jnp.sum(out * out)

        def loss_plain(f, w):
            return jnp.sum(apply_sparse_conv(f, rb, w, st.mask) ** 2)

        gf_b, gw_b = jax.grad(loss_band, argnums=(0, 1))(st.features, weights)
        gf_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(st.features, weights)
        np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_p),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_window_overflow_exact_via_residual(self, rng):
        """Blocks whose span exceeds the window stay EXACT: the out-of-window
        tail entries are compacted into the plan's budgeted overflow list and
        applied as a residual (fwd AND both grads)."""
        import jax

        from ponderv2_tpu.ops.band_conv import band_subm_conv, build_band_plan
        from ponderv2_tpu.ops.spconv import apply_sparse_conv

        kernel = 3
        st, rb, weights = self._scene(rng, kernel, n=200, shape=(12, 12, 12))
        block, window = 32, 8  # spans of up to 32 rows overflow an 8-row window
        plan = build_band_plan(rb, kernel, block=block, window=window)
        assert bool(plan.ok)
        assert int((plan.ov_i >= 0).sum()) > 0  # the tail is non-empty
        token = jnp.zeros((0,), jnp.float32)

        def loss_band(f, w):
            out = band_subm_conv((kernel, block, window), f, plan,
                                 w, st.mask, token)
            return jnp.sum(out * out)

        def loss_plain(f, w):
            return jnp.sum(apply_sparse_conv(f, rb, w, st.mask) ** 2)

        out = band_subm_conv((kernel, block, window), st.features, plan,
                             weights, st.mask, token)
        ref = apply_sparse_conv(st.features, rb, weights, st.mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        gf_b, gw_b = jax.grad(loss_band, argnums=(0, 1))(st.features, weights)
        gf_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(st.features, weights)
        np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_p),
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_p),
                                   rtol=1e-4, atol=2e-4)

    def test_budget_overflow_gates_to_zero(self, rng):
        """When the overflow budgets themselves are exceeded the conv output
        must be zero (loud failure contract), never silently wrong taps."""
        from ponderv2_tpu.ops.band_conv import band_subm_conv, build_band_plan

        kernel = 3
        st, rb, weights = self._scene(rng, kernel, n=200, shape=(12, 12, 12))
        block, window = 32, 8
        plan = build_band_plan(rb, kernel, block=block, window=window,
                               pair_budget=0)
        assert not bool(plan.ok)
        token = jnp.zeros((0,), jnp.float32)
        out = band_subm_conv((kernel, block, window), st.features, plan,
                             weights, st.mask, token)
        assert float(jnp.abs(out).sum()) == 0.0
        plan2 = build_band_plan(rb, kernel, block=block, window=window,
                                entry_budget=1)
        assert not bool(plan2.ok)
        out2 = band_subm_conv((kernel, block, window), st.features, plan2,
                              weights, st.mask, token)
        assert float(jnp.abs(out2).sum()) == 0.0
