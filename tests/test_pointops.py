"""pointops vs numpy brute-force oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from ponderv2_tpu.ops.pointops import (
    ball_query,
    farthest_point_sampling,
    grouping,
    interpolation,
    knn_query,
)


def np_knn(k, ref, ref_b, q, q_b):
    idxs, dists = [], []
    for i in range(len(q)):
        d = ((ref - q[i]) ** 2).sum(1)
        d[ref_b != q_b[i]] = 1e10
        d[ref_b < 0] = 1e10
        order = np.argsort(d, kind="stable")[:k]
        idxs.append(order)
        dists.append(d[order])
    return np.array(idxs), np.array(dists)


class TestKnn:
    def test_matches_numpy(self, rng):
        ref = rng.randn(100, 3).astype(np.float32)
        ref_b = np.repeat([0, 1], 50).astype(np.int32)
        ref_b[95:] = -1  # padding
        q = rng.randn(40, 3).astype(np.float32)
        q_b = np.repeat([0, 1], 20).astype(np.int32)
        idx, dist = knn_query(5, jnp.asarray(ref), jnp.asarray(ref_b),
                              jnp.asarray(q), jnp.asarray(q_b), chunk=16)
        ref_idx, ref_dist = np_knn(5, ref, ref_b, q, q_b)
        np.testing.assert_allclose(np.asarray(dist), ref_dist, rtol=1e-3, atol=1e-4)
        # indices may tie-swap; compare distances plus batch correctness
        assert (ref_b[np.asarray(idx)] == q_b[:, None]).all()


class TestBallQuery:
    def test_in_radius_and_fill(self, rng):
        ref = rng.rand(60, 3).astype(np.float32)
        ref_b = np.zeros(60, np.int32)
        q = ref[:10]
        idx, dist = ball_query(0.25, 8, jnp.asarray(ref), jnp.asarray(ref_b),
                               jnp.asarray(q), jnp.asarray(ref_b[:10]), chunk=8)
        idx, dist = np.asarray(idx), np.asarray(dist)
        assert (dist <= 0.25**2 + 1e-5).all()  # only in-radius hits (or fill copies)
        # each query is its own neighbor (distance 0 present)
        assert (dist.min(1) <= 1e-6).all()


class TestFPS:
    def test_spread_and_mask(self, rng):
        xyz = rng.rand(100, 3).astype(np.float32)
        xyz[50:] += 100.0  # far cluster
        mask = np.ones(100, bool)
        mask[50:] = False  # far cluster is padding -> must never be picked
        idx = np.asarray(farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 10))
        assert (idx < 50).all()
        assert len(np.unique(idx)) == 10

    def test_first_two_are_extremes(self):
        xyz = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0]], np.float32)
        mask = np.ones(3, bool)
        idx = np.asarray(farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 2))
        assert idx[0] == 0 and idx[1] == 2


class TestInterpolation:
    def test_exact_at_source_points(self, rng):
        src = rng.rand(30, 3).astype(np.float32)
        b = np.zeros(30, np.int32)
        feat = rng.randn(30, 4).astype(np.float32)
        out = np.asarray(
            interpolation(jnp.asarray(src), jnp.asarray(b), jnp.asarray(src),
                          jnp.asarray(b), jnp.asarray(feat))
        )
        np.testing.assert_allclose(out, feat, rtol=1e-3, atol=1e-3)

    def test_grouping_shape(self, rng):
        feat = rng.randn(20, 6).astype(np.float32)
        idx = rng.randint(0, 20, (5, 3))
        out = np.asarray(grouping(jnp.asarray(feat), jnp.asarray(idx)))
        assert out.shape == (5, 3, 6)
        np.testing.assert_array_equal(out[2, 1], feat[idx[2, 1]])


def _np_random_ball_query(rank_of_row, r_max, r_min, nsample, xyz, batch,
                          qxyz, qbatch):
    """Literal numpy port of the reference kernel semantics
    (libs/pointops/src/random_ball_query/random_ball_query_cuda_kernel.cu):
    scan refs in permutation order, keep first nsample hits."""
    m = qxyz.shape[0]
    idx = np.full((m, nsample), -1, np.int32)
    d2_out = np.full((m, nsample), 1e10, np.float32)
    order = np.argsort(rank_of_row)
    for qi in range(m):
        cnt = 0
        for ri in order:
            if batch[ri] != qbatch[qi] or batch[ri] < 0:
                continue
            d2 = np.sum((qxyz[qi] - xyz[ri]) ** 2)
            if d2 <= 1e-5 or (r_min**2 <= d2 < r_max**2):
                idx[qi, cnt] = ri
                d2_out[qi, cnt] = d2
                cnt += 1
                if cnt >= nsample:
                    break
    return idx, np.sqrt(d2_out)


class TestRandomBallQuery:
    def test_matches_numpy_reference(self, rng):
        from ponderv2_tpu.ops.pointops import random_ball_query

        n, m, nsample = 60, 20, 6
        xyz = rng.rand(n, 3).astype(np.float32)
        batch = np.sort(rng.randint(0, 2, n)).astype(np.int32)
        qxyz = rng.rand(m, 3).astype(np.float32)
        qbatch = np.sort(rng.randint(0, 2, m)).astype(np.int32)
        rank = rng.permutation(n).astype(np.int32)
        idx, dist = random_ball_query(
            jax.random.PRNGKey(0), 0.5, nsample, jnp.asarray(xyz),
            jnp.asarray(batch), jnp.asarray(qxyz), jnp.asarray(qbatch),
            min_radius=0.1, rank_of_row=jnp.asarray(rank),
        )
        ref_idx, ref_dist = _np_random_ball_query(
            rank, 0.5, 0.1, nsample, xyz, batch, qxyz, qbatch
        )
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(dist), ref_dist, rtol=1e-5)

    def test_random_order_changes_selection(self, rng):
        from ponderv2_tpu.ops.pointops import random_ball_query

        n = 200
        xyz = (rng.rand(n, 3) * 0.2).astype(np.float32)  # dense cluster
        batch = np.zeros(n, np.int32)
        q = xyz[:4]
        qb = batch[:4]
        i1, _ = random_ball_query(jax.random.PRNGKey(1), 0.5, 8,
                                  jnp.asarray(xyz), jnp.asarray(batch),
                                  jnp.asarray(q), jnp.asarray(qb))
        i2, _ = random_ball_query(jax.random.PRNGKey(2), 0.5, 8,
                                  jnp.asarray(xyz), jnp.asarray(batch),
                                  jnp.asarray(q), jnp.asarray(qb))
        assert not np.array_equal(np.asarray(i1), np.asarray(i2))


class TestQueryAndGroup:
    def test_knn_group_with_xyz(self, rng):
        from ponderv2_tpu.ops.pointops import knn_query, knn_query_and_group

        n, c, k = 40, 5, 4
        xyz = rng.rand(n, 3).astype(np.float32)
        feat = rng.randn(n, c).astype(np.float32)
        batch = np.zeros(n, np.int32)
        grouped, idx = knn_query_and_group(
            jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(batch),
            nsample=k, with_xyz=True,
        )
        assert grouped.shape == (n, k, 3 + c)
        idx_ref, _ = knn_query(k, jnp.asarray(xyz), jnp.asarray(batch))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        g = np.asarray(grouped)
        i = np.asarray(idx)
        np.testing.assert_allclose(
            g[:, :, 3:], feat[i], rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            g[:, :, :3], xyz[i] - xyz[:, None, :], rtol=1e-5, atol=1e-5
        )

    def test_ball_group_zero_fills_invalid(self, rng):
        from ponderv2_tpu.ops.pointops import ball_query_and_group

        n, c = 30, 4
        xyz = rng.rand(n, 3).astype(np.float32)
        feat = rng.randn(n, c).astype(np.float32)
        batch = np.zeros(n, np.int32)
        idx = jnp.asarray(
            np.stack([np.arange(n), np.full(n, -1)], axis=1).astype(np.int32)
        )
        grouped, _ = ball_query_and_group(
            jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(batch),
            idx=idx, with_xyz=True,
        )
        g = np.asarray(grouped)
        assert np.all(g[:, 1, :] == 0)
        np.testing.assert_allclose(g[:, 0, 3:], feat, rtol=1e-6)
