"""Tests for the voxel/point substrate: hashing, unique, pooling, offsets."""

import numpy as np
import jax.numpy as jnp
import pytest

from ponderv2_tpu.ops import hashing
from ponderv2_tpu.ops.sparse import (
    SparseTensor,
    batch2offset,
    make_sparse_tensor,
    offset2batch,
    to_dense,
    unique_voxels,
    voxel_pool,
)


def random_coords(rng, n, shape=(20, 20, 20), batch=2, pad=0):
    coords = np.stack(
        [
            rng.randint(0, batch, n),
            rng.randint(0, shape[0], n),
            rng.randint(0, shape[1], n),
            rng.randint(0, shape[2], n),
        ],
        axis=1,
    ).astype(np.int32)
    if pad:
        coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    return coords


class TestHashing:
    @pytest.mark.parametrize("mode", ["dense", "sorted", "pair"])
    def test_lookup_roundtrip(self, rng, mode):
        shape = (3000, 3000, 3000) if mode == "pair" else (30, 30, 30)
        assert hashing.key_fits_int32(shape, 2) != (mode == "pair")
        coords = random_coords(rng, 200, shape=(20, 20, 20), batch=2, pad=16)
        uniq = np.unique(coords[coords[:, 0] >= 0], axis=0)
        uniq = np.concatenate([uniq, np.full((8, 4), -1, np.int32)])
        table = hashing.build_table(
            jnp.asarray(uniq), shape, 2, prefer_dense=(mode == "dense")
        )
        if mode == "dense":
            assert isinstance(table, hashing.DenseTable)
        else:
            assert table.single != (mode == "pair")
        # every table entry finds itself
        idx = np.asarray(hashing.lookup(table, jnp.asarray(uniq), shape))
        valid = uniq[:, 0] >= 0
        np.testing.assert_array_equal(idx[valid], np.arange(valid.sum()))
        assert (idx[~valid] == -1).all()
        # absent coords -> -1
        absent = np.array([[0, 25, 25, 25], [1, 19, 19, 19]], np.int32)
        present = (uniq[None, valid] == absent[:, None]).all(-1).any(1)
        res = np.asarray(hashing.lookup(table, jnp.asarray(absent), shape))
        assert ((res >= 0) == present).all()

    def test_dense_and_sorted_lookup_agree(self, rng):
        shape = (40, 40, 40)
        coords = random_coords(rng, 300, shape=(40, 40, 40), batch=2, pad=20)
        queries = random_coords(rng, 500, shape=(41, 41, 41), batch=2, pad=12)
        dense = hashing.build_table(jnp.asarray(coords), shape, 2,
                                    prefer_dense=True)
        srt = hashing.build_table(jnp.asarray(coords), shape, 2,
                                  prefer_dense=False)
        assert isinstance(dense, hashing.DenseTable)
        a = np.asarray(hashing.lookup(dense, jnp.asarray(queries), shape))
        b = np.asarray(hashing.lookup(srt, jnp.asarray(queries), shape))
        np.testing.assert_array_equal(a, b)

    def test_fnv_matches_reference_formula(self):
        coords = np.array([[1, 2, 3, 4], [0, 0, 0, 0]], np.int32)
        out = np.asarray(hashing.fnv_hash(jnp.asarray(coords)))
        for row, expect in zip(coords, out):
            h = np.uint32(2166136261)
            for v in row:
                h = np.uint32((int(h) ^ int(np.uint32(v))) * 16777619 & 0xFFFFFFFF)
            assert h == expect


class TestUniqueVoxels:
    def test_matches_numpy_unique(self, rng):
        coords = random_coords(rng, 300, pad=20)
        cap = 320
        uc, inv, count = unique_voxels(jnp.asarray(coords), (20, 20, 20), 2, cap)
        uc, inv, count = np.asarray(uc), np.asarray(inv), int(count)
        ref = np.unique(coords[coords[:, 0] >= 0], axis=0)
        assert count == len(ref)
        np.testing.assert_array_equal(uc[:count], ref)  # ascending key order
        assert (uc[count:] == -1).all()
        # inverse maps every valid input row to its own coords
        valid = coords[:, 0] >= 0
        np.testing.assert_array_equal(uc[inv[valid]], coords[valid])
        assert (inv[~valid] == cap).all()

    def test_overflow_drops_largest_keys(self, rng):
        coords = random_coords(rng, 500)
        ref = np.unique(coords, axis=0)
        cap = len(ref) - 5
        uc, inv, count = unique_voxels(jnp.asarray(coords), (20, 20, 20), 2, cap)
        assert int(count) == cap
        np.testing.assert_array_equal(np.asarray(uc), ref[:cap])


class TestVoxelPool:
    def test_mean_pool_matches_numpy(self, rng):
        coords = random_coords(rng, 200, pad=8)
        feats = rng.randn(208, 5).astype(np.float32)
        feats[200:] = 0
        st, inv = voxel_pool(
            jnp.asarray(feats), jnp.asarray(coords), (20, 20, 20), 2, capacity=256
        )
        uc = np.asarray(st.coords)
        out = np.asarray(st.features)
        valid = coords[:, 0] >= 0
        ref_u, ref_inv = np.unique(coords[valid], axis=0, return_inverse=True)
        for i in range(len(ref_u)):
            np.testing.assert_allclose(
                out[i], feats[valid][ref_inv == i].mean(0), rtol=1e-5
            )
        assert (np.abs(out[len(ref_u):]) == 0).all()

    def test_to_dense(self, rng):
        coords = np.array([[0, 1, 2, 3], [1, 0, 0, 0], [-1, -1, -1, -1]], np.int32)
        feats = np.array([[1.0], [2.0], [99.0]], np.float32)
        st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords), (4, 4, 4), 2)
        dense = np.asarray(to_dense(st))
        assert dense.shape == (2, 1, 4, 4, 4)
        assert dense[0, 0, 1, 2, 3] == 1.0 and dense[1, 0, 0, 0, 0] == 2.0
        assert dense.sum() == 3.0  # padding row dropped


class TestOffsets:
    def test_roundtrip(self):
        offset = jnp.asarray([3, 5, 9])
        batch = np.asarray(offset2batch(offset, total=12))
        np.testing.assert_array_equal(
            batch, [0, 0, 0, 1, 1, 2, 2, 2, 2, -1, -1, -1]
        )
        off2 = np.asarray(batch2offset(jnp.asarray(batch), 3))
        np.testing.assert_array_equal(off2, [3, 5, 9])


class TestOutOfBoundsRows:
    def test_subm_rulebook_drops_out_of_shape_rows(self, rng):
        """Rows whose coords exceed the static spatial shape are invalid
        everywhere — dense and sorted table paths must agree (regression:
        the sorted path used to self-connect their center tap)."""
        import ponderv2_tpu.ops.hashing as H
        from ponderv2_tpu.ops import spconv as S

        shape = (16, 16, 16)
        coords = np.array(
            [[0, 1, 1, 1], [0, 1, 1, 2], [0, 5, 5, 20], [0, 20, 3, 3],
             [-1, -1, -1, -1]],
            np.int32,
        )
        cj = jnp.asarray(coords)
        rb_dense = np.asarray(S.build_subm_rulebook(cj, shape, 1, 3))
        old = H.DENSE_GRID_LIMIT
        try:
            H.DENSE_GRID_LIMIT = 0
            rb_sorted = np.asarray(S.build_subm_rulebook(cj, shape, 1, 3))
        finally:
            H.DENSE_GRID_LIMIT = old
        np.testing.assert_array_equal(rb_dense, rb_sorted)
        # out-of-shape rows 2,3 and padding row 4: -1 at every tap
        assert (rb_dense[:, 2:] == -1).all()
        # in-bounds rows keep their neighbors (center tap = self)
        assert rb_dense[13, 0] == 0 and rb_dense[13, 1] == 1
        assert rb_dense[14, 0] == 1 and rb_dense[12, 1] == 0


def test_lookup_runs_matches_lookup():
    """Packed z-run lookups must equal per-cell scalar lookups, including
    z-boundary runs and invalid columns."""
    import jax.numpy as jnp
    from ponderv2_tpu.ops import hashing

    rng = np.random.RandomState(3)
    shape, batch = (7, 9, 11), 2
    coords = np.unique(
        np.stack(
            [rng.randint(0, batch, 80), rng.randint(0, 7, 80),
             rng.randint(0, 9, 80), rng.randint(0, 11, 80)], axis=1
        ), axis=0,
    ).astype(np.int32)
    table = hashing.build_dense_table(jnp.asarray(coords), shape, batch)
    # bases probing past every boundary, plus invalid columns / padding rows
    bases = np.stack(
        [rng.randint(-1, batch + 1, 400), rng.randint(-2, 9, 400),
         rng.randint(-2, 11, 400), rng.randint(-6, 13, 400)], axis=1
    ).astype(np.int32)
    runs = hashing.lookup_runs(table, jnp.asarray(bases), shape, 5)
    for dz in range(5):
        q = bases.copy()
        q[:, 3] += dz
        # scalar lookup treats any negative coordinate row as invalid;
        # lookup_runs likewise requires a valid (b, x, y) column
        q = np.where((bases[:, :3] >= 0).all(1, keepdims=True), q, -1)
        ref = hashing.lookup(table, jnp.asarray(q), shape)
        ref = jnp.where(jnp.asarray((q >= 0).all(1)), ref, -1)
        got = jnp.where(jnp.asarray((q >= 0).all(1)), runs[:, dz], -1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
