"""SpUNet plan prefetch: precomputed-vs-inline equality, host/device parity.

Guards the single-source-of-truth contract of
``models/sparse_unet/plans.build_spunet_plans``: the model's inline build and
an externally supplied (input-pipeline) build must be indistinguishable, and
the host (CPU backend) build must produce bit-identical integer plans.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; smoke tier skips

from ponderv2_tpu.models import build_model
from ponderv2_tpu.models.sparse_unet.plans import (
    build_spunet_plans,
    host_build_spunet_plans,
)
from ponderv2_tpu.models.sparse_unet.spunet import capacity_schedule
from ponderv2_tpu.ops.sparse import make_sparse_tensor, sort_by_key

SMALL = dict(
    type="SpUNet-v1m1",
    in_channels=4,
    num_classes=5,
    base_channels=8,
    channels=(8, 16, 16, 16, 16, 16, 8, 8),
    layers=(1, 1, 1, 1, 1, 1, 1, 1),
)
SHAPE = (32, 32, 32)
BATCH = 2


def make_sorted_batch(rng, n=120, cap=160, cin=4):
    coords = np.stack(
        [
            rng.randint(0, BATCH, n),
            rng.randint(0, SHAPE[0], n),
            rng.randint(0, SHAPE[1], n),
            rng.randint(0, SHAPE[2], n),
        ],
        axis=1,
    ).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    feat = rng.randn(n, cin).astype(np.float32)
    coords = np.concatenate([coords, np.full((cap - n, 4), -1, np.int32)])
    feat = np.concatenate([feat, np.zeros((cap - n, cin), np.float32)])
    st = make_sparse_tensor(jnp.asarray(feat), jnp.asarray(coords), SHAPE, BATCH)
    st, _ = sort_by_key(st)
    return st


class TestPlans:
    def test_precomputed_equals_inline(self):
        rng = np.random.RandomState(7)
        st = make_sorted_batch(rng)
        model = build_model(dict(SMALL))
        num_stages = len(SMALL["layers"]) // 2
        caps = capacity_schedule(st.capacity, num_stages)
        variables = model.init(jax.random.PRNGKey(0), st, train=False)

        out_inline = model.apply(variables, st, train=False)
        plans = jax.jit(
            lambda c: build_spunet_plans(
                c, SHAPE, BATCH, caps, SMALL["channels"])
        )(st.coords)
        # pass plans THROUGH a jit boundary, as the train step does
        out_pre = jax.jit(
            lambda v, f, c, p: model.apply(
                v, make_sparse_tensor(f, c, SHAPE, BATCH), train=False,
                plans=p)
        )(variables, st.features, st.coords, plans)
        # integer plans are bit-identical (test below); the float outputs may
        # reassociate between the eager and jitted executables
        np.testing.assert_allclose(np.asarray(out_inline),
                                   np.asarray(out_pre), rtol=1e-3, atol=1e-6)

    def test_band_budgets_auto_size(self):
        """Pathological coords must overflow tiny starting budgets and the
        host build must auto-double until every band plan's ``ok`` flag is
        True — no env tuning. Overflow is guaranteed by construction:
        alternating dense (32y x 16z = 512-row) and sparse (4y x 4z = 16-row)
        x-slices make a sparse-slice row's x-neighbor tap inputs spread
        across the full dense next slice, so the (block, tap-column) span is
        ~544 rows — past the 384-row static window — for every block that
        straddles a sparse slice."""
        from ponderv2_tpu.models.sparse_unet.plans import band_ok_flags

        S = 32
        rows = []
        for x in range(S):
            ys = range(S) if x % 2 == 0 else range(0, S, 8)
            zmax = 16 if x % 2 == 0 else 4
            for y in ys:
                for z in range(zmax):
                    rows.append((0, x, y, z))
        coords = np.array(rows, np.int32)  # already (b, x, y, z) sorted
        shape = (S, S, 16)
        num_stages = 4
        caps = capacity_schedule(len(coords), num_stages)
        channels = (16, 16, 16, 16, 16, 16, 8, 96)

        plans = host_build_spunet_plans(
            coords[:, 1:], coords[:, 0], shape, 1, caps, channels,
            band_budgets=(4, 64), max_doublings=8)
        flags = band_ok_flags(plans)
        assert flags, "expected band plans to be attached"
        assert all(bool(f) for f in flags)
        # budgets actually grew past the tiny start
        assert plans.l0.band.ov_i.shape[0] > 64
        assert int((plans.l0.band.ov_i >= 0).sum()) > 64

    def test_host_build_matches_device_build(self):
        rng = np.random.RandomState(11)
        st = make_sorted_batch(rng)
        num_stages = len(SMALL["layers"]) // 2
        caps = capacity_schedule(st.capacity, num_stages)

        dev = jax.jit(
            lambda c: build_spunet_plans(
                c, SHAPE, BATCH, caps, SMALL["channels"])
        )(st.coords)
        host = host_build_spunet_plans(
            np.asarray(st.coords[:, 1:]), np.asarray(st.coords[:, 0]),
            SHAPE, BATCH, caps, SMALL["channels"])

        leaves_d, treedef_d = jax.tree.flatten(dev)
        leaves_h, treedef_h = jax.tree.flatten(host)
        assert str(treedef_d) == str(treedef_h)
        for ld, lh in zip(leaves_d, leaves_h):
            np.testing.assert_array_equal(np.asarray(ld), np.asarray(lh))
