"""PonderOutdoor-v2: LiDAR rendering pretraining forward/backward."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; smoke tier skips
import jax
import jax.numpy as jnp

from ponderv2_tpu.models import build_model

MODEL_CFG = dict(
    type="PonderOutdoor-v2",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=0,
        base_channels=8,
        channels=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
    ),
    projection=dict(type="SimpleConv3D-v1m1", in_channels=8, out_channels=16),
    renderer=dict(
        type="NeuSModel",
        field=dict(hidden_dim=32, num_layers=2, geo_feat_dim=8,
                   use_semantic=False, share_volume=True),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(type="NeuSSampler", num_samples=12,
                     num_samples_importance=4, num_upsample_steps=1),
        loss=dict(sensor_depth_truncation=0.01,
                  weights=dict(rgb=10.0, depth=1.0, eikonal=0.01,
                               free_space=1.0, sdf=10.0)),
    ),
    grid_shape=(24, 24, 4),
    point_cloud_range=(-10.0, -10.0, -2.0, 10.0, 10.0, 2.0),
    conditions=("NuScenes",),
)


def make_outdoor_batch(rng, n=800, cap=1024, batch=2, rays=64):
    # unique (batch, voxel) keys — the spconv rulebook's unique-voxel
    # contract (real pipelines guarantee it via GridSample); duplicates
    # poison the plan's rank self-check and zero the backbone
    b_all = rng.randint(0, batch, n)
    cells = np.stack(np.meshgrid(np.arange(80), np.arange(80), np.arange(15),
                                 indexing="ij"), -1).reshape(-1, 3)
    grid_list = np.zeros((n, 3), np.int64)
    for i in range(batch):
        m = b_all == i
        grid_list[m] = cells[rng.choice(len(cells), int(m.sum()),
                                        replace=False)]
    coord = (grid_list * 0.2 - np.array([8, 8, 1.5])
             + rng.rand(n, 3) * 0.2).astype(np.float32)
    pad = cap - n
    coordp = np.concatenate([coord, np.zeros((pad, 3), np.float32)])
    strength = rng.rand(cap, 1).astype(np.float32)
    feat = np.concatenate([coordp, strength], axis=1).astype(np.float32)
    grid = np.concatenate([
        grid_list.astype(np.int32),
        np.full((pad, 3), -1, np.int32),
    ])
    b = np.concatenate([b_all, np.full(pad, -1)]).astype(np.int32)
    # rays: camera at origin-ish to lidar points
    pick = rng.randint(0, n, (batch, rays))
    ray_end = coord[pick]
    ray_start = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (batch, rays, 1))
    ray_rgb = (rng.rand(batch, rays, 3) * 255).astype(np.float32)
    return dict(
        feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(grid),
        batch=jnp.asarray(b),
        coord=jnp.asarray(coordp),
        ray_start=jnp.asarray(ray_start),
        ray_end=jnp.asarray(ray_end.astype(np.float32)),
        ray_rgb=jnp.asarray(ray_rgb),
        ray_valid=jnp.ones((batch, rays), bool),
        spatial_shape=(128, 128, 32),
        batch_size=batch,
        rng=jax.random.PRNGKey(0),
    )


class TestBlockMask:
    def test_keep_is_blockwise_and_matches_ratio(self, rng):
        from ponderv2_tpu.models.ponder.ponder_outdoor import block_mask_keep

        n, size, ratio = 20000, 8, 0.8
        grid = jnp.asarray(rng.randint(0, 160, (n, 3)).astype(np.int32))
        batch = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
        keep = np.asarray(
            block_mask_keep(grid, batch, size, ratio, jax.random.PRNGKey(3))
        )
        # same (batch, block) -> same decision
        key = np.stack([np.asarray(batch)] + list(np.asarray(grid).T // size))
        flat = key[0] * 10**9 + key[1] * 10**6 + key[2] * 10**3 + key[3]
        for k in np.unique(flat)[:200]:
            assert len(set(keep[flat == k])) == 1
        # block-level keep fraction ~ 1 - ratio
        uk, idx = np.unique(flat, return_index=True)
        frac = keep[idx].mean()
        assert abs(frac - (1 - ratio)) < 0.05
        # padding rows always kept
        batch_pad = jnp.asarray(np.full(n, -1, np.int32))
        keep_pad = np.asarray(
            block_mask_keep(grid, batch_pad, size, ratio, jax.random.PRNGKey(3))
        )
        assert keep_pad.all()

    def test_per_condition_resolution(self):
        from ponderv2_tpu.models.ponder.ponder_outdoor import _per_condition

        flat = (-10.0, -10.0, -2.0, 10.0, 10.0, 2.0)
        assert _per_condition(flat, 1) == flat
        per = ((-10.0,) * 6, (-20.0,) * 6)
        assert _per_condition(per, 1) == (-20.0,) * 6


class TestPonderOutdoor:
    def test_forward_backward_masked(self, rng):
        """Block masking (reference ponder_outdoor_base.py:44-51,106-135):
        masked pretrain step must train and flow grads into mtoken."""
        batch = make_outdoor_batch(rng)
        cfg = dict(MODEL_CFG)
        cfg["mask"] = dict(ratio=0.8, size=8, channel=4)
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(1), batch, train=False)
        assert variables["params"]["mtoken"].shape == (1, 4)

        def loss_fn(params):
            out, _ = model.apply({**variables, "params": params}, batch,
                                 train=True, mutable=["batch_stats"])
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        assert float(jnp.sum(jnp.abs(grads["mtoken"]))) > 0

    def test_forward_backward(self, rng):
        batch = make_outdoor_batch(rng)
        model = build_model(dict(MODEL_CFG))
        variables = model.init(jax.random.PRNGKey(1), batch, train=False)

        def loss_fn(params):
            out, _ = model.apply({**variables, "params": params}, batch,
                                 train=True, mutable=["batch_stats"])
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss))
        for k in ("rgb_loss", "depth_loss", "eikonal_loss", "sdf_loss"):
            assert k in out and np.isfinite(float(out[k])), k
        gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
        assert np.isfinite(gsum) and gsum > 0
        # regression guard: unsorted input rows once zero-poisoned the
        # backbone (spconv sortedness contract) — the render loss silently
        # decoupled from the point features while total grads stayed nonzero
        bsum = sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree.leaves(grads["backbone_net"]))
        assert bsum > 0
