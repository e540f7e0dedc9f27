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
    coord = (rng.rand(n, 3) * np.array([16, 16, 3]) - np.array([8, 8, 1.5])
             ).astype(np.float32)
    pad = cap - n
    coordp = np.concatenate([coord, np.zeros((pad, 3), np.float32)])
    strength = rng.rand(cap, 1).astype(np.float32)
    feat = np.concatenate([coordp, strength], axis=1).astype(np.float32)
    grid = np.concatenate([
        ((coord + np.array([8, 8, 1.5])) / 0.2).astype(np.int32),
        np.full((pad, 3), -1, np.int32),
    ])
    b = np.concatenate([rng.randint(0, batch, n), np.full(pad, -1)]).astype(np.int32)
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


class TestPonderOutdoor:
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
