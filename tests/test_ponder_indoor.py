"""PonderIndoor-v2 end-to-end: synthetic RGB-D pretraining forward/backward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; smoke tier skips

from ponderv2_tpu.datasets import build_dataset
from ponderv2_tpu.datasets.utils import collate_fn
from ponderv2_tpu.engines.common import split_batch
from ponderv2_tpu.models import build_model

MODEL_CFG = dict(
    type="PonderIndoor-v2",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=8,
        channels=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
    ),
    projection=dict(type="UNet3D-v1m2", in_channels=8, out_channels=16,
                    f_maps=8, num_levels=2),
    renderer=dict(
        type="NeuSModel",
        field=dict(hidden_dim=32, num_layers=2, geo_feat_dim=8,
                   semantic_dim=512, share_volume=False),
        collider=dict(type="AABBBoxCollider", near_plane=0.01),
        sampler=dict(type="NeuSSampler", num_samples=12,
                     num_samples_importance=4, num_upsample_steps=1),
        loss=dict(sensor_depth_truncation=0.05,
                  weights=dict(rgb=10.0, depth=1.0, semantic=0.1,
                               eikonal=0.01, free_space=1.0, sdf=10.0,
                               sparse_sdf=0.1)),
    ),
    grid_shape=(32, 32, 16),
    grid_size=0.02,
    ray_nsample=32,
    padding=0.1,
    conditions=("Synthetic",),
    class_name=tuple(f"class_{i}" for i in range(8)),
    valid_index=(tuple(range(8)),),
    ppt_loss_weight=0.1,
)

TRANSFORM = [
    dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="NormalizeColor"),
    dict(type="Collect",
         keys=("coord", "grid_coord", "segment", "rgb", "depth", "semantic2d",
               "intrinsic", "extrinsic"),
         feat_keys=("color", "normal")),
]


def make_batch():
    ds = build_dataset(
        dict(type="SyntheticRGBDDataset", num_scenes=2, points_per_scene=1500,
             num_classes=8, num_cameras=2, image_size=32, transform=TRANSFORM)
    )
    scenes = [ds[i] for i in range(2)]
    batch = collate_fn(scenes, point_budget=3000, scene_budget=2)
    arrays, _ = split_batch(batch)
    return {k: jnp.asarray(v) for k, v in arrays.items()}


class TestPonderIndoor:
    def test_forward_backward(self):
        arrays = make_batch()
        static_ctx = dict(spatial_shape=(160, 160, 64), batch_size=2)
        model = build_model(dict(MODEL_CFG))
        input_dict = {**arrays, **static_ctx, "rng": jax.random.PRNGKey(0)}
        variables = model.init(jax.random.PRNGKey(1), input_dict, train=False)
        assert "constants" in variables  # CLIP class embeddings

        def loss_fn(params):
            out, _ = model.apply(
                {**variables, "params": params}, input_dict, train=True,
                mutable=["batch_stats"],
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss)), f"loss={loss}"
        for key in ("rgb_loss", "depth_loss", "semantic_loss", "eikonal_loss",
                    "free_space_loss", "sdf_loss", "sparse_sdf_loss", "psnr",
                    "ppt_loss"):
            assert key in out and np.isfinite(float(out[key])), key
        gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
        assert gsum > 0
        # the field variance param must receive gradient (NeuS alive)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        var_grads = [v for p, v in flat if "variance" in str(p)]
        assert var_grads and float(jnp.abs(var_grads[0])) >= 0

    def test_loss_decreases_under_sgd(self):
        import optax

        arrays = make_batch()
        static_ctx = dict(spatial_shape=(160, 160, 64), batch_size=2)
        model = build_model(dict(MODEL_CFG))
        input_dict = {**arrays, **static_ctx, "rng": jax.random.PRNGKey(0)}
        variables = model.init(jax.random.PRNGKey(1), input_dict, train=False)
        params = variables["params"]
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                out, _ = model.apply(
                    {**variables, "params": p},
                    {**input_dict, "rng": key}, train=True,
                    mutable=["batch_stats"],
                )
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for i in range(8):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(0))
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestFullPixelEval:
    def test_chunked_eval_matches_single_pass(self):
        """Eval renders EVERY pixel (reference full-image eval); the nn.scan
        val_ray_split chunk path must reproduce the single-pass render."""
        arrays = make_batch()
        batch = {**arrays, "spatial_shape": (160, 160, 64), "batch_size": 2,
                 "rng": jax.random.PRNGKey(0)}
        model_one = build_model(dict(MODEL_CFG, val_ray_split=10240))
        variables = model_one.init(jax.random.PRNGKey(0), batch, train=False)
        out_one = model_one.apply(variables, batch, train=False)

        model_chunk = build_model(dict(MODEL_CFG, val_ray_split=512))
        out_chunk = model_chunk.apply(variables, batch, train=False)

        # full-pixel ray count: V * H * W = 2 * 32 * 32
        assert out_one["render"]["rgb"].shape[1] == 2 * 32 * 32
        for k in out_one["render"]:
            # scan vs inline compilation reassociates float reductions; the
            # atol covers normals (unit vectors whose near-zero components
            # carry large relative noise)
            np.testing.assert_allclose(
                np.asarray(out_chunk["render"][k]),
                np.asarray(out_one["render"][k]),
                rtol=1e-3, atol=5e-3, err_msg=k)
        np.testing.assert_allclose(float(out_chunk["loss"]),
                                   float(out_one["loss"]), rtol=1e-3)
