"""Data pipeline tests: transforms, GridSample modes, collate, loaders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ponderv2_tpu.datasets import TRANSFORMS, Compose, build_dataset, collate_fn
from ponderv2_tpu.datasets.dataloader import MultiDatasetDataloader, build_dataloader


def make_scene(rng, n=500):
    return dict(
        coord=rng.rand(n, 3).astype(np.float32) * 4,
        color=(rng.rand(n, 3) * 255).astype(np.float32),
        normal=rng.randn(n, 3).astype(np.float32),
        segment=rng.randint(0, 5, n).astype(np.int64),
        extrinsic=np.stack([np.eye(4, dtype=np.float32)] * 2),
    )


class TestGeometricTransforms:
    @pytest.mark.parametrize("cfg", [
        dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", p=1.0, keys=["extrinsic"]),
        dict(type="RandomScale", scale=[0.8, 1.2], keys=["extrinsic"]),
        dict(type="RandomFlip", p=1.0, keys=["extrinsic"]),
        dict(type="RandomShift", keys=["extrinsic"]),
    ])
    def test_camera_consistency(self, rng, cfg):
        """M' p' must equal M p: camera matrices track point transforms exactly."""
        data = make_scene(rng)
        p0 = data["coord"].copy()
        E0 = data["extrinsic"].copy()
        out = TRANSFORMS.build(cfg)(data)
        p1, E1 = out["coord"], out["extrinsic"]
        h0 = np.concatenate([p0, np.ones((len(p0), 1))], 1)
        h1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
        cam0 = h0 @ E0[0].T
        cam1 = h1 @ E1[0].T
        np.testing.assert_allclose(cam0, cam1, rtol=1e-4, atol=1e-4)

    def test_rotate_preserves_shape(self, rng):
        data = make_scene(rng)
        d0 = np.linalg.norm(data["coord"][0] - data["coord"][1])
        out = TRANSFORMS.build(dict(type="RandomRotate", angle=[-1, 1], p=1.0))(data)
        d1 = np.linalg.norm(out["coord"][0] - out["coord"][1])
        assert d0 == pytest.approx(d1, rel=1e-5)


class TestGridSample:
    def test_train_mode_one_point_per_voxel(self, rng):
        data = make_scene(rng, 2000)
        gs = TRANSFORMS.build(dict(type="GridSample", grid_size=0.5,
                                   hash_type="fnv", mode="train",
                                   return_grid_coord=True))
        out = gs(data)
        vox = out["grid_coord"]
        assert len(np.unique(vox, axis=0)) == len(vox)  # one point per voxel
        assert (vox.min(0) >= 0).all()

    def test_test_mode_fragments_cover_all_points(self, rng):
        data = make_scene(rng, 2000)
        gs = TRANSFORMS.build(dict(type="GridSample", grid_size=0.5,
                                   hash_type="fnv", mode="test",
                                   return_grid_coord=True,
                                   keys=("coord", "color", "normal", "segment")))
        out = gs(data)
        frags = out["fragment_list"]
        assert len(frags) >= 1
        covered = np.concatenate([f["index"] for f in frags])
        np.testing.assert_array_equal(np.sort(np.unique(covered)),
                                      np.arange(2000))


class TestCollate:
    def test_padding_and_budget_drop(self, rng):
        scenes = [make_scene(rng, n) for n in (100, 200, 300)]
        for s in scenes:
            s.pop("extrinsic")
        out = collate_fn(scenes, point_budget=350, scene_budget=3)
        assert out["coord"].shape == (350, 3)
        # third scene dropped (100+200+300 > 350); padding after 300
        assert (out["batch"][:300] >= 0).all()
        assert (out["batch"][300:] == -1).all()
        assert out["segment"][300:].max() == -1
        assert out["batch_size"] == 3

    def test_mix3d_merges_pairs(self, rng):
        scenes = [make_scene(rng, 50) for _ in range(4)]
        for s in scenes:
            s.pop("extrinsic")
        np.random.seed(0)
        import random
        random.seed(0)  # force mix
        out = collate_fn(scenes, point_budget=200, mix_prob=1.0)
        assert set(np.unique(out["batch"])) == {0, 1}


class TestLoaders:
    def _ds_cfg(self, n_scenes, loop=1):
        return dict(
            type="SyntheticDataset", num_scenes=n_scenes, points_per_scene=400,
            num_classes=5, loop=loop,
            transform=[
                dict(type="PositiveShift"),
                dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                     mode="train", return_grid_coord=True),
                dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                     feat_keys=("color", "normal")),
            ],
        )

    def test_dataloader_shapes(self):
        ds = build_dataset(self._ds_cfg(4))
        loader = build_dataloader(ds, batch_size=2, point_budget=1024,
                                  scene_budget=2, shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b["feat"].shape == (1024, 6)
            assert b["batch_size"] == 2

    def test_multidataset_round_robin(self):
        from ponderv2_tpu.datasets.defaults import ConcatDataset

        concat = ConcatDataset(datasets=[
            self._ds_cfg(4, loop=2), self._ds_cfg(4, loop=1),
        ])
        loader = MultiDatasetDataloader(concat, batch_size_per_dataset=2,
                                        point_budget=1024)
        conditions = [b["condition"] for b in loader]
        assert len(conditions) > 0
        assert conditions.count("SyntheticDataset") == len(conditions)


class TestCollateSortInvariant:
    def _scenes(self, rng, sizes=(120, 90)):
        scenes = []
        for n in sizes:
            g = rng.randint(0, 40, (n, 3)).astype(np.int32)
            # unique voxels per scene (spconv contract)
            g = np.unique(g, axis=0)
            n = len(g)
            scenes.append(dict(
                coord=g.astype(np.float32) * 0.05,
                grid_coord=g,
                feat=rng.rand(n, 6).astype(np.float32),
                segment=rng.randint(0, 5, n).astype(np.int64),
            ))
        return scenes

    def test_rows_sorted_by_batch_and_voxel_key(self, rng):
        out = collate_fn(self._scenes(rng), point_budget=256, scene_budget=2)
        b = out["batch"]
        valid = b >= 0
        g = out["grid_coord"][valid].astype(np.int64)
        key = ((b[valid].astype(np.int64) * 64 + g[:, 0]) * 64 + g[:, 1]) \
            * 64 + g[:, 2]
        assert (np.diff(key) > 0).all()  # strictly: unique voxels per scene
        assert not valid[np.argmax(~valid):].any()  # padding is a suffix

    def test_point_keys_permuted_consistently(self, rng):
        scenes = self._scenes(rng)
        out = collate_fn(scenes, point_budget=256, scene_budget=2)
        valid = out["batch"] >= 0
        # every (grid_coord, feat, segment) row triple must still co-occur
        orig = {}
        for si, s in enumerate(scenes):
            for i in range(len(s["feat"])):
                orig[(si, *s["grid_coord"][i])] = (s["feat"][i], s["segment"][i])
        for i in np.where(valid)[0]:
            k = (out["batch"][i], *out["grid_coord"][i])
            f, seg = orig[k]
            np.testing.assert_array_equal(out["feat"][i], f)
            assert out["segment"][i] == seg

    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_assume_sorted_model_equivalence(self, rng):
        from ponderv2_tpu.models import build_model

        scenes = self._scenes(rng)
        out = collate_fn(scenes, point_budget=256, scene_budget=2)
        arrays = {k: jnp.asarray(v) for k, v in out.items()
                  if isinstance(v, np.ndarray)}
        arrays["batch_size"] = 2
        arrays["spatial_shape"] = (64, 64, 64)
        cfg = dict(
            type="DefaultSegmentor",
            backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=5,
                          base_channels=8, channels=(8, 8, 8, 8),
                          layers=(1, 1, 1, 1)),
            criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
        )
        m_sort = build_model(dict(cfg))
        variables = m_sort.init(jax.random.PRNGKey(0), arrays, train=False)
        m_trust = build_model(dict(cfg, assume_sorted=True))
        o1 = m_sort.apply(variables, arrays, train=False)["seg_logits"]
        o2 = m_trust.apply(variables, arrays, train=False)["seg_logits"]
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   rtol=1e-5, atol=1e-5)
