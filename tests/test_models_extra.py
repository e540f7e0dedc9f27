"""PPT / PDNorm / PointGroup / losses / instance-AP tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; smoke tier skips

from ponderv2_tpu.models import build_model

SMALL_PD_BACKBONE = dict(
    type="SpUNet-v1m3",
    in_channels=6,
    num_classes=0,
    base_channels=8,
    channels=(8, 16, 16, 16, 16, 16, 8, 8),
    layers=(1, 1, 1, 1, 1, 1, 1, 1),
    conditions=("A", "B"),
    norm_adaptive=True,
    context_channels=16,
)


def make_batch(rng, n=100, cap=128, shape=(32, 32, 32), batch=2, classes=5):
    coords = np.unique(
        np.stack(
            [rng.randint(0, batch, n), rng.randint(0, shape[0], n),
             rng.randint(0, shape[1], n), rng.randint(0, shape[2], n)], axis=1
        ), axis=0)
    n = len(coords)
    pad = cap - n
    feat = np.concatenate([rng.randn(n, 6).astype(np.float32),
                           np.zeros((pad, 6), np.float32)])
    grid = np.concatenate([coords[:, 1:], np.full((pad, 3), -1)]).astype(np.int32)
    b = np.concatenate([coords[:, 0], np.full(pad, -1)]).astype(np.int32)
    seg = np.concatenate([rng.randint(0, classes, n), np.full(pad, -1)]).astype(np.int64)
    coord = np.concatenate([coords[:, 1:].astype(np.float32) * 0.05,
                            np.zeros((pad, 3), np.float32)])
    return dict(
        feat=jnp.asarray(feat), grid_coord=jnp.asarray(grid),
        batch=jnp.asarray(b), segment=jnp.asarray(seg),
        coord=jnp.asarray(coord),
        spatial_shape=(32, 32, 32), batch_size=2,
    )


class TestPPT:
    def test_forward_loss_and_condition_specialization(self, rng):
        model = build_model(dict(
            type="PPT-v1m1",
            backbone=SMALL_PD_BACKBONE,
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            conditions=("A", "B"),
            class_name=tuple(f"c{i}" for i in range(7)),
            valid_index=((0, 1, 2, 3, 4), (2, 3, 4, 5, 6)),
            backbone_out_channels=8,
            context_channels=16,
        ))
        batch = make_batch(rng)
        batch["condition"] = "A"
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert out["seg_logits"].shape == (128, 5)  # valid_index A has 5 classes
        assert np.isfinite(float(out["loss"]))
        batch["condition"] = "B"
        out_b = model.apply(variables, batch, train=False)
        assert out_b["seg_logits"].shape == (128, 5)
        assert not np.allclose(np.asarray(out["seg_logits"]),
                               np.asarray(out_b["seg_logits"]))

    def test_pdnorm_decoupled_stats(self, rng):
        """Different conditions must update different BN stats."""
        model = build_model(dict(
            type="PPT-v1m1",
            backbone=SMALL_PD_BACKBONE,
            criteria=[],
            conditions=("A", "B"),
            class_name=tuple(f"c{i}" for i in range(7)),
            valid_index=((0, 1, 2), (3, 4, 5)),
            backbone_mode=True,
        ))
        batch = make_batch(rng)
        batch["condition"] = "A"
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        _, mut = model.apply(variables, batch, train=True,
                             mutable=["batch_stats"])
        flat_before = jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"])[0]
        flat_after = dict(jax.tree_util.tree_flatten_with_path(
            mut["batch_stats"])[0])
        changed_a = changed_b = False
        for path, before in flat_before:
            after = flat_after[path]
            p = str(path)
            if not np.allclose(np.asarray(before), np.asarray(after)):
                if "bn_A" in p:
                    changed_a = True
                if "bn_B" in p:
                    changed_b = True
        assert changed_a and not changed_b


class TestPointGroup:
    def test_train_losses_and_proposals(self, rng):
        model = build_model(dict(
            type="PG-v1m1",
            backbone=dict(
                type="SpUNet-v1m1", in_channels=6, num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            backbone_out_channels=8,
            semantic_num_classes=5,
            segment_ignore_index=(-1,),
            cluster_min_points=5,
            cluster_propose_points=5,
        ))
        batch = make_batch(rng)
        n = 128
        instance = np.asarray(batch["segment"]).copy()  # 1 instance per class
        centroid = np.zeros((n, 3), np.float32)
        batch["instance"] = jnp.asarray(instance)
        batch["instance_centroid"] = jnp.asarray(centroid)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out, _ = model.apply(variables, batch, train=True,
                             mutable=["batch_stats"])
        for k in ("loss", "seg_loss", "bias_l1_loss", "bias_cosine_loss"):
            assert np.isfinite(float(out[k])), k
        # host-side clustering on a synthetic two-cluster layout
        coord = np.zeros((40, 3), np.float32)
        coord[20:] += 5.0
        logits = np.zeros((40, 5), np.float32)
        logits[:, 2] = 10.0
        props = model.propose_instances(
            coord, logits, np.zeros((40, 3), np.float32), np.zeros(40, np.int32)
        )
        assert len(props) >= 2
        sizes = sorted(int(p["mask"].sum()) for p in props)
        assert 20 in sizes


class TestInstanceAP:
    def test_perfect_predictions_ap1(self):
        from ponderv2_tpu.engines.hooks.evaluator import evaluate_instance_ap

        n = 400
        instance = np.repeat(np.arange(4), 100)
        segment = np.repeat([2, 2, 3, 3], 100)
        preds = [
            dict(mask=instance == i, cls=int(segment[i * 100]), score=0.9)
            for i in range(4)
        ]
        res = evaluate_instance_ap(
            [preds], [dict(instance=instance, segment=segment)],
            num_classes=5, segment_ignore_index=(-1, 0, 1),
        )
        assert res["mAP"] == pytest.approx(1.0)
        assert res["mAP25"] == pytest.approx(1.0)

    def test_wrong_predictions_ap0(self):
        from ponderv2_tpu.engines.hooks.evaluator import evaluate_instance_ap

        n = 200
        instance = np.repeat(np.arange(2), 100)
        segment = np.full(n, 2)
        # prediction masks completely disjoint from gt
        preds = [dict(mask=np.zeros(n, bool), cls=2, score=0.9)]
        res = evaluate_instance_ap(
            [preds], [dict(instance=instance, segment=segment)],
            num_classes=5,
        )
        assert res["mAP"] == pytest.approx(0.0)


class TestLosses:
    def test_ce_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        from ponderv2_tpu.models.losses.builder import LOSSES

        logits = rng.randn(30, 6).astype(np.float32)
        labels = rng.randint(-1, 6, 30).astype(np.int64)
        ce = LOSSES.build(dict(type="CrossEntropyLoss", ignore_index=-1))
        ours = float(ce(jnp.asarray(logits), jnp.asarray(labels)))
        ref = float(F.cross_entropy(torch.from_numpy(logits),
                                    torch.from_numpy(labels), ignore_index=-1))
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_lovasz_zero_for_perfect(self):
        from ponderv2_tpu.models.losses.builder import LOSSES

        labels = jnp.asarray(np.repeat([0, 1, 2], 10))
        logits = jax.nn.one_hot(labels, 3) * 100.0
        lov = LOSSES.build(dict(type="LovaszLoss", mode="multiclass"))
        assert float(lov(logits, labels)) == pytest.approx(0.0, abs=1e-4)

    def test_focal_and_dice_finite(self, rng):
        from ponderv2_tpu.models.losses.builder import LOSSES

        logits = jnp.asarray(rng.randn(20, 4).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 4, 20))
        for cfg in (dict(type="FocalLoss"), dict(type="DiceLoss"),
                    dict(type="SmoothCELoss")):
            loss = LOSSES.build(cfg)(logits, labels)
            assert np.isfinite(float(loss))


class TestInstanceAPProtocol:
    """ScanNet-protocol specifics (reference hooks/evaluator.py:233-510):
    void-overlap discount, hard false negatives, strict > threshold."""

    def _eval(self, preds, instance, segment, **kw):
        from ponderv2_tpu.engines.hooks.evaluator import evaluate_instance_ap

        return evaluate_instance_ap(
            [preds], [dict(instance=instance, segment=segment)],
            num_classes=5, segment_ignore_index=(-1, 0, 1), **kw
        )

    def test_void_dominated_prediction_not_fp(self):
        # gt: one 120-pt instance of class 2; 200 void points (segment 0)
        instance = np.concatenate([np.zeros(120, int), np.full(200, -1)])
        segment = np.concatenate([np.full(120, 2), np.zeros(200, int)])
        good = dict(mask=instance == 0, cls=2, score=0.9)
        # higher-scored than the true positive, so an FP here would dent AP
        void_pred = dict(
            mask=np.concatenate([np.zeros(120, bool), np.ones(200, bool)]),
            cls=2, score=0.95,
        )
        res = self._eval([good, void_pred], instance, segment)
        # the void-dominated proposal is ignored, not a false positive
        assert res["mAP"] == pytest.approx(1.0)
        # without the discount (void points relabeled to a valid class) it IS an FP
        segment_no_void = np.concatenate([np.full(120, 2), np.full(200, 3)])
        instance2 = np.concatenate([np.zeros(120, int), np.full(200, -1)])
        res2 = self._eval([good, void_pred], instance2, segment_no_void)
        assert res2["mAP"] < 1.0

    def test_hard_false_negative_halves_ap(self):
        # two gts, one matched -> recall caps at 0.5 -> AP 0.5
        instance = np.repeat([0, 1], 100)
        segment = np.full(200, 2)
        preds = [dict(mask=instance == 0, cls=2, score=0.9)]
        res = self._eval(preds, instance, segment)
        assert res["mAP50"] == pytest.approx(0.5)

    def test_strict_overlap_threshold(self):
        # pred covers exactly half the gt: IoU 0.5 is NOT > 0.5 -> miss at 50,
        # but > 0.25 -> hit at 25
        instance = np.zeros(200, int)
        segment = np.full(200, 2)
        mask = np.zeros(200, bool)
        mask[:100] = True
        preds = [dict(mask=mask, cls=2, score=0.9)]
        res = self._eval(preds, instance, segment)
        assert res["mAP50"] == pytest.approx(0.0)
        assert res["mAP25"] == pytest.approx(1.0)

    def test_small_prediction_skipped(self):
        # sub-min_region proposals are dropped entirely (not FPs)
        instance = np.zeros(200, int)
        segment = np.full(200, 2)
        good = dict(mask=np.ones(200, bool), cls=2, score=0.9)
        tiny = np.zeros(200, bool)
        tiny[:10] = True
        preds = [good, dict(mask=tiny, cls=2, score=0.95)]
        res = self._eval(preds, instance, segment)
        assert res["mAP"] == pytest.approx(1.0)


class TestClusterProtocolExactness:
    """cluster.bfs_cluster vs a literal O(n^2) numpy port of the reference
    pointgroup_ops semantics (VERDICT r2 #4)."""

    @staticmethod
    def _reference_bfs(coords, classes, radius, min_points, cap=1000):
        # ballquery_batch_p kernel: per point, first <=cap in-radius refs in
        # index order (strict d2 < r2, self included); bfs_cluster.cpp: BFS
        # seeded ascending, expansion through same-label-as-current neighbors,
        # small components discarded but visited.
        n = len(coords)
        d2 = np.sum((coords[:, None] - coords[None, :]) ** 2, -1)
        nbr = [np.where(d2[i] < radius**2)[0][:cap] for i in range(n)]
        visited = np.zeros(n, bool)
        ids = np.full(n, -1, np.int64)
        nid = 0
        for s in range(n):
            if visited[s]:
                continue
            comp, queue, visited[s] = [s], [s], True
            while queue:
                cur = queue.pop(0)
                for j in nbr[cur]:
                    if not visited[j] and classes[j] == classes[cur]:
                        visited[j] = True
                        comp.append(j)
                        queue.append(j)
            if len(comp) >= min_points:
                ids[np.asarray(comp)] = nid
                nid += 1
        return ids, nid

    def _scene(self, rng):
        # three blobs, two classes, one blob pair close enough to bridge
        a = rng.randn(60, 3) * 0.01 + [0, 0, 0]
        b = rng.randn(50, 3) * 0.01 + [0.06, 0, 0]
        c = rng.randn(40, 3) * 0.01 + [1, 1, 1]
        noise = rng.randn(8, 3) * 0.01 + [2, 2, 2]
        coords = np.concatenate([a, b, c, noise]).astype(np.float32)
        classes = np.concatenate(
            [np.zeros(60), np.zeros(50), np.ones(40), np.full(8, 2)]
        ).astype(np.int32)
        perm = rng.permutation(len(coords))
        return coords[perm], classes[perm]

    def test_native_matches_reference_semantics(self, rng):
        from ponderv2_tpu.models.point_group import cluster as C

        coords, classes = self._scene(rng)
        ids, n = C.bfs_cluster(coords, classes, radius=0.05, min_points=20)
        ref_ids, ref_n = self._reference_bfs(coords, classes, 0.05, 20)
        assert n == ref_n
        np.testing.assert_array_equal(ids, ref_ids)

    def test_python_fallback_matches_reference_semantics(self, rng, monkeypatch):
        from ponderv2_tpu.models.point_group import cluster as C

        monkeypatch.setattr(C, "_load_native", lambda: None)
        coords, classes = self._scene(rng)
        ids, n = C.bfs_cluster(coords, classes, radius=0.05, min_points=20)
        ref_ids, ref_n = self._reference_bfs(coords, classes, 0.05, 20)
        assert n == ref_n
        np.testing.assert_array_equal(ids, ref_ids)

    def test_single_set_is_default(self, rng):
        from ponderv2_tpu.models.point_group.cluster import cluster_proposals

        coords, classes = self._scene(rng)
        shifted = coords + rng.randn(*coords.shape).astype(np.float32) * 0.001
        valid = np.ones(len(coords), bool)
        single = cluster_proposals(coords, shifted, classes, valid,
                                   radius=0.05, min_points=20)
        dual = cluster_proposals(coords, shifted, classes, valid,
                                 radius=0.05, min_points=20, dual_set=True)
        assert len(dual) == 2 * len(single)


class TestComputeDtype:
    """bf16 compute paths (bench defaults) stay numerically close to f32."""

    def test_unet3d_bf16_matches_f32(self, rng):
        cfg = dict(type="UNet3D-v1m2", in_channels=8, out_channels=16,
                   f_maps=8, num_levels=3)
        vol = jnp.asarray(rng.randn(1, 8, 16, 16, 8).astype(np.float32))
        m32 = build_model(dict(cfg))
        v = m32.init(jax.random.PRNGKey(0), vol, train=False)
        m16 = build_model(dict(cfg, compute_dtype=jnp.bfloat16))
        o32 = m32.apply(v, vol, train=False)
        o16 = m16.apply(v, vol, train=False)  # same params: dtype is compute-only
        assert o16.dtype == jnp.float32
        denom = np.maximum(np.abs(np.asarray(o32)), 1.0)
        assert np.max(np.abs(np.asarray(o16 - o32)) / denom) < 0.1

    def test_residual_decoder_bf16_matches_f32(self, rng):
        from ponderv2_tpu.models.ponder.render.fields import ResidualDecoder

        pts = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        cond = jnp.asarray(rng.randn(64, 16).astype(np.float32))
        d32 = ResidualDecoder(hidden_dim=32, n_blocks=1, out_dim=4)
        v = d32.init(jax.random.PRNGKey(0), pts, cond)
        d16 = ResidualDecoder(hidden_dim=32, n_blocks=1, out_dim=4,
                              dtype=jnp.bfloat16)
        o32 = d32.apply(v, pts, cond)
        o16 = d16.apply(v, pts, cond)
        assert o16.dtype == jnp.float32
        denom = np.maximum(np.abs(np.asarray(o32)), 1.0)
        assert np.max(np.abs(np.asarray(o16 - o32)) / denom) < 0.1
