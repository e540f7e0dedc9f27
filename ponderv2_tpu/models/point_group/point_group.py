"""PointGroup instance segmentation (reference point_group_v1m1_base.py:19-170).

Train: backbone -> semantic head (CE) + bias/offset head (masked L1 + cosine
direction losses toward instance centroids). Eval: the jitted part emits
semantic logits + predicted offsets; host-side clustering
(``cluster.cluster_proposals``) builds instance proposals scored by mean class
probability.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import MODELS, build_model
from ..default import batch_to_sparse_tensor
from ..losses.builder import build_criteria


@MODELS.register_module(name="PG-v1m1")
class PointGroup(nn.Module):
    backbone: Any = None
    assume_sorted: bool = False  # rows pre-sorted by (batch, voxel key)
    #   (datasets.utils.collate_fn invariant); skips the device sort
    criteria: Any = None
    backbone_out_channels: int = 64
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Tuple[int, ...] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    cluster_closed_points: int = 300  # ballquery buffer hint; the effective
    #   per-point neighbor cap is the reference kernel's hard 1000 (cluster.py)
    cluster_propose_points: int = 100
    cluster_min_points: int = 50
    cluster_dual_set: bool = False  # extension: also cluster original coords
    voxel_size: float = 0.02

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self._criteria = build_criteria(self.criteria or [])
        self.bias_head = nn.Sequential(
            [nn.Dense(self.backbone_out_channels), nn.relu, nn.Dense(3)]
        )
        self.seg_head = nn.Dense(self.semantic_num_classes)

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        st = batch_to_sparse_tensor(input_dict)
        if getattr(self.backbone_net, "_takes_input_dict", False):
            # PPT-v1m1 backbone_mode (reference insseg-ppt-...-ft configs)
            feat = self.backbone_net(input_dict, train=train)["feat"]
        else:
            from ...ops.sparse import maybe_sort_by_key

            st_sorted, inverse = maybe_sort_by_key(st, self.assume_sorted)
            feat = self.backbone_net(st_sorted, train=train)
            if inverse is not None:
                feat = feat[inverse]
        bias_pred = self.bias_head(feat)  # (N, 3)
        logits = self.seg_head(feat)  # (N, K)
        mask = st.mask

        out: Dict[str, Any] = {
            "seg_logits": logits,
            "bias_pred": bias_pred,
        }
        if "segment" not in input_dict:
            return out

        segment = input_dict["segment"]
        seg_loss = self._criteria(logits, segment, mask)

        instance = input_dict.get("instance")
        centroid = input_dict.get("instance_centroid")
        if instance is not None and centroid is not None:
            coord = input_dict["coord"].astype(jnp.float32)
            gt_bias = centroid - coord
            valid = (
                (instance != self.instance_ignore_index) & mask
            ).astype(jnp.float32)
            nv = jnp.maximum(valid.sum(), 1.0)
            l1 = jnp.sum(jnp.abs(bias_pred - gt_bias), axis=-1)
            bias_l1_loss = (l1 * valid).sum() / nv
            pred_n = bias_pred / jnp.maximum(
                jnp.linalg.norm(bias_pred, axis=-1, keepdims=True), 1e-8
            )
            gt_n = gt_bias / jnp.maximum(
                jnp.linalg.norm(gt_bias, axis=-1, keepdims=True), 1e-8
            )
            cosine = -jnp.sum(pred_n * gt_n, axis=-1)
            bias_cos_loss = (cosine * valid).sum() / nv
            out["bias_l1_loss"] = jax.lax.stop_gradient(bias_l1_loss)
            out["bias_cosine_loss"] = jax.lax.stop_gradient(bias_cos_loss)
            loss = seg_loss + bias_l1_loss + bias_cos_loss
        else:
            loss = seg_loss
        out["loss"] = loss
        out["seg_loss"] = jax.lax.stop_gradient(seg_loss)
        return out

    # ------------------------------------------------- host-side proposals
    def propose_instances(
        self,
        coord,
        seg_logits,
        bias_pred,
        batch,
    ):
        """Host-side: cluster into instance proposals (numpy in, numpy out).

        Returns list of dicts: {"mask", "cls", "score"} per proposal.
        """
        import numpy as np

        from .cluster import cluster_proposals

        coord = np.asarray(coord)
        logits = np.asarray(seg_logits)
        bias = np.asarray(bias_pred)
        batch = np.asarray(batch)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        classes = logits.argmax(-1)
        proposals = []
        for b in np.unique(batch[batch >= 0]):
            sel = batch == b
            valid = sel & ~np.isin(classes, self.segment_ignore_index)
            # reference protocol (point_group_v1m1_base.py:92-131): cluster
            # ONLY center_pred = (coord + bias) / voxel_size at radius
            # cluster_thresh — equivalent to unscaled coords at radius
            # cluster_thresh * voxel_size
            masks = cluster_proposals(
                coord,
                coord + bias,
                classes,
                valid,
                radius=self.cluster_thresh * self.voxel_size,
                min_points=self.cluster_min_points,
                dual_set=self.cluster_dual_set,
            )
            for m in masks:
                # reference keeps proposals with point count STRICTLY greater
                # (proposals_point_num > cluster_propose_points, line 144)
                if m.sum() <= self.cluster_propose_points:
                    continue
                # BFS components are label-uniform; the reference takes the
                # first member's class (line 141)
                cls = classes[np.argmax(m)]
                score = float(probs[m, cls].mean())
                proposals.append(dict(mask=m, cls=int(cls), score=score, batch=int(b)))
        return proposals
