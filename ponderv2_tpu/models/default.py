"""Default task wrappers: segmentor / classifier (reference ponder/models/default.py).

Models receive an ``input_dict`` of arrays (already collated/padded) and return a
dict. Train mode returns ``{"loss": ...}``-style entries; eval/test also return
logits — matching the reference's branching (default.py:15-31) but as pure
functions of (params, batch).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .builder import MODELS, build_model
from .losses.builder import build_criteria
from ..ops.sparse import make_sparse_tensor, maybe_sort_by_key
from ..ops.scatter import segment_max, segment_mean


def batch_to_sparse_tensor(input_dict: Dict[str, Any]):
    """Build a SparseTensor from a collated batch dict.

    Expects ``feat (N, C)``, ``grid_coord (N, 3)``, ``batch (N,)`` (padding -1),
    plus static ints ``spatial_shape`` and ``batch_size``.
    """
    coords = jnp.concatenate(
        [input_dict["batch"][:, None].astype(jnp.int32),
         input_dict["grid_coord"].astype(jnp.int32)],
        axis=1,
    )
    return make_sparse_tensor(
        input_dict["feat"],
        coords,
        tuple(int(s) for s in input_dict["spatial_shape"]),
        int(input_dict["batch_size"]),
    )


@MODELS.register_module()
class DefaultSegmentor(nn.Module):
    backbone: Any = None
    criteria: Any = None
    sort_input: bool = True  # spatial-sort rows for gather locality
    assume_sorted: bool = False  # rows pre-sorted by (batch, voxel key)
    #   (datasets.utils.collate_fn invariant); skips the device sort

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self._criteria = build_criteria(self.criteria or [])

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        st = batch_to_sparse_tensor(input_dict)
        if getattr(self.backbone_net, "_takes_input_dict", False):
            # model-style backbone (e.g. PPT-v1m1 in backbone_mode, used by the
            # reference insseg/semseg ft configs): it consumes the input_dict
            bout = self.backbone_net(input_dict, train=train)
            seg_logits = bout.get("feat", bout.get("seg_logits"))
        elif self.sort_input:
            st_sorted, inverse = maybe_sort_by_key(st, self.assume_sorted)
            seg_logits = self.backbone_net(st_sorted, train=train)
            if inverse is not None:
                seg_logits = seg_logits[inverse]
        else:
            seg_logits = self.backbone_net(st, train=train)
        out: Dict[str, Any] = {"seg_logits": seg_logits}
        if "segment" in input_dict:
            out["loss"] = self._criteria(seg_logits, input_dict["segment"], st.mask)
        return out


@MODELS.register_module()
class DefaultClassifier(nn.Module):
    backbone: Any = None
    criteria: Any = None
    num_classes: int = 40
    backbone_embed_dim: int = 256

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self._criteria = build_criteria(self.criteria or [])
        self.cls_head = nn.Dense(self.num_classes)

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        st = batch_to_sparse_tensor(input_dict)
        feat = self.backbone_net(st, train=train)
        if feat.ndim == 2 and feat.shape[0] == st.capacity:
            # backbone returned per-voxel features: pool per scene
            feat = segment_mean(feat, st.coords[:, 0], st.batch_size)
        cls_logits = self.cls_head(feat)
        out: Dict[str, Any] = {"cls_logits": cls_logits}
        if "category" in input_dict:
            out["loss"] = self._criteria(cls_logits, input_dict["category"], None)
        return out
