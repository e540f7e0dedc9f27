"""Point Prompt Training: multi-dataset fine-tuning with language guidance.

Reference: /root/reference/ponder/models/point_prompt_training/
point_prompt_training_v1m1_language_guided.py:19-186 (PPT-v1m1) and
point_prompt_training_v1m2_decoupled.py:18-68 (PPT-v1m2).

PPT-v1m1: per-dataset condition -> learned context embedding -> SpUNet-v1m3
(PDNorm) backbone -> 512-d projection head -> cosine logits against frozen CLIP
text embeddings restricted to the dataset's ``valid_index``; learned logit scale.
The condition is static per jit trace (one specialized executable per dataset).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.clip_text import get_text_embeddings
from ..builder import MODELS, build_model
from ..default import batch_to_sparse_tensor
from ..losses.builder import build_criteria


@MODELS.register_module(name="PPT-v1m1")
class PointPromptTraining(nn.Module):
    # consumed as a *model*, not a sparse-tensor backbone: wrappers
    # (DefaultSegmentor, PG-v1m1) must pass the input_dict through
    _takes_input_dict = True

    backbone: Any = None
    criteria: Any = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    template: str = "[x]"
    clip_model: str = "openai/clip-vit-base-patch16"
    class_name: Tuple[str, ...] = ()
    valid_index: Tuple[Tuple[int, ...], ...] = ()
    backbone_mode: bool = False
    assume_sorted: bool = False  # rows pre-sorted by (batch, voxel key)
    #   (datasets.utils.collate_fn invariant); skips the device sort
    embedding_path: Optional[str] = None

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self._criteria = build_criteria(self.criteria or [])
        self.context_embedding = nn.Embed(
            len(self.conditions), self.context_channels, name="context"
        )
        if not self.backbone_mode:
            emb = get_text_embeddings(
                list(self.class_name),
                embedding_path=self.embedding_path,
                clip_model=self.clip_model,
            )
            self.class_embedding = self.variable(
                "constants", "class_embedding", lambda: jnp.asarray(emb)
            )
            self.proj_head = nn.Dense(512, name="proj_head")
            self.logit_scale = self.param(
                "logit_scale",
                lambda k: jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
            )

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        cond = input_dict.get("condition", self.conditions[0])
        if isinstance(cond, (list, tuple)):
            cond = cond[0]
        ci = self.conditions.index(cond) if cond in self.conditions else 0
        # (1,)-shaped lookup: flax Embed's num_embeddings==1 fast path
        # broadcasts instead of gathering and breaks on scalar indices,
        # so single-condition models need a leading axis
        context = self.context_embedding(jnp.asarray([ci]))[0]

        st = batch_to_sparse_tensor(input_dict)
        from ...ops.sparse import maybe_sort_by_key

        st_sorted, inverse = maybe_sort_by_key(st, self.assume_sorted)
        feat = self.backbone_net(
            st_sorted, train=train, condition=cond, context=context
        )
        if inverse is not None:
            feat = feat[inverse]
        if self.backbone_mode:
            return {"feat": feat}

        from ..ponder.render.rays import safe_normalize

        proj = safe_normalize(self.proj_head(feat))
        vi = (
            jnp.asarray(self.valid_index[ci])
            if self.valid_index
            else jnp.arange(self.class_embedding.value.shape[0])
        )
        emb = safe_normalize(self.class_embedding.value[vi])
        seg_logits = proj @ emb.T * jnp.exp(self.logit_scale)

        out: Dict[str, Any] = {"seg_logits": seg_logits}
        if "segment" in input_dict:
            out["loss"] = self._criteria(
                seg_logits, input_dict["segment"], st.mask
            )
        return out


@MODELS.register_module(name="PPT-v1m2")
class PointPromptTrainingDecoupled(nn.Module):
    """Decoupled per-dataset linear segmentation heads (no CLIP)."""

    _takes_input_dict = True

    backbone: Any = None
    criteria: Any = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    num_classes: Tuple[int, ...] = (25, 20, 13)

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self._criteria = build_criteria(self.criteria or [])
        self.context_embedding = nn.Embed(
            len(self.conditions), self.context_channels, name="context"
        )
        self.seg_heads = [
            nn.Dense(n, name=f"seg_head_{c}")
            for c, n in zip(self.conditions, self.num_classes)
        ]

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        cond = input_dict.get("condition", self.conditions[0])
        if isinstance(cond, (list, tuple)):
            cond = cond[0]
        ci = self.conditions.index(cond) if cond in self.conditions else 0
        # (1,)-shaped lookup: flax Embed's num_embeddings==1 fast path
        # broadcasts instead of gathering and breaks on scalar indices,
        # so single-condition models need a leading axis
        context = self.context_embedding(jnp.asarray([ci]))[0]
        st = batch_to_sparse_tensor(input_dict)
        feat = self.backbone_net(st, train=train, condition=cond, context=context)
        seg_logits = self.seg_heads[ci](feat)
        out: Dict[str, Any] = {"seg_logits": seg_logits}
        if "segment" in input_dict:
            out["loss"] = self._criteria(seg_logits, input_dict["segment"], st.mask)
        return out
