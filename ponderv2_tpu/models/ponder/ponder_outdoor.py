"""PonderOutdoor-v2: LiDAR pretraining by neural rendering.

Reference: /root/reference/ponder/models/ponder/ponder_outdoor_base.py:18-265.
Rays are precomputed by the ProjectOnImage/RaySample transforms (camera origin ->
lidar point, with pixel color gt); the scene is normalized by the fixed
``point_cloud_range`` bbox; the dense render volume is a flat outdoor grid
(e.g. 180×180×5) projected by SimpleConv3D. Per-dataset (condition) ranges and
grids are supported for multi-dataset outdoor pretraining.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.scatter import segment_max, segment_mean
from ..builder import MODELS, build_model
from ..default import batch_to_sparse_tensor
from .render.surface_models import RENDERERS


@MODELS.register_module(name="PonderOutdoor-v2")
class PonderOutdoor(nn.Module):
    backbone: Any = None
    projection: Any = None
    renderer: Any = None
    grid_shape: Tuple[int, int, int] = (180, 180, 5)
    point_cloud_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    pool_type: str = "mean"
    render_semantic: bool = False
    conditions: Tuple[str, ...] = ("NuScenes",)
    val_ray_split: int = 8192
    # CLIP semantic head (reference ponder_outdoor_base.py:60-88): class-name
    # text embeddings, per-condition valid_index slices
    template: Any = "[x]"
    clip_model: str = "openai/clip-vit-base-patch16"
    class_name: Tuple[str, ...] = ()
    valid_index: Tuple[Tuple[int, ...], ...] = ()
    embedding_path: Optional[str] = None

    def setup(self):
        self.backbone_net = build_model(dict(self.backbone))
        self.proj_net = build_model(dict(self.projection))
        cfg = dict(self.renderer)
        cls = RENDERERS.get(cfg.pop("type", "NeuSModel"))
        self.render_model = cls(**cfg)
        if self.render_semantic:
            from ...utils.clip_text import get_text_embeddings

            names = list(self.class_name) or [f"class_{i}" for i in range(16)]
            emb = get_text_embeddings(
                names,
                embedding_path=self.embedding_path,
                clip_model=self.clip_model,
            )
            self.class_embedding = self.variable(
                "constants", "class_embedding", lambda: jnp.asarray(emb)
            )

    def _normalize(self, p: jnp.ndarray) -> jnp.ndarray:
        """World coords -> [0, 1]^3 over the fixed point-cloud range."""
        lo = jnp.asarray(self.point_cloud_range[:3])
        hi = jnp.asarray(self.point_cloud_range[3:])
        return jnp.clip((p - lo) / (hi - lo), 1e-5, 1.0 - 1e-5)

    def _build_volume(self, feat, coord, batch, batch_size):
        gx, gy, gz = self.grid_shape
        p = self._normalize(coord)
        vox = jnp.floor(p * jnp.asarray([gx, gy, gz])).astype(jnp.int32)
        vox = jnp.clip(vox, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
        flat = ((jnp.clip(batch, 0) * gx + vox[:, 0]) * gy + vox[:, 1]) * gz + vox[:, 2]
        flat = jnp.where(batch >= 0, flat, batch_size * gx * gy * gz)
        num = batch_size * gx * gy * gz
        pooled = (
            segment_mean(feat, flat, num)
            if self.pool_type == "mean"
            else segment_max(feat, flat, num, initial=0.0)
        )
        dense = pooled.reshape(batch_size, gx, gy, gz, -1)
        return jnp.transpose(dense, (0, 4, 1, 2, 3))

    def __call__(self, input_dict: Dict[str, Any], train: bool = True) -> Dict:
        rng = input_dict.get("rng")
        if rng is None:
            rng = jax.random.PRNGKey(0)

        st = batch_to_sparse_tensor(input_dict)
        feat = self.backbone_net(st, train=train)

        coord = input_dict["coord"].astype(jnp.float32)
        batch = input_dict["batch"]
        B = int(input_dict["batch_size"])
        volume = self.proj_net(self._build_volume(feat, coord, batch, B),
                               train=train)

        # rays precomputed by transforms: (B, R, 3) after scene-dim collation
        ray_start = self._normalize(input_dict["ray_start"].astype(jnp.float32))
        ray_end = self._normalize(input_dict["ray_end"].astype(jnp.float32))
        delta = ray_end - ray_start
        dist = jnp.linalg.norm(delta, axis=-1)
        dirs = delta / jnp.maximum(dist[..., None], 1e-8)
        valid = input_dict.get(
            "ray_valid", jnp.ones(ray_start.shape[:-1], bool)
        ).astype(bool) & (dist > 1e-6)

        render_out = self.render_model(volume, ray_start, dirs, train=train, rng=rng)
        targets = dict(
            depth=jnp.where(valid, dist, -0.001),
            ray_mask=valid,
        )
        if "ray_rgb" in input_dict:  # color variant (reference `-color` cfg)
            targets["rgb"] = input_dict["ray_rgb"].astype(jnp.float32) / 255.0
        class_emb = None
        if self.render_semantic and "ray_segment" in input_dict:
            targets["semantic"] = input_dict["ray_segment"]
            # per-condition class subset (reference :168-174); condition is a
            # static python string resolved at trace time
            cond = input_dict.get("condition", self.conditions[0])
            if isinstance(cond, (list, tuple)):
                cond = cond[0]
            ci = self.conditions.index(cond) if cond in self.conditions else 0
            class_emb = self.class_embedding.value
            if self.valid_index:
                class_emb = class_emb[jnp.asarray(self.valid_index[ci])]
        loss_dict = self.render_model.get_loss(
            render_out, targets, class_embeddings=class_emb, train=train
        )
        loss = loss_dict.pop("render_loss")
        out = dict(loss=loss)
        out.update({k: jax.lax.stop_gradient(v) for k, v in loss_dict.items()})
        return out
