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
from ...ops.sparse import maybe_sort_by_key
from ..builder import MODELS, build_model
from ..default import batch_to_sparse_tensor
from .render.surface_models import RENDERERS


def block_mask_keep(grid_coord, batch, size, ratio, rng):
    """Per-point keep decision for MAE-style voxel-block masking.

    Reference (ponder_outdoor_base.py:96-135) argsorts random scores over
    each scene's *unique* blocks and keeps exactly round(n*(1-ratio)) — a
    dynamic-shape unique+sort per scene. TPU-first equivalent: one per-block
    Bernoulli(keep = 1-ratio) decision, made consistent across a block's
    points by hashing (batch, block coords) with a per-step seed — same
    expectation and per-block granularity, static shapes. Padding rows
    (batch < 0) are always kept."""
    blk = grid_coord.astype(jnp.uint32) // jnp.uint32(size)
    seed = jax.random.randint(
        rng, (), 0, jnp.iinfo(jnp.int32).max
    ).astype(jnp.uint32)
    h = (
        jnp.where(batch >= 0, batch, 0).astype(jnp.uint32)
        * jnp.uint32(73856093)
        ^ blk[:, 0] * jnp.uint32(19349663)
        ^ blk[:, 1] * jnp.uint32(83492791)
        ^ blk[:, 2] * jnp.uint32(2654435761)
        ^ seed
    )
    # murmur3 finalizer: decorrelate the linear hash before thresholding
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    keep = (h.astype(jnp.float32) / jnp.float32(2**32)) >= ratio
    return keep | (batch < 0)


def _per_condition(value, ci):
    """Resolve a possibly per-condition tuple-of-tuples to condition ``ci``.

    The reference indexes ``scene_bbox/grid_size/grid_shape[dataset_idx]``
    (ponder_outdoor_base.py:203-209); flat tuples mean "same for all"."""
    if value and isinstance(value[0], (tuple, list)):
        return tuple(value[ci])
    return tuple(value)


@MODELS.register_module(name="PonderOutdoor-v2")
class PonderOutdoor(nn.Module):
    backbone: Any = None
    projection: Any = None
    renderer: Any = None
    # scene_bbox/grid_shape/grid_size accept one flat tuple or one tuple per
    # condition (multi-dataset outdoor pretraining)
    grid_shape: Tuple = (180, 180, 5)
    point_cloud_range: Tuple = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    grid_size: Optional[Tuple] = None  # derived from bbox/shape when None
    # MAE-style block masking of input features before the backbone
    # (reference ponder_outdoor_base.py:44-51,106-135): dict(ratio, size,
    # channel). Blocks of ``size`` voxels are dropped with prob ``ratio`` and
    # replaced by the learned ``mtoken``.
    mask: Optional[Any] = None
    assume_sorted: bool = False  # rows pre-sorted by (batch, voxel key)
    #   (datasets.utils.collate_fn invariant); skips the device sort
    share_volume: bool = True  # accepted for config parity (unused upstream)
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
        if self.mask is not None:
            # learned mask token, trunc-normal(std 0.02) like the reference
            self.mtoken = self.param(
                "mtoken",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, int(dict(self.mask)["channel"])),
            )
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

    def _normalize(self, p: jnp.ndarray, ci: int = 0) -> jnp.ndarray:
        """World coords -> [0, 1]^3 over condition ``ci``'s point-cloud range."""
        bbox = _per_condition(self.point_cloud_range, ci)
        lo = jnp.asarray(bbox[:3])
        hi = jnp.asarray(bbox[3:])
        return jnp.clip((p - lo) / (hi - lo), 1e-5, 1.0 - 1e-5)

    def _block_mask_features(self, feat, grid_coord, batch, rng):
        """Replace features of randomly dropped voxel blocks with ``mtoken``."""
        cfg = dict(self.mask)
        keep = block_mask_keep(
            grid_coord, batch, int(cfg["size"]), float(cfg["ratio"]), rng
        )
        return jnp.where(keep[:, None], feat,
                         self.mtoken.astype(feat.dtype))

    def _build_volume(self, feat, coord, batch, batch_size, ci=0):
        gx, gy, gz = _per_condition(self.grid_shape, ci)
        bbox = _per_condition(self.point_cloud_range, ci)
        if self.grid_size is not None:
            gsize = jnp.asarray(_per_condition(self.grid_size, ci))
        else:
            gsize = (jnp.asarray(bbox[3:]) - jnp.asarray(bbox[:3])) / (
                jnp.asarray([gx, gy, gz], jnp.float32)
            )
        vox = jnp.floor(
            (coord - jnp.asarray(bbox[:3])) / gsize
        ).astype(jnp.int32)
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

        # condition is a static python string resolved at trace time — each
        # dataset gets its own specialized executable (reference indexes
        # scene_bbox/grid_size/grid_shape per dataset_idx)
        cond = input_dict.get("condition", self.conditions[0])
        if isinstance(cond, (list, tuple)):
            cond = cond[0]
        ci = self.conditions.index(cond) if cond in self.conditions else 0

        if self.mask is not None and train:
            rng, mask_rng = jax.random.split(rng)
            input_dict = dict(input_dict)
            input_dict["feat"] = self._block_mask_features(
                input_dict["feat"], input_dict["grid_coord"],
                input_dict["batch"], mask_rng,
            )
        st = batch_to_sparse_tensor(input_dict)
        # spatial key-sort before the backbone (spconv's sortedness contract
        # zero-poisons unsorted rows), un-permute features back after —
        # same as PonderIndoor/DefaultSegmentor
        st_sorted, inverse = maybe_sort_by_key(st, self.assume_sorted)
        feat = self.backbone_net(st_sorted, train=train)
        if inverse is not None:
            feat = feat[inverse]

        coord = input_dict["coord"].astype(jnp.float32)
        batch = input_dict["batch"]
        B = int(input_dict["batch_size"])
        volume = self.proj_net(self._build_volume(feat, coord, batch, B, ci),
                               train=train)

        # rays precomputed by transforms: (B, R, 3) after scene-dim collation
        ray_start = self._normalize(
            input_dict["ray_start"].astype(jnp.float32), ci
        )
        ray_end = self._normalize(
            input_dict["ray_end"].astype(jnp.float32), ci
        )
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
            # per-condition class subset (reference :168-174)
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
