"""Surface rendering models: NeuS / VolSDF forward + render losses.

Reference: /root/reference/ponder/models/ponder/render_utils/models/
base_surface_model.py:13-211 (+ neus.py, volsdf.py). One vectorized pass renders
all scenes' rays at once: (B, R) rays × S samples; the per-scene python loop of
the reference (``render_func``, ponder_indoor_base.py:642) disappears into the
batch dimension.

Losses (get_loss, reference 102-209): depth L1, RGB L1 (+PSNR), ray-batch
contrastive semantic CE against CLIP text embeddings, free-space/truncation SDF
supervision from sensor depth, eikonal, and sparse input-point SDF.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....utils.registry import Registry
from .colliders import COLLIDERS
from .fields import SDFField
from .rays import (get_weights_from_alphas, get_weights_from_densities,
                   safe_norm, safe_normalize)
from .renderers import (
    render_accumulation,
    render_depth,
    render_normal,
    render_rgb,
    render_semantic,
)
from .samplers import SAMPLERS, NeuSSampler

RENDERERS = Registry("renderers")


def _contrastive_ce(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray,
                    temperature: float) -> jnp.ndarray:
    """InfoNCE over a ray batch (reference base_surface_model.py:130-145):
    ``logits = pred @ gt.T / temperature``, label of ray i is i; rows with
    ``valid == False`` are excluded from the mean (reference label -100).
    Returns 0 when no row is valid."""
    logits = (pred @ gt.T) / temperature  # (N, N)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.diagonal(logp)
    v = valid.astype(jnp.float32)
    return (nll * v).sum() / jnp.maximum(v.sum(), 1.0)


class SurfaceModel(nn.Module):
    """Base: collider -> sampler -> field -> compositing -> outputs."""

    field: Dict[str, Any] = None
    collider: Dict[str, Any] = None
    sampler: Dict[str, Any] = None
    loss: Dict[str, Any] = None

    def setup(self):
        field_cfg = dict(self.field or {})
        field_cfg.pop("type", None)
        self.sdf_field = SDFField(**field_cfg, name="field")
        self._collider = COLLIDERS.build(
            dict(self.collider or {"type": "AABBBoxCollider"})
        )
        self._sampler = SAMPLERS.build(
            dict(self.sampler or {"type": "NeuSSampler"})
        )
        self._loss_cfg = dict(self.loss or {})

    # --------------------------------------------------------------- rendering
    def render(self, volume, origins, directions, train: bool, rng=None,
               cos_anneal_ratio: float = 1.0) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def __call__(self, volume, origins, directions, train: bool = True,
                 rng=None, cos_anneal_ratio: float = 1.0):
        return self.render(volume, origins, directions, train, rng,
                           cos_anneal_ratio)

    # ------------------------------------------------------------------ losses
    def get_loss(
        self,
        outputs: Dict[str, jnp.ndarray],
        targets: Dict[str, jnp.ndarray],
        class_embeddings: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Compute the render losses (reference base_surface_model.py:102-209).

        targets: ``rgb (B,R,3)``, ``depth (B,R)``, ``semantic (B,R) int``
        (class id into ``class_embeddings``; ids <= 0 carry no CLIP target, as
        in the reference's ``semantic_map[semantic > 0]`` construction),
        ``ray_mask (B,R)`` bool (valid rays). ``sparse_sdf`` in outputs: sdf at
        input points for the sparse loss.

        Weight keys accept both reference spelling (``rgb_loss``) and the short
        form (``rgb``). Deviation from the reference: rgb/psnr are averaged over
        valid rays only — our fixed-shape batches contain padding rays (from
        budget-dropped scenes) that the reference's ragged batches never see.
        """
        cfg = self._loss_cfg
        w = cfg.get("weights", {})

        def _w(name, default):
            return w.get(f"{name}_loss", w.get(name, default))

        mask = targets.get("ray_mask")
        if mask is None:
            mask = jnp.ones(targets["rgb"].shape[:-1], bool)
        fmask = mask.astype(jnp.float32)
        n_rays = jnp.maximum(fmask.sum(), 1.0)
        losses: Dict[str, jnp.ndarray] = {}

        if "rgb" in outputs and "rgb" in targets:
            err = jnp.abs(outputs["rgb"] - targets["rgb"]).mean(-1)
            losses["rgb_loss"] = (err * fmask).sum() / n_rays * _w("rgb", 10.0)
            mse = (((outputs["rgb"] - targets["rgb"]) ** 2).mean(-1) * fmask
                   ).sum() / n_rays
            losses["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))

        if "depth" in outputs and "depth" in targets:
            dmask = fmask * (targets["depth"] > 0)
            nd = jnp.maximum(dmask.sum(), 1.0)
            err = jnp.abs(outputs["depth"] - targets["depth"])
            losses["depth_loss"] = (err * dmask).sum() / nd * _w("depth", 1.0)

        if (
            "semantic" in outputs
            and "semantic" in targets
            and class_embeddings is not None
        ):
            # Ray-batch contrastive InfoNCE (reference :122-173): every ray's
            # rendered CLIP feature must match its OWN ray's gt text embedding
            # among all rays' gt embeddings in the batch; temperature-scaled.
            # gt embeddings are taken as-is (CLIP rows are unit-norm already;
            # rows for label<=0 are zero and excluded — reference
            # ``semantic_map[semantic > 0]`` + ``valid_semantic_mask``).
            temperature = float(cfg.get("temperature", 0.01))
            # indoor reference fills gt embeddings only for labels > 0
            # (semantic_map[semantic > 0]); the outdoor path indexes label 0
            # too (ponder_outdoor_base.py:169-174) — configurable minimum.
            min_label = int(cfg.get("semantic_min_label", 1))
            labels = targets["semantic"]  # (B, R) int
            pred = safe_normalize(outputs["semantic"])  # (B, R, C)
            lab_ok = labels >= min_label
            gt_emb = jnp.where(
                lab_ok[..., None],
                jnp.asarray(class_embeddings)[jnp.clip(labels, 0)],
                0.0,
            )
            valid = fmask * (targets.get("depth", fmask) > 0) * lab_ok
            C = pred.shape[-1]
            pred_f = pred.reshape(-1, C)
            gt_f = gt_emb.reshape(-1, C)
            valid_f = valid.reshape(-1)
            if train:
                sem = _contrastive_ce(pred_f, gt_f, valid_f, temperature)
            else:
                # eval: chunk-local contrast (reference val path :147-170)
                chunk = int(cfg.get("val_ray_split", 128))
                n = pred_f.shape[0]
                pad = (-n) % chunk
                if pad:
                    pred_f = jnp.pad(pred_f, ((0, pad), (0, 0)))
                    gt_f = jnp.pad(gt_f, ((0, pad), (0, 0)))
                    valid_f = jnp.pad(valid_f, (0, pad))
                sem = jnp.mean(
                    jax.vmap(_contrastive_ce, in_axes=(0, 0, 0, None))(
                        pred_f.reshape(-1, chunk, C),
                        gt_f.reshape(-1, chunk, C),
                        valid_f.reshape(-1, chunk),
                        temperature,
                    )
                )
            losses["semantic_loss"] = sem * _w("semantic", 1.0)

        if "sdf" in outputs and "depth" in targets:
            truncation = cfg.get("sensor_depth_truncation", 0.05)
            mid = outputs["sample_depths"]  # (B, R, S)
            gt = targets["depth"][..., None]
            valid = (fmask * (targets["depth"] > 0))[..., None]
            sdf = outputs["sdf"]
            approx_sdf = gt - mid
            front = (approx_sdf > truncation) * valid
            near = (jnp.abs(approx_sdf) <= truncation) * valid
            nf = jnp.maximum(front.sum(), 1.0)
            nn_ = jnp.maximum(near.sum(), 1.0)
            losses["free_space_loss"] = (
                (nn.relu(truncation - sdf) * front).sum() / nf
                * _w("free_space", 1.0)
            )
            losses["sdf_loss"] = (
                (jnp.abs(sdf - approx_sdf) * near).sum() / nn_
                * _w("sdf", 1.0)
            )

        if "gradients" in outputs:
            # reference :198-201 means over ALL samples, no ray mask
            grad_norm = safe_norm(outputs["gradients"], axis=-1)
            eik = ((grad_norm - 1.0) ** 2).mean()
            losses["eikonal_loss"] = eik * _w("eikonal", 0.1)

        if "sparse_sdf" in outputs:
            sp_mask = outputs.get("sparse_sdf_mask")
            if sp_mask is None:
                sp_mask = jnp.ones_like(outputs["sparse_sdf"], bool)
            spm = sp_mask.astype(jnp.float32)
            losses["sparse_sdf_loss"] = (
                (jnp.abs(outputs["sparse_sdf"]) * spm).sum()
                / jnp.maximum(spm.sum(), 1.0)
                * _w("sparse_sdf", w.get("sparse_points_sdf_loss", 0.0))
            )

        total = sum(
            v for k, v in losses.items() if k.endswith("_loss")
        )
        losses["render_loss"] = total
        return losses


@RENDERERS.register_module()
class NeuSModel(SurfaceModel):
    def render(self, volume, origins, directions, train: bool = True, rng=None,
               cos_anneal_ratio: float = 1.0):
        nears, fars = self._collider(origins, directions)

        def sdf_fn(positions):
            return self.sdf_field.get_sdf(volume, positions)

        starts, ends = self._sampler(
            nears, fars, sdf_fn, origins, directions, train=train, rng=rng
        )
        field_out = self.sdf_field(
            volume, origins, directions, starts, ends,
            cos_anneal_ratio=cos_anneal_ratio,
        )
        weights, _ = get_weights_from_alphas(field_out["alphas"])
        outputs = dict(
            weights=weights,
            sdf=field_out["sdf"],
            gradients=field_out["gradients"],
            inv_s=field_out["inv_s"],
            sample_depths=0.5 * (starts + ends),
            depth=render_depth(weights, starts, ends),
            accumulation=render_accumulation(weights),
            normal=render_normal(weights, field_out["gradients"]),
        )
        if "rgb" in field_out:
            outputs["rgb"] = render_rgb(weights, field_out["rgb"])
        if "semantic" in field_out:
            outputs["semantic"] = render_semantic(weights, field_out["semantic"])
        return outputs


@RENDERERS.register_module()
class VolSDFModel(SurfaceModel):
    """VolSDF: Laplace-density transform of the sdf (reference volsdf.py:7-29)."""

    def setup(self):
        super().setup()
        from .fields import LaplaceDensity

        self.density_fn = LaplaceDensity(name="laplace_density")

    def render(self, volume, origins, directions, train: bool = True, rng=None,
               cos_anneal_ratio: float = 1.0):
        nears, fars = self._collider(origins, directions)

        def sdf_fn(positions):
            return self.sdf_field.get_sdf(volume, positions)

        starts, ends = self._sampler(
            nears, fars, sdf_fn, origins, directions, train=train, rng=rng
        )
        field_out = self.sdf_field(
            volume, origins, directions, starts, ends,
            cos_anneal_ratio=cos_anneal_ratio,
        )
        densities = self.density_fn(field_out["sdf"])
        weights, _ = get_weights_from_densities(densities, starts, ends)
        outputs = dict(
            weights=weights,
            sdf=field_out["sdf"],
            gradients=field_out["gradients"],
            inv_s=field_out["inv_s"],
            sample_depths=0.5 * (starts + ends),
            depth=render_depth(weights, starts, ends),
            accumulation=render_accumulation(weights),
            normal=render_normal(weights, field_out["gradients"]),
        )
        if "rgb" in field_out:
            outputs["rgb"] = render_rgb(weights, field_out["rgb"])
        if "semantic" in field_out:
            outputs["semantic"] = render_semantic(weights, field_out["semantic"])
        return outputs
