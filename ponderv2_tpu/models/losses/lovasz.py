"""Lovász-softmax loss (used by every semseg fine-tune config in the reference;
``ponder/models/losses/lovasz.py:211+``). Fresh jnp implementation of the Lovász
extension of the Jaccard index [Berman et al., CVPR 2018]."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    # difference trick: grad[0] = jaccard[0], grad[i] = jaccard[i] - jaccard[i-1]
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@LOSSES.register_module()
class LovaszLoss:
    """mode='multiclass' Lovász-softmax over valid rows; per-image=False
    (whole-batch flat, the reference's default for semseg)."""

    def __init__(
        self,
        mode: str = "multiclass",
        class_seen: Optional[list] = None,
        per_image: bool = False,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        assert mode in ("multiclass", "binary")
        self.mode = mode
        self.class_seen = class_seen
        self.per_image = per_image  # flat-batch only (per_image unused in ref configs)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None):
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        vf = valid.astype(pred.dtype)

        if self.mode == "binary":
            p = jax.nn.sigmoid(pred[:, 0] if pred.ndim > 1 else pred)
            fg = (target > 0).astype(p.dtype) * vf
            errors = jnp.abs(fg - p) * vf
            order = jnp.argsort(-errors)
            loss = jnp.dot(errors[order], _lovasz_grad(fg[order]))
            return self.loss_weight * loss

        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred, axis=-1)
        t = jnp.clip(target, 0, num_classes - 1)
        losses, present = [], []
        classes = (
            range(num_classes) if self.class_seen is None else self.class_seen
        )
        for c in classes:
            fg = ((t == c) & valid).astype(pred.dtype)
            errors = jnp.abs(fg - probs[:, c]) * vf
            order = jnp.argsort(-errors)
            loss_c = jnp.dot(errors[order], _lovasz_grad(fg[order]))
            losses.append(loss_c)
            present.append((jnp.sum(fg) > 0).astype(pred.dtype))
        losses = jnp.stack(losses)
        present = jnp.stack(present)
        mean = jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
        return self.loss_weight * mean
