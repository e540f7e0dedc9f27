"""Classification/segmentation losses on padded logits.

All losses take ``(pred (N, C) logits, target (N,) int labels, mask (N,) bool)``;
rows failing the mask or labelled ``ignore_index`` contribute zero and are excluded
from the normalizer. Mirrors reference ``ponder/models/losses/misc.py:15-224``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _valid(target, mask, ignore_index):
    v = target != ignore_index
    if mask is not None:
        v = v & mask
    return v


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None):
        num_classes = pred.shape[-1]
        valid = _valid(target, mask, self.ignore_index)
        t = jnp.clip(target, 0, num_classes - 1)
        logp = jax.nn.log_softmax(pred, axis=-1)
        if self.label_smoothing > 0:
            eps = self.label_smoothing
            onehot = jax.nn.one_hot(t, num_classes) * (1.0 - eps) + eps / num_classes
            nll = -jnp.sum(onehot * logp, axis=-1)
        else:
            nll = -jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
        w = jnp.ones_like(nll) if self.weight is None else self.weight[t]
        w = jnp.where(valid, w, 0.0)
        if self.reduction == "sum":
            loss = jnp.sum(nll * w)
        else:
            loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
        return self.loss_weight * loss


@LOSSES.register_module()
class SmoothCELoss:
    """CE with smoothing expressed as (1-s)·CE + s·uniform (reference SmoothCELoss)."""

    def __init__(self, smoothing_ratio: float = 0.1, loss_weight: float = 1.0,
                 ignore_index: int = -1):
        self.inner = CrossEntropyLoss(
            label_smoothing=smoothing_ratio, loss_weight=loss_weight,
            ignore_index=ignore_index,
        )

    def __call__(self, pred, target, mask=None):
        return self.inner(pred, target, mask)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, gamma: float = 2.0, alpha: float = 0.5,
                 loss_weight: float = 1.0, ignore_index: int = -1):
        self.gamma, self.alpha = gamma, alpha
        self.loss_weight, self.ignore_index = loss_weight, ignore_index

    def __call__(self, pred, target, mask=None):
        num_classes = pred.shape[-1]
        valid = _valid(target, mask, self.ignore_index)
        t = jnp.clip(target, 0, num_classes - 1)
        logp = jax.nn.log_softmax(pred, axis=-1)
        logpt = jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
        pt = jnp.exp(logpt)
        focal = -self.alpha * (1.0 - pt) ** self.gamma * logpt
        focal = jnp.where(valid, focal, 0.0)
        return self.loss_weight * jnp.sum(focal) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0
        )


@LOSSES.register_module()
class BinaryFocalLoss:
    def __init__(self, gamma: float = 2.0, alpha: float = 0.5, logits: bool = True,
                 loss_weight: float = 1.0):
        self.gamma, self.alpha, self.logits = gamma, alpha, logits
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None):
        p = jax.nn.sigmoid(pred) if self.logits else pred
        t = target.astype(p.dtype)
        pt = jnp.where(t > 0.5, p, 1.0 - p)
        alpha_t = jnp.where(t > 0.5, self.alpha, 1.0 - self.alpha)
        loss = -alpha_t * (1.0 - pt) ** self.gamma * jnp.log(jnp.clip(pt, 1e-12))
        if mask is not None:
            loss = jnp.where(mask, loss, 0.0)
            n = jnp.maximum(jnp.sum(mask.astype(loss.dtype)), 1.0)
        else:
            n = loss.size
        return self.loss_weight * jnp.sum(loss) / n


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, smooth: float = 1.0, exponent: float = 2.0,
                 loss_weight: float = 1.0, ignore_index: int = -1):
        self.smooth, self.exponent = smooth, exponent
        self.loss_weight, self.ignore_index = loss_weight, ignore_index

    def __call__(self, pred, target, mask=None):
        num_classes = pred.shape[-1]
        valid = _valid(target, mask, self.ignore_index)
        probs = jax.nn.softmax(pred, axis=-1)
        probs = jnp.where(valid[:, None], probs, 0.0)
        t = jnp.clip(target, 0, num_classes - 1)
        onehot = jax.nn.one_hot(t, num_classes) * valid[:, None]
        num = 2.0 * jnp.sum(probs * onehot, axis=0) + self.smooth
        den = (
            jnp.sum(probs**self.exponent, axis=0)
            + jnp.sum(onehot**self.exponent, axis=0)
            + self.smooth
        )
        return self.loss_weight * jnp.mean(1.0 - num / den)
