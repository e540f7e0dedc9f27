"""Normalization layers for padded sparse tensors.

``MaskedBatchNorm`` normalizes over *valid* rows only (padding rows would poison
batch statistics). Under pjit the feature buffer is a global array, so the batch
statistics are global across the device mesh — i.e. SyncBatchNorm semantics
(reference: ``nn.SyncBatchNorm.convert_sync_batchnorm`` at
ponder/engines/train.py:207-208) fall out of the sharding model for free.

``momentum`` follows the *torch* convention (running = (1-m)*running + m*batch),
matching reference configs like eps=1e-3, momentum=0.01
(spconv_unet_v1m1_base.py:100).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- SyncBN axis
# When set (trace-time), MaskedBatchNorm psums its batch statistics over the
# named mesh axis — true cross-replica SyncBatchNorm semantics (reference
# nn.SyncBatchNorm.convert_sync_batchnorm, train.py:207-208). Installed by
# parallel.mesh.make_sharded_train_step(sync_bn=True) around the model trace.
_BN_SYNC_AXIS: Optional[str] = None


@contextlib.contextmanager
def bn_sync_axis(axis_name: Optional[str]):
    global _BN_SYNC_AXIS
    prev = _BN_SYNC_AXIS
    _BN_SYNC_AXIS = axis_name
    try:
        yield
    finally:
        _BN_SYNC_AXIS = prev


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-3
    momentum: float = 0.01  # torch convention
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: (N, C); mask: (N,) bool. Returns normalized (N, C), zeroed padding."""
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            m = mask.astype(jnp.float32)[:, None]
            s1 = jnp.sum(x * m, axis=0)
            s2 = jnp.sum((x * x) * m, axis=0)
            count = jnp.sum(m)
            if _BN_SYNC_AXIS is not None and not self.is_initializing():
                # cross-replica statistics over the data-parallel axis
                s1, s2, count = jax.lax.psum((s1, s2, count), _BN_SYNC_AXIS)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                # torch tracks *unbiased* running variance
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return jnp.where(mask[:, None], y, 0.0)


class PDBatchNorm(nn.Module):
    """Prompt-Driven BatchNorm: per-condition decoupled BN + optional adaptive
    film modulation from a context embedding (reference SpUNet-v1m3's PDNorm,
    spconv_unet_v1m3_pdnorm.py:23-72).

    ``conditions`` is the static tuple of dataset names; the active one is selected
    by integer index (static per jit trace via the model's condition argument).
    """

    features: int
    conditions: tuple = ("ScanNet", "S3DIS", "Structured3D")
    eps: float = 1e-3
    momentum: float = 0.01
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool,
        condition_idx: int = 0,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.decouple:
            norms = [
                MaskedBatchNorm(
                    self.features, eps=self.eps, momentum=self.momentum, name=f"bn_{c}"
                )
                for c in self.conditions
            ]
            if self.is_initializing():
                # materialize every condition's variables so any condition can
                # be selected at apply time (each dataset only touches its own)
                for i, nm in enumerate(norms):
                    if i != condition_idx:
                        nm(x, mask, train)
            # condition_idx is a static python int (per-dataset jit specialization)
            y = norms[condition_idx](x, mask, train)
        else:
            y = MaskedBatchNorm(
                self.features, eps=self.eps, momentum=self.momentum, name="bn"
            )(x, mask, train)
        if self.adaptive:
            assert context is not None, "adaptive PDNorm needs a context embedding"
            film = nn.Dense(2 * self.features, name="modulation")(nn.silu(context))
            shift, scale = jnp.split(film, 2, axis=-1)
            y = y * (1.0 + scale) + shift
            y = jnp.where(mask[:, None], y, 0.0)
        return y
