"""Neural fields: SDF field over a dense feature volume + decoders.

Reference: /root/reference/ponder/models/ponder/render_utils/fields/sdf_field.py
(SDFField 77-284, SDFDecoder via decoders.py:6-109, SingleVarianceNetwork
122-146, LaplaceDensity 10-35). TPU-native re-design:

- Volume features are sampled with the differentiable trilinear smooth sampler
  (ops.interp) — JAX autodiff provides the grad-of-grad the eikonal loss needs,
  replacing the 768-line CUDA backward-backward kernel.
- SDF spatial gradients come from ``jax.grad`` of the scalarized field — exact,
  fused by XLA, no finite differences.
- Decoders follow the reference's per-layer residually re-injected
  conditioning (x = lin_l(x + fc_c_l(feat))), Softplus(β=100) activations for
  the SDF branch, sigmoid RGB.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....utils.registry import Registry
from ....ops.interp import grid_sample_3d

FIELDS = Registry("fields")

_softplus100 = lambda x: nn.softplus(x * 100.0) / 100.0


class ResidualDecoder(nn.Module):
    """Reference decoder skeleton (decoders.py:6-109): per-layer residually
    re-injected conditioning. With L = n_blocks + 1 linears:

        x = fc_p(points) * points_factor
        for l in 0..L-1:
            x = lin_l(x + fc_c_l(feats));  activation unless last layer

    Every layer adds a FRESH linear projection of the conditioning features
    before its linear; lin_{L-1} maps hidden -> out with no activation.
    Multiple conditioning tensors are concatenated (the reference
    concatenates at the call site, sdf_field.py:245-263)."""

    hidden_dim: int = 128
    n_blocks: int = 1
    out_dim: int = 1
    points_factor: float = 1.0
    activation: str = "softplus"  # softplus | relu
    final: Optional[str] = None  # None | sigmoid
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (params stay f32)

    @nn.compact
    def __call__(self, points: jnp.ndarray, *conds: jnp.ndarray) -> jnp.ndarray:
        act = _softplus100 if self.activation == "softplus" else nn.relu
        feats = conds[0] if len(conds) == 1 else jnp.concatenate(conds, axis=-1)
        dense = lambda d, name: nn.Dense(d, name=name, dtype=self.dtype)
        x = dense(self.hidden_dim, "fc_p")(points) * self.points_factor
        n_lin = self.n_blocks + 1
        for l in range(n_lin):
            x = x + dense(self.hidden_dim, f"fc_c{l}")(feats)
            out_d = self.out_dim if l == n_lin - 1 else self.hidden_dim
            x = dense(out_d, f"lin{l}")(x)
            if l < n_lin - 1:
                x = act(x)
        x = x.astype(jnp.float32)
        if self.final == "sigmoid":
            x = jax.nn.sigmoid(x)
        return x


class SingleVarianceNetwork(nn.Module):
    """NeuS learnable inverse-variance: inv_s = exp(10 * variance)."""

    init_val: float = 0.3

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        variance = self.param(
            "variance", lambda key: jnp.asarray(self.init_val, jnp.float32)
        )
        return jnp.exp(10.0 * variance)


class LaplaceDensity(nn.Module):
    """VolSDF sdf->density: (1/beta) * (0.5 + 0.5 sign(-sdf)(1-exp(-|sdf|/beta)))."""

    beta_init: float = 0.1
    beta_min: float = 1e-4

    @nn.compact
    def __call__(self, sdf: jnp.ndarray) -> jnp.ndarray:
        beta_param = self.param(
            "beta", lambda key: jnp.asarray(self.beta_init, jnp.float32)
        )
        beta = jnp.abs(beta_param) + self.beta_min
        alpha = 1.0 / beta
        return alpha * (
            0.5 + 0.5 * jnp.sign(-sdf) * (1.0 - jnp.exp(-jnp.abs(sdf) / beta))
        )


@FIELDS.register_module()
class SDFField(nn.Module):
    """SDF + color + semantic field conditioned on a dense feature volume.

    Points are in the *unit cube* [0,1]^3 (scene-normalized); the feature volume
    is (B, C, X, Y, Z) and is sampled at normalized coords. All decoders are
    vmapped implicitly by operating on trailing dims.
    """

    feature_dim: int = 32
    hidden_dim: int = 128
    num_layers: int = 3
    geo_feat_dim: int = 15
    use_color: bool = True
    use_semantic: bool = True
    semantic_dim: int = 512
    points_factor: float = 0.0  # reference indoor config zeroes positional input
    smoothstep: bool = True
    variance_init: float = 0.3
    sdf_bias: float = 0.0
    rgb_n_blocks: int = 0
    semantic_n_blocks: int = 0
    compute_dtype: Optional[jnp.dtype] = None  # cast the volume for sampling
    #   (bf16 halves the gather operand; TPU gather rate degrades with
    #   operand size — measured round 3)
    share_volume: bool = False  # False: first half of channels -> sdf branch,
    #                             second half -> rgb/semantic (reference cfg)

    def setup(self):
        # reference shipped sizes (configs/scannet/pretrain-...-base.py:35-56):
        # sdf n_blocks=1, rgb/semantic n_blocks=0; ``num_layers`` keeps the
        # historical config knob: sdf blocks = num_layers - 1
        self.sdf_decoder = ResidualDecoder(
            hidden_dim=self.hidden_dim,
            n_blocks=max(self.num_layers - 1, 0),
            out_dim=1 + self.geo_feat_dim,
            points_factor=self.points_factor,
            activation="softplus",
            dtype=self.compute_dtype,
            name="sdf_decoder",
        )
        if self.use_color:
            self.rgb_decoder = ResidualDecoder(
                hidden_dim=self.hidden_dim,
                n_blocks=self.rgb_n_blocks,
                out_dim=3,
                activation="relu",
                dtype=self.compute_dtype,
                name="rgb_decoder",
            )
        if self.use_semantic:
            self.semantic_decoder = ResidualDecoder(
                hidden_dim=self.hidden_dim,
                n_blocks=self.semantic_n_blocks,
                out_dim=self.semantic_dim,
                activation="relu",
                dtype=self.compute_dtype,
                name="semantic_decoder",
            )
        self.deviation = SingleVarianceNetwork(
            init_val=self.variance_init, name="deviation_network"
        )

    # ------------------------------------------------------------- primitives
    def sample_features(self, volume: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
        """volume (B,C,X,Y,Z); points (B, ..., 3) in [0,1] -> (B, ..., C)."""
        B = volume.shape[0]
        if self.compute_dtype is not None:
            volume = volume.astype(self.compute_dtype)
        flat = points.reshape(B, -1, 3)
        grid = flat * 2.0 - 1.0  # [0,1] -> [-1,1]
        # our volume axes are (X,Y,Z) = (D,H,W) order with torch convention
        # grid_sample (x->W): feed (z,y,x)? We store volume as (B,C,X,Y,Z) and
        # want index by (x,y,z): pass grid as (x_norm over Z-axis?) — simplest:
        # transpose volume to (B,C,Z,Y,X) so W-axis == x.
        vol = jnp.transpose(volume, (0, 1, 4, 3, 2))
        out = grid_sample_3d(vol, grid, align_corners=True, smoothstep=self.smoothstep)
        out = jnp.swapaxes(out, 1, 2).astype(jnp.float32)  # (B, M, C)
        return out.reshape(*points.shape[:-1], volume.shape[1])

    def _split(self, feat: jnp.ndarray):
        if self.share_volume:
            return feat, feat
        half = feat.shape[-1] // 2
        return feat[..., :half], feat[..., half:]

    def get_sdf(self, volume: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
        """(B, ..., 3) -> sdf (B, ...)."""
        feat_sdf, _ = self._split(self.sample_features(volume, points))
        out = self.sdf_decoder(points, feat_sdf)
        return out[..., 0] - self.sdf_bias

    def _sdf_geo(self, volume, points):
        """(sdf, aux=(geo, appearance-feat)) — the vjp-fused forward body."""
        feat = self.sample_features(volume, points)
        feat_sdf, feat_app = self._split(feat)
        out = self.sdf_decoder(points, feat_sdf)
        return out[..., 0] - self.sdf_bias, (out[..., 1:], feat_app)

    def get_sdf_and_geo(self, volume, points):
        sdf, (geo, feat_app) = self._sdf_geo(volume, points)
        return sdf, geo, feat_app

    def get_gradient(self, volume, points):
        """Spatial gradient of the sdf at each point (normals, eikonal)."""

        def sdf_sum(p):
            return jnp.sum(self.get_sdf(volume, p))

        return jax.grad(sdf_sum)(points)

    def get_alpha(
        self,
        sdf: jnp.ndarray,
        gradients: jnp.ndarray,
        directions: jnp.ndarray,
        deltas: jnp.ndarray,
        inv_s: jnp.ndarray,
        cos_anneal_ratio: float = 1.0,
    ) -> jnp.ndarray:
        """NeuS alpha from sdf + its gradient (reference sdf_field.py:122-146)."""
        true_cos = jnp.sum(directions[..., None, :] * gradients, axis=-1)
        iter_cos = -(
            nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + nn.relu(-true_cos) * cos_anneal_ratio
        )
        est_next = sdf + iter_cos * deltas * 0.5
        est_prev = sdf - iter_cos * deltas * 0.5
        cdf_next = jax.nn.sigmoid(est_next * inv_s)
        cdf_prev = jax.nn.sigmoid(est_prev * inv_s)
        alpha = (cdf_prev - cdf_next + 1e-5) / (cdf_prev + 1e-5)
        return jnp.clip(alpha, 0.0, 1.0)

    # ------------------------------------------------------------ full forward
    def __call__(
        self,
        volume: jnp.ndarray,
        origins: jnp.ndarray,
        directions: jnp.ndarray,
        starts: jnp.ndarray,
        ends: jnp.ndarray,
        cos_anneal_ratio: float = 1.0,
    ):
        """Evaluate the field at ray samples.

        origins/directions (B, R, 3); starts/ends (B, R, S).
        Returns dict with sdf, alphas, rgb, semantic, gradients, positions.
        """
        mid = 0.5 * (starts + ends)
        positions = origins[..., None, :] + directions[..., None, :] * mid[..., None]
        # one forward + one pullback yields sdf, geo/appearance features AND
        # the spatial sdf gradient — get_sdf_and_geo + get_gradient would
        # run the volume sample + sdf decoder forward twice (sdf_i depends
        # only on p_i, so the sum-pullback IS the per-point gradient)
        sdf, pullback, (geo, feat) = jax.vjp(
            lambda p: self._sdf_geo(volume, p), positions, has_aux=True
        )
        gradients = pullback(jnp.ones_like(sdf))[0]
        inv_s = self.deviation()
        deltas = jnp.maximum(ends - starts, 1e-6)
        alphas = self.get_alpha(
            sdf, gradients, directions, deltas, inv_s, cos_anneal_ratio
        )
        out = dict(
            sdf=sdf,
            alphas=alphas,
            gradients=gradients,
            positions=positions,
            inv_s=inv_s,
        )
        if self.use_color:
            # reference input order: gradients, appearance feat, geo, dirs
            # (sdf_field.py:240-254)
            dirs = jnp.broadcast_to(directions[..., None, :], positions.shape)
            out["rgb"] = jax.nn.sigmoid(
                self.rgb_decoder(positions, gradients, feat, geo, dirs)
            )
        if self.use_semantic:
            # reference semantic decoder: feat + geo + gradients, no view dirs
            out["semantic"] = self.semantic_decoder(positions, gradients, feat, geo)
        return out
