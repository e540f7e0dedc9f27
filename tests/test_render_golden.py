"""Golden-forward test: the FULL NeuS render forward (collider -> sampler ->
field -> compositing) on one fixed scene, pinned against an independent
float64 torch reimplementation of the reference pipeline
(/root/reference/ponder/models/ponder/render_utils/models/base_surface_model.py:40-91,
neus.py:16-36, sdf_field.py, ray_samplers.py:355-430).

Loss-level tests average away compositing/sampler drift; this compares the
rendered rgb / depth / semantic / sdf / weights themselves (round-3 verdict
next-round item #6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ponderv2_tpu.models.ponder.render.surface_models import NeuSModel


@pytest.fixture(autouse=True)
def _torch_float64():
    # Scoped, not module-level: pytest imports every module at collection
    # time, so a module-level set_default_dtype leaks float64 into every
    # other torch-oracle test in the session (broke
    # test_render.py::TestContrastiveSemanticLoss in full-suite runs).
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def _t(x):
    return torch.from_numpy(np.asarray(x)).double()


class TorchOracle:
    """Independent float64 reimplementation of the NeuS forward."""

    def __init__(self, params, cfg):
        self.p = jax.tree.map(np.asarray, params)
        self.cfg = cfg

    # ---------------------------------------------------------- primitives
    def linear(self, *path):
        d = self.p["field"]
        for k in path:
            d = d[k]
        return _t(d["kernel"]), _t(d["bias"])

    def decoder(self, name, n_blocks, points, conds, act,
                points_factor=1.0):
        # only the sdf decoder takes the config's points_factor (the indoor
        # reference zeroes positional input there); rgb/semantic decoders
        # keep the ResidualDecoder default of 1.0 (fields.py setup)
        feats = torch.cat(conds, dim=-1)
        k, b = self.linear(name, "fc_p")
        x = (points @ k + b) * points_factor
        for l in range(n_blocks + 1):
            ck, cb = self.linear(name, f"fc_c{l}")
            x = x + feats @ ck + cb
            lk, lb = self.linear(name, f"lin{l}")
            x = x @ lk + lb
            if l < n_blocks:
                x = act(x)
        return x

    @staticmethod
    def softplus100(x):
        return F.softplus(x * 100.0) / 100.0

    def sample(self, vol, pts):
        """Trilinear smoothstep sample, zeros padding, align_corners.

        vol (C, X, Y, Z); pts (..., 3) in [0, 1] -> (..., C)."""
        C, X, Y, Z = vol.shape
        flat = pts.reshape(-1, 3)
        ix = flat[:, 0] * (X - 1)
        iy = flat[:, 1] * (Y - 1)
        iz = flat[:, 2] * (Z - 1)
        x0, y0, z0 = torch.floor(ix), torch.floor(iy), torch.floor(iz)
        tx, ty, tz = ix - x0, iy - y0, iz - z0
        tx = tx * tx * (3.0 - 2.0 * tx)
        ty = ty * ty * (3.0 - 2.0 * ty)
        tz = tz * tz * (3.0 - 2.0 * tz)
        out = torch.zeros(flat.shape[0], C, dtype=vol.dtype)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx, cy, cz = x0 + dx, y0 + dy, z0 + dz
                    valid = (
                        (cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y)
                        & (cz >= 0) & (cz < Z)
                    )
                    v = vol[
                        :,
                        cx.clamp(0, X - 1).long(),
                        cy.clamp(0, Y - 1).long(),
                        cz.clamp(0, Z - 1).long(),
                    ].T  # (M, C)
                    w = (
                        (tx if dx else 1.0 - tx)
                        * (ty if dy else 1.0 - ty)
                        * (tz if dz else 1.0 - tz)
                    )
                    out = out + (w * valid)[:, None] * v
        return out.reshape(*pts.shape[:-1], C)

    def field_feat(self, vol, pts):
        feat = self.sample(vol, pts)
        half = feat.shape[-1] // 2
        return feat[..., :half], feat[..., half:]

    def get_sdf(self, vol, pts):
        feat_sdf, _ = self.field_feat(vol, pts)
        out = self.decoder(
            "sdf_decoder", self.cfg["sdf_blocks"], pts, [feat_sdf],
            self.softplus100, points_factor=self.cfg["points_factor"],
        )
        return out[..., 0]

    # ------------------------------------------------------------- sampling
    def collide(self, o, d):
        inv_d = 1.0 / torch.where(
            d.abs() < 1e-10, torch.sign(d) * 1e-10 + 1e-10, d
        )
        t0 = (0.0 - o) * inv_d
        t1 = (1.0 - o) * inv_d
        near = torch.minimum(t0, t1).max(dim=-1).values
        far = torch.maximum(t0, t1).min(dim=-1).values
        near = torch.clamp(near, min=self.cfg["near_plane"])
        far = torch.maximum(far, near + 1e-4)
        return near, far

    @staticmethod
    def weights_from_alphas(alphas):
        one_minus = torch.clamp(1.0 - alphas, 1e-7, 1.0)
        trans = torch.cumprod(one_minus, dim=-1)
        trans = torch.cat([torch.ones_like(trans[..., :1]),
                           trans[..., :-1]], dim=-1)
        return alphas * trans

    @staticmethod
    def sdf_to_alpha(sdf, starts, ends, inv_s):
        next_sdf = torch.cat([sdf[..., 1:], sdf[..., -1:]], dim=-1)
        mid_sdf = 0.5 * (sdf + next_sdf)
        delta = torch.clamp(ends - starts, min=1e-6)
        cos_val = torch.clamp((next_sdf - sdf) / delta, -1e3, 0.0)
        est_prev = mid_sdf - cos_val * delta * 0.5
        est_next = mid_sdf + cos_val * delta * 0.5
        cdf_prev = torch.sigmoid(est_prev * inv_s)
        cdf_next = torch.sigmoid(est_next * inv_s)
        alpha = (cdf_prev - cdf_next + 1e-5) / torch.clamp(cdf_prev, min=1e-5)
        return torch.clamp(alpha, 0.0, 1.0)

    def pdf_sample(self, starts, ends, weights, n):
        num_bins = n + 1
        w = weights + 0.01
        pdf = w / torch.clamp(w.sum(-1, keepdim=True), min=1e-10)
        cdf = torch.cat(
            [torch.zeros_like(pdf[..., :1]), torch.cumsum(pdf, -1)], dim=-1
        ).clamp(0.0, 1.0)
        u = torch.linspace(0.0, 1.0 - 1e-6, num_bins).expand(
            *cdf.shape[:-1], num_bins
        )
        edges = torch.cat([starts, ends[..., -1:]], dim=-1)
        idx = (u[..., None, :] >= cdf[..., :, None]).sum(dim=-2)
        below = (idx - 1).clamp(0, cdf.shape[-1] - 1)
        above = idx.clamp(0, cdf.shape[-1] - 1)
        cdf_b = torch.gather(cdf, -1, below)
        cdf_a = torch.gather(cdf, -1, above)
        edge_b = torch.gather(edges, -1, below)
        edge_a = torch.gather(edges, -1, above)
        denom = torch.where(cdf_a - cdf_b < 1e-8,
                            torch.ones_like(cdf_a), cdf_a - cdf_b)
        t = (u - cdf_b) / denom
        samples = edge_b + t * (edge_a - edge_b)
        return samples[..., :-1]

    # --------------------------------------------------------- full forward
    def render(self, volume, origins, directions):
        cfg = self.cfg
        vol = _t(volume)
        o, d = _t(origins), _t(directions)
        B = vol.shape[0]
        near, far = self.collide(o, d)
        u = torch.linspace(0.0, 1.0, cfg["num_samples"] + 1)
        bins = near[..., None] + (far - near)[..., None] * u
        starts, ends = bins[..., :-1], bins[..., 1:]
        for step in range(cfg["upsample_steps"]):
            mid = 0.5 * (starts + ends)
            pos = o[..., None, :] + d[..., None, :] * mid[..., None]
            sdf = torch.stack(
                [self.get_sdf(vol[i], pos[i]) for i in range(B)]
            )
            alphas = self.sdf_to_alpha(
                sdf, starts, ends, cfg["base_variance"] * 2 ** step
            )
            w = self.weights_from_alphas(alphas)
            new_starts = self.pdf_sample(
                starts, ends, w,
                cfg["num_importance"] // cfg["upsample_steps"],
            )
            all_starts = torch.sort(
                torch.cat([starts, new_starts], dim=-1), dim=-1
            ).values
            ends_last = torch.maximum(ends[..., -1:], all_starts[..., -1:])
            starts = all_starts
            ends = torch.cat([all_starts[..., 1:], ends_last], dim=-1)

        mid = 0.5 * (starts + ends)
        pos = o[..., None, :] + d[..., None, :] * mid[..., None]
        pos = pos.detach().requires_grad_(True)
        feat_sdf, feat_app = zip(
            *[self.field_feat(vol[i], pos[i]) for i in range(B)]
        )
        feat_sdf = torch.stack(list(feat_sdf))
        feat_app = torch.stack(list(feat_app))
        out = self.decoder("sdf_decoder", cfg["sdf_blocks"], pos, [feat_sdf],
                           self.softplus100,
                           points_factor=cfg["points_factor"])
        sdf, geo = out[..., 0], out[..., 1:]
        (gradients,) = torch.autograd.grad(sdf.sum(), pos)
        pos = pos.detach()

        inv_s = float(np.exp(10.0 * np.asarray(
            self.p["field"]["deviation_network"]["variance"])))
        deltas = torch.clamp(ends - starts, min=1e-6)
        true_cos = (d[..., None, :] * gradients).sum(-1)
        iter_cos = -F.relu(-true_cos)  # cos_anneal_ratio = 1
        est_next = sdf + iter_cos * deltas * 0.5
        est_prev = sdf - iter_cos * deltas * 0.5
        alphas = torch.clamp(
            (torch.sigmoid(est_prev * inv_s) - torch.sigmoid(est_next * inv_s)
             + 1e-5)
            / (torch.sigmoid(est_prev * inv_s) + 1e-5),
            0.0, 1.0,
        )
        weights = self.weights_from_alphas(alphas)

        dirs_b = d[..., None, :].expand_as(pos)
        rgb = torch.sigmoid(self.decoder(
            "rgb_decoder", cfg["rgb_blocks"], pos,
            [gradients, feat_app, geo, dirs_b], F.relu,
        ))
        semantic = self.decoder(
            "semantic_decoder", cfg["semantic_blocks"], pos,
            [gradients, feat_app, geo], F.relu,
        )

        acc = weights.sum(-1)
        depth = (weights * mid).sum(-1) / torch.clamp(acc, min=1e-8)
        depth = torch.clamp(
            depth, mid.min(dim=-1).values, mid.max(dim=-1).values
        )
        return dict(
            sdf=sdf, gradients=gradients, weights=weights,
            rgb=(weights[..., None] * rgb).sum(-2),
            semantic=(weights[..., None] * semantic).sum(-2),
            depth=depth, accumulation=acc,
        )


class TestGoldenForward:
    @pytest.mark.slow  # heavy jit compile; smoke tier skips
    def test_full_forward_matches_torch_oracle(self):
        """One fixed scene, full render forward pinned against the float64
        torch oracle: catches compositing/sampler drift that loss-level
        tests average away."""
        cfg = dict(
            points_factor=0.0, sdf_blocks=1, rgb_blocks=0, semantic_blocks=0,
            near_plane=0.05, num_samples=12, num_importance=4,
            upsample_steps=1, base_variance=64.0,
        )
        model = NeuSModel(
            field=dict(hidden_dim=32, num_layers=2, geo_feat_dim=8,
                       semantic_dim=16, share_volume=False),
            collider=dict(type="AABBBoxCollider", near_plane=0.05),
            sampler=dict(type="NeuSSampler", num_samples=12,
                         num_samples_importance=4, num_upsample_steps=1),
            loss=dict(),
        )
        rng = np.random.RandomState(3)
        B, R, C = 2, 16, 16
        # a smooth volume (random low-frequency field) keeps the pdf-sampler
        # cdf away from exact bin-edge ties (discrete f32-vs-f64 flips)
        base = rng.randn(B, C, 3, 3, 3).astype(np.float32)
        volume = jax.image.resize(jnp.asarray(base), (B, C, 8, 8, 8),
                                  "cubic")
        volume = np.asarray(volume)
        origins = (rng.rand(B, R, 3) * 0.4 + 0.3).astype(np.float32)
        dirs = rng.randn(B, R, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(volume), jnp.asarray(origins),
            jnp.asarray(dirs), train=False,
        )
        out = model.apply(variables, jnp.asarray(volume), jnp.asarray(origins),
                          jnp.asarray(dirs), train=False)

        oracle = TorchOracle(variables["params"], cfg)
        ref = oracle.render(volume, origins, dirs)

        for key, tol in (
            ("sdf", 2e-4), ("weights", 2e-3), ("rgb", 2e-3),
            ("depth", 2e-3), ("semantic", 5e-3), ("accumulation", 2e-3),
            ("gradients", 2e-3),
        ):
            got = np.asarray(out[key], np.float64)
            want = ref[key].detach().numpy()
            scale = max(np.abs(want).max(), 1e-3)
            np.testing.assert_allclose(
                got, want, atol=tol * scale, rtol=0,
                err_msg=f"golden forward diverged at '{key}'",
            )
