"""Torch-checkpoint converter: structural round-trip against our SpUNet tree."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_checkpoint import graft_variables  # noqa: E402

pytestmark = pytest.mark.slow  # heavy jit compiles; smoke tier skips


def fake_reference_state(channels, layers, in_ch=6, num_classes=5, base=8):
    """Construct a reference-named state_dict with correctly-shaped tensors."""
    rng = np.random.RandomState(0)
    st = {}
    num_stages = len(layers) // 2

    def conv(name, k, cin, cout):
        # fan-in scaling keeps activations O(1) so f32 rounding stays small
        st[f"{name}.weight"] = (
            rng.randn(k, k, k, cin, cout) / np.sqrt(k**3 * cin)
        ).astype(np.float32)

    def bn(name, c):
        st[f"{name}.weight"] = np.ones(c, np.float32)
        st[f"{name}.bias"] = np.zeros(c, np.float32)
        st[f"{name}.running_mean"] = np.zeros(c, np.float32)
        st[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv_input.0", 5, in_ch, base)
    bn("conv_input.1", base)
    prev = base
    for s in range(num_stages):
        conv(f"down.{s}.0", 2, prev, channels[s])
        bn(f"down.{s}.1", channels[s])
        for b in range(layers[s]):
            conv(f"enc.{s}.block{b}.conv1", 3, channels[s], channels[s])
            bn(f"enc.{s}.block{b}.bn1", channels[s])
            conv(f"enc.{s}.block{b}.conv2", 3, channels[s], channels[s])
            bn(f"enc.{s}.block{b}.bn2", channels[s])
        prev = channels[s]
    dec_prev = prev
    for s in range(num_stages):
        # reference module indices: up/dec are BUILT ascending but EXECUTED
        # reversed (spconv_unet_v1m1_base.py:267), so execution step s reads
        # module index num_stages - 1 - s
        ref = num_stages - 1 - s
        dec_c = channels[num_stages + s]
        skip_c = ([base] + list(channels[:num_stages]))[num_stages - 1 - s]
        conv(f"up.{ref}.0", 2, dec_prev, dec_c)
        bn(f"up.{ref}.1", dec_c)
        for b in range(layers[num_stages + s]):
            cin = dec_c + skip_c if b == 0 else dec_c
            conv(f"dec.{ref}.block{b}.conv1", 3, cin, dec_c)
            bn(f"dec.{ref}.block{b}.bn1", dec_c)
            conv(f"dec.{ref}.block{b}.conv2", 3, dec_c, dec_c)
            bn(f"dec.{ref}.block{b}.bn2", dec_c)
            if b == 0 and cin != dec_c:
                st[f"dec.{ref}.block{b}.proj.0.weight"] = (
                    rng.randn(1, 1, 1, cin, dec_c) / np.sqrt(cin)
                ).astype(np.float32)
                bn(f"dec.{ref}.block{b}.proj.1", dec_c)
        dec_prev = dec_c
    st["final.weight"] = (rng.randn(channels[-1], num_classes)
                          / np.sqrt(channels[-1])).astype(np.float32).T
    st["final.bias"] = np.zeros(num_classes, np.float32)
    return st


class TestConverter:
    def test_structure_matches_model(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_torch_checkpoint import convert_spunet_v1m1

        from ponderv2_tpu.models import build_model
        from ponderv2_tpu.ops.sparse import make_sparse_tensor

        channels = (8, 16, 16, 16, 16, 16, 8, 8)
        layers = (1, 2, 1, 1, 2, 1, 1, 1)
        state = fake_reference_state(channels, layers)
        params, stats = convert_spunet_v1m1(state, channels, layers)

        model = build_model(dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=5, base_channels=8,
            channels=channels, layers=layers,
        ))
        coords = np.unique(np.stack(
            [rng.randint(0, 2, 150), rng.randint(0, 16, 150),
             rng.randint(0, 16, 150), rng.randint(0, 16, 150)], 1), axis=0)
        cap = 192
        coords = np.concatenate(
            [coords, np.full((cap - len(coords), 4), -1)]).astype(np.int32)
        feat = rng.randn(cap, 6).astype(np.float32)
        st = make_sparse_tensor(jnp.asarray(feat), jnp.asarray(coords),
                                (16, 16, 16), 2)
        variables = model.init(jax.random.PRNGKey(0), st, train=False)

        # graft converted weights onto the model tree — structure must line up
        target = jax.device_get(variables)
        restored = graft_variables(
            target, {"params": params, "batch_stats": stats}
        )
        # every leaf shape must match
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(target["params"])[0],
            jax.tree_util.tree_flatten_with_path(restored["params"])[0],
        ):
            assert str(p1) == str(p2)
            assert a.shape == np.asarray(b).shape, (str(p1), a.shape, b.shape)

        # and the model must run with the converted weights
        out = model.apply(restored, st, train=False)
        assert np.isfinite(np.asarray(out)).all()


def _dense_reference_forward(state, coords, feat, channels, layers, base,
                             in_ch, num_classes, grid, eps=1e-3):
    """Dense-torch oracle of the reference SpUNet-v1m1 forward
    (spconv_unet_v1m1_base.py:242-278) in eval mode.

    Sparse convs become dense convs evaluated at active sites with inactive
    inputs zeroed: SubMConv3d = conv3d(pad k//2) masked to the input's active
    set; SparseConv3d(k2 s2 p0) = strided conv3d masked to the downsampled
    active set; SparseInverseConv3d = conv_transpose3d(stride 2) masked to the
    original fine active set (spconv indice_key inversion).
    """
    import torch
    import torch.nn.functional as F

    X, Y, Z = grid
    B = int(coords[:, 0].max()) + 1
    num_stages = len(layers) // 2

    def dense(c, f):
        # numpy advanced indexing (separated by ':') -> (M, C), unambiguous
        d = np.zeros((B, f.shape[1], X, Y, Z), np.float32)
        d[c[:, 0], :, c[:, 1], c[:, 2], c[:, 3]] = f
        return torch.from_numpy(d)

    def active_mask(c, dims):
        m = torch.zeros(B, 1, *dims)
        m[c[:, 0], :, c[:, 1], c[:, 2], c[:, 3]] = 1.0
        return m

    def w5(name):  # (kx,ky,kz,Cin,Cout) -> torch conv (Cout,Cin,kx,ky,kz)
        return torch.from_numpy(state[f"{name}.weight"]).permute(4, 3, 0, 1, 2)

    def bn(x, name, act):
        m = torch.from_numpy(state[f"{name}.running_mean"])[None, :, None, None, None]
        v = torch.from_numpy(state[f"{name}.running_var"])[None, :, None, None, None]
        w = torch.from_numpy(state[f"{name}.weight"])[None, :, None, None, None]
        b = torch.from_numpy(state[f"{name}.bias"])[None, :, None, None, None]
        return ((x - m) / torch.sqrt(v + eps) * w + b) * act

    def subm(x, name, k, act):
        return F.conv3d(x, w5(name), padding=k // 2) * act

    def block(x, name, act):
        identity = x
        h = torch.relu(bn(subm(x, f"{name}.conv1", 3, act), f"{name}.bn1", act))
        h = bn(subm(h, f"{name}.conv2", 3, act), f"{name}.bn2", act)
        if f"{name}.proj.0.weight" in state:
            pw = torch.from_numpy(
                state[f"{name}.proj.0.weight"]).permute(4, 3, 0, 1, 2)
            identity = bn(F.conv3d(identity, pw), f"{name}.proj.1", act)
        return torch.relu(h + identity) * act

    x = dense(coords, feat)
    acts = [active_mask(coords, (X, Y, Z))]
    x = torch.relu(bn(subm(x, "conv_input.0", 5, acts[0]), "conv_input.1",
                      acts[0]))
    skips = [x]
    for s in range(num_stages):
        act_coarse = (F.max_pool3d(acts[-1], 2, 2) > 0).float()
        x = F.conv3d(x, w5(f"down.{s}.0"), stride=2) * act_coarse
        acts.append(act_coarse)
        x = torch.relu(bn(x, f"down.{s}.1", act_coarse))
        for b in range(layers[s]):
            x = block(x, f"enc.{s}.block{b}", act_coarse)
        skips.append(x)
    skips.pop(-1)
    for s in range(num_stages):
        ref = num_stages - 1 - s  # reference executes up/dec reversed
        act_fine = acts[num_stages - 1 - s]
        wt = torch.from_numpy(
            state[f"up.{ref}.0.weight"]).permute(3, 4, 0, 1, 2)  # (Cin,Cout,k..)
        x = F.conv_transpose3d(x, wt, stride=2)
        x = x[..., :act_fine.shape[2], :act_fine.shape[3], :act_fine.shape[4]]
        x = x * act_fine
        x = torch.relu(bn(x, f"up.{ref}.1", act_fine))
        x = torch.cat([x, skips.pop(-1)], dim=1)
        for b in range(layers[num_stages + s]):
            x = block(x, f"dec.{ref}.block{b}", act_fine)
    # final: 1x1 subm with bias; state stores torch-Linear (out, in)
    fw = torch.from_numpy(state["final.weight"])
    fb = torch.from_numpy(state["final.bias"])
    logits = torch.einsum("bcxyz,oc->boxyz", x, fw) + fb[None, :, None, None,
                                                         None]
    ln = logits.numpy()
    return ln[coords[:, 0], :, coords[:, 1], coords[:, 2], coords[:, 3]]


class TestGoldenForward:
    """Numerical golden test (SURVEY §7 milestone A machinery): converted
    reference weights must reproduce the reference forward to ~1e-4."""

    def test_converted_forward_matches_dense_reference(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_torch_checkpoint import convert_spunet_v1m1

        from ponderv2_tpu.models import build_model
        from ponderv2_tpu.ops.sparse import make_sparse_tensor, sort_by_key

        channels = (4, 8, 4, 4)
        layers = (1, 2, 1, 1)
        base, in_ch, num_classes = 4, 3, 5
        grid = (16, 16, 16)
        state = fake_reference_state(channels, layers, in_ch=in_ch,
                                     num_classes=num_classes, base=base)
        # randomize BN stats so normalization actually does something
        for k in list(state):
            if k.endswith("running_mean"):
                state[k] = rng.randn(*state[k].shape).astype(np.float32) * 0.1
            elif k.endswith("running_var"):
                state[k] = (rng.rand(*state[k].shape).astype(np.float32)
                            * 0.5 + 0.75)
            elif k.endswith(".bias") and "final" not in k:
                state[k] = rng.randn(*state[k].shape).astype(np.float32) * 0.1
        state["final.bias"] = rng.randn(num_classes).astype(np.float32) * 0.1

        coords = np.unique(np.stack(
            [rng.randint(0, 2, 200), rng.randint(0, 16, 200),
             rng.randint(0, 16, 200), rng.randint(0, 16, 200)], 1), axis=0
        ).astype(np.int32)
        M = len(coords)
        feat = rng.randn(M, in_ch).astype(np.float32)

        expected = _dense_reference_forward(
            state, coords, feat, channels, layers, base, in_ch, num_classes,
            grid,
        )

        params, stats = convert_spunet_v1m1(state, channels, layers)
        model = build_model(dict(
            type="SpUNet-v1m1", in_channels=in_ch, num_classes=num_classes,
            base_channels=base, channels=channels, layers=layers,
            # random scenes barely merge under 2x downsampling: keep full
            # capacity per level so no voxel is budget-dropped vs the oracle
            capacities=(256, 256, 256),
        ))
        cap = 256
        pad_coords = np.concatenate(
            [coords, np.full((cap - M, 4), -1, np.int32)])
        pad_feat = np.concatenate(
            [feat, np.zeros((cap - M, in_ch), np.float32)])
        st = make_sparse_tensor(jnp.asarray(pad_feat), jnp.asarray(pad_coords),
                                grid, 2)
        st_sorted, inverse = sort_by_key(st)
        variables = model.init(jax.random.PRNGKey(0), st_sorted, train=False)
        restored = graft_variables(
            jax.device_get(variables),
            {"params": params, "batch_stats": stats},
        )
        out = np.asarray(
            model.apply(restored, st_sorted, train=False)
        )[np.asarray(inverse)][:M]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def fake_v1m3_state(channels, layers, conditions, in_ch=6, base=8,
                    adaptive=True, context_channels=16, num_classes=0):
    """Reference-named SpUNet-v1m3/PDNorm state_dict
    (spconv_unet_v1m3_pdnorm.py module naming)."""
    rng = np.random.RandomState(1)
    st = {}
    num_stages = len(layers) // 2

    def conv(name, k, cin, cout):
        st[f"{name}.weight"] = (
            rng.randn(k, k, k, cin, cout) / np.sqrt(k**3 * cin)
        ).astype(np.float32)

    def pdn(name, c):
        for i in range(len(conditions)):
            st[f"{name}.bns.{i}.weight"] = np.ones(c, np.float32)
            st[f"{name}.bns.{i}.bias"] = (
                rng.randn(c).astype(np.float32) * 0.1
            )
            st[f"{name}.bns.{i}.running_mean"] = (
                rng.randn(c).astype(np.float32) * 0.1
            )
            st[f"{name}.bns.{i}.running_var"] = (
                rng.rand(c).astype(np.float32) * 0.5 + 0.75
            )
        if adaptive:
            st[f"{name}.modulation.1.weight"] = (
                rng.randn(2 * c, context_channels).astype(np.float32) * 0.02
            )
            st[f"{name}.modulation.1.bias"] = np.zeros(2 * c, np.float32)

    conv("conv_input.conv", 5, in_ch, base)
    pdn("conv_input.bn", base)
    prev = base
    for s in range(num_stages):
        conv(f"down.{s}.conv", 2, prev, channels[s])
        pdn(f"down.{s}.bn", channels[s])
        for b in range(layers[s]):
            conv(f"enc.{s}.block{b}.conv1", 3, channels[s], channels[s])
            pdn(f"enc.{s}.block{b}.bn1", channels[s])
            conv(f"enc.{s}.block{b}.conv2", 3, channels[s], channels[s])
            pdn(f"enc.{s}.block{b}.bn2", channels[s])
        prev = channels[s]
    dec_prev = prev
    for s in range(num_stages):
        ref = num_stages - 1 - s  # reversed execution order (see v1m1)
        dec_c = channels[num_stages + s]
        skip_c = ([base] + list(channels[:num_stages]))[num_stages - 1 - s]
        conv(f"up.{ref}.conv", 2, dec_prev, dec_c)
        pdn(f"up.{ref}.bn", dec_c)
        for b in range(layers[num_stages + s]):
            cin = dec_c + skip_c if b == 0 else dec_c
            conv(f"dec.{ref}.block{b}.conv1", 3, cin, dec_c)
            pdn(f"dec.{ref}.block{b}.bn1", dec_c)
            conv(f"dec.{ref}.block{b}.conv2", 3, dec_c, dec_c)
            pdn(f"dec.{ref}.block{b}.bn2", dec_c)
            if b == 0 and cin != dec_c:
                st[f"dec.{ref}.block{b}.proj_conv.weight"] = (
                    rng.randn(1, 1, 1, cin, dec_c) / np.sqrt(cin)
                ).astype(np.float32)
                pdn(f"dec.{ref}.block{b}.proj_norm", dec_c)
        dec_prev = dec_c
    return st


class TestV1m3Converter:
    CONDITIONS = ("Structured3D", "ScanNet", "S3DIS")

    def _build(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch_checkpoint import convert_spunet_v1m3

        channels = (8, 16, 16, 16, 16, 16, 8, 8)
        layers = (1, 2, 1, 1, 2, 1, 1, 1)
        state = fake_v1m3_state(channels, layers, self.CONDITIONS)
        params, stats = convert_spunet_v1m3(
            state, channels, layers, self.CONDITIONS, adaptive=True
        )
        return channels, layers, params, stats

    def test_structure_matches_model_and_runs(self, rng):

        from ponderv2_tpu.models import build_model
        from ponderv2_tpu.ops.sparse import make_sparse_tensor

        channels, layers, params, stats = self._build(rng)
        model = build_model(dict(
            type="SpUNet-v1m3", in_channels=6, num_classes=0, base_channels=8,
            channels=channels, layers=layers, conditions=self.CONDITIONS,
            context_channels=16, norm_adaptive=True,
        ))
        coords = np.unique(np.stack(
            [rng.randint(0, 2, 150), rng.randint(0, 16, 150),
             rng.randint(0, 16, 150), rng.randint(0, 16, 150)], 1), axis=0)
        cap = 192
        coords = np.concatenate(
            [coords, np.full((cap - len(coords), 4), -1)]).astype(np.int32)
        feat = rng.randn(cap, 6).astype(np.float32)
        st = make_sparse_tensor(jnp.asarray(feat), jnp.asarray(coords),
                                (16, 16, 16), 2)
        ctx = jnp.asarray(rng.randn(16).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), st, train=False,
                               condition="ScanNet", context=ctx)
        target = jax.device_get(variables)
        restored = graft_variables(
            target, {"params": params, "batch_stats": stats}
        )
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(target["params"])[0],
            jax.tree_util.tree_flatten_with_path(restored["params"])[0],
        ):
            assert str(p1) == str(p2)
            assert a.shape == np.asarray(b).shape, (str(p1), a.shape)
        out = model.apply(restored, st, train=False, condition="ScanNet",
                          context=ctx)
        assert np.isfinite(np.asarray(out)).all()
        # per-condition norms must actually differ
        out2 = model.apply(restored, st, train=False, condition="S3DIS",
                           context=ctx)
        assert not np.allclose(np.asarray(out), np.asarray(out2))


class TestPPTConverter:
    def test_full_ppt_tree_and_forward(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch_checkpoint import convert_ppt_v1m1

        from ponderv2_tpu.models import build_model

        conditions = ("Structured3D", "ScanNet", "S3DIS")
        channels = (8, 16, 16, 16, 16, 16, 8, 8)
        layers = (1, 1, 1, 1, 1, 1, 1, 1)
        num_names = 9
        state = {
            f"backbone.{k}": v
            for k, v in fake_v1m3_state(channels, layers, conditions).items()
        }
        state["embedding_table.weight"] = rng.randn(
            len(conditions), 16).astype(np.float32)
        state["proj_head.weight"] = rng.randn(512, 8).astype(np.float32) * 0.05
        state["proj_head.bias"] = np.zeros(512, np.float32)
        state["logit_scale"] = np.float32(np.log(1 / 0.07))
        emb = rng.randn(num_names, 512).astype(np.float32)
        state["class_embedding"] = emb / np.linalg.norm(
            emb, axis=1, keepdims=True)

        params, stats, constants = convert_ppt_v1m1(
            state, channels, layers, conditions, adaptive=True
        )
        model = build_model(dict(
            type="PPT-v1m1",
            backbone=dict(
                type="SpUNet-v1m3", in_channels=6, num_classes=0,
                base_channels=8, channels=channels, layers=layers,
                conditions=conditions, context_channels=16,
                norm_adaptive=True,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            backbone_out_channels=8,
            context_channels=16,
            conditions=conditions,
            class_name=tuple(f"c{i}" for i in range(num_names)),
            valid_index=tuple(tuple(range(num_names)) for _ in conditions),
        ))
        coords = np.unique(np.stack(
            [rng.randint(0, 2, 120), rng.randint(0, 16, 120),
             rng.randint(0, 16, 120), rng.randint(0, 16, 120)], 1), axis=0)
        cap = 160
        n = len(coords)
        coords = np.concatenate(
            [coords, np.full((cap - n, 4), -1)]).astype(np.int32)
        batch_dict = dict(
            feat=jnp.asarray(rng.randn(cap, 6).astype(np.float32)),
            grid_coord=jnp.asarray(coords[:, 1:]),
            batch=jnp.asarray(coords[:, 0]),
            spatial_shape=(16, 16, 16),
            batch_size=2,
            condition="ScanNet",
            segment=jnp.asarray(
                np.concatenate([np.zeros(n), np.full(cap - n, -1)])
            ).astype(jnp.int32),
        )
        variables = model.init(jax.random.PRNGKey(0), batch_dict, train=False)
        target = jax.device_get(variables)
        restored = graft_variables(
            target,
            {"params": params, "batch_stats": stats, "constants": constants},
        )
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(target["params"])[0],
            jax.tree_util.tree_flatten_with_path(restored["params"])[0],
        ):
            assert str(p1) == str(p2)
            assert a.shape == np.asarray(b).shape, (str(p1), a.shape)
        np.testing.assert_allclose(
            np.asarray(restored["constants"]["class_embedding"]),
            state["class_embedding"], rtol=1e-6,
        )
        out = model.apply(restored, batch_dict, train=False)
        logits = np.asarray(out["seg_logits"])
        assert logits.shape == (cap, num_names)
        assert np.isfinite(logits).all()


class TestUNet3Dv1m2Converter:
    """Golden test: converted torch UNet3D-v1m2 weights reproduce the torch
    forward (BatchNorm 'bcr' SingleConvs, ConvTranspose3d+sum decoders —
    reference unet3d.py:359-446,710-743)."""

    @staticmethod
    def _torch_model(in_ch, out_ch, f_maps, num_levels):
        import torch
        import torch.nn as tnn

        maps = [f_maps * 2**k for k in range(num_levels)]

        def single(cin, cout):
            return tnn.Sequential(
                tnn.BatchNorm3d(cin),
                tnn.Conv3d(cin, cout, 3, padding=1, bias=False),
                tnn.ReLU(),
            )

        class Oracle(tnn.Module):
            def __init__(self):
                super().__init__()
                self.encs = tnn.ModuleList(
                    [single(in_ch if i == 0 else maps[i - 1], maps[i])
                     for i in range(num_levels)]
                )
                self.ups = tnn.ModuleList(
                    [tnn.ConvTranspose3d(maps[-1 - i], maps[-2 - i], 3,
                                         stride=2, padding=1)
                     for i in range(num_levels - 1)]
                )
                self.decs = tnn.ModuleList(
                    [single(maps[-2 - i], maps[-2 - i])
                     for i in range(num_levels - 1)]
                )
                self.final = tnn.Conv3d(maps[0], out_ch, 1)

            def forward(self, x):
                import torch.nn.functional as F

                skips = []
                for i, enc in enumerate(self.encs):
                    if i > 0:
                        x = F.max_pool3d(x, 2, 2)
                    x = enc(x)
                    skips.append(x)
                for i in range(len(self.ups)):
                    skip = skips[-2 - i]
                    x = self.ups[i](x, output_size=skip.shape[2:])
                    x = skip + x
                    x = self.decs[i](x)
                return self.final(x)

        return Oracle()

    def test_forward_matches_torch(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        import torch
        from convert_torch_checkpoint import convert_unet3d_v1m2

        from ponderv2_tpu.models import build_model

        in_ch, out_ch, f_maps, levels = 3, 5, 4, 3
        oracle = self._torch_model(in_ch, out_ch, f_maps, levels)
        oracle.eval()
        # randomize BN stats so normalization matters
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, torch.nn.BatchNorm3d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.75, 1.25)

        # reference-named state dict
        sd = {}
        for i in range(levels):
            pre = f"encoders.{i}.basic_module"
            sd[f"{pre}.batchnorm.weight"] = oracle.encs[i][0].weight
            sd[f"{pre}.batchnorm.bias"] = oracle.encs[i][0].bias
            sd[f"{pre}.batchnorm.running_mean"] = oracle.encs[i][0].running_mean
            sd[f"{pre}.batchnorm.running_var"] = oracle.encs[i][0].running_var
            sd[f"{pre}.conv.weight"] = oracle.encs[i][1].weight
        for i in range(levels - 1):
            sd[f"decoders.{i}.upsampling.upsample.weight"] = oracle.ups[i].weight
            sd[f"decoders.{i}.upsampling.upsample.bias"] = oracle.ups[i].bias
            pre = f"decoders.{i}.basic_module"
            sd[f"{pre}.batchnorm.weight"] = oracle.decs[i][0].weight
            sd[f"{pre}.batchnorm.bias"] = oracle.decs[i][0].bias
            sd[f"{pre}.batchnorm.running_mean"] = oracle.decs[i][0].running_mean
            sd[f"{pre}.batchnorm.running_var"] = oracle.decs[i][0].running_var
            sd[f"{pre}.conv.weight"] = oracle.decs[i][1].weight
        sd["final_conv.weight"] = oracle.final.weight
        sd["final_conv.bias"] = oracle.final.bias
        sd = {k: v.detach().numpy() for k, v in sd.items()}

        params, stats = convert_unet3d_v1m2(sd, num_levels=levels)
        model = build_model(dict(type="UNet3D-v1m2", in_channels=in_ch,
                                 out_channels=out_ch, f_maps=f_maps,
                                 num_levels=levels))
        x = rng.randn(2, in_ch, 8, 8, 8).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               train=False)
        restored = graft_variables(
            jax.device_get(variables),
            {"params": params, "batch_stats": stats},
        )
        got = np.asarray(model.apply(restored, jnp.asarray(x), train=False))
        with torch.no_grad():
            want = oracle(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPonderIndoorConverter:
    def test_full_pretrain_tree_and_forward(self, rng):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch_checkpoint import convert_ponder_indoor

        from ponderv2_tpu.datasets import build_dataset
        from ponderv2_tpu.datasets.utils import collate_fn
        from ponderv2_tpu.engines.common import split_batch
        from ponderv2_tpu.models import build_model

        channels = (8, 16, 16, 16, 16, 16, 8, 8)
        layers = (1, 1, 1, 1, 1, 1, 1, 1)
        base, in_ch = 8, 6
        hidden, geo, sem_dim = 32, 8, 512
        proj_out, f_maps, levels = 16, 8, 2
        feat_half = proj_out // 2

        state = {
            f"backbone.{k}": v
            for k, v in fake_reference_state(
                channels, layers, in_ch=in_ch, base=base
            ).items()
            if not k.startswith("final.")  # pretrain backbone has no head
        }

        def lin(name, din, dout):
            state[name + ".weight"] = (
                rng.randn(dout, din) / np.sqrt(din)).astype(np.float32)
            state[name + ".bias"] = np.zeros(dout, np.float32)

        # proj_net: UNet3D-v1m2 naming
        maps = [f_maps * 2**k for k in range(levels)]
        prev = base  # backbone out channels = channels[-1] = 8
        for i in range(levels):
            pre = f"proj_net.encoders.{i}.basic_module"
            cin = prev if i == 0 else maps[i - 1]
            state[f"{pre}.batchnorm.weight"] = np.ones(cin, np.float32)
            state[f"{pre}.batchnorm.bias"] = np.zeros(cin, np.float32)
            state[f"{pre}.batchnorm.running_mean"] = np.zeros(cin, np.float32)
            state[f"{pre}.batchnorm.running_var"] = np.ones(cin, np.float32)
            state[f"{pre}.conv.weight"] = (
                rng.randn(maps[i], cin, 3, 3, 3) / np.sqrt(27 * cin)
            ).astype(np.float32)
        for i in range(levels - 1):
            up = f"proj_net.decoders.{i}.upsampling.upsample"
            state[f"{up}.weight"] = (
                rng.randn(maps[-1 - i], maps[-2 - i], 3, 3, 3) * 0.05
            ).astype(np.float32)
            state[f"{up}.bias"] = np.zeros(maps[-2 - i], np.float32)
            pre = f"proj_net.decoders.{i}.basic_module"
            c = maps[-2 - i]
            state[f"{pre}.batchnorm.weight"] = np.ones(c, np.float32)
            state[f"{pre}.batchnorm.bias"] = np.zeros(c, np.float32)
            state[f"{pre}.batchnorm.running_mean"] = np.zeros(c, np.float32)
            state[f"{pre}.batchnorm.running_var"] = np.ones(c, np.float32)
            state[f"{pre}.conv.weight"] = (
                rng.randn(c, c, 3, 3, 3) / np.sqrt(27 * c)
            ).astype(np.float32)
        state["proj_net.final_conv.weight"] = (
            rng.randn(proj_out, maps[0], 1, 1, 1) * 0.1).astype(np.float32)
        state["proj_net.final_conv.bias"] = np.zeros(proj_out, np.float32)

        # field decoders (reference decoders.py naming)
        fld = "renderer.field"
        lin(f"{fld}.sdf_decoder.fc_p", 3, hidden)
        for l in range(2):  # n_blocks=1 -> lin0, lin1
            lin(f"{fld}.sdf_decoder.fc_c.{l}", feat_half, hidden)
        lin(f"{fld}.sdf_decoder.lin0", hidden, hidden)
        lin(f"{fld}.sdf_decoder.lin1", hidden, 1 + geo)
        rgb_in = 3 + feat_half + geo + 3
        lin(f"{fld}.rgb_decoder.fc_p", 3, hidden)
        lin(f"{fld}.rgb_decoder.fc_c.0", rgb_in, hidden)
        lin(f"{fld}.rgb_decoder.lin0", hidden, 3)
        sem_in = 3 + feat_half + geo
        lin(f"{fld}.semantic_decoder.fc_p", 3, hidden)
        lin(f"{fld}.semantic_decoder.fc_c.0", sem_in, hidden)
        lin(f"{fld}.semantic_decoder.lin0", hidden, sem_dim)
        state[f"{fld}.deviation_network.variance"] = np.float32(0.3)
        state[f"{fld}.laplace_density.beta"] = np.float32(0.1)
        lin("proj_head", base, 512)
        state["logit_scale"] = np.float32(np.log(1 / 0.07))
        emb = rng.randn(8, 512).astype(np.float32)
        state["class_embedding"] = emb / np.linalg.norm(emb, 1, keepdims=True)

        params, stats, constants = convert_ponder_indoor(
            state, channels, layers, num_levels=levels
        )

        model = build_model(dict(
            type="PonderIndoor-v2",
            backbone=dict(type="SpUNet-v1m1", in_channels=in_ch,
                          num_classes=0, base_channels=base,
                          channels=channels, layers=layers),
            projection=dict(type="UNet3D-v1m2", in_channels=base,
                            out_channels=proj_out, f_maps=f_maps,
                            num_levels=levels),
            renderer=dict(
                type="NeuSModel",
                field=dict(hidden_dim=hidden, num_layers=2, geo_feat_dim=geo,
                           semantic_dim=sem_dim, share_volume=False),
                collider=dict(type="AABBBoxCollider", near_plane=0.01),
                sampler=dict(type="NeuSSampler", num_samples=8,
                             num_samples_importance=4, num_upsample_steps=1),
                loss=dict(sensor_depth_truncation=0.05,
                          weights=dict(rgb=10.0, depth=1.0, semantic=0.1,
                                       eikonal=0.01, free_space=1.0,
                                       sdf=10.0)),
            ),
            grid_shape=(16, 16, 8),
            grid_size=0.05,
            ray_nsample=8,
            conditions=("Synthetic",),
            class_name=tuple(f"c{i}" for i in range(8)),
            valid_index=(tuple(range(8)),),
            ppt_loss_weight=0.1,
        ))
        ds = build_dataset(dict(
            type="SyntheticRGBDDataset", num_scenes=1, points_per_scene=600,
            num_classes=8, num_cameras=2, image_size=24, seed=0,
            transform=[
                dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
                dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                     mode="train", return_grid_coord=True),
                dict(type="NormalizeColor"),
                dict(type="Collect",
                     keys=("coord", "grid_coord", "segment", "rgb", "depth",
                           "semantic2d", "intrinsic", "extrinsic"),
                     feat_keys=("color", "normal")),
            ]))
        batch = collate_fn([ds[0]], point_budget=1024, scene_budget=1)
        arrays, _ = split_batch(batch)
        input_dict = {
            **{k: jnp.asarray(v) for k, v in arrays.items()},
            "spatial_shape": (64, 64, 32), "batch_size": 1,
        }
        variables = model.init(jax.random.PRNGKey(0), input_dict, train=False)
        target = jax.device_get(variables)
        restored = graft_variables(
            target,
            {"params": params, "batch_stats": stats, "constants": constants},
        )
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(target["params"])[0],
            jax.tree_util.tree_flatten_with_path(restored["params"])[0],
        ):
            assert str(p1) == str(p2)
            assert a.shape == np.asarray(b).shape, (str(p1), a.shape,
                                                    np.asarray(b).shape)
        out = model.apply(restored, input_dict, train=False)
        assert np.isfinite(float(out["loss"]))
