"""Torch-checkpoint converter: structural round-trip against our SpUNet tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
        dec_c = channels[num_stages + s]
        skip_c = ([base] + list(channels[:num_stages]))[num_stages - 1 - s]
        conv(f"up.{s}.0", 2, dec_prev, dec_c)
        bn(f"up.{s}.1", dec_c)
        for b in range(layers[num_stages + s]):
            cin = dec_c + skip_c if b == 0 else dec_c
            conv(f"dec.{s}.block{b}.conv1", 3, cin, dec_c)
            bn(f"dec.{s}.block{b}.bn1", dec_c)
            conv(f"dec.{s}.block{b}.conv2", 3, dec_c, dec_c)
            bn(f"dec.{s}.block{b}.bn2", dec_c)
            if b == 0 and cin != dec_c:
                st[f"dec.{s}.block{b}.proj.0.weight"] = (
                    rng.randn(1, 1, 1, cin, dec_c) / np.sqrt(cin)
                ).astype(np.float32)
                bn(f"dec.{s}.block{b}.proj.1", dec_c)
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
        import flax.serialization

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
        restored = flax.serialization.from_state_dict(
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
        act_fine = acts[num_stages - 1 - s]
        wt = torch.from_numpy(
            state[f"up.{s}.0.weight"]).permute(3, 4, 0, 1, 2)  # (Cin,Cout,k..)
        x = F.conv_transpose3d(x, wt, stride=2)
        x = x[..., :act_fine.shape[2], :act_fine.shape[3], :act_fine.shape[4]]
        x = x * act_fine
        x = torch.relu(bn(x, f"up.{s}.1", act_fine))
        x = torch.cat([x, skips.pop(-1)], dim=1)
        for b in range(layers[num_stages + s]):
            x = block(x, f"dec.{s}.block{b}", act_fine)
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
        import flax.serialization

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
        restored = flax.serialization.from_state_dict(
            jax.device_get(variables),
            {"params": params, "batch_stats": stats},
        )
        out = np.asarray(
            model.apply(restored, st_sorted, train=False)
        )[np.asarray(inverse)][:M]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
