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
        st[f"{name}.weight"] = rng.randn(k, k, k, cin, cout).astype(np.float32)

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
                st[f"dec.{s}.block{b}.proj.0.weight"] = rng.randn(
                    1, 1, 1, cin, dec_c
                ).astype(np.float32)
                bn(f"dec.{s}.block{b}.proj.1", dec_c)
        dec_prev = dec_c
    st["final.weight"] = rng.randn(channels[-1], num_classes).astype(np.float32).T
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
