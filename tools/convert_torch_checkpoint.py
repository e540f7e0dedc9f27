"""Convert a reference (PyTorch/spconv) PonderV2 checkpoint into this framework's
parameter tree.

Maps the reference SpUNet-v1m1 state_dict (spconv_unet_v1m1_base.py module
names) onto our flax param structure. Weight layout conversion:

- spconv conv weights are (kx, ky, kz, Cin, Cout) (spconv ≥2.2 native layout;
  older (Cout, kx, ky, kz, Cin) is auto-detected by shape) -> our (K^3, Cin,
  Cout) with tap order itertools.product(range(kx), ky, kz) — identical memory
  order, so a reshape suffices.
- BatchNorm: weight/bias/running_mean/running_var -> scale/bias + batch_stats
  mean/var (torch tracks unbiased running var; ours matches).
- Linear: weight (out, in) -> kernel (in, out) transpose.

Usage:
  python tools/convert_torch_checkpoint.py \
      --torch_ckpt model_best.pth --out converted.pth \
      [--prefix module.backbone.]   # strip DDP/module prefixes
"""

from __future__ import annotations

import argparse
import pickle
from typing import Dict

import numpy as np


def load_torch_state(path: str, prefix: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in state.items():
        if prefix and k.startswith(prefix):
            k = k[len(prefix):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def conv_weight(w: np.ndarray) -> np.ndarray:
    """spconv kernel -> (K^3, Cin, Cout)."""
    if w.ndim == 5:
        if w.shape[0] == w.shape[1] == w.shape[2]:  # (kx,ky,kz,Cin,Cout)
            k3 = w.shape[0] * w.shape[1] * w.shape[2]
            return w.reshape(k3, w.shape[3], w.shape[4])
        # (Cout, kx, ky, kz, Cin) legacy layout
        cout = w.shape[0]
        k3 = w.shape[1] * w.shape[2] * w.shape[3]
        return np.transpose(w.reshape(cout, k3, w.shape[4]), (1, 2, 0))
    raise ValueError(f"unexpected conv weight shape {w.shape}")


def bn_params(state, name):
    return (
        dict(scale=state[f"{name}.weight"], bias=state[f"{name}.bias"]),
        dict(mean=state[f"{name}.running_mean"], var=state[f"{name}.running_var"]),
    )


def convert_spunet_v1m1(state: Dict[str, np.ndarray], channels, layers,
                        scan_blocks: bool = True):
    """Returns (params, batch_stats) dicts shaped like our SpUNet-v1m1."""
    params: Dict = {}
    stats: Dict = {}
    num_stages = len(layers) // 2

    # stem: reference conv_input = Seq(SubMConv3d, BN, ReLU) -> our ConvBNRelu
    p, s = bn_params(state, "conv_input.1")
    params["stem"] = dict(
        conv=dict(kernel=conv_weight(state["conv_input.0.weight"])), bn=p
    )
    stats["stem"] = dict(bn=s)

    def block(src):
        bp, bs = {}, {}
        bp["conv1"] = dict(kernel=conv_weight(state[f"{src}.conv1.weight"]))
        p1, s1 = bn_params(state, f"{src}.bn1")
        bp["bn1"], bs["bn1"] = p1, s1
        bp["conv2"] = dict(kernel=conv_weight(state[f"{src}.conv2.weight"]))
        p2, s2 = bn_params(state, f"{src}.bn2")
        bp["bn2"], bs["bn2"] = p2, s2
        if f"{src}.proj.0.weight" in state:
            w = state[f"{src}.proj.0.weight"]
            # spconv 1x1 conv (1,1,1,Cin,Cout) or linear
            if w.ndim == 5:
                w = w.reshape(w.shape[-2], w.shape[-1])
            bp["proj"] = dict(kernel=w)
            p3, s3 = bn_params(state, f"{src}.proj.1")
            bp["proj_bn"], bs["proj_bn"] = p3, s3
        return bp, bs

    def stack_blocks(names):
        bps, bss = zip(*(block(n) for n in names))
        if not scan_blocks:
            return list(bps), list(bss)
        import jax

        stacked_p = jax.tree.map(lambda *xs: np.stack(xs), *bps)
        stacked_s = jax.tree.map(lambda *xs: np.stack(xs), *bss)
        return {"blocks": stacked_p}, {"blocks": stacked_s}

    # reference ModuleList naming: down.{s}.0, enc.{s}.block{i}, up.{s}.0,
    # dec.{s}.block{i} (spconv_unet_v1m1_base.py:126-218)
    for st_i in range(num_stages):
        p, s = bn_params(state, f"down.{st_i}.1")
        params[f"down{st_i}"] = dict(
            conv=dict(kernel=conv_weight(state[f"down.{st_i}.0.weight"])), bn=p
        )
        stats[f"down{st_i}"] = dict(bn=s)
        names = [f"enc.{st_i}.block{b}" for b in range(layers[st_i])]
        bp, bs = stack_blocks(names)
        params[f"enc{st_i}_blocks"], stats[f"enc{st_i}_blocks"] = bp, bs

    for st_i in range(num_stages):
        p, s = bn_params(state, f"up.{st_i}.1")
        params[f"up{st_i}"] = dict(
            conv=dict(kernel=conv_weight(state[f"up.{st_i}.0.weight"])), bn=p
        )
        stats[f"up{st_i}"] = dict(bn=s)
        n_blocks = layers[num_stages + st_i]
        names = [f"dec.{st_i}.block{b}" for b in range(n_blocks)]
        # our decoder: block0 standalone (width change), rest scanned
        bp0, bs0 = block(names[0])
        params[f"dec{st_i}_block0"], stats[f"dec{st_i}_block0"] = bp0, bs0
        if n_blocks > 1:
            bp, bs = stack_blocks(names[1:])
            params[f"dec{st_i}_blocks"], stats[f"dec{st_i}_blocks"] = bp, bs

    if "final.weight" in state:
        w = state["final.weight"]
        if w.ndim == 5:  # 1x1x1 spconv kernel (possibly padded k=1 p=1)
            w = w.reshape(-1, w.shape[-2], w.shape[-1]).sum(0)
        else:  # torch Linear (out, in) -> flax (in, out)
            w = w.T
        params["final"] = dict(kernel=w, bias=state["final.bias"])
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prefix", default="module.")
    ap.add_argument("--backbone_prefix", default="backbone.")
    ap.add_argument("--channels", default="32,64,128,256,256,128,96,96")
    ap.add_argument("--layers", default="2,3,4,6,2,2,2,2")
    ap.add_argument("--no_scan_blocks", action="store_true")
    args = ap.parse_args()

    state = load_torch_state(args.torch_ckpt, args.prefix)
    bb = {
        k[len(args.backbone_prefix):]: v
        for k, v in state.items() if k.startswith(args.backbone_prefix)
    } or state
    channels = tuple(int(c) for c in args.channels.split(","))
    layers = tuple(int(c) for c in args.layers.split(","))
    params, stats = convert_spunet_v1m1(
        bb, channels, layers, scan_blocks=not args.no_scan_blocks
    )
    payload = {
        "state": {
            "params": {"backbone_net": params},
            "batch_stats": {"backbone_net": stats},
        },
        "extra": {"converted_from": args.torch_ckpt},
    }
    with open(args.out, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    n = sum(v.size for v in _leaves(params))
    print(f"converted {n} backbone params -> {args.out}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
