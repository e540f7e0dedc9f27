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

# Collections sown per-forward (kernel-contract flags etc.) — never part of
# the checkpoint contract. The reference checkpoint carries only learnable
# state + running stats (ponder/engines/hooks/misc.py:208-253); our analog is
# params / batch_stats / constants.
TRANSIENT_COLLECTIONS = ("diagnostics", "intermediates")


def graft_variables(variables, converted):
    """Graft converted persistent collections onto a ``model.init`` tree.

    ``variables`` is the full tree from ``model.init`` (which may include
    transient collections like ``diagnostics``); ``converted`` maps
    collection name -> state dict for the persistent collections present in
    the checkpoint. Each named collection is restored structurally; every
    other collection (including transients) is carried over untouched.
    """
    import flax.serialization

    restored = dict(variables)
    for name, state in converted.items():
        restored[name] = flax.serialization.from_state_dict(
            variables[name], state)
    return restored


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
        # the reference BUILDS up/dec in module-index order but EXECUTES them
        # reversed (spconv_unet_v1m1_base.py:267 `for s in reversed(...)`), so
        # our execution-order up{st_i}/dec{st_i} reads reference module
        # index num_stages - 1 - st_i
        ref = num_stages - 1 - st_i
        p, s = bn_params(state, f"up.{ref}.1")
        params[f"up{st_i}"] = dict(
            conv=dict(kernel=conv_weight(state[f"up.{ref}.0.weight"])), bn=p
        )
        stats[f"up{st_i}"] = dict(bn=s)
        n_blocks = layers[num_stages + st_i]
        names = [f"dec.{ref}.block{b}" for b in range(n_blocks)]
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


def pdnorm_params(state, name, conditions, adaptive):
    """Reference PDBatchNorm (spconv_unet_v1m3_pdnorm.py:23-72) -> our
    models.norm.PDBatchNorm: per-condition ``bns.{i}.*`` -> ``bn_{cond}``
    submodules; ``modulation.1`` (SiLU, Linear) -> ``modulation`` Dense."""
    p, s = {}, {}
    if f"{name}.bns.0.weight" in state:
        for i, c in enumerate(conditions):
            pi, si = bn_params(state, f"{name}.bns.{i}")
            p[f"bn_{c}"], s[f"bn_{c}"] = pi, si
    else:  # decouple=False
        pi, si = bn_params(state, f"{name}.bn")
        p["bn"], s["bn"] = pi, si
    if adaptive and f"{name}.modulation.1.weight" in state:
        p["modulation"] = dict(
            kernel=state[f"{name}.modulation.1.weight"].T,
            bias=state[f"{name}.modulation.1.bias"],
        )
    return p, s


def convert_spunet_v1m3(state: Dict[str, np.ndarray], channels, layers,
                        conditions=("Structured3D", "ScanNet", "S3DIS"),
                        adaptive: bool = True, scan_blocks: bool = True):
    """Reference SpUNet-v1m3 / PDNorm (spconv_unet_v1m3_pdnorm.py:232+) ->
    our SpUNetPDNorm tree. Module naming differs from v1m1: the stem is
    ``conv_input.conv/.bn``, down/up are SPConvDown/Up with ``.conv/.bn``,
    block shortcuts are ``proj_conv``/``proj_norm``, and every norm is a
    PDBatchNorm. Decoder indices are reversed at execution like v1m1."""
    params: Dict = {}
    stats: Dict = {}
    num_stages = len(layers) // 2

    def pdn(name):
        return pdnorm_params(state, name, conditions, adaptive)

    p, s = pdn("conv_input.bn")
    # v1m3 modules are flat convs + separate PDNorms (SubMConv/StridedConv
    # param "kernel" directly), unlike v1m1's ConvBNRelu units
    params["stem_conv"] = dict(kernel=conv_weight(state["conv_input.conv.weight"]))
    params["stem_bn"], stats["stem_bn"] = p, s

    def block(src):
        bp, bs = {}, {}
        bp["conv1"] = dict(kernel=conv_weight(state[f"{src}.conv1.weight"]))
        bp["bn1"], bs["bn1"] = pdn(f"{src}.bn1")
        bp["conv2"] = dict(kernel=conv_weight(state[f"{src}.conv2.weight"]))
        bp["bn2"], bs["bn2"] = pdn(f"{src}.bn2")
        if f"{src}.proj_conv.weight" in state:
            w = state[f"{src}.proj_conv.weight"]
            if w.ndim == 5:  # 1x1x1 subm conv
                w = w.reshape(w.shape[-2], w.shape[-1])
            bp["proj"] = dict(kernel=w)
            bp["proj_bn"], bs["proj_bn"] = pdn(f"{src}.proj_norm")
        return bp, bs

    def stack_blocks(names):
        bps, bss = zip(*(block(n) for n in names))
        if not scan_blocks:
            return list(bps), list(bss)
        import jax

        stacked_p = jax.tree.map(lambda *xs: np.stack(xs), *bps)
        stacked_s = jax.tree.map(lambda *xs: np.stack(xs), *bss)
        return {"blocks": stacked_p}, {"blocks": stacked_s}

    for st_i in range(num_stages):
        params[f"down{st_i}"] = dict(
            kernel=conv_weight(state[f"down.{st_i}.conv.weight"])
        )
        p, s = pdn(f"down.{st_i}.bn")
        params[f"down{st_i}_bn"], stats[f"down{st_i}_bn"] = p, s
        names = [f"enc.{st_i}.block{b}" for b in range(layers[st_i])]
        bp, bs = stack_blocks(names)
        params[f"enc{st_i}_blocks"], stats[f"enc{st_i}_blocks"] = bp, bs

    for st_i in range(num_stages):
        ref = num_stages - 1 - st_i  # reversed execution (see v1m1)
        params[f"up{st_i}"] = dict(
            kernel=conv_weight(state[f"up.{ref}.conv.weight"])
        )
        p, s = pdn(f"up.{ref}.bn")
        params[f"up{st_i}_bn"], stats[f"up{st_i}_bn"] = p, s
        n_blocks = layers[num_stages + st_i]
        names = [f"dec.{ref}.block{b}" for b in range(n_blocks)]
        bp0, bs0 = block(names[0])
        params[f"dec{st_i}_block0"], stats[f"dec{st_i}_block0"] = bp0, bs0
        if n_blocks > 1:
            bp, bs = stack_blocks(names[1:])
            params[f"dec{st_i}_blocks"], stats[f"dec{st_i}_blocks"] = bp, bs

    if "final.weight" in state:
        w = state["final.weight"]
        if w.ndim == 5:
            w = w.reshape(-1, w.shape[-2], w.shape[-1]).sum(0)
        else:
            w = w.T
        params["final"] = dict(kernel=w, bias=state["final.bias"])
    return params, stats


def convert_ppt_v1m1(state: Dict[str, np.ndarray], channels, layers,
                     conditions=("Structured3D", "ScanNet", "S3DIS"),
                     adaptive: bool = True, scan_blocks: bool = True):
    """Reference PPT-v1m1 (point_prompt_training_v1m1_language_guided.py:19-186)
    -> our PointPromptTraining tree: ``embedding_table`` -> ``context`` Embed,
    SpUNet-v1m3 backbone -> ``backbone_net``, ``proj_head`` Linear ->
    Dense (transposed), scalar ``logit_scale``, and the frozen
    ``class_embedding`` buffer -> the ``constants`` collection.

    Returns (params, batch_stats, constants)."""
    bb = {k[len("backbone."):]: v for k, v in state.items()
          if k.startswith("backbone.")}
    bp, bs = convert_spunet_v1m3(bb, channels, layers, conditions, adaptive,
                                 scan_blocks)
    params: Dict = {"backbone_net": bp}
    stats: Dict = {"backbone_net": bs}
    constants: Dict = {}
    params["context"] = dict(embedding=state["embedding_table.weight"])
    if "proj_head.weight" in state:
        params["proj_head"] = dict(
            kernel=state["proj_head.weight"].T,
            bias=state["proj_head.bias"],
        )
        params["logit_scale"] = np.asarray(state["logit_scale"], np.float32)
        constants["class_embedding"] = state["class_embedding"]
    return params, stats, constants


def conv3d_weight(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (out, in, kx, ky, kz) -> flax (kx, ky, kz, in, out)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def convt3d_weight(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (in, out, kx, ky, kz) -> flax ConvTranspose with
    transpose_kernel=True: (kx, ky, kz, out, in)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _bn3d(state, name):
    return (
        dict(scale=state[f"{name}.weight"], bias=state[f"{name}.bias"]),
        dict(mean=state[f"{name}.running_mean"],
             var=state[f"{name}.running_var"]),
    )


def convert_unet3d_v1m2(state: Dict[str, np.ndarray], num_levels: int = 4):
    """Reference UNet3D-v1m2 (unet3d.py:710-743; SingleConv 'bcr' encoders,
    ConvTranspose3d+sum decoders, final 1x1 conv) -> our UNet3Dv1m2 tree.
    ``state`` keys are relative to the projector (encoders./decoders./
    final_conv.)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(num_levels):
        base = f"encoders.{i}.basic_module"
        p, s = _bn3d(state, f"{base}.batchnorm")
        params[f"enc{i}"] = dict(
            batchnorm=p,
            conv=dict(kernel=conv3d_weight(state[f"{base}.conv.weight"])),
        )
        stats[f"enc{i}"] = dict(batchnorm=s)
    for i in range(num_levels - 1):
        up = f"decoders.{i}.upsampling.upsample"
        params[f"dec{i}_up"] = dict(
            kernel=convt3d_weight(state[f"{up}.weight"]),
            bias=state[f"{up}.bias"],
        )
        base = f"decoders.{i}.basic_module"
        p, s = _bn3d(state, f"{base}.batchnorm")
        params[f"dec{i}"] = dict(
            batchnorm=p,
            conv=dict(kernel=conv3d_weight(state[f"{base}.conv.weight"])),
        )
        stats[f"dec{i}"] = dict(batchnorm=s)
    fw = state["final_conv.weight"]  # (out, in, 1, 1, 1)
    params["final"] = dict(
        kernel=conv3d_weight(fw), bias=state["final_conv.bias"]
    )
    return params, stats


def convert_residual_decoder(state: Dict[str, np.ndarray], prefix: str):
    """Reference SDF/RGB/Semantic decoder (decoders.py:6-109: fc_p, fc_c.{l},
    lin{l}) -> our ResidualDecoder tree."""
    p = {
        "fc_p": dict(kernel=state[f"{prefix}.fc_p.weight"].T,
                     bias=state[f"{prefix}.fc_p.bias"]),
    }
    l = 0
    while f"{prefix}.lin{l}.weight" in state:
        p[f"lin{l}"] = dict(kernel=state[f"{prefix}.lin{l}.weight"].T,
                            bias=state[f"{prefix}.lin{l}.bias"])
        p[f"fc_c{l}"] = dict(kernel=state[f"{prefix}.fc_c.{l}.weight"].T,
                             bias=state[f"{prefix}.fc_c.{l}.bias"])
        l += 1
    return p


def convert_ponder_indoor(state: Dict[str, np.ndarray], channels, layers,
                          num_levels: int = 4, scan_blocks: bool = True):
    """Reference PonderIndoor-v2 pretrain checkpoint -> our tree:
    ``backbone`` (SpUNet-v1m1, no head), ``proj_net`` (UNet3D-v1m2),
    ``renderer.field`` (SDF/RGB/semantic decoders + deviation network +
    Laplace beta), ``embedding_table``/``proj_head``/``logit_scale`` when
    the PPT-alignment loss was trained
    (ponder_indoor_base.py:45-118). Returns (params, batch_stats, constants).
    """
    bb = {k[len("backbone."):]: v for k, v in state.items()
          if k.startswith("backbone.")}
    bp, bs = convert_spunet_v1m1(bb, channels, layers, scan_blocks)
    proj = {k[len("proj_net."):]: v for k, v in state.items()
            if k.startswith("proj_net.")}
    pp, ps = convert_unet3d_v1m2(proj, num_levels)
    params: Dict = {"backbone_net": bp, "proj_net": pp}
    stats: Dict = {"backbone_net": bs, "proj_net": ps}
    constants: Dict = {}

    field = "renderer.field"
    fp: Dict = {
        "sdf_decoder": convert_residual_decoder(state, f"{field}.sdf_decoder"),
        "deviation_network": dict(
            variance=np.asarray(
                state[f"{field}.deviation_network.variance"], np.float32
            ).reshape(()),
        ),
    }
    if f"{field}.rgb_decoder.fc_p.weight" in state:
        fp["rgb_decoder"] = convert_residual_decoder(
            state, f"{field}.rgb_decoder")
    if f"{field}.semantic_decoder.fc_p.weight" in state:
        fp["semantic_decoder"] = convert_residual_decoder(
            state, f"{field}.semantic_decoder")
    params["render_model"] = {"field": fp}
    if f"{field}.laplace_density.beta" in state:
        params["render_model"]["laplace_density"] = dict(
            beta=np.asarray(state[f"{field}.laplace_density.beta"],
                            np.float32).reshape(()),
        )

    # (the reference's per-condition embedding_table has no counterpart in
    # our PonderIndoor — single-condition pretrain ignores it)
    if "proj_head.weight" in state:
        params["proj_head"] = dict(kernel=state["proj_head.weight"].T,
                                   bias=state["proj_head.bias"])
        params["logit_scale"] = np.asarray(state["logit_scale"], np.float32)
        if "class_embedding" in state:
            constants["class_embedding"] = state["class_embedding"]
    if "mask_token" in state:
        params["mask_token"] = state["mask_token"]
    return params, stats, constants


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prefix", default="module.")
    ap.add_argument("--backbone_prefix", default="backbone.")
    ap.add_argument("--channels", default="32,64,128,256,256,128,96,96")
    ap.add_argument("--layers", default="2,3,4,6,2,2,2,2")
    ap.add_argument("--family", default="spunet-v1m1",
                    choices=("spunet-v1m1", "spunet-v1m3", "ppt-v1m1"))
    ap.add_argument("--conditions", default="Structured3D,ScanNet,S3DIS")
    ap.add_argument("--no_adaptive", action="store_true")
    ap.add_argument("--no_scan_blocks", action="store_true")
    args = ap.parse_args()

    state = load_torch_state(args.torch_ckpt, args.prefix)
    channels = tuple(int(c) for c in args.channels.split(","))
    layers = tuple(int(c) for c in args.layers.split(","))
    conditions = tuple(args.conditions.split(","))
    scan = not args.no_scan_blocks
    if args.family == "ppt-v1m1":
        params, stats, constants = convert_ppt_v1m1(
            state, channels, layers, conditions,
            adaptive=not args.no_adaptive, scan_blocks=scan,
        )
        tree = {"params": params, "batch_stats": stats}
        if constants:
            tree["constants"] = constants
    else:
        bb = {
            k[len(args.backbone_prefix):]: v
            for k, v in state.items() if k.startswith(args.backbone_prefix)
        } or state
        if args.family == "spunet-v1m3":
            params, stats = convert_spunet_v1m3(
                bb, channels, layers, conditions,
                adaptive=not args.no_adaptive, scan_blocks=scan,
            )
        else:
            params, stats = convert_spunet_v1m1(
                bb, channels, layers, scan_blocks=scan
            )
        tree = {
            "params": {"backbone_net": params},
            "batch_stats": {"backbone_net": stats},
        }
    payload = {
        "state": tree,
        "extra": {"converted_from": args.torch_ckpt, "family": args.family},
    }
    with open(args.out, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    n = sum(np.asarray(v).size for v in _leaves(tree["params"]))
    print(f"converted {n} params ({args.family}) -> {args.out}")


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
