"""Export CLIP text embeddings for every class vocabulary to assets/clip_text/.

The reference encodes class-name prompts with a frozen CLIP ViT-B/16 at model
construction (/root/reference/ponder/models/ponder/ponder_indoor_base.py:85-118,
point_prompt_training_v1m1_language_guided.py:120-151). This repo loads them
from committed ``.npy`` files instead (``embedding_path``) so training jobs
never need torch/CLIP/network.

Three sources, in priority order:

1. ``--checkpoint path.pth key`` — extract the frozen embeddings a released
   torch checkpoint already carries (PPT stores ``class_embedding`` as a
   buffer; PonderIndoor configs bake the render-semantic targets) — exact.
2. HuggingFace ``transformers`` CLIPTextModelWithProjection, when its weights
   are available locally or downloadable — exact.
3. ``--allow-stub``: the deterministic unit-norm fallback from
   ``utils.clip_text`` — NOT real CLIP; keeps asset-free environments running
   end-to-end. Stub files embed a marker in their companion ``.meta`` so
   downstream can tell them apart.

Usage:
    python tools/export_clip_embeddings.py [--allow-stub] [--out assets/clip_text]
    python tools/export_clip_embeddings.py --checkpoint ppt.pth class_embedding --vocab ppt36
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEMPLATE = "a photo of a {} in a scene"

SCANNET20 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)
NUSCENES16 = (
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
)


def vocabularies():
    from ponderv2_tpu.datasets.ppt_vocab import PPT_CLASS_NAMES
    from ponderv2_tpu.datasets.preprocessing.scannet200_constants import (
        CLASS_LABELS_200,
    )

    return {
        "scannet20": SCANNET20,
        "scannet200": tuple(CLASS_LABELS_200),
        "nuscenes16": NUSCENES16,
        "ppt36": tuple(PPT_CLASS_NAMES),
        # the driver multichip dryrun's synthetic vocabulary
        # (__graft_entry__._MODEL_CFG); a committed stub keeps the dryrun
        # from logging the CLIP-fallback warning
        "synthetic8": tuple(f"class_{i}" for i in range(8)),
    }


def encode_with_clip(names, model_name="openai/clip-vit-base-patch16",
                     local_only=False):
    import torch
    from transformers import CLIPTextModelWithProjection, CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(model_name, local_files_only=local_only)
    model = CLIPTextModelWithProjection.from_pretrained(
        model_name, local_files_only=local_only
    )
    model.eval()
    prompts = [TEMPLATE.format(n) for n in names]
    with torch.no_grad():
        tokens = tok(prompts, padding=True, return_tensors="pt")
        emb = model(**tokens).text_embeds.numpy().astype(np.float32)
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "clip_text"))
    ap.add_argument("--allow-stub", action="store_true",
                    help="write deterministic stand-ins when CLIP is absent")
    ap.add_argument("--checkpoint", nargs=2, metavar=("PTH", "KEY"),
                    help="extract embeddings from a torch checkpoint buffer")
    ap.add_argument("--vocab", default=None,
                    help="restrict to one vocabulary name")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    vocabs = vocabularies()
    if args.vocab:
        vocabs = {args.vocab: vocabs[args.vocab]}

    if args.checkpoint:
        import torch

        assert args.vocab, "--checkpoint requires --vocab"
        pth, key = args.checkpoint
        sd = torch.load(pth, map_location="cpu")
        sd = sd.get("state_dict", sd)
        cand = [k for k in sd if k.endswith(key)]
        assert cand, f"{key} not found in {pth}"
        emb = sd[cand[0]].float().numpy()
        names = vocabs[args.vocab]
        assert emb.shape[0] == len(names), (emb.shape, len(names))
        _write(args.out, args.vocab, emb, names, source=f"checkpoint:{pth}")
        return

    for name, names in vocabs.items():
        try:
            emb = encode_with_clip(names)
            source = "clip-vit-base-patch16"
        except Exception as e:
            if not args.allow_stub:
                raise SystemExit(
                    f"CLIP unavailable ({type(e).__name__}: {e}); rerun with "
                    "--allow-stub to write deterministic stand-ins"
                )
            from ponderv2_tpu.utils.clip_text import _fallback_embeddings

            emb = _fallback_embeddings(names, 512)
            source = "deterministic-stub (NOT real CLIP)"
        _write(args.out, name, emb, names, source)


def _write(out_dir, name, emb, names, source):
    path = os.path.join(out_dir, f"{name}.npy")
    np.save(path, emb.astype(np.float32))
    meta = dict(vocab=name, classes=list(names), template=TEMPLATE,
                dim=int(emb.shape[1]), source=source)
    with open(os.path.join(out_dir, f"{name}.meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {path} {emb.shape} source={source}")


if __name__ == "__main__":
    main()
