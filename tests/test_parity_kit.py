"""Parity kit: released-format torch checkpoint -> converter -> forward ->
SemSegTester mIoU, end to end (round-3 verdict next-round item #8).

The environment has no network access to the real model zoo
(/root/reference/docs/model_zoo.md:16-24), so this stands in for the real
accuracy-parity run: a synthetic checkpoint in the EXACT released format
(torch.save of {"state_dict": {"module....": tensors}}) goes through the
actual converter CLI (tools/convert_torch_checkpoint.py main()), is loaded
by the actual TesterBase checkpoint path, and is scored by the actual
fragment-vote protocol — asserting the resulting mIoU equals the mIoU of a
direct forward with the converted weights."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ponderv2_tpu.engines.test import SemSegTester
from ponderv2_tpu.models import build_model
from ponderv2_tpu.utils.config import Config
from ponderv2_tpu.utils.misc import intersection_and_union

CONDITIONS = ("Synthetic",)
CHANNELS = (8, 16, 16, 16, 16, 16, 8, 8)
LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)
NUM_CLASSES = 9


def _released_ckpt(path, rng):
    """A synthetic checkpoint in the released PPT format: DDP 'module.'
    prefixes under 'state_dict', backbone + proj head + class embedding."""
    import torch

    from test_convert import fake_v1m3_state

    state = {
        f"backbone.{k}": v
        for k, v in fake_v1m3_state(CHANNELS, LAYERS, CONDITIONS).items()
    }
    state["embedding_table.weight"] = rng.randn(
        len(CONDITIONS), 16).astype(np.float32)
    state["proj_head.weight"] = rng.randn(512, 8).astype(np.float32) * 0.05
    state["proj_head.bias"] = np.zeros(512, np.float32)
    state["logit_scale"] = np.float32(np.log(1 / 0.07))
    emb = rng.randn(NUM_CLASSES, 512).astype(np.float32)
    state["class_embedding"] = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    torch.save(
        {
            "state_dict": {
                f"module.{k}": torch.from_numpy(np.asarray(v))
                for k, v in state.items()
            },
            "epoch": 100,
        },
        path,
    )


def _model_cfg():
    return dict(
        type="PPT-v1m1",
        backbone=dict(
            type="SpUNet-v1m3", in_channels=6, num_classes=0,
            base_channels=8, channels=CHANNELS, layers=LAYERS,
            conditions=CONDITIONS, context_channels=16, norm_adaptive=True,
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        backbone_out_channels=8,
        context_channels=16,
        conditions=CONDITIONS,
        class_name=tuple(f"c{i}" for i in range(NUM_CLASSES)),
        valid_index=(tuple(range(NUM_CLASSES)),),
    )


def _make_scene(rng, name, n_points, n_frag):
    """Overlapping fragments covering every point, test-protocol style."""
    segment = rng.randint(0, NUM_CLASSES, n_points).astype(np.int64)
    coord = rng.rand(n_points, 3).astype(np.float32)
    grid = rng.randint(0, 16, (n_points, 3)).astype(np.int32)
    feat = rng.randn(n_points, 6).astype(np.float32)
    fragments = []
    for f in range(n_frag):
        idx = np.arange(f, n_points, n_frag)
        idx = np.concatenate([idx, rng.randint(0, n_points, 4)])
        fragments.append(dict(
            index=idx, coord=coord[idx], grid_coord=grid[idx],
            feat=feat[idx], condition=CONDITIONS[0],
        ))
    return dict(name=name, segment=segment, fragment_list=fragments)


class _Scenes:
    def __init__(self, scenes):
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i):
        return self.scenes[i]


@pytest.mark.slow
def test_released_checkpoint_to_miou(tmp_path):
    rng = np.random.RandomState(11)
    pth = str(tmp_path / "released_ppt.pth")
    _released_ckpt(pth, rng)

    # the actual converter CLI entry point
    import convert_torch_checkpoint as cvt

    out_ckpt = str(tmp_path / "converted.ckpt")
    old_argv = sys.argv
    sys.argv = [
        "convert_torch_checkpoint.py", "--torch_ckpt", pth, "--out", out_ckpt,
        "--family", "ppt-v1m1",
        "--channels", ",".join(map(str, CHANNELS)),
        "--layers", ",".join(map(str, LAYERS)),
        "--conditions", ",".join(CONDITIONS),
    ]
    try:
        cvt.main()
    finally:
        sys.argv = old_argv
    assert os.path.isfile(out_ckpt)

    scenes = [_make_scene(rng, f"scene{i}", 140, 2) for i in range(2)]
    cfg = Config(dict(
        model=_model_cfg(),
        data=dict(num_classes=NUM_CLASSES, ignore_index=-1,
                  test=dict(type="synthetic")),
        weight=out_ckpt,
        save_path=str(tmp_path / "exp"),
        sparse_shape=(16, 16, 16),
        point_budget=256,
    ))
    tester = SemSegTester(cfg, test_loader=_Scenes(scenes))
    metrics = tester.test()
    assert metrics is not None and np.isfinite(metrics["m_iou"])

    # oracle: direct forward with the tester's own loaded state must give the
    # same per-point argmax -> same mIoU (vote scatter + softmax are exact for
    # covering fragments; overlaps add probabilities, matching the protocol)
    model = build_model(_model_cfg())
    inter_s = np.zeros(NUM_CLASSES)
    union_s = np.zeros(NUM_CLASSES)
    variables = {"params": tester.state.params,
                 "batch_stats": tester.state.batch_stats}
    if tester.state.constants:
        variables["constants"] = tester.state.constants
    for scene in scenes:
        pred = np.zeros((len(scene["segment"]), NUM_CLASSES), np.float32)
        for frag in scene["fragment_list"]:
            from ponderv2_tpu.datasets.utils import collate_fn
            from ponderv2_tpu.engines.common import split_batch

            batch = collate_fn([dict(frag)], point_budget=256, scene_budget=1)
            arrays, _ = split_batch(batch)
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = model.apply(
                variables,
                {**arrays, "spatial_shape": (16, 16, 16), "batch_size": 1},
                train=False,
            )
            valid = np.asarray(batch["batch"]) >= 0
            index = np.asarray(batch["index"])[valid]
            logits = np.asarray(out["seg_logits"])[valid]
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            pred[index] += probs
        inter, union, _ = intersection_and_union(
            pred.argmax(-1), scene["segment"], NUM_CLASSES, -1
        )
        inter_s += inter
        union_s += union
    want_miou = float(np.mean(inter_s / (union_s + 1e-10)))
    assert abs(metrics["m_iou"] - want_miou) < 1e-6, (
        metrics["m_iou"], want_miou,
    )
