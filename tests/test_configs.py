"""Every shipped config must parse, build its model, and trace a forward pass.

Mirrors the reference config matrix (reference configs/*): for each config we
run the config parser, build the model from cfg.model, and abstractly evaluate
``model.init`` on a synthetic batch of the config's modality via
``jax.eval_shape`` — catching registry/key/shape mismatches without paying an
XLA compile per config.
"""

import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ponderv2_tpu.datasets import build_dataset
from ponderv2_tpu.datasets.utils import collate_fn
from ponderv2_tpu.engines.common import split_batch
from ponderv2_tpu.models import build_model
from ponderv2_tpu.utils.config import Config

CONFIGS = sorted(
    f for f in glob.glob("configs/*/*.py") if "/_base_/" not in f
)

# abstractly tracing a full-size model takes ~1 min of pure-python rulebook
# tracing per config; do it for one representative per model family and
# build-only for the rest
TRACE_CONFIGS = {
    "configs/scannet/pretrain-ponder-spunet-v1m1-0-base.py",   # PonderIndoor
    "configs/scannet/semseg-spunet-v1m1-0-base.py",            # SpUNet
    "configs/scannet/semseg-ppt-v1m1-0-sc-s3-st-spunet-lovasz-ft.py",  # PPT
    "configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py",  # PG+PPT
    "configs/scannet200/semseg-ppt-v1m1-0-spunet-lovasz-ft.py",  # PPT bb-mode
}

_SEMSEG_TRANSFORM = [
    dict(type="CenterShift", apply_z=True),
    dict(type="PositiveShift"),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="NormalizeColor"),
]

SPATIAL = (160, 160, 64)


def _synthetic_batch(cfg):
    """Build a tiny synthetic batch matching the config's input modality."""
    model_type = cfg.model.get("type")
    train_type = (cfg.data.train.get("type", "") if "data" in cfg
                  and "train" in cfg.data else "")
    feat_keys = ("color", "normal")
    in_ch = cfg.model.get("backbone", {}).get("in_channels", 6)
    if in_ch == 9:
        feat_keys = ("color", "normal", "coord")

    if model_type == "PonderIndoor-v2":
        keys = ("coord", "grid_coord", "segment", "rgb", "depth",
                "semantic2d", "intrinsic", "extrinsic")
        ds = build_dataset(dict(
            type="SyntheticRGBDDataset", num_scenes=2, points_per_scene=600,
            num_classes=max(2, int(cfg.get("num_classes", 8))), num_cameras=2,
            image_size=24,
            transform=_SEMSEG_TRANSFORM + [
                dict(type="Collect", keys=keys, feat_keys=feat_keys)],
        ))
    elif model_type == "PonderOutdoor-v2":
        ds = build_dataset(dict(
            type="SyntheticOutdoorDataset", num_scenes=2,
            points_per_scene=600,
            transform=[],
        ))
        # outdoor synthetic datasets come pre-collected (rays precomputed)
    else:
        extra = []
        keys = ["coord", "grid_coord", "segment"]
        if "insseg" in str(model_type) or model_type == "PG-v1m1":
            extra = [dict(type="InstanceParser",
                          segment_ignore_index=(-1, 0, 1),
                          instance_ignore_index=-1)]
            keys += ["instance", "instance_centroid"]
        if "condition" in str(cfg):
            extra = extra + [dict(type="Add",
                                  keys_dict={"condition": "ScanNet"})]
            keys += ["condition"]
        ds = build_dataset(dict(
            type="SyntheticDataset", num_scenes=2, points_per_scene=600,
            num_classes=max(2, int(cfg.get("num_classes", 8))),
            transform=_SEMSEG_TRANSFORM + extra + [
                dict(type="Collect", keys=tuple(keys), feat_keys=feat_keys)],
        ))
    scenes = [ds[i] for i in range(2)]
    batch = collate_fn(scenes, point_budget=2048, scene_budget=2)
    arrays, static = split_batch(batch)
    arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    ctx = dict(spatial_shape=SPATIAL, batch_size=2)
    if "condition" in static:
        cond = static["condition"]
        ctx["condition"] = cond[0] if isinstance(cond, list) else cond
    return arrays, ctx


# smoke tier traces only the cheapest representative; the other families'
# traces cost 10-36 s of pure-python rulebook tracing each -> slow tier
LIGHT_TRACE = {"configs/scannet/semseg-spunet-v1m1-0-base.py"}


def _abstract_trace(path):
    cfg = Config.fromfile(path)
    model = build_model(dict(cfg.model))
    arrays, ctx = _synthetic_batch(cfg)
    rng = jax.random.PRNGKey(0)
    # abstract trace: no compile, catches shape/key errors through the full fwd
    jax.eval_shape(
        lambda r, a: model.init(r, {**a, **ctx, "rng": r}, train=False),
        rng, arrays,
    )


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.split("configs/")[-1])
def test_config_parses_and_model_traces(path):
    cfg = Config.fromfile(path)
    assert "model" in cfg and "type" in cfg.model
    build_model(dict(cfg.model))
    if path in (TRACE_CONFIGS & LIGHT_TRACE):
        _abstract_trace(path)


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", sorted(TRACE_CONFIGS - LIGHT_TRACE),
    ids=lambda p: p.split("configs/")[-1],
)
def test_config_traces_heavy(path):
    _abstract_trace(path)
