"""CLI/default plumbing (reference ponder/engines/defaults.py:22-154)."""

from __future__ import annotations

import argparse
import os
from typing import Optional

from ..utils import comm
from ..utils.config import Config, DictAction
from ..utils.env import set_seed


def default_argument_parser(epilog: Optional[str] = None) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        epilog=epilog or "TPU-native PonderV2 framework", add_help=True
    )
    parser.add_argument(
        "--config-file", default="", metavar="FILE", help="path to config file"
    )
    parser.add_argument(
        "--num-devices", type=int, default=None,
        help="limit visible device count (debug; default: all)",
    )
    parser.add_argument(
        "--options", nargs="+", action=DictAction, help="custom options (k=v, dotted keys)"
    )
    return parser


def default_config_parser(file_path: str, options: Optional[dict]) -> Config:
    if os.path.isfile(file_path):
        cfg = Config.fromfile(file_path)
    else:
        raise FileNotFoundError(f"config not found: {file_path}")
    if options is not None:
        cfg.merge_from_dict(options)

    if cfg.get("seed", None) is None:
        cfg.seed = comm.shared_random_seed()

    # epoch rebasing: run `eval_epoch` outer epochs of `loop`-repeated data
    # (reference defaults.py:125: data.train.loop = epoch // eval_epoch)
    cfg.setdefault("eval_epoch", cfg.get("epoch", 1))
    if "data" in cfg and "train" in cfg.data:
        cfg.data.train.loop = max(cfg.get("epoch", 1) // cfg.eval_epoch, 1)

    os.makedirs(os.path.join(cfg.save_path, "model"), exist_ok=True)
    if not cfg.get("resume", False):
        cfg.dump(os.path.join(cfg.save_path, "config.py"))
    return cfg


def default_setup(cfg: Config) -> Config:
    import jax

    world_size = comm.get_world_size()
    # reference divides per-process batch by world size; TPU batches are global,
    # so batch_size stays global and sharding splits it across devices.
    cfg.num_worker = cfg.get("num_worker", 0)
    seed = None if cfg.get("seed") is None else cfg.seed * world_size + comm.get_rank()
    seed = set_seed(seed)
    cfg.seed = seed
    cfg.setdefault("num_devices", len(jax.devices()))
    return cfg
