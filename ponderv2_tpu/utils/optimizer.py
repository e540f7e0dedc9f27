"""Optimizer builders on optax (reference: ``ponder/utils/optimizer.py:13-56``).

Supports SGD / Adam / AdamW with per-parameter-group learning-rate multipliers via
keyword matching on the parameter path (the reference's ``param_dicts`` mechanism,
used e.g. to give backbone blocks a lower lr than heads).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import optax

from .registry import Registry

OPTIMIZERS = Registry("optimizers")


def _path_to_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _group_labels(params, param_dicts: Optional[Sequence[Dict]]) -> Any:
    """Label each leaf by the first matching keyword group, else 'default'."""
    keywords = [d["keyword"] for d in (param_dicts or [])]

    def label(path, _leaf):
        s = _path_to_str(path)
        for i, kw in enumerate(keywords):
            if kw in s:
                return f"group{i}"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _with_param_groups(
    make_tx: Callable[[Callable], optax.GradientTransformation],
    base_lr: float,
    schedule: Callable[[int], float],
    params,
    param_dicts: Optional[Sequence[Dict]],
) -> optax.GradientTransformation:
    """Build one transform per lr group, dispatched by keyword-matched labels.

    Each group's lr is ``schedule(step) * (group_lr / base_lr)`` so one shared
    schedule drives all groups (matching torch param-group semantics where the
    scheduler rescales every group's lr by the same factor).
    """
    if not param_dicts:
        return make_tx(schedule)

    transforms = {"default": make_tx(schedule)}
    for i, d in enumerate(param_dicts):
        ratio = float(d.get("lr", base_lr)) / float(base_lr)
        transforms[f"group{i}"] = make_tx(
            lambda step, r=ratio: schedule(step) * r
        )
    labels = _group_labels(params, param_dicts)
    return optax.multi_transform(transforms, labels)


@OPTIMIZERS.register_module(name="SGD")
def sgd(
    lr: float,
    schedule: Callable[[int], float],
    params,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    dampening: float = 0.0,  # accepted for config parity; torch-default 0
    param_dicts: Optional[Sequence[Dict]] = None,
) -> optax.GradientTransformation:
    del dampening

    def make_tx(sched):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(learning_rate=sched, momentum=momentum, nesterov=nesterov))
        return optax.chain(*chain)

    return _with_param_groups(make_tx, lr, schedule, params, param_dicts)


@OPTIMIZERS.register_module(name="Adam")
def adam(
    lr: float,
    schedule: Callable[[int], float],
    params,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    param_dicts: Optional[Sequence[Dict]] = None,
) -> optax.GradientTransformation:
    def make_tx(sched):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.adam(learning_rate=sched, b1=betas[0], b2=betas[1], eps=eps))
        return optax.chain(*chain)

    return _with_param_groups(make_tx, lr, schedule, params, param_dicts)


@OPTIMIZERS.register_module(name="AdamW")
def adamw(
    lr: float,
    schedule: Callable[[int], float],
    params,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    param_dicts: Optional[Sequence[Dict]] = None,
) -> optax.GradientTransformation:
    def make_tx(sched):
        return optax.adamw(
            learning_rate=sched,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
        )

    return _with_param_groups(make_tx, lr, schedule, params, param_dicts)


def build_optimizer(
    cfg: Dict, params, schedule: Callable[[int], float]
) -> optax.GradientTransformation:
    """Build an optax transform from a config dict, a param pytree, and a schedule."""
    cfg = dict(cfg)
    cfg["schedule"] = schedule
    cfg["params"] = params
    return OPTIMIZERS.build(cfg)
