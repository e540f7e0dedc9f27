"""Trainer: hook-instrumented epoch loop around a single jitted train step.

Reference: /root/reference/ponder/engines/train.py. The reference's ``run_step``
(H2D copy → autocast forward → GradScaler backward → optimizer/scheduler step) is
re-architected TPU-first: the whole step — forward, loss, backward, optimizer
update, BN-stat update — is ONE jitted pure function ``(state, batch) -> (state,
metrics)``. bf16 compute needs no loss scaler; the schedule is folded into the
optax transform; under a device mesh the same step runs SPMD (see
``parallel.mesh``).
"""

from __future__ import annotations

import time
import weakref
from typing import Any, Callable, Dict, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets import build_dataset, build_dataloader
from ..datasets.dataloader import MultiDatasetDataloader
from ..models import build_model
from ..utils.config import Config
from ..utils.events import EventStorage
from ..utils.logger import get_root_logger
from ..utils.optimizer import build_optimizer
from ..utils.registry import Registry
from ..utils.scheduler import build_scheduler
from .common import split_batch

TRAINERS = Registry("trainers")


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    constants: Any = None  # frozen collections (e.g. CLIP class embeddings)


def _variables(state: "TrainState", params=None):
    v = {"params": params if params is not None else state.params,
         "batch_stats": state.batch_stats}
    if state.constants:
        v["constants"] = state.constants
    return v


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    schedule: Callable,
    static_ctx: Dict[str, Any],
    loss_key: str = "loss",
    metric_keys: Sequence[str] = (),
    rng_seed: int = 0,
):
    """Build the jitted train step closure. A per-step PRNG key (derived from
    the step counter) is injected as input_dict["rng"] for stochastic models
    (ray sampling, masking)."""

    base_rng = jax.random.PRNGKey(rng_seed)

    def train_step(state: TrainState, arrays: Dict[str, jnp.ndarray]):
        rng = jax.random.fold_in(base_rng, state.step)
        input_dict = {**arrays, **static_ctx, "rng": rng}

        def loss_fn(params):
            out, mutated = model.apply(
                _variables(state, params), input_dict, train=True,
                mutable=["batch_stats", "diagnostics"],
            )
            return out[loss_key], (
                out, mutated["batch_stats"], mutated.get("diagnostics", {})
            )

        (loss, (out, batch_stats, diags)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "lr": schedule(state.step)}
        # kernel-contract flags (rows key-sorted, band windows cover): sown by
        # the sparse backbones; 1.0 iff every plan's contract held this step.
        # Trainer.sync_metrics and bench.py raise when it goes false.
        flags = jax.tree.leaves(diags)
        if flags:
            metrics["contract_ok"] = jnp.all(jnp.stack(flags)).astype(
                jnp.float32
            )
        for k in metric_keys:
            if k in out:
                metrics[k] = out[k]
        # NOTE: state.replace keeps `constants` (and the pytree structure!)
        # intact — rebuilding TrainState without it would drop the frozen
        # collections and retrace/recompile on the next call.
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, static_ctx: Dict[str, Any]):
    def eval_step(state: TrainState, arrays: Dict[str, jnp.ndarray]):
        return model.apply(_variables(state), {**arrays, **static_ctx}, train=False)

    return jax.jit(eval_step)


class TrainerBase:
    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info: Dict[str, Any] = {}
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks_cfg) -> None:
        from .hooks.builder import build_hooks

        hooks = build_hooks(hooks_cfg)
        for h in hooks:
            h.trainer = weakref.proxy(self)
        self.hooks = hooks

    def before_train(self):
        for h in self.hooks:
            h.before_train()

    def before_epoch(self):
        for h in self.hooks:
            h.before_epoch()

    def before_step(self):
        for h in self.hooks:
            h.before_step()

    def after_step(self):
        for h in self.hooks:
            h.after_step()

    def after_epoch(self):
        for h in self.hooks:
            h.after_epoch()

    def after_train(self):
        for h in self.hooks:
            h.after_train()

    def train(self):
        with EventStorage(self.start_epoch * len(self.train_loader)) as self.storage:
            self.before_train()
            self.logger.info(">>>>>>>>>>>>>>>> Start Training >>>>>>>>>>>>>>>>")
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                for i, input_dict in enumerate(self.train_loader):
                    self.comm_info["iter"] = i
                    self.comm_info["input_dict"] = input_dict
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.after_epoch()
            self.after_train()
            self.logger.info("<<<<<<<<<<<<<<<<< End Training <<<<<<<<<<<<<<<<<")


@TRAINERS.register_module("Trainer")
class Trainer(TrainerBase):
    def __init__(self, cfg: Config):
        super().__init__()
        self.cfg = cfg
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = cfg.eval_epoch  # loop-rebased epochs (reference defaults.py:125)
        self.best_metric_value = -float("inf")
        self.logger = get_root_logger(
            log_file=f"{cfg.save_path}/train.log" if cfg.get("save_path") else None
        )
        self.logger.info(f"Save path: {cfg.get('save_path')}")
        self.logger.info(f"Config:\n{cfg.pretty_text}")

        # ------------------------------------------------- data parallelism
        # The reference's only distribution is DDP around the train loop
        # (reference defaults.py:22-43, train.py:212-216). TPU-native: a
        # `data` mesh over all local devices, the train step shard_map'ed
        # over it (parallel/mesh.py). Enabled automatically when >1 device is
        # visible; force on/off with cfg.data_parallel.
        n_avail = len(jax.devices())
        dp = cfg.get("data_parallel", None)
        self.num_devices = 1
        if dp is None:
            dp = n_avail > 1
        if dp:
            self.num_devices = int(cfg.get("num_devices", 0)) or n_avail
            if cfg.batch_size % self.num_devices != 0:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by "
                    f"{self.num_devices} devices"
                )
        self.mesh = None
        if self.num_devices > 1:
            from ..parallel.mesh import create_mesh

            self.mesh = create_mesh(self.num_devices)
            self.logger.info(
                f"=> Data parallel over {self.num_devices} devices"
            )

        self.logger.info("=> Building model ...")
        self.model = build_model(dict(cfg.model))
        self.logger.info("=> Building train dataset & loader ...")
        self.train_loader = self.build_train_loader()
        self.val_loader = self.build_val_loader()

        # host-side SpUNet plan prefetch (engines/plan_prefetch.py): build the
        # next batch's conv plans on a background thread, overlapped with the
        # device step. Single-shard only — sharded batches carry a leading
        # device axis the host builder doesn't split.
        if cfg.get("host_plans", True) and self.num_devices == 1:
            from .plan_prefetch import (
                PlanPrefetchLoader, plan_cfg_from_model_cfg,
            )

            plan_cfg = plan_cfg_from_model_cfg(
                dict(cfg.model), self.build_static_ctx()
            )
            if plan_cfg is not None:
                self.train_loader = PlanPrefetchLoader(
                    self.train_loader, plan_cfg
                )
                self.logger.info("=> Host plan prefetch enabled")

        total_steps = len(self.train_loader) * self.max_epoch
        self.logger.info(f"=> Total steps: {total_steps}")
        self.schedule = build_scheduler(dict(cfg.scheduler), total_steps)

        self.logger.info("=> Initializing params (tracing model) ...")
        template = next(iter(self.train_loader))
        arrays, _ = split_batch(template)
        if self.mesh is not None:
            # sharded batches carry a leading device axis; init on shard 0
            arrays = {k: v[0] for k, v in arrays.items()}
        self.static_ctx = self.build_static_ctx()
        init_fn = jax.jit(
            lambda rng, arr: self.model.init(
                rng, {**arr, **self.static_ctx}, train=False
            )
        )
        variables = init_fn(
            jax.random.PRNGKey(cfg.get("seed", 0)),
            jax.tree.map(jnp.asarray, arrays),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.logger.info(f"Num params: {n_params}")
        self.tx = build_optimizer(dict(cfg.optimizer), params, self.schedule)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            constants=variables.get("constants", {}),
        )
        if self.mesh is not None:
            from ..parallel.mesh import make_sharded_train_step, replicate_state

            self.state = replicate_state(self.state, self.mesh)
            self.train_step = make_sharded_train_step(
                self.model,
                self.tx,
                self.schedule,
                self.static_ctx,
                self.mesh,
                metric_keys=tuple(cfg.get("metric_keys", ())),
                rng_seed=cfg.get("seed", 0),
                sync_bn=bool(cfg.get("sync_bn", False)),
            )
        else:
            self.train_step = make_train_step(
                self.model,
                self.tx,
                self.schedule,
                self.static_ctx,
                metric_keys=tuple(cfg.get("metric_keys", ())),
                rng_seed=cfg.get("seed", 0),
            )
        self.eval_step = make_eval_step(self.model, self.val_static_ctx)
        self.register_hooks(cfg.get("hooks", []))

    # ------------------------------------------------------------------ build
    def build_static_ctx(self) -> Dict[str, Any]:
        ctx = dict(
            spatial_shape=tuple(self.cfg.get("sparse_shape", (1024, 1024, 1024))),
            # under data parallelism the jitted step sees per-device scenes
            batch_size=int(self.cfg.batch_size) // self.num_devices,
        )
        ctx.update(self.cfg.get("static_ctx", {}))
        return ctx

    @property
    def val_static_ctx(self) -> Dict[str, Any]:
        """Eval-shape context: the val loader collates with
        ``scene_budget=batch_size_val`` (unsharded), so the eval step's static
        batch_size must match it — NOT the per-device train batch size
        (a pretrain model's stacked per-scene arrays, e.g. rgb (B, V, H, W, 3),
        would otherwise shape-mismatch whenever batch_size_val differs)."""
        ctx = dict(self.static_ctx)
        ctx["batch_size"] = int(self.cfg.get("batch_size_val", 1))
        ctx.update(self.cfg.get("static_ctx_val", {}))
        return ctx

    def build_train_loader(self):
        cfg = self.cfg
        dataset = build_dataset(dict(cfg.data.train))
        if self.num_devices > 1 and not cfg.get("point_budget"):
            raise ValueError("data_parallel requires an explicit point_budget")
        return build_dataloader(
            dataset,
            batch_size=cfg.batch_size,
            num_workers=cfg.get("num_worker", 0),
            shuffle=True,
            drop_last=True,
            point_budget=cfg.get("point_budget"),
            scene_budget=cfg.batch_size,
            mix_prob=cfg.get("mix_prob", 0.0),
            seed=cfg.get("seed", 0),
            num_shards=self.num_devices,
        )

    def build_val_loader(self):
        cfg = self.cfg
        if not cfg.get("evaluate", True) or "val" not in cfg.data:
            return None
        dataset = build_dataset(dict(cfg.data.val))
        return build_dataloader(
            dataset,
            batch_size=cfg.get("batch_size_val", 1),
            num_workers=cfg.get("num_worker", 0),
            shuffle=False,
            drop_last=False,
            point_budget=cfg.get("point_budget_val", cfg.get("point_budget")),
            scene_budget=cfg.get("batch_size_val", 1),
            seed=cfg.get("seed", 0),
        )

    # ------------------------------------------------------------------- step
    def run_step(self):
        arrays, _ = split_batch(self.comm_info["input_dict"])
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            arrays = shard_batch(arrays, self.mesh)
        else:
            arrays = jax.tree.map(jnp.asarray, arrays)
        self.state, metrics = self.train_step(self.state, arrays)
        self.comm_info["metrics"] = metrics

    def sync_metrics(self) -> Dict[str, float]:
        """Device->host fetch of the last step's metrics (blocks)."""
        metrics = {
            k: float(v) for k, v in self.comm_info.get("metrics", {}).items()
        }
        if metrics.get("contract_ok", 1.0) < 0.5:
            raise RuntimeError(
                "sparse-conv kernel contract violated this step "
                "(rows not key-sorted or band window overflow): conv outputs "
                "were zero-poisoned by design. Check that the collate path "
                "sorts rows when the model sets assume_sorted=True, or raise "
                "PONDER_BAND_WINDOW. Refusing to continue training."
            )
        return metrics


@TRAINERS.register_module("MultiDatasetTrainer")
class MultiDatasetTrainer(Trainer):
    def build_train_loader(self):
        cfg = self.cfg
        dataset = build_dataset(dict(cfg.data.train))
        if self.num_devices > 1 and not cfg.get("point_budget"):
            raise ValueError("data_parallel requires an explicit point_budget")
        return MultiDatasetDataloader(
            dataset,
            batch_size_per_dataset=cfg.batch_size,
            num_workers=cfg.get("num_worker", 0),
            point_budget=cfg.get("point_budget"),
            mix_prob=cfg.get("mix_prob", 0.0),
            seed=cfg.get("seed", 0),
            num_shards=self.num_devices,
        )
