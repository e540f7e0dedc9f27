"""Core hooks: timing, logging, checkpointing (reference hooks/misc.py)."""

from __future__ import annotations

import os
import pickle
import shutil
import time
from typing import Optional

import jax
import numpy as np

from ...utils import comm
from ...utils.events import get_event_storage
from ...utils.timer import Timer
from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class IterationTimer(HookBase):
    """Tracks data/batch time and ETA (reference hooks/misc.py:33-76)."""

    def __init__(self, warmup_iter: int = 2):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._iter_timer = Timer()
        self._remain_iter = 0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._remain_iter = self.trainer.max_epoch * len(self.trainer.train_loader)

    def before_epoch(self):
        self._iter_timer.reset()

    def before_step(self):
        data_time = self._iter_timer.seconds()
        self.trainer.storage.put_scalar("data_time", data_time)

    def after_step(self):
        # force device sync so batch_time is honest
        self.trainer.sync_metrics()
        batch_time = self._iter_timer.seconds()
        self._iter_timer.reset()
        self.trainer.storage.put_scalar("batch_time", batch_time)
        self._remain_iter -= 1
        remain_time = self._remain_iter * self.trainer.storage.history(
            "batch_time"
        ).avg(20)
        t_m, t_s = divmod(remain_time, 60)
        t_h, t_m = divmod(t_m, 60)
        self.trainer.comm_info["eta"] = f"{int(t_h):02d}:{int(t_m):02d}:{int(t_s):02d}"


@HOOKS.register_module()
class InformationWriter(HookBase):
    """Console line per iter + scalar logging (reference hooks/misc.py:79-144)."""

    def __init__(self, log_interval: int = 1):
        self.log_interval = log_interval
        self.curr_iter = 0

    def before_train(self):
        self.trainer.comm_info["iter_info"] = ""
        self.curr_iter = self.trainer.start_epoch * len(self.trainer.train_loader)

    def after_step(self):
        self.curr_iter += 1
        metrics = self.trainer.sync_metrics()
        for k, v in metrics.items():
            smooth = k != "lr"
            self.trainer.storage.put_scalar(k, v, smoothing_hint=smooth)
        if self.curr_iter % self.log_interval != 0:
            return
        storage = self.trainer.storage
        info = (
            f"Train: [{self.trainer.epoch + 1}/{self.trainer.max_epoch}]"
            f"[{self.trainer.comm_info.get('iter', 0) + 1}/{len(self.trainer.train_loader)}] "
        )
        try:
            info += (
                f"data {storage.history('data_time').avg(10):.3f} "
                f"batch {storage.history('batch_time').avg(10):.3f} "
            )
        except KeyError:
            pass
        for k in metrics:
            info += f"{k}: {storage.history(k).latest():.4g} "
        eta = self.trainer.comm_info.get("eta")
        if eta:
            info += f"eta: {eta}"
        self.trainer.logger.info(info)
        storage.step()


def save_checkpoint(state, path: str, extra: Optional[dict] = None) -> None:
    """Atomic checkpoint: host-fetched pytree + metadata, pickle format."""
    import flax.serialization

    payload = {
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template=None):
    import flax.serialization

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if state_template is not None:
        state = flax.serialization.from_state_dict(state_template, payload["state"])
        return state, payload["extra"]
    return payload["state"], payload["extra"]


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Saves model_last.pth each epoch; copies to model_best.pth on metric
    improvement (reference hooks/misc.py:147-205)."""

    def __init__(self, save_freq: Optional[int] = None):
        self.save_freq = save_freq

    def after_epoch(self):
        if not comm.is_main_process():
            return
        trainer = self.trainer
        save_path = trainer.cfg.get("save_path")
        if not save_path:
            return
        os.makedirs(os.path.join(save_path, "model"), exist_ok=True)
        is_best = False
        current = trainer.comm_info.get("current_metric_value")
        if current is not None and current > trainer.best_metric_value:
            trainer.best_metric_value = current
            is_best = True
        filename = os.path.join(save_path, "model", "model_last.pth")
        extra = dict(
            epoch=trainer.epoch + 1,
            best_metric_value=trainer.best_metric_value,
        )
        save_checkpoint(trainer.state, filename, extra)
        trainer.logger.info(
            f"Saved checkpoint to {filename} "
            f"(best {trainer.cfg.get('evaluate_metric', 'metric')}: "
            f"{trainer.best_metric_value:.4f})"
        )
        if is_best:
            shutil.copyfile(
                filename, os.path.join(save_path, "model", "model_best.pth")
            )
            trainer.logger.info("Best validation model updated.")
        if self.save_freq and (trainer.epoch + 1) % self.save_freq == 0:
            shutil.copyfile(
                filename,
                os.path.join(save_path, "model", f"epoch_{trainer.epoch + 1}.pth"),
            )


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Loads weights / resumes state before training (reference misc.py:208-253)."""

    def __init__(self, keywords: str = "", replacement: Optional[str] = None,
                 strict: bool = False):
        self.keywords = keywords
        self.replacement = replacement if replacement is not None else keywords
        self.strict = strict

    def before_train(self):
        trainer = self.trainer
        weight = trainer.cfg.get("weight")
        resume = trainer.cfg.get("resume", False)
        if not weight:
            return
        if not os.path.isfile(weight):
            raise FileNotFoundError(f"checkpoint not found: {weight}")
        trainer.logger.info(f"Loading weight at: {weight}")
        if resume:
            state, extra = load_checkpoint(weight, trainer.state)
            trainer.state = state
            trainer.start_epoch = int(extra.get("epoch", 0))
            trainer.best_metric_value = float(extra.get("best_metric_value", -np.inf))
            trainer.logger.info(
                f"Resuming train at epoch {trainer.start_epoch + 1}"
            )
        else:
            # weights only: graft params/batch_stats, keep fresh optimizer
            import flax.serialization

            raw, _ = load_checkpoint(weight)
            partial = flax.serialization.from_state_dict(
                dict(params=jax.device_get(trainer.state.params),
                     batch_stats=jax.device_get(trainer.state.batch_stats)),
                {k: raw[k] for k in ("params", "batch_stats") if k in raw},
            )
            trainer.state = trainer.state.replace(
                params=partial["params"], batch_stats=partial["batch_stats"]
            )
            trainer.logger.info("Loaded model weights (optimizer state fresh).")


@HOOKS.register_module()
class DataCacheOperator(HookBase):
    """Pre-populates the shared-memory scene cache (reference misc.py:283-314)."""

    def __init__(self, data_root: str, split: str):
        self.data_root = data_root
        self.split = split

    def before_train(self):
        self.trainer.logger.info("=> Caching dataset ...")
        dataset = getattr(self.trainer.train_loader, "dataset", None)
        inner = getattr(dataset, "dataset", dataset)
        if inner is None or not hasattr(inner, "get_data"):
            return
        for i in range(len(inner.data_list)):
            inner.get_data(i)
        comm.synchronize()


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """Traces a few steps with jax.profiler and writes a TensorBoard trace
    (the reference's torch.profiler hook, hooks/misc.py:317-466)."""

    def __init__(self, trace_dir: Optional[str] = None, warm_up: int = 2,
                 record: int = 3, exit_after: bool = True):
        self.trace_dir = trace_dir
        self.warm_up = warm_up
        self.record = record
        self.exit_after = exit_after

    def before_train(self):
        import jax.profiler

        trainer = self.trainer
        trace_dir = self.trace_dir or os.path.join(
            trainer.cfg.get("save_path", "."), "trace"
        )
        trainer.logger.info(f"Profiling {self.record} steps -> {trace_dir}")
        it = iter(trainer.train_loader)
        from ..common import split_batch
        import jax.numpy as jnp

        for _ in range(self.warm_up):
            arrays, _ = split_batch(next(it))
            trainer.state, m = trainer.train_step(
                trainer.state, {k: jnp.asarray(v) for k, v in arrays.items()}
            )
            jax.block_until_ready(m["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(self.record):
                arrays, _ = split_batch(next(it))
                trainer.state, m = trainer.train_step(
                    trainer.state, {k: jnp.asarray(v) for k, v in arrays.items()}
                )
                jax.block_until_ready(m["loss"])
        trainer.logger.info("Profiling done.")
        if self.exit_after:
            raise SystemExit(0)


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Runs the full fragment-voting tester after training completes
    (reference hooks/misc.py:256-280)."""

    def __init__(self, test_last: bool = False):
        self.test_last = test_last

    def after_train(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Precise Evaluation >>>>>>>>>>>>>>>>")
        from ..test import TESTERS

        cfg = trainer.cfg
        tester_cfg = dict(cfg.get("test", {"type": "SemSegTester"}))
        which = "model_last.pth" if self.test_last else "model_best.pth"
        weight = os.path.join(cfg.save_path, "model", which)
        if not os.path.isfile(weight):
            weight = os.path.join(cfg.save_path, "model", "model_last.pth")
        cfg.weight = weight
        tester = TESTERS.build(
            dict(type=tester_cfg.get("type", "SemSegTester"), cfg=cfg)
        )
        tester.test()
