"""Testers: precise inference with TTA/fragment voting (reference engines/test.py).

``SemSegTester`` mirrors the reference protocol (test.py:115-336): per scene, the
dataset emits aug×fragment variants (GridSample mode="test" complementary
fragments); each fragment runs through the jitted forward; softmax probabilities
accumulate into the full-resolution point cloud by fragment index; argmax is
scored against the raw labels and optionally written as a submission file.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import build_dataset
from ..datasets.utils import collate_fn
from ..models import build_model
from ..utils import comm
from ..utils.logger import get_root_logger
from ..utils.misc import AverageMeter, intersection_and_union
from ..utils.registry import Registry
from .common import split_batch
from .hooks.misc import load_checkpoint
from .train import TrainState

TESTERS = Registry("testers")


class TesterBase:
    def __init__(self, cfg, model=None, state=None, test_loader=None, verbose=False):
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "test.log")
            if cfg.get("save_path") else None
        )
        self.cfg = cfg
        self.verbose = verbose
        self.model = model if model is not None else self.build_model()
        self.state = state if state is not None else self.load_state()
        self.test_dataset = (
            test_loader if test_loader is not None else self.build_test_dataset()
        )
        self.static_ctx = dict(
            spatial_shape=tuple(cfg.get("sparse_shape", (1024, 1024, 1024))),
            batch_size=1,
        )
        self._eval_fn = None

    def build_model(self):
        return build_model(dict(self.cfg.model))

    def load_state(self) -> TrainState:
        weight = self.cfg.get("weight")
        assert weight and os.path.isfile(weight), f"checkpoint not found: {weight}"
        raw, extra = load_checkpoint(weight)
        self.logger.info(
            f"Loaded weight from {weight} (epoch {extra.get('epoch', '?')})"
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=raw["params"],
            batch_stats=raw.get("batch_stats", {}),
            opt_state=None,
            constants=raw.get("constants", {}) or None,
        )

    def build_test_dataset(self):
        return build_dataset(dict(self.cfg.data.test))

    def eval_fragment(self, arrays: Dict[str, jnp.ndarray]):
        if self._eval_fn is None:
            model, static_ctx, state = self.model, self.static_ctx, self.state

            @jax.jit
            def fwd(state, arrays):
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                if state.constants:
                    variables["constants"] = state.constants
                return model.apply(variables, {**arrays, **static_ctx},
                                   train=False)

            self._eval_fn = fwd
        return self._eval_fn(self.state, arrays)

    def test(self):
        raise NotImplementedError


@TESTERS.register_module()
class SemSegTester(TesterBase):
    def test(self):
        logger = self.logger
        cfg = self.cfg
        dataset = self.test_dataset
        num_classes = cfg.data.num_classes
        ignore_index = cfg.data.get("ignore_index", -1)
        point_budget = cfg.get("point_budget_test", cfg.get("point_budget"))
        save_path = cfg.get("save_path", ".")
        submit = cfg.get("submit", False)

        os.makedirs(os.path.join(save_path, "result"), exist_ok=True)
        if submit:
            os.makedirs(os.path.join(save_path, "submit"), exist_ok=True)

        logger.info(">>>>>>>>>>>>>>>> Start Testing >>>>>>>>>>>>>>>>")
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        batch_meter = AverageMeter()

        indices = list(range(len(dataset)))
        # multi-host: stripe scenes across processes
        indices = indices[comm.get_rank():: comm.get_world_size()]

        records = {}
        import time

        for n, idx in enumerate(indices):
            t0 = time.perf_counter()
            data_dict = dataset[idx]
            name = data_dict["name"]
            segment = np.asarray(data_dict.get("segment"))
            pred_save_path = os.path.join(save_path, "result", f"{name}_pred.npy")
            if os.path.isfile(pred_save_path):
                # per-scene resume (reference test.py:168-175): reuse the
                # cached prediction instead of re-running inference
                logger.info(f"{name}: loaded cached prediction")
                final = np.load(pred_save_path)
                if segment is not None and segment.ndim > 0:
                    inter, union, target = intersection_and_union(
                        final, segment, num_classes, ignore_index
                    )
                    inter_sum += inter
                    union_sum += union
                    target_sum += target
                    records[name] = dict(
                        intersection=inter, union=union, target=target
                    )
                if submit:
                    self.write_submission(name, final, save_path)
                continue
            fragments = data_dict["fragment_list"]
            num_points = (
                segment.shape[0] if segment is not None and segment.ndim > 0
                else max(int(f["index"].max()) + 1 for f in fragments)
            )
            pred = np.zeros((num_points, num_classes), np.float32)
            for frag in fragments:
                # "index" rides through collation so the vote scatter stays
                # aligned under collate's (batch, voxel key) row sort;
                # padding rows carry index -1 and are masked out
                batch = collate_fn([dict(frag)], point_budget=point_budget,
                                   scene_budget=1)
                arrays, _ = split_batch(batch)
                arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
                out = self.eval_fragment(arrays)
                valid = np.asarray(batch["batch"]) >= 0
                index = np.asarray(batch["index"])[valid]
                logits = np.asarray(out["seg_logits"])[valid]
                probs = np.exp(logits - logits.max(-1, keepdims=True))
                probs /= probs.sum(-1, keepdims=True)
                pred[index] += probs
            final = pred.argmax(-1)
            batch_meter.update(time.perf_counter() - t0)

            if segment is not None and segment.ndim > 0:
                inter, union, target = intersection_and_union(
                    final, segment, num_classes, ignore_index
                )
                inter_sum += inter
                union_sum += union
                target_sum += target
                mask = union != 0
                iou = (inter[mask] / np.maximum(union[mask], 1)).mean() if mask.any() else 0
                acc = inter.sum() / max(target.sum(), 1)
                records[name] = dict(intersection=inter, union=union, target=target)
                logger.info(
                    f"Test: {name} [{n + 1}/{len(indices)}]-{num_points} "
                    f"Batch {batch_meter.val:.3f} ({batch_meter.avg:.3f}) "
                    f"Accuracy {acc:.4f} mIoU {iou:.4f}"
                )
            np.save(os.path.join(save_path, "result", f"{name}_pred.npy"), final)
            if submit:
                self.write_submission(name, final, save_path)

        # gather across hosts
        gathered = comm.gather(records, dst=0)
        metrics = None
        if comm.is_main_process():
            merged = {}
            for r in gathered:
                merged.update(r)
            if merged:
                inter_sum = sum(v["intersection"] for v in merged.values())
                union_sum = sum(v["union"] for v in merged.values())
                target_sum = sum(v["target"] for v in merged.values())
            iou_class = inter_sum / (union_sum + 1e-10)
            acc_class = inter_sum / (target_sum + 1e-10)
            m_iou = float(np.mean(iou_class))
            m_acc = float(np.mean(acc_class))
            all_acc = float(inter_sum.sum() / (target_sum.sum() + 1e-10))
            logger.info(
                f"Syncing ... Val result: mIoU/mAcc/allAcc "
                f"{m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
            )
            names = cfg.data.get("names", [str(i) for i in range(num_classes)])
            for c in range(num_classes):
                logger.info(
                    f"Class_{c} - {names[c]} Result: iou/accuracy "
                    f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
                )
            metrics = dict(m_iou=m_iou, m_acc=m_acc, all_acc=all_acc,
                           iou_class=iou_class)
        logger.info("<<<<<<<<<<<<<<<<< End Testing <<<<<<<<<<<<<<<<<")
        return metrics

    def write_submission(self, name: str, pred: np.ndarray, save_path: str):
        """Per-dataset submission writers (reference test.py:252-288)."""
        data_cfg = dict(self.cfg.data.test)
        ds_type = data_cfg.get("type", "")
        submit_dir = os.path.join(save_path, "submit")
        if "ScanNet" in ds_type:
            from ..datasets.scannet import VALID_CLASS_IDS_20

            remapped = np.asarray(VALID_CLASS_IDS_20)[pred]
            np.savetxt(
                os.path.join(submit_dir, f"{name}.txt"), remapped, fmt="%d"
            )
        elif "NuScenes" in ds_type:
            # lidarseg bin: uint8 = 16-class learning-space pred + 1, exactly
            # as the reference writes it (test.py:279-288 does `pred + 1` with
            # no inverse learning map)
            np.asarray(pred + 1, np.uint8).tofile(
                os.path.join(submit_dir, f"{name}_lidarseg.bin")
            )
        else:
            np.savetxt(os.path.join(submit_dir, f"{name}.txt"), pred, fmt="%d")


@TESTERS.register_module()
class ClsTester(TesterBase):
    def test(self):
        logger = self.logger
        num_classes = self.cfg.data.num_classes
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        for i in range(len(self.test_dataset)):
            data = self.test_dataset[i]
            batch = collate_fn([data], point_budget=self.cfg.get("point_budget"))
            arrays, _ = split_batch(batch)
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = self.eval_fragment(arrays)
            pred = np.asarray(out["cls_logits"]).argmax(-1)
            target = np.asarray(batch["category"]).reshape(-1)
            inter, union, t = intersection_and_union(pred, target, num_classes)
            inter_sum += inter
            union_sum += union
            target_sum += t
        acc = inter_sum.sum() / (target_sum.sum() + 1e-10)
        logger.info(f"Test result: allAcc {acc:.4f}")


@TESTERS.register_module()
class PartSegTester(TesterBase):
    """Part segmentation tester (reference test.py:417-509): per-category IoU."""

    def test(self):
        """Reference protocol (test.py:417-509): per-sample prediction, parts
        restricted to the sample's category (``category2part``), per-part IoU
        with the both-empty -> 1.0 rule; reports ins.mIoU and cat.mIoU."""
        logger = self.logger
        num_classes = self.cfg.data.num_classes
        ds = self.test_dataset
        categories = list(getattr(ds, "categories", ()) or
                          self.cfg.data.get("categories", ())) or ["all"]
        category2part = getattr(ds, "category2part", None) or self.cfg.data.get(
            "category2part", {"all": list(range(num_classes))}
        )
        num_categories = len(categories)
        iou_category = np.zeros(num_categories)
        iou_count = np.zeros(num_categories)
        for i in range(len(ds)):
            data = ds[i]
            batch = collate_fn([data], point_budget=self.cfg.get("point_budget"))
            arrays, _ = split_batch(batch)
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = self.eval_fragment(arrays)
            valid = np.asarray(batch["batch"]) >= 0
            pred = np.asarray(out["seg_logits"]).argmax(-1)[valid]
            label = np.asarray(batch["segment"])[valid]
            ci = 0
            if "category" in batch:
                ci = int(np.asarray(batch["category"]).reshape(-1)[0])
            elif "cls_token" in batch:
                ci = int(np.asarray(batch["cls_token"]).reshape(-1)[0])
            ci = min(max(ci, 0), num_categories - 1)
            parts = category2part.get(categories[ci], list(range(num_classes)))
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                if (label == part).sum() == 0 and (pred == part).sum() == 0:
                    parts_iou[j] = 1.0  # part absent in both: perfect
                else:
                    inter = np.sum((label == part) & (pred == part))
                    union = np.sum((label == part) | (pred == part))
                    parts_iou[j] = inter / (union + 1e-10)
            iou_category[ci] += parts_iou.mean()
            iou_count[ci] += 1
        ins_miou = iou_category.sum() / (iou_count.sum() + 1e-10)
        cat_miou = float((iou_category / (iou_count + 1e-10)).mean())
        logger.info(
            f"Test result: ins.mIoU/cat.mIoU {ins_miou:.4f}/{cat_miou:.4f}"
        )
        for ci in range(num_categories):
            logger.info(
                f"Class_{ci}-{categories[ci]} Result: iou_cat/num_sample "
                f"{iou_category[ci] / (iou_count[ci] + 1e-10):.4f}/"
                f"{int(iou_count[ci])}"
            )
