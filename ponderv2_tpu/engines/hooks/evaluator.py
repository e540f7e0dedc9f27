"""Per-epoch evaluators (reference ponder/engines/hooks/evaluator.py).

``SemSegEvaluator`` runs the val loader through the jitted eval step, computes
per-class IoU on host, optionally projecting voxel predictions back to the raw
point cloud by nearest-neighbor (the reference's pointops.knn_query path,
evaluator.py:131-138). Metric scalars go into EventStorage and
``comm_info["current_metric_value"]`` for CheckpointSaver.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...utils import comm
from ...utils.misc import intersection_and_union
from ..common import split_batch
from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    def __init__(self, write_cls_iou: bool = False):
        self.write_cls_iou = write_cls_iou

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        trainer = self.trainer
        logger = trainer.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = trainer.cfg.data.num_classes
        ignore_index = trainer.cfg.data.get("ignore_index", -1)
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        losses = []
        for i, input_dict in enumerate(trainer.val_loader):
            arrays, _ = split_batch(input_dict)
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = trainer.eval_step(trainer.state, arrays)
            seg_logits = np.asarray(out["seg_logits"])
            if "loss" in out:
                losses.append(float(out["loss"]))
            pred = seg_logits.argmax(-1)
            segment = np.asarray(input_dict["segment"])
            valid = np.asarray(input_dict["batch"]) >= 0
            if "origin_coord" in input_dict:
                # project voxel predictions back to raw points by nearest neighbor
                from ...ops.pointops import knn_query

                idx, _ = knn_query(
                    1,
                    arrays["coord"],
                    arrays["batch"],
                    arrays["origin_coord"],
                    arrays["origin_batch"],
                )
                pred = pred[np.asarray(idx)[:, 0]]
                segment = np.asarray(input_dict["origin_segment"])
                valid = np.asarray(input_dict["origin_batch"]) >= 0
            pred = np.where(valid, pred, ignore_index)
            segment = np.where(valid, segment, ignore_index)
            inter, union, target = intersection_and_union(
                pred, segment, num_classes, ignore_index
            )
            inter_sum += inter
            union_sum += union
            target_sum += target
            mask = union != 0
            batch_iou = (inter[mask] / np.maximum(union[mask], 1)).mean() if mask.any() else 0.0
            logger.info(
                f"Test: [{i + 1}/{len(trainer.val_loader)}] iou {batch_iou:.4f}"
            )

        # cross-host reduction of the histogram counters
        reduced = comm.reduce_dict(
            {
                **{f"i{c}": inter_sum[c] for c in range(num_classes)},
                **{f"u{c}": union_sum[c] for c in range(num_classes)},
                **{f"t{c}": target_sum[c] for c in range(num_classes)},
            },
            average=False,
        )
        inter_sum = np.array([reduced[f"i{c}"] for c in range(num_classes)])
        union_sum = np.array([reduced[f"u{c}"] for c in range(num_classes)])
        target_sum = np.array([reduced[f"t{c}"] for c in range(num_classes)])

        iou_class = inter_sum / (union_sum + 1e-10)
        acc_class = inter_sum / (target_sum + 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter_sum.sum() / (target_sum.sum() + 1e-10))
        logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        if self.write_cls_iou:
            names = self.trainer.cfg.data.get("names", list(range(num_classes)))
            for c in range(num_classes):
                logger.info(
                    f"Class_{c}-{names[c]} Result: iou/accuracy "
                    f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
                )
        storage = trainer.storage
        storage.put_scalar("val/mIoU", m_iou, smoothing_hint=False)
        storage.put_scalar("val/mAcc", m_acc, smoothing_hint=False)
        storage.put_scalar("val/allAcc", all_acc, smoothing_hint=False)
        if losses:
            storage.put_scalar("val/loss", float(np.mean(losses)), smoothing_hint=False)
        trainer.comm_info["current_metric_value"] = m_iou
        trainer.comm_info["current_metric_name"] = "mIoU"
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        trainer = self.trainer
        num_classes = trainer.cfg.data.num_classes
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        for input_dict in trainer.val_loader:
            arrays, _ = split_batch(input_dict)
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = trainer.eval_step(trainer.state, arrays)
            pred = np.asarray(out["cls_logits"]).argmax(-1)
            target = np.asarray(input_dict["category"]).reshape(-1)
            inter, union, t = intersection_and_union(pred, target, num_classes)
            inter_sum += inter
            union_sum += union
            target_sum += t
        acc = float(inter_sum.sum() / (target_sum.sum() + 1e-10))
        trainer.logger.info(f"Val result: allAcc {acc:.4f}")
        trainer.storage.put_scalar("val/allAcc", acc, smoothing_hint=False)
        trainer.comm_info["current_metric_value"] = acc
        trainer.comm_info["current_metric_name"] = "allAcc"


def _average_precision(scores, matched, num_gt):
    """AP from scored predictions with binary match flags (all-point interp)."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    matched = np.asarray(matched)[order]
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1)
    # envelope + integrate
    precision = np.concatenate([[0.0], precision, [0.0]])
    recall = np.concatenate([[0.0], recall, [recall[-1] if len(recall) else 0.0]])
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.where(recall[1:] != recall[:-1])[0]
    return float(np.sum((recall[idx + 1] - recall[idx]) * precision[idx + 1]))


def evaluate_instance_ap(
    scene_preds,
    scene_gts,
    num_classes,
    segment_ignore_index=(-1, 0, 1),
    min_region_size=100,
):
    """ScanNet-protocol instance AP (reference hooks/evaluator.py:233-510).

    scene_preds: per scene, list of dicts {mask (N,), cls, score}.
    scene_gts: per scene, dict {instance (N,), segment (N,)}.
    Returns dict(mAP, mAP25, mAP50, per-class APs).
    """
    thresholds = np.arange(0.5, 0.96, 0.05)
    valid_classes = [
        c for c in range(num_classes) if c not in segment_ignore_index
    ]
    ap_table = np.full((len(thresholds) + 1, num_classes), np.nan)
    all_t = [0.25] + list(thresholds)

    for ti, t in enumerate(all_t):
        for c in valid_classes:
            scores, matched, num_gt = [], [], 0
            for preds, gt in zip(scene_preds, scene_gts):
                inst = np.asarray(gt["instance"])
                seg = np.asarray(gt["segment"])
                gt_masks = []
                for i in np.unique(inst[inst >= 0]):
                    m = inst == i
                    cls_votes = seg[m]
                    cls_votes = cls_votes[cls_votes >= 0]
                    if len(cls_votes) == 0:
                        continue
                    gcls = np.bincount(cls_votes).argmax()
                    if gcls == c and m.sum() >= min_region_size:
                        gt_masks.append(m)
                num_gt += len(gt_masks)
                used = np.zeros(len(gt_masks), bool)
                c_preds = sorted(
                    [p for p in preds if p["cls"] == c],
                    key=lambda p: -p["score"],
                )
                for p in c_preds:
                    pm = np.asarray(p["mask"])
                    best_iou, best_j = 0.0, -1
                    for j, gm in enumerate(gt_masks):
                        if used[j]:
                            continue
                        inter_ = np.logical_and(pm, gm).sum()
                        union_ = np.logical_or(pm, gm).sum()
                        iou = inter_ / max(union_, 1)
                        if iou > best_iou:
                            best_iou, best_j = iou, j
                    hit = best_iou >= t
                    if hit:
                        used[best_j] = True
                    scores.append(p["score"])
                    matched.append(hit)
            ap_table[ti, c] = _average_precision(scores, matched, num_gt)

    def _mean(rows):
        vals = rows[:, valid_classes]
        return float(np.nanmean(vals)) if np.isfinite(vals).any() else 0.0

    return dict(
        mAP25=_mean(ap_table[0:1]),
        mAP50=_mean(ap_table[1:2]),
        mAP=_mean(ap_table[1:]),
        ap_table=ap_table,
    )


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    """Instance segmentation evaluator (reference hooks/evaluator.py:210-587):
    jitted forward for semantic/offset, host clustering, ScanNet AP matching."""

    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1):
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        trainer = self.trainer
        logger = trainer.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = trainer.cfg.data.num_classes
        model = trainer.model
        scene_preds, scene_gts = [], []
        for input_dict in trainer.val_loader:
            arrays, _ = split_batch(input_dict)
            jarrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            out = trainer.eval_step(trainer.state, jarrays)
            batch = np.asarray(input_dict["batch"])
            proposals = model.propose_instances(
                input_dict["coord"], out["seg_logits"], out["bias_pred"], batch
            )
            for b in np.unique(batch[batch >= 0]):
                sel = batch == b
                scene_preds.append(
                    [
                        dict(mask=p["mask"][sel], cls=p["cls"], score=p["score"])
                        for p in proposals
                        if p["batch"] == b
                    ]
                )
                scene_gts.append(
                    dict(
                        instance=np.asarray(input_dict["instance"])[sel],
                        segment=np.asarray(input_dict["segment"])[sel],
                    )
                )
        # gather scenes across hosts (reference evaluator.py:558-560)
        all_preds = [p for r in comm.all_gather(scene_preds) for p in r]
        all_gts = [g for r in comm.all_gather(scene_gts) for g in r]
        result = evaluate_instance_ap(
            all_preds, all_gts, num_classes, self.segment_ignore_index
        )
        logger.info(
            f"Val result: mAP/mAP50/mAP25 {result['mAP']:.4f}/"
            f"{result['mAP50']:.4f}/{result['mAP25']:.4f}"
        )
        trainer.storage.put_scalar("val/mAP", result["mAP"], smoothing_hint=False)
        trainer.storage.put_scalar("val/mAP50", result["mAP50"], smoothing_hint=False)
        trainer.storage.put_scalar("val/mAP25", result["mAP25"], smoothing_hint=False)
        trainer.comm_info["current_metric_value"] = result["mAP50"]
        trainer.comm_info["current_metric_name"] = "mAP50"
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
