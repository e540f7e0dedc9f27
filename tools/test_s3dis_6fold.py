"""Merge per-area S3DIS test records into 6-fold cross-validated mIoU.

Reference: /root/reference/tools/test_s3dis_6fold.py:42-60+. Each area's test run
saves per-scene ``{name}_pred.npy`` plus a ``records.npz`` with
intersection/union/target histograms; this tool sums them across the six areas.

Usage: python tools/test_s3dis_6fold.py --record_root exp/s3dis
"""

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--record_root", required=True,
                   help="dir containing Area_*/result record folders")
    p.add_argument("--num_classes", type=int, default=13)
    args = p.parse_args()

    inter = np.zeros(args.num_classes)
    union = np.zeros(args.num_classes)
    target = np.zeros(args.num_classes)
    records = sorted(glob.glob(os.path.join(args.record_root, "**", "records.npz"),
                               recursive=True))
    assert records, f"no records.npz under {args.record_root}"
    for r in records:
        data = np.load(r)
        inter += data["intersection"]
        union += data["union"]
        target += data["target"]
        print(f"merged {r}")

    iou = inter / (union + 1e-10)
    acc = inter / (target + 1e-10)
    print(f"6-fold mIoU {iou.mean():.4f} mAcc {acc.mean():.4f} "
          f"allAcc {inter.sum() / (target.sum() + 1e-10):.4f}")
    for c in range(args.num_classes):
        print(f"class {c}: iou {iou[c]:.4f} acc {acc[c]:.4f}")


if __name__ == "__main__":
    main()
