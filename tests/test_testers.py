"""SemSegTester fragment-vote protocol: the vote scatter must stay aligned
with original point ids under collate_fn's (batch, voxel key) row sort.

Reference protocol: ponder/engines/test.py (fragment inference + probability
voting into a per-original-point accumulator via the fragment's ``index``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ponderv2_tpu.engines.test import SemSegTester
from ponderv2_tpu.utils.config import Config


class _OracleSegTester(SemSegTester):
    """eval_fragment stub: logits = one-hot of a hidden per-point label carried
    in the features, so a CORRECT vote pipeline reconstructs the labels
    exactly regardless of row order; any index/row misalignment breaks it."""

    def __init__(self, cfg, dataset, num_classes):
        # bypass TesterBase (no model/checkpoint); set only what test() uses
        from ponderv2_tpu.utils.logger import get_root_logger

        self.logger = get_root_logger()
        self.cfg = cfg
        self.verbose = False
        self.test_dataset = dataset
        self._num_classes = num_classes

    def eval_fragment(self, arrays):
        label = np.rint(np.asarray(arrays["feat"])[:, 0]).astype(int)
        label = np.clip(label, 0, self._num_classes - 1)
        logits = np.full((len(label), self._num_classes), -10.0, np.float32)
        logits[np.arange(len(label)), label] = 10.0
        return {"seg_logits": jnp.asarray(logits)}


def _make_fragment_scene(rng, n_points, n_frag, num_classes, seed):
    """A scene whose points are covered by overlapping fragments, with the
    ground-truth label hidden in feat[:, 0] (what the oracle predicts)."""
    segment = rng.randint(0, num_classes, n_points).astype(np.int64)
    coord = rng.rand(n_points, 3).astype(np.float32)
    grid = rng.permutation(n_points)[:, None].repeat(3, 1).astype(np.int32)
    fragments = []
    for f in range(n_frag):
        idx = np.arange(f, n_points, n_frag)
        idx = np.concatenate([idx, rng.randint(0, n_points, 5)])  # overlap
        fragments.append(dict(
            index=idx,
            coord=coord[idx],
            grid_coord=grid[idx],
            feat=np.stack(
                [segment[idx].astype(np.float32),
                 np.zeros(len(idx), np.float32)], axis=1),
        ))
    return dict(name=f"scene{seed}", segment=segment, fragment_list=fragments)


class _FragDataset:
    def __init__(self, scenes):
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i):
        return self.scenes[i]


def test_vote_scatter_alignment(tmp_path):
    rng = np.random.RandomState(7)
    num_classes = 5
    scenes = [_make_fragment_scene(rng, 97, 3, num_classes, s)
              for s in range(2)]
    cfg = Config(dict(
        save_path=str(tmp_path),
        point_budget=128,
        data=dict(num_classes=num_classes, ignore_index=-1),
    ))
    tester = _OracleSegTester(cfg, _FragDataset(scenes), num_classes)
    tester.test()
    # perfect oracle + correct index plumbing => saved per-scene predictions
    # reconstruct the ground truth EXACTLY (any vote/row misalignment breaks
    # this for most points)
    for s in scenes:
        pred = np.load(tmp_path / "result" / f"{s['name']}_pred.npy")
        np.testing.assert_array_equal(pred, s["segment"])
