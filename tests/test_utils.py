"""Unit tests for the core runtime: registry, config, events, schedulers, misc."""

import os

import numpy as np
import pytest

from ponderv2_tpu.utils.registry import Registry, build_from_cfg
from ponderv2_tpu.utils.config import Config, DictAction
from ponderv2_tpu.utils.events import EventStorage
from ponderv2_tpu.utils.misc import intersection_and_union
from ponderv2_tpu.utils.scheduler import build_scheduler
from ponderv2_tpu.utils.env import derive_seed


class TestRegistry:
    def test_register_and_build(self):
        R = Registry("things")

        @R.register_module()
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = R.build(dict(type="Foo", a=1))
        assert isinstance(obj, Foo) and obj.a == 1 and obj.b == 2

    def test_named_registration_and_conflict(self):
        R = Registry("things")
        R.register_module(name="Alias", module=dict)
        assert "Alias" in R
        with pytest.raises(KeyError):
            R.register_module(name="Alias", module=list)

    def test_default_args_and_callable_type(self):
        R = Registry("things")
        obj = build_from_cfg(dict(type=dict, a=1), R, default_args=dict(b=2))
        assert obj == dict(a=1, b=2)

    def test_parent_lookup(self):
        parent = Registry("models")
        child = Registry("backbones", parent=parent)
        child.register_module(name="B", module=dict)
        assert parent.get("B") is dict


class TestConfig:
    def _write(self, tmpdir, name, text):
        path = os.path.join(tmpdir, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        return path

    def test_base_inheritance_and_merge(self, tmp_path):
        d = str(tmp_path)
        self._write(d, "_base_/runtime.py", "a = 1\nmodel = dict(type='M', depth=2)\n")
        child = self._write(
            d, "exp.py", "_base_ = ['_base_/runtime.py']\nmodel = dict(depth=5)\nb = 3\n"
        )
        cfg = Config.fromfile(child)
        assert cfg.a == 1 and cfg.b == 3
        assert cfg.model.type == "M" and cfg.model.depth == 5

    def test_delete_key(self, tmp_path):
        d = str(tmp_path)
        self._write(d, "base.py", "opt = dict(type='SGD', momentum=0.9)\n")
        child = self._write(
            d, "exp.py",
            "_base_ = ['base.py']\nopt = dict(_delete_=True, type='AdamW')\n",
        )
        cfg = Config.fromfile(child)
        assert cfg.opt == dict(type="AdamW")

    def test_merge_from_dict_and_dump(self, tmp_path):
        cfg = Config(dict(data=dict(train=dict(loop=1)), lr=0.1))
        cfg.merge_from_dict({"data.train.loop": 4, "new.key": "x"})
        assert cfg.data.train.loop == 4 and cfg.new.key == "x"
        out = str(tmp_path / "dump.py")
        cfg.dump(out)
        cfg2 = Config.fromfile(out)
        assert cfg2.data.train.loop == 4 and cfg2.lr == 0.1

    def test_dict_action(self):
        import argparse

        p = argparse.ArgumentParser()
        p.add_argument("--options", nargs="+", action=DictAction)
        ns = p.parse_args(["--options", "a.b=1", "c=true", "d=[1,2]", "e=text"])
        assert ns.options == {"a.b": 1, "c": True, "d": [1, 2], "e": "text"}


class TestEvents:
    def test_storage_and_smoothing(self):
        with EventStorage() as storage:
            for i in range(10):
                storage.put_scalar("loss", float(i), smoothing_hint=True)
                storage.put_scalar("lr", float(i), smoothing_hint=False)
                storage.step()
            latest = storage.latest_with_smoothing_hint(window_size=4)
            assert latest["lr"][0] == 9.0
            assert latest["loss"][0] == np.median([6, 7, 8, 9])
            assert storage.history("loss").global_avg() == pytest.approx(4.5)


class TestScheduler:
    def test_onecycle_shape(self):
        sched = build_scheduler(
            dict(type="OneCycleLR", max_lr=0.1, pct_start=0.3, div_factor=10.0,
                 final_div_factor=100.0),
            total_steps=100,
        )
        lrs = np.array([float(sched(s)) for s in range(100)])
        assert lrs[0] == pytest.approx(0.01, rel=1e-3)  # max_lr / div_factor
        assert lrs.max() == pytest.approx(0.1, rel=1e-2)
        assert lrs[-1] < 1e-3  # annealed to ~max/div/final
        assert np.argmax(lrs) == pytest.approx(29, abs=2)

    def test_poly_and_cosine(self):
        poly = build_scheduler(dict(type="PolyLR", base_lr=1.0, power=0.9), 10)
        assert float(poly(0)) == pytest.approx(1.0)
        assert float(poly(10)) == pytest.approx(0.0)
        cos = build_scheduler(dict(type="CosineAnnealingLR", base_lr=1.0), 10)
        assert float(cos(0)) == pytest.approx(1.0)
        assert float(cos(10)) == pytest.approx(0.0, abs=1e-6)
        assert float(cos(5)) == pytest.approx(0.5, abs=1e-6)

    def test_multistep_warmup(self):
        s = build_scheduler(
            dict(type="MultiStepWithWarmupLR", base_lr=1.0, milestones=[0.5],
                 gamma=0.1, warmup_rate=0.1),
            total_steps=100,
        )
        assert float(s(0)) < 0.2
        assert float(s(20)) == pytest.approx(1.0)
        assert float(s(60)) == pytest.approx(0.1)


class TestMisc:
    def test_intersection_and_union(self):
        pred = np.array([0, 1, 1, 2, 2, 2])
        gt = np.array([0, 1, 2, 2, 2, -1])
        inter, union, target = intersection_and_union(pred, gt, 3, ignore_index=-1)
        assert inter.tolist() == [1, 1, 2]
        assert target.tolist() == [1, 1, 3]
        assert union.tolist() == [1, 2, 3]

    def test_derive_seed_deterministic(self):
        assert derive_seed(123, 4, 5) == derive_seed(123, 4, 5)
        assert derive_seed(123, 4, 5) != derive_seed(123, 5, 4)


class TestOptimizer:
    def test_param_groups(self):
        import jax.numpy as jnp
        import jax
        from ponderv2_tpu.utils.optimizer import build_optimizer

        params = {"backbone": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
        sched = lambda step: 0.1
        tx = build_optimizer(
            dict(type="SGD", lr=0.1, momentum=0.0,
                 param_dicts=[dict(keyword="backbone", lr=0.01)]),
            params, sched,
        )
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(updates["head"]["w"], -0.1, rtol=1e-6)
        np.testing.assert_allclose(updates["backbone"]["w"], -0.01, rtol=1e-6)
