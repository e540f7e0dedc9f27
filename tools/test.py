"""Testing entry point (reference tools/test.py:17-34)."""

from ponderv2_tpu.engines import (
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)
from ponderv2_tpu.engines.test import TESTERS


def main_worker(cfg):
    cfg = default_setup(cfg)
    tester_cfg = dict(cfg.get("test", {"type": "SemSegTester"}))
    tester_cfg.setdefault("type", "SemSegTester")
    tester = TESTERS.build(dict(type=tester_cfg["type"], cfg=cfg))
    tester.test()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, cfg=(cfg,))


if __name__ == "__main__":
    main()
