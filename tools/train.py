"""Training entry point (reference tools/train.py:17-41)."""

from ponderv2_tpu.engines import (
    TRAINERS,
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)


def main_worker(cfg):
    cfg = default_setup(cfg)
    trainer_cfg = dict(cfg.get("train", {"type": "Trainer"}))
    trainer_cfg.setdefault("type", "Trainer")
    trainer = TRAINERS.build(dict(type=trainer_cfg["type"], cfg=cfg))
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, cfg=(cfg,))


if __name__ == "__main__":
    main()
