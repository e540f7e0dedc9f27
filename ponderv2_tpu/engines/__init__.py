from .launch import launch, slurm_launch
from .defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from .train import TRAINERS, Trainer, MultiDatasetTrainer, TrainState
from .hooks.builder import HOOKS, build_hooks

from .hooks import misc as _hooks_misc  # noqa: F401
from .hooks import evaluator as _hooks_eval  # noqa: F401
