from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict, DictAction
from .logger import get_root_logger
from .events import EventStorage, get_event_storage
from .misc import AverageMeter, intersection_and_union
from .timer import Timer
from .env import set_seed, derive_seed
from .optimizer import OPTIMIZERS, build_optimizer
from .scheduler import SCHEDULERS, build_scheduler
