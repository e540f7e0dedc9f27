from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose
from .utils import collate_fn, point_collate_fn
from .dataloader import build_dataloader, MultiDatasetDataloader

from . import defaults  # noqa: F401
