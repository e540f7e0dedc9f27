from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose
from .utils import collate_fn, point_collate_fn
from .dataloader import build_dataloader, MultiDatasetDataloader

from . import defaults  # noqa: F401
from . import scannet  # noqa: F401
from . import s3dis  # noqa: F401
from . import structure3d  # noqa: F401
from . import nuscenes  # noqa: F401
