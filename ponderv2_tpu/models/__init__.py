from .builder import MODELS, build_model
from .losses.builder import LOSSES, build_criteria

from . import default  # noqa: F401  (registers DefaultSegmentor/DefaultClassifier)
from .sparse_unet import spunet  # noqa: F401
from .ponder import unet3d as _unet3d  # noqa: F401
from .ponder import ponder_indoor as _ponder_indoor  # noqa: F401
from .sparse_unet import spunet_pdnorm as _spunet_pdnorm  # noqa: F401
from .point_prompt_training import ppt as _ppt  # noqa: F401
from .point_group import point_group as _point_group  # noqa: F401
from .ponder import ponder_outdoor as _ponder_outdoor  # noqa: F401
from .sparse_unet import mink_unet as _mink_unet  # noqa: F401
from .losses import misc as _losses_misc  # noqa: F401
from .losses import lovasz as _losses_lovasz  # noqa: F401
