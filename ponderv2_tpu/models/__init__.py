from .builder import MODELS, build_model
from .losses.builder import LOSSES, build_criteria

from . import default  # noqa: F401  (registers DefaultSegmentor/DefaultClassifier)
from .sparse_unet import spunet  # noqa: F401
from .losses import misc as _losses_misc  # noqa: F401
from .losses import lovasz as _losses_lovasz  # noqa: F401
