"""ponderv2_tpu — a TPU-native 3D point-cloud pre-training framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PonderV2
(OpenGVLab/PonderV2): sparse-voxel backbones pre-trained by differentiable neural
rendering, fine-tuned for semantic/instance segmentation, config-driven throughout.
"""

import os as _os

__version__ = "0.1.0"

# Platform override knob. Some environments pre-register a TPU PJRT plugin via
# sitecustomize and pin JAX_PLATFORMS before user code runs; PONDER_PLATFORM=cpu
# reliably redirects (e.g. for CPU smoke runs / simulated multi-device meshes).
if _os.environ.get("PONDER_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PONDER_PLATFORM"])
