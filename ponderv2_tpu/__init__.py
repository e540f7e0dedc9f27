"""ponderv2_tpu — a TPU-native 3D point-cloud pre-training framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PonderV2
(OpenGVLab/PonderV2): sparse-voxel backbones pre-trained by differentiable neural
rendering, fine-tuned for semantic/instance segmentation, config-driven throughout.
"""

__version__ = "0.1.0"
