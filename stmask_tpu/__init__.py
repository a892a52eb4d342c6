"""stmask-tpu: a TPU-native one-stage video instance segmentation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
STMask system (CVPR 2021 — spatial feature calibration + temporal fusion on
YOLACT), re-designed for TPU: static shapes, functional transforms, fused
kernels, mesh-sharded training, and a streaming per-video tracking scan.
"""

__version__ = '0.1.0'

from .config import REGISTRY, STMaskConfig, get_config  # noqa: F401
