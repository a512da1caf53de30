"""Hawkeye-TPU: a TPU-native fine-grained visual recognition framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the PyTorch
Hawkeye toolbox (Hawkeye-FineGrained/Hawkeye): config-driven training of a
registry-based zoo of fine-grained recognition methods over ResNet/VGG
backbones, with high-order pooling heads and region-proposal paths implemented
as fused on-device kernels and data parallelism over a TPU mesh.
"""

__version__ = "0.1.0"

from .config import ConfigNode, build_config_from_dict, setup_config
from .registry import BACKBONE, LOSS, MODEL, Repository

__all__ = [
    "ConfigNode",
    "build_config_from_dict",
    "setup_config",
    "Repository",
    "MODEL",
    "BACKBONE",
    "LOSS",
]
