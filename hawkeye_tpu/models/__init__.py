from . import backbones  # noqa: F401  (BACKBONE registrations)
from . import methods  # noqa: F401  (MODEL registrations)
from .weights import (
    convert_torchvision_resnet,
    convert_torchvision_vgg,
    load_torch_state_dict,
    merge_into,
)

__all__ = [
    "convert_torchvision_resnet",
    "convert_torchvision_vgg",
    "load_torch_state_dict",
    "merge_into",
]
