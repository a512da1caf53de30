from . import resnet, vgg  # noqa: F401  (registration side effects)
from .resnet import ResNet, BasicBlock, Bottleneck
from .vgg import VGG

__all__ = ["ResNet", "BasicBlock", "Bottleneck", "VGG"]
