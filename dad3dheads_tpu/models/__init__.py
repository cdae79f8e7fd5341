from .bifpn import BiFPN
from .dad3dnet import DAD3DNet, create_model
from .mobilenet import MobileNetStages
from .resnet import ENCODER_CHANNELS, ResNet50Stages

__all__ = [
    "BiFPN",
    "DAD3DNet",
    "create_model",
    "MobileNetStages",
    "ResNet50Stages",
    "ENCODER_CHANNELS",
]
