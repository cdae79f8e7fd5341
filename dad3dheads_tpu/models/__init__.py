from .bifpn import BiFPN
from .dad3dnet import DAD3DNet, create_model, load_model
from .mobilenet import MobileNetStages
from .resnet import ENCODER_CHANNELS, ResNet50Stages

__all__ = [
    "BiFPN",
    "DAD3DNet",
    "create_model",
    "load_model",
    "MobileNetStages",
    "ResNet50Stages",
    "ENCODER_CHANNELS",
]
from .layers import (
    ConvBlock,
    IdentityLayer,
    MaskPredictionHead,
    MixSepConv,
    PixelShuffleUpsample,
    SepConv,
    get_conv_block,
    get_mask_prediction_layer,
    pixel_shuffle,
)

__all__ += [
    "ConvBlock",
    "SepConv",
    "MixSepConv",
    "PixelShuffleUpsample",
    "pixel_shuffle",
    "IdentityLayer",
    "MaskPredictionHead",
    "get_conv_block",
    "get_mask_prediction_layer",
]
