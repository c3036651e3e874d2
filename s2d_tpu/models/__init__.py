from .resnet import ResNet, RESNET_FEATURE_CHANNELS, RESNET_FEATURE_STRIDES
from .pixel_decoder import MSDeformAttnPixelDecoder
from .transformer_decoder import VideoMaskedTransformerDecoder
from .meta_arch import VideoMaskFormer, build_model, preprocess_clip

__all__ = [
    "ResNet",
    "RESNET_FEATURE_CHANNELS",
    "RESNET_FEATURE_STRIDES",
    "MSDeformAttnPixelDecoder",
    "VideoMaskedTransformerDecoder",
    "VideoMaskFormer",
    "build_model",
    "preprocess_clip",
]
