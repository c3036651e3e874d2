"""ResNet backbone, detectron2-weight-compatible, NHWC / TPU-native.

Reproduces the architecture d2's `build_resnet_backbone` constructs for the
reference configs (`/root/reference/model_training/configs/imagenet_video/
Base-YouTubeVIS-VideoInstanceSegmentation.yaml`: DEPTH=50,
STRIDE_IN_1X1=False i.e. torchvision-style stride on the 3x3 conv,
FrozenBN, OUT_FEATURES res2..res5):

  stem: 7x7/2 conv (64) + FrozenBN + relu + 3x3/2 maxpool
  res2..res5: bottleneck stacks [3, 4, 6, 3], widths 256/512/1024/2048,
  stride 2 on the first block of res3..res5 (on the 3x3 conv and shortcut).

FrozenBN is an affine transform with constant (scale, bias) folded from the
checkpoint's running stats; those parameters are excluded from optimization
by the trainer's parameter labeling (see train/optim.py).

Layout: NHWC activations, HWIO conv kernels — XLA TPU's preferred conv
layout (channels-last maps the channel axis onto the 128-wide lane dimension
of the MXU). Weight conversion from torch NCHW/OIHW happens in
checkpoint/torch_import.py.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BOTTLENECK_STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBN(nn.Module):
    """Affine y = x * scale + bias with frozen parameters."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        name=name,
    )


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if self.has_shortcut:
            shortcut = _conv(self.out_channels, 1, self.stride, name="shortcut")(x)
            shortcut = FrozenBN(self.out_channels, name="shortcut_norm")(shortcut)

        # stride_in_1x1=False: stride lives on the 3x3 conv
        out = _conv(self.bottleneck_channels, 1, 1, name="conv1")(x)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="norm1")(out))
        out = _conv(self.bottleneck_channels, 3, self.stride, name="conv2")(out)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="norm2")(out))
        out = _conv(self.out_channels, 1, 1, name="conv3")(out)
        out = FrozenBN(self.out_channels, name="norm3")(out)
        return nn.relu(out + shortcut)


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNet(nn.Module):
    """Returns a dict of NHWC feature maps {"res2": ..., ..., "res5": ...}."""

    depth: int = 50
    stem_out_channels: int = 64
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        stages = BOTTLENECK_STAGES[self.depth]
        out = _conv(self.stem_out_channels, 7, 2, name="stem_conv1")(x)
        out = nn.relu(FrozenBN(self.stem_out_channels, name="stem_norm1")(out))
        out = _max_pool_3x3_s2(out)

        features: Dict[str, jnp.ndarray] = {}
        in_channels = self.stem_out_channels
        out_channels = 256
        bottleneck = 64
        for stage_idx, num_blocks in enumerate(stages):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                out = BottleneckBlock(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck,
                    stride=stride if block_idx == 0 else 1,
                    has_shortcut=block_idx == 0,
                    name=f"{name}_block{block_idx}",
                )(out)
            if name in self.out_features:
                features[name] = out
            in_channels = out_channels
            out_channels *= 2
            bottleneck *= 2
        return features


RESNET_FEATURE_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
RESNET_FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
