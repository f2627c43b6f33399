"""ResNet-18 noise-robust classifier for guided sampling.

Reference semantics: ncsn/models/classifiers.py:5-23 - a 1->3-channel
pre-conv in front of a torchvision resnet18 (pretrained=False,
general_config.yml:12) with a fresh fc head.

TPU-first departure: GroupNorm(32) instead of BatchNorm - the classifier is
frozen inside jitted sampler scans (guidance VJPs), and stateless norm keeps
the whole scan pure with identical guidance semantics; the reference freezes
BN into eval mode there anyway (ncsn/models/__init__.py:166-169).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, max_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = Conv(features=self.features, kernel_size=3, stride=self.stride,
                   use_bias=False, name="conv1")(x)
        out = nn.GroupNorm(num_groups=min(32, self.features), name="norm1")(out)
        out = nn.relu(out)
        out = Conv(features=self.features, kernel_size=3, use_bias=False,
                   name="conv2")(out)
        out = nn.GroupNorm(num_groups=min(32, self.features), name="norm2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv(features=self.features, kernel_size=1,
                            stride=self.stride, padding=0, use_bias=False,
                            name="downsample")(x)
            identity = nn.GroupNorm(num_groups=min(32, self.features),
                                    name="downsample_norm")(identity)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv(features=64, kernel_size=7, stride=2, padding=3,
                 use_bias=False, name="stem")(x)
        h = nn.GroupNorm(num_groups=32, name="stem_norm")(h)
        h = nn.relu(h)
        h = max_pool(h, ndim=2, window=3, stride=2, padding=1)
        for i, (blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for j in range(blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                h = BasicBlock(features=width, stride=stride,
                               name=f"stage{i}_block{j}")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, name="fc")(h)


class ResNetClf(nn.Module):
    """1->3 channel pre-conv + ResNet-18 trunk + num_cls head
    (reference: classifiers.py:5-23)."""
    config: Any  # needs: Clf.in_channels, Clf.num_cls

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv(features=3, kernel_size=3, name="pre_conv")(x)
        return ResNet18(num_classes=self.config.Clf.num_cls, name="resnet")(h)
