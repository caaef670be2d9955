"""EfficientNet (Tan & Le 2019) in flax — the ENB3 feature extractor.

The reference dumps 1536-d global-average-pooled EfficientNet-B3 features
for all 73k NSD images (feature_extractor_enb3.py:31-60; SURVEY.md §2.6).
This is the same compound-scaled MBConv architecture built natively so the
dump is one batched XLA forward on TPU.

Conv → BatchNorm(eps 1e-3) → swish; squeeze-excite ratio 0.25 of the block
*input* channels; width via round_filters (divisor 8), depth via
ceil-scaled repeats — the published scaling rules, so offline-converted
pretrained weights map 1:1 (``backbones.load_npz_weights`` npz convention).

``efficientnet_b3()`` → (B, 300, 300, 3) → pooled (B, 1536).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# B0 baseline: (kernel, stride, expand, in_ch, out_ch, repeats)
_B0_BLOCKS = (
    (3, 1, 1, 32, 16, 1),
    (3, 2, 6, 16, 24, 2),
    (5, 2, 6, 24, 40, 2),
    (3, 2, 6, 40, 80, 3),
    (5, 1, 6, 80, 112, 3),
    (5, 2, 6, 112, 192, 4),
    (3, 1, 6, 192, 320, 1),
)

# model: (width_mult, depth_mult, resolution, dropout)
SCALINGS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:  # never drop >10%
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.99, name="bn")(x)
        return nn.swish(x) if self.act else x


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    kernel: int
    strides: int
    expand: int
    out_ch: int
    se_ch: int  # squeeze channels = max(1, in_ch // 4) of the *block* input

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        if self.expand != 1:
            x = ConvBNAct(mid, 1, name="expand")(x, train)
        x = ConvBNAct(mid, self.kernel, self.strides, groups=mid,
                      name="depthwise")(x, train)
        # squeeze-excite: global pool -> reduce -> swish -> expand -> sigmoid
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.swish(nn.Conv(self.se_ch, (1, 1), name="se_reduce")(se))
        se = nn.sigmoid(nn.Conv(mid, (1, 1), name="se_expand")(se))
        x = x * se
        x = ConvBNAct(self.out_ch, 1, act=False, name="project")(x, train)
        if self.strides == 1 and in_ch == self.out_ch:
            x = x + inp  # skip (drop-connect omitted: inference extractor)
        return x


class EfficientNet(nn.Module):
    """Outputs pooled (B, head_ch) and optionally logits (B, 1000)."""

    width: float = 1.0
    depth: float = 1.0
    include_top: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(round_filters(32, self.width), 3, 2, name="stem")(
            x, train)
        bi = 0
        for kernel, stride, expand, in_ch, out_ch, repeats in _B0_BLOCKS:
            in_r = round_filters(in_ch, self.width)
            out_r = round_filters(out_ch, self.width)
            for r in range(round_repeats(repeats, self.depth)):
                blk_in = in_r if r == 0 else out_r
                x = MBConv(kernel, stride if r == 0 else 1, expand, out_r,
                           se_ch=max(1, blk_in // 4),
                           name=f"block{bi}")(x, train)
                bi += 1
        x = ConvBNAct(round_filters(1280, self.width), 1, name="head")(
            x, train)
        out = {"pooled": x.mean(axis=(1, 2)),
               "patches": x.reshape(x.shape[0], -1, x.shape[-1])}
        if self.include_top:
            out["logits"] = nn.Dense(1000, name="predictions")(out["pooled"])
        return out


def efficientnet(variant: str = "b3", include_top: bool = False):
    """Build a scaled variant; returns (module, input_resolution)."""
    width, depth, res, _ = SCALINGS[variant]
    return EfficientNet(width=width, depth=depth,
                        include_top=include_top), res


def preprocess(images: np.ndarray) -> np.ndarray:
    """Keras EfficientNet 'torch'-style: scale to [0,1], ImageNet norm."""
    x = np.asarray(images, np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std
