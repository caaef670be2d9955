"""ResNet-v1.5 (He et al. 2016) in flax — bottleneck-block family.

BASELINE.json's north star lists "EfficientNet-B3/ResNet image feature
extraction runs as a batched XLA forward pass"; this supplies the ResNet
half. Standard torchvision-style v1.5 graph (stride-2 in the 3x3 of each
downsampling bottleneck) so offline-converted pretrained weights map 1:1
through ``backbones.load_npz_weights``.

``resnet50()`` → (B, 224, 224, 3) → pooled (B, 2048), patches (B, 49, 2048),
optional logits (B, 1000).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# blocks per stage
DEPTHS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
          "resnet152": (3, 8, 36, 3)}


class ConvBN(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding="SAME",
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride here, v1.5) → 1x1 expand ×4, residual."""

    width: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.width * 4
        shortcut = x
        if self.strides != 1 or x.shape[-1] != out_ch:
            shortcut = ConvBN(out_ch, 1, self.strides, act=False,
                              name="downsample")(x, train)
        y = ConvBN(self.width, 1, name="conv1")(x, train)
        y = ConvBN(self.width, 3, self.strides, name="conv2")(y, train)
        y = ConvBN(out_ch, 1, act=False, name="conv3")(y, train)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    depths: tuple = (3, 4, 6, 3)
    include_top: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(64, 7, 2, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.depths):
            width = 64 * 2 ** stage
            for b in range(n_blocks):
                x = Bottleneck(
                    width, strides=2 if (b == 0 and stage > 0) else 1,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
        out = {"patches": x.reshape(x.shape[0], -1, x.shape[-1]),
               "pooled": x.mean(axis=(1, 2))}
        if self.include_top:
            out["logits"] = nn.Dense(1000, name="predictions")(out["pooled"])
        return out


def resnet(variant: str = "resnet50", include_top: bool = False) -> ResNet:
    return ResNet(depths=DEPTHS[variant], include_top=include_top)


def preprocess(images: np.ndarray) -> np.ndarray:
    """torchvision-style: [0,1] scale + ImageNet normalization."""
    x = np.asarray(images, np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std
