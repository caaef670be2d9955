"""InceptionV3 backbone (Szegedy et al. 2016) as a flax graph.

The reference's CNN_RNN generation extracts (8, 8, 2048) feature maps from
Keras ``InceptionV3`` and trains Show-Attend-Tell on the flattened
(64, 2048) patches (CNN_RNN/train.py: feature extraction +
``np.memmap(73000, 64, 2048)`` store; SURVEY.md §2.3). This module provides
the same graph natively so feature extraction runs as one batched XLA
forward on TPU rather than a per-image Keras predict loop.

Layer topology follows the canonical published architecture (mixed0..mixed10
with factorized 7x7 and expanded 3x3 branches). Conv → BatchNorm(no scale,
eps 1e-3) → ReLU throughout, matching the Keras convention so that
converted pretrained weights (via an offline npz dump; this image has no
egress) drop in through ``backbones.load_npz_weights``.

Use: ``feats = InceptionV3(include_top=False).apply(vars, x)["patches"]``
gives (B, 64, 2048); ``pooled`` gives (B, 2048); with ``include_top``,
``logits`` gives (B, 1000).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """conv2d (no bias) + BatchNorm(center, no scale) + ReLU."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         epsilon=1e-3, momentum=0.99, name="bn")(x)
        return nn.relu(x)


def _avg_pool_same(x):
    """3x3 stride-1 average pool, SAME padding, count excluding pads
    (Keras semantics: `AveragePooling2D(padding='same')` divides by the
    number of real elements in the window)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=True) * 9.0
    counts = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=True) * 9.0
    return summed / counts


class InceptionA(nn.Module):
    """mixed0-2: 1x1 / 5x5 / double-3x3 / pool-proj branches."""

    pool_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBN(64, (1, 1), name="b1x1")(x, train)
        b5 = ConvBN(48, (1, 1), name="b5x5_1")(x, train)
        b5 = ConvBN(64, (5, 5), name="b5x5_2")(b5, train)
        b3 = ConvBN(64, (1, 1), name="b3x3dbl_1")(x, train)
        b3 = ConvBN(96, (3, 3), name="b3x3dbl_2")(b3, train)
        b3 = ConvBN(96, (3, 3), name="b3x3dbl_3")(b3, train)
        bp = _avg_pool_same(x)
        bp = ConvBN(self.pool_features, (1, 1), name="bpool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):
    """mixed3: stride-2 3x3 + stride-2 double-3x3 + maxpool."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), padding="VALID",
                    name="b3x3")(x, train)
        bd = ConvBN(64, (1, 1), name="b3x3dbl_1")(x, train)
        bd = ConvBN(96, (3, 3), name="b3x3dbl_2")(bd, train)
        bd = ConvBN(96, (3, 3), strides=(2, 2), padding="VALID",
                    name="b3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionB(nn.Module):
    """mixed4-7: factorized 7x7 branches; c7 = 128/160/160/192."""

    c7: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="b1x1")(x, train)
        b7 = ConvBN(c7, (1, 1), name="b7x7_1")(x, train)
        b7 = ConvBN(c7, (1, 7), name="b7x7_2")(b7, train)
        b7 = ConvBN(192, (7, 1), name="b7x7_3")(b7, train)
        bd = ConvBN(c7, (1, 1), name="b7x7dbl_1")(x, train)
        bd = ConvBN(c7, (7, 1), name="b7x7dbl_2")(bd, train)
        bd = ConvBN(c7, (1, 7), name="b7x7dbl_3")(bd, train)
        bd = ConvBN(c7, (7, 1), name="b7x7dbl_4")(bd, train)
        bd = ConvBN(192, (1, 7), name="b7x7dbl_5")(bd, train)
        bp = _avg_pool_same(x)
        bp = ConvBN(192, (1, 1), name="bpool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class ReductionB(nn.Module):
    """mixed8: stride-2 3x3 + 7x7-then-3x3 + maxpool → 8x8x1280."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBN(192, (1, 1), name="b3x3_1")(x, train)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), padding="VALID",
                    name="b3x3_2")(b3, train)
        b7 = ConvBN(192, (1, 1), name="b7x7x3_1")(x, train)
        b7 = ConvBN(192, (1, 7), name="b7x7x3_2")(b7, train)
        b7 = ConvBN(192, (7, 1), name="b7x7x3_3")(b7, train)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), padding="VALID",
                    name="b7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionC(nn.Module):
    """mixed9-10: expanded (split 1x3 / 3x1) branches → 2048 channels."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBN(320, (1, 1), name="b1x1")(x, train)
        b3 = ConvBN(384, (1, 1), name="b3x3_1")(x, train)
        b3a = ConvBN(384, (1, 3), name="b3x3_2a")(b3, train)
        b3b = ConvBN(384, (3, 1), name="b3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="b3x3dbl_1")(x, train)
        bd = ConvBN(384, (3, 3), name="b3x3dbl_2")(bd, train)
        bda = ConvBN(384, (1, 3), name="b3x3dbl_3a")(bd, train)
        bdb = ConvBN(384, (3, 1), name="b3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_same(x)
        bp = ConvBN(192, (1, 1), name="bpool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Input (B, 299, 299, 3), values preprocessed to [-1, 1].

    Outputs: patches (B, 64, 2048) — the CNN_RNN attention features —
    pooled (B, 2048), and logits (B, 1000) when ``include_top``.
    """

    include_top: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, (3, 3), strides=(2, 2), padding="VALID",
                   name="stem1")(x, train)
        x = ConvBN(32, (3, 3), padding="VALID", name="stem2")(x, train)
        x = ConvBN(64, (3, 3), name="stem3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), padding="VALID", name="stem4")(x, train)
        x = ConvBN(192, (3, 3), padding="VALID", name="stem5")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        x = InceptionA(32, name="mixed0")(x, train)
        x = InceptionA(64, name="mixed1")(x, train)
        x = InceptionA(64, name="mixed2")(x, train)
        x = ReductionA(name="mixed3")(x, train)
        for i, c7 in enumerate((128, 160, 160, 192), start=4):
            x = InceptionB(c7, name=f"mixed{i}")(x, train)
        x = ReductionB(name="mixed8")(x, train)
        x = InceptionC(name="mixed9")(x, train)
        x = InceptionC(name="mixed10")(x, train)

        out = {"patches": x.reshape(x.shape[0], -1, x.shape[-1])}
        pooled = x.mean(axis=(1, 2))
        out["pooled"] = pooled
        if self.include_top:
            out["logits"] = nn.Dense(1000, name="predictions")(pooled)
        return out


def preprocess(images: np.ndarray) -> np.ndarray:
    """Inception preprocessing: scale uint8 RGB to [-1, 1]."""
    return np.asarray(images, np.float32) / 127.5 - 1.0
