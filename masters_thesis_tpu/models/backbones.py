"""Image feature extraction backbones (offline preprocessing, L2).

The reference dumps per-image CNN features once and trains on them
(SURVEY.md §2): VGG16 fc2 4096-d and block5-conv (196, 512) patches
(AttemptFour/CNN/feature_extractor.py:38-101), InceptionV3 (64, 2048)
(CNN_RNN/train.py), EfficientNet-B3 1536-d (feature_extractor_enb3.py:31-60).

Here: a faithful VGG16 graph in flax (batched XLA forward on TPU instead of
the reference's per-batch Keras predict), with weight import from a numpy
archive (convert torchvision/Keras weights offline — no pretrained weights
ship with this zero-egress image). Any backbone that yields (patches, C) or
(C,) features can feed the stores; the extractor driver is
backbone-agnostic.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv channels per VGG16 block (Simonyan & Zisserman 2015)
VGG16_CFG = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
             (512, 512, 512))


class VGG16(nn.Module):
    """Outputs a dict: fc2 (B, 4096), conv5 (B, 196, 512), logits (B, 1000).

    Input: (B, 224, 224, 3) RGB, caller-normalised (the reference uses
    Keras ``preprocess_input`` BGR-mean subtraction; see ``preprocess``).
    """

    include_top: bool = True

    @nn.compact
    def __call__(self, x):
        out = {}
        for b, widths in enumerate(VGG16_CFG, start=1):
            for c, width in enumerate(widths, start=1):
                x = nn.Conv(width, (3, 3), padding="SAME",
                            name=f"block{b}_conv{c}")(x)
                x = nn.relu(x)
            if b == 5:
                # (B, 14, 14, 512) -> (B, 196, 512): the attention patches
                out["conv5"] = x.reshape(x.shape[0], -1, x.shape[-1])
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.include_top:
            x = x.reshape(x.shape[0], -1)                     # (B, 7*7*512)
            x = nn.relu(nn.Dense(4096, name="fc1")(x))
            x = nn.relu(nn.Dense(4096, name="fc2")(x))
            out["fc2"] = x
            out["logits"] = nn.Dense(1000, name="predictions")(x)
        return out


def preprocess(images: np.ndarray) -> np.ndarray:
    """Keras VGG16 'caffe' preprocessing: RGB->BGR, subtract ImageNet means."""
    x = np.asarray(images, np.float32)[..., ::-1]
    return x - np.array([103.939, 116.779, 123.68], np.float32)


def _merge_flat(tree, flat, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out[k] = _merge_flat(v, flat, p)
        else:
            if p in flat:
                arr = flat[p]
                assert arr.shape == v.shape, (p, arr.shape, v.shape)
                out[k] = jnp.asarray(arr)
            else:
                out[k] = v
    return out


def load_npz_weights(params, path: str):
    """Merge a {param_path: array} npz into a backbone param tree.

    Keys use '/'-joined flax paths, e.g. 'block1_conv1/kernel'. Shapes must
    match (conv kernels HWIO; dense kernels (in, out)).
    """
    flat = dict(np.load(path))
    return _merge_flat(params, flat)


def load_npz_variables(variables: dict, path: str) -> dict:
    """Merge an npz into BOTH collections of a backbone's variables.

    Plain keys merge into ``params``; keys prefixed ``stats/`` merge into
    ``batch_stats`` (BatchNorm moving mean/var — without these, pretrained
    BN backbones would silently run inference on the init stats
    mean=0/var=1 and emit wrong features).
    """
    blob = dict(np.load(path))
    params_flat = {k: v for k, v in blob.items() if not k.startswith("stats/")}
    stats_flat = {k[len("stats/"):]: v for k, v in blob.items()
                  if k.startswith("stats/")}
    out = dict(variables)
    out["params"] = _merge_flat(variables["params"], params_flat)
    if "batch_stats" in variables and variables["batch_stats"]:
        out["batch_stats"] = _merge_flat(variables["batch_stats"], stats_flat)
    return out


def extract_features(
    model, variables, images: np.ndarray, batch_size: int = 64,
    head: str = "fc2",
) -> np.ndarray:
    """Batched feature extraction (the reference's per-key dump loop,
    feature_extractor.py:67-84, as one jitted scan over batches)."""
    fwd = jax.jit(lambda x: model.apply(variables, x)[head])
    outs = []
    n = len(images)
    for i in range(0, n, batch_size):
        batch = images[i : i + batch_size]
        if len(batch) < batch_size:  # pad the tail for a static shape
            pad = np.repeat(batch[-1:], batch_size - len(batch), axis=0)
            out = np.asarray(fwd(jnp.asarray(np.concatenate([batch, pad]))))
            outs.append(out[: len(batch)])
        else:
            outs.append(np.asarray(fwd(jnp.asarray(batch))))
    return np.concatenate(outs)


class GlobalPoolExtractor(nn.Module):
    """EfficientNet-style pooled-feature head over any backbone trunk
    (feature_extractor_enb3.py:31-60 semantics: global-avg-pool -> (C,))."""

    trunk: nn.Module
    head: str = "conv5"

    @nn.compact
    def __call__(self, x):
        feats = self.trunk(x)[self.head]
        return feats.mean(axis=1)
