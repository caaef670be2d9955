"""Offline converter: keras.applications backbone weights -> the framework's
npz bundle (params keys + ``stats/``-prefixed BatchNorm moving stats, loaded
by ``backbones.load_npz_variables``).

The reference extracts features with Keras VGG16 / InceptionV3 /
EfficientNet (AttemptFour/CNN/feature_extractor*.py,
CNN_RNN/train.py, feature_extractor_enb3.py); this script moves those
models' pretrained weights into the native flax graphs so `mtt features
--weights w.npz` reproduces the reference's features on TPU.

Run on a machine with tensorflow + network access (imagenet weights), or
with --weights none for a random-init bundle (graph-parity testing):

    python scripts/convert_keras_backbone.py --backbone inception_v3 \
        --out inception_v3.npz [--weights imagenet]

Supported: vgg16, inception_v3, efficientnet_b0..b7. ResNets follow the
torchvision (v1.5) convention instead — convert a torch state_dict with
--torch-state-dict (no tensorflow needed for those).

Graph parity of every mapping is pinned by tests/test_parity_tf.py
(random keras weights -> convert -> load -> identical outputs).
"""

from __future__ import annotations

import argparse

import numpy as np


# ---------------------------------------------------------------- vgg16

def convert_vgg16(model) -> dict:
    """keras.applications.VGG16: layer names match the flax graph 1:1."""
    out: dict[str, np.ndarray] = {}
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        kernel, bias = ws
        out[f"{layer.name}/kernel"] = np.asarray(kernel)
        out[f"{layer.name}/bias"] = np.asarray(bias)
    return out


# ---------------------------------------------------------- inception_v3

# our ConvBN paths in the EXACT creation order keras.applications builds its
# conv2d_bn layers (models/inception.py mirrors that topology)
_INCEPTION_A = ["b1x1", "b5x5_1", "b5x5_2",
                "b3x3dbl_1", "b3x3dbl_2", "b3x3dbl_3", "bpool"]
_INCEPTION_RA = ["b3x3", "b3x3dbl_1", "b3x3dbl_2", "b3x3dbl_3"]
_INCEPTION_B = ["b1x1", "b7x7_1", "b7x7_2", "b7x7_3",
                "b7x7dbl_1", "b7x7dbl_2", "b7x7dbl_3", "b7x7dbl_4",
                "b7x7dbl_5", "bpool"]
_INCEPTION_RB = ["b3x3_1", "b3x3_2", "b7x7x3_1", "b7x7x3_2", "b7x7x3_3",
                 "b7x7x3_4"]
_INCEPTION_C = ["b1x1", "b3x3_1", "b3x3_2a", "b3x3_2b",
                "b3x3dbl_1", "b3x3dbl_2", "b3x3dbl_3a", "b3x3dbl_3b",
                "bpool"]


def inception_conv_order() -> list[str]:
    paths = [f"stem{i}" for i in range(1, 6)]
    for i in range(3):
        paths += [f"mixed{i}/{n}" for n in _INCEPTION_A]
    paths += [f"mixed3/{n}" for n in _INCEPTION_RA]
    for i in range(4, 8):
        paths += [f"mixed{i}/{n}" for n in _INCEPTION_B]
    paths += [f"mixed8/{n}" for n in _INCEPTION_RB]
    for i in (9, 10):
        paths += [f"mixed{i}/{n}" for n in _INCEPTION_C]
    return paths


def convert_inception_v3(model) -> dict:
    """Pair keras's sequentially-named conv2d_N/batch_normalization_N layers
    (creation order == model.layers order) with the flax paths."""
    import tensorflow as tf

    def creation_index(layer):
        # model.layers is TOPOLOGICAL order (parallel branches interleave by
        # depth); the auto-generated name suffix (conv2d, conv2d_1, ...)
        # carries CREATION order, which is what the path list mirrors
        tail = layer.name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    convs = sorted(
        (l for l in model.layers if isinstance(l, tf.keras.layers.Conv2D)),
        key=creation_index)
    bns = sorted(
        (l for l in model.layers
         if isinstance(l, tf.keras.layers.BatchNormalization)),
        key=creation_index)
    paths = inception_conv_order()
    assert len(convs) == len(bns) == len(paths), (
        len(convs), len(bns), len(paths))
    out: dict[str, np.ndarray] = {}
    for path, conv, bn in zip(paths, convs, bns):
        (kernel,) = conv.get_weights()
        out[f"{path}/conv/kernel"] = np.asarray(kernel)
        beta, mean, var = bn.get_weights()   # scale=False: no gamma
        out[f"{path}/bn/bias"] = np.asarray(beta)
        out[f"stats/{path}/bn/mean"] = np.asarray(mean)
        out[f"stats/{path}/bn/var"] = np.asarray(var)
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.Dense):
            k, b = layer.get_weights()
            out["predictions/kernel"] = np.asarray(k)
            out["predictions/bias"] = np.asarray(b)
    return out


# --------------------------------------------------------- efficientnet

def convert_efficientnet(model) -> dict:
    """keras.applications.EfficientNetB* -> flax block{i}/... paths.

    Keras names blocks block{stage}{letter}_*; the flax graph numbers them
    flat in the same order. Depthwise kernels (k, k, C, 1) transpose to the
    flax grouped-conv layout (k, k, 1, C).
    """
    import re

    import tensorflow as tf

    out: dict[str, np.ndarray] = {}
    # ordered unique keras block tags (block1a, block2a, block2b, ...)
    tags: list[str] = []
    for layer in model.layers:
        m = re.match(r"block(\d[a-z])_", layer.name)
        if m and (not tags or tags[-1] != f"block{m.group(1)}"):
            if f"block{m.group(1)}" not in tags:
                tags.append(f"block{m.group(1)}")
    tag_to_idx = {t: i for i, t in enumerate(tags)}

    def put_conv(path, layer, depthwise=False):
        ws = layer.get_weights()
        kernel = np.asarray(ws[0])
        if depthwise:                         # (k,k,C,1) -> (k,k,1,C)
            kernel = np.transpose(kernel, (0, 1, 3, 2))
        out[f"{path}/kernel"] = kernel
        if len(ws) > 1:
            out[f"{path}/bias"] = np.asarray(ws[1])

    def put_bn(path, layer):
        gamma, beta, mean, var = layer.get_weights()
        out[f"{path}/scale"] = np.asarray(gamma)
        out[f"{path}/bias"] = np.asarray(beta)
        out[f"stats/{path}/mean"] = np.asarray(mean)
        out[f"stats/{path}/var"] = np.asarray(var)

    for layer in model.layers:
        name = layer.name
        m = re.match(r"block(\d[a-z])_(.+)", name)
        if m:
            blk = f"block{tag_to_idx[f'block{m.group(1)}']}"
            part = m.group(2)
            if part == "expand_conv":
                put_conv(f"{blk}/expand/conv", layer)
            elif part == "expand_bn":
                put_bn(f"{blk}/expand/bn", layer)
            elif part == "dwconv":
                put_conv(f"{blk}/depthwise/conv", layer, depthwise=True)
            elif part == "bn":
                put_bn(f"{blk}/depthwise/bn", layer)
            elif part == "se_reduce":
                put_conv(f"{blk}/se_reduce", layer)
            elif part == "se_expand":
                put_conv(f"{blk}/se_expand", layer)
            elif part == "project_conv":
                put_conv(f"{blk}/project/conv", layer)
            elif part == "project_bn":
                put_bn(f"{blk}/project/bn", layer)
        elif name == "stem_conv":
            put_conv("stem/conv", layer)
        elif name == "stem_bn":
            put_bn("stem/bn", layer)
        elif name == "top_conv":
            put_conv("head/conv", layer)
        elif name == "top_bn":
            put_bn("head/bn", layer)
        elif name == "predictions":
            k, b = layer.get_weights()
            out["predictions/kernel"] = np.asarray(k)
            out["predictions/bias"] = np.asarray(b)
    return out


# ------------------------------------------------------ resnet (torch)

def convert_resnet_state_dict(state: dict) -> dict:
    """torchvision resnet50/101/152 state_dict -> flax npz (v1.5 graph,
    models/resnet.py). Conv kernels OIHW -> HWIO."""
    out: dict[str, np.ndarray] = {}

    def conv(t):
        return np.transpose(np.asarray(t), (2, 3, 1, 0))

    def put(prefix, torch_prefix):
        out[f"{prefix}/conv/kernel"] = conv(state[f"{torch_prefix}.weight"])

    def put_bn(prefix, tp):
        out[f"{prefix}/bn/scale"] = np.asarray(state[f"{tp}.weight"])
        out[f"{prefix}/bn/bias"] = np.asarray(state[f"{tp}.bias"])
        out[f"stats/{prefix}/bn/mean"] = np.asarray(
            state[f"{tp}.running_mean"])
        out[f"stats/{prefix}/bn/var"] = np.asarray(state[f"{tp}.running_var"])

    put("stem", "conv1")
    put_bn("stem", "bn1")
    import re

    layers = sorted({
        tuple(map(int, re.match(r"layer(\d+)\.(\d+)\.", k).groups()))
        for k in state if k.startswith("layer")
    })
    for s, b in layers:
        ours = f"layer{s}_{b}"
        for i in (1, 2, 3):
            put(f"{ours}/conv{i}", f"layer{s}.{b}.conv{i}")
            put_bn(f"{ours}/conv{i}", f"layer{s}.{b}.bn{i}")
        if f"layer{s}.{b}.downsample.0.weight" in state:
            put(f"{ours}/downsample", f"layer{s}.{b}.downsample.0")
            put_bn(f"{ours}/downsample", f"layer{s}.{b}.downsample.1")
    if "fc.weight" in state:
        out["predictions/kernel"] = np.asarray(state["fc.weight"]).T
        out["predictions/bias"] = np.asarray(state["fc.bias"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", required=True,
                    choices=["vgg16", "inception_v3"]
                    + [f"efficientnet_b{i}" for i in range(8)]
                    + ["resnet50", "resnet101", "resnet152"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default="imagenet",
                    help="'imagenet' or 'none' (keras backbones)")
    ap.add_argument("--torch-state-dict", default=None,
                    help="path to a torch .pth state_dict (resnets)")
    args = ap.parse_args()

    if args.backbone.startswith("resnet"):
        import torch

        state = torch.load(args.torch_state_dict, map_location="cpu")
        flat = convert_resnet_state_dict(
            {k: v.numpy() for k, v in state.items()})
    else:
        import tensorflow as tf

        weights = None if args.weights == "none" else args.weights
        if args.backbone == "vgg16":
            model = tf.keras.applications.VGG16(weights=weights)
            flat = convert_vgg16(model)
        elif args.backbone == "inception_v3":
            model = tf.keras.applications.InceptionV3(weights=weights)
            flat = convert_inception_v3(model)
        else:
            n = args.backbone[-1]
            model = getattr(tf.keras.applications, f"EfficientNetB{n}")(
                weights=weights)
            flat = convert_efficientnet(model)
    np.savez(args.out, **flat)
    print(f"wrote {args.out}: {len(flat)} arrays")


if __name__ == "__main__":
    main()
