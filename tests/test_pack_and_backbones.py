import numpy as np
import jax
import pytest

from masters_thesis_tpu.data.pack import open_pack, write_pack
from masters_thesis_tpu.models.backbones import (
    VGG16,
    extract_features,
    load_npz_weights,
    preprocess,
)


def test_pack_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    keys = [11, 7, 23]
    rows = rng.standard_normal((3, 64)).astype(np.float32)
    meta = write_pack(str(tmp_path / "p"), keys, rows)
    assert meta["n_rows"] == 3
    store = open_pack(str(tmp_path / "p"))
    np.testing.assert_array_equal(store.keys, keys)
    got = store.gather_host(store.indices_for([23, 11]))
    np.testing.assert_allclose(got, rows[[2, 0]])


def test_pack_streaming_writer(tmp_path):
    rows = ((k, np.full(8, k, np.float32)) for k in range(5))
    write_pack(str(tmp_path / "p"), None, rows)
    store = open_pack(str(tmp_path / "p"))
    assert len(store) == 5
    np.testing.assert_allclose(store.gather_host(np.array([3]))[0], 3.0)


def test_vgg16_shapes_small():
    # run the graph at reduced resolution to keep the test fast; conv5
    # patches scale accordingly
    model = VGG16(include_top=False)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["conv5"].shape == (1, 16, 512)  # (64/16)^2 patches


def test_vgg16_weight_import(tmp_path):
    model = VGG16(include_top=False)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    k = np.asarray(variables["params"]["block1_conv1"]["kernel"])
    new_k = np.ones_like(k)
    np.savez(tmp_path / "w.npz", **{"block1_conv1/kernel": new_k})
    merged = load_npz_weights(variables["params"], str(tmp_path / "w.npz"))
    np.testing.assert_array_equal(merged["block1_conv1"]["kernel"], 1.0)
    # untouched params preserved
    np.testing.assert_array_equal(
        merged["block1_conv1"]["bias"], variables["params"]["block1_conv1"]["bias"]
    )


def test_extract_features_pads_tail():
    model = VGG16(include_top=False)
    x = np.zeros((5, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    feats = extract_features(model, variables, x, batch_size=4, head="conv5")
    assert feats.shape[0] == 5


def test_preprocess_bgr_means():
    img = np.zeros((1, 2, 2, 3), np.float32)
    out = preprocess(img)
    np.testing.assert_allclose(out[0, 0, 0], [-103.939, -116.779, -123.68])


def test_inception_v3_full_resolution_shapes():
    """The CNN_RNN feature contract: 299x299 input -> (64, 2048) patches."""
    from masters_thesis_tpu.models.inception import InceptionV3
    from masters_thesis_tpu.models.inception import preprocess as prep

    model = InceptionV3(include_top=True)
    x = np.zeros((1, 299, 299, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["patches"].shape == (1, 64, 2048)
    assert out["pooled"].shape == (1, 2048)
    assert out["logits"].shape == (1, 1000)
    np.testing.assert_allclose(
        prep(np.full((1, 1, 1, 3), 255.0)), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(prep(np.zeros((1, 1, 1, 3))), -1.0)


def test_efficientnet_b3_pooled_width():
    """feature_extractor_enb3.py contract: ENB3 global pool is 1536-d."""
    from masters_thesis_tpu.models.efficientnet import (
        efficientnet,
        round_filters,
        round_repeats,
    )

    model, res = efficientnet("b3")
    assert res == 300
    # published B3 widths/depths
    assert round_filters(32, 1.2) == 40
    assert round_filters(1280, 1.2) == 1536
    assert round_repeats(3, 1.4) == 5
    # run at reduced resolution: pooled width is resolution-independent
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pooled"].shape == (1, 1536)


def test_efficientnet_b0_block_structure():
    from masters_thesis_tpu.models.efficientnet import efficientnet

    model, res = efficientnet("b0")
    assert res == 224
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pooled"].shape == (1, 1280)
    # B0 has 16 MBConv blocks
    n_blocks = sum(1 for k in variables["params"] if k.startswith("block"))
    assert n_blocks == 16


def test_resnet50_structure_and_shapes():
    from masters_thesis_tpu.models.resnet import resnet

    model = resnet("resnet50", include_top=True)
    x = np.zeros((1, 64, 64, 3), np.float32)  # reduced res; widths invariant
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pooled"].shape == (1, 2048)
    assert out["logits"].shape == (1, 1000)
    # 3+4+6+3 = 16 bottlenecks
    blocks = [k for k in variables["params"] if k.startswith("layer")]
    assert len(blocks) == 16
    # batch stats exist (BN)
    assert "batch_stats" in variables
