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
