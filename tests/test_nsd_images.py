"""NSD stimuli brick reader/exporter (NSDAccess.read_images equivalent)."""

import numpy as np
import pytest


@pytest.fixture()
def brick_path(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (10, 6, 6, 3)).astype(np.uint8)
    p = tmp_path / "nsd_stimuli.hdf5"
    with h5py.File(p, "w") as f:
        f.create_dataset("imgBrick", data=imgs)
    return str(p), imgs


def test_read_stimuli_keys_order_and_dupes(brick_path):
    from masters_thesis_tpu.data.nsd_images import read_stimuli

    path, imgs = brick_path
    # 1-based keys, arbitrary order, duplicate key
    got = read_stimuli(path, keys=[3, 1, 10, 3])
    np.testing.assert_array_equal(got[0], imgs[2])
    np.testing.assert_array_equal(got[1], imgs[0])
    np.testing.assert_array_equal(got[2], imgs[9])
    np.testing.assert_array_equal(got[3], imgs[2])
    np.testing.assert_array_equal(read_stimuli(path), imgs)
    with pytest.raises(ValueError, match="keys must be in"):
        read_stimuli(path, keys=[0])
    with pytest.raises(ValueError, match="keys must be in"):
        read_stimuli(path, keys=[11])


def test_iter_stimuli_chunks(brick_path):
    from masters_thesis_tpu.data.nsd_images import iter_stimuli_chunks

    path, imgs = brick_path
    seen_keys, seen = [], []
    for ck, chunk in iter_stimuli_chunks(path, keys=None, chunk=4):
        assert len(ck) == len(chunk) <= 4
        seen_keys += list(ck)
        seen.append(chunk)
    assert seen_keys == list(range(1, 11))
    np.testing.assert_array_equal(np.concatenate(seen), imgs)


def test_export_images_both_formats(brick_path, tmp_path):
    from PIL import Image

    from masters_thesis_tpu.data.nsd_images import export_images

    path, imgs = brick_path
    out = tmp_path / "pics"
    assert export_images(path, [2, 5], str(out)) == 2
    png = np.asarray(Image.open(out / "KID2.png"))
    np.testing.assert_array_equal(png, imgs[1])
    out2 = tmp_path / "pics_npy"
    export_images(path, [7], str(out2), fmt="npy")
    np.testing.assert_array_equal(np.load(out2 / "KID7.npy"), imgs[6])


def test_stimuli_cli_feeds_preview_loader(brick_path, tmp_path):
    """mtt stimuli exports the exact layout load_stimulus_images consumes."""
    from masters_thesis_tpu.cli import main as cli_main
    from masters_thesis_tpu.train.callbacks import load_stimulus_images

    path, imgs = brick_path
    keys = tmp_path / "keys.npy"
    np.save(keys, np.array([1, 4], np.int64))
    out = tmp_path / "exported"
    rc = cli_main(["stimuli", "--hdf5", path, "--keys", str(keys),
                   "--out-dir", str(out)])
    assert rc == 0
    loaded = load_stimulus_images(str(out), [1, 4, 9])
    np.testing.assert_array_equal(loaded[0], imgs[0])
    np.testing.assert_array_equal(loaded[1], imgs[3])
    assert loaded[2] is None


def test_image_chunks_npy_and_hdf5(brick_path, tmp_path):
    from types import SimpleNamespace

    from masters_thesis_tpu.cli import _image_chunks

    path, imgs = brick_path
    keys = tmp_path / "keys.npy"
    np.save(keys, np.array([2, 9], np.int64))
    # hdf5 source
    a = SimpleNamespace(images=path, keys=str(keys))
    got = np.concatenate(list(_image_chunks(a, chunk=1)))
    np.testing.assert_array_equal(got, imgs[[1, 8]])
    # npy source, same key semantics (row = key - 1)
    npy = tmp_path / "imgs.npy"
    np.save(npy, imgs)
    b = SimpleNamespace(images=str(npy), keys=str(keys))
    got2 = np.concatenate(list(_image_chunks(b, chunk=8)))
    np.testing.assert_array_equal(got2, imgs[[1, 8]])
    c = SimpleNamespace(images=str(npy), keys=None)
    np.testing.assert_array_equal(
        np.concatenate(list(_image_chunks(c, chunk=3))), imgs)
