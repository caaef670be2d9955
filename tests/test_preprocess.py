import numpy as np
import pytest

from masters_thesis_tpu.data.preprocess.glasser import (
    groups_from_atlas,
    select_groups,
    visual_cortex_mask,
)
from masters_thesis_tpu.data.preprocess.pca import fit_pca
from masters_thesis_tpu.data.preprocess.zscore import (
    average_over_repeats,
    session_zscore,
    voxelwise_stats,
)


def test_session_zscore():
    rng = np.random.default_rng(0)
    betas = rng.standard_normal((50, 7)) * 3 + 5
    z = session_zscore(betas)
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(0), 1, atol=1e-5)


def test_average_over_repeats():
    betas = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    ids = np.array([10, 20, 10, 20])
    uniq, avg = average_over_repeats(betas, ids)
    np.testing.assert_array_equal(uniq, [10, 20])
    np.testing.assert_allclose(avg, [[3.0, 4.0], [5.0, 6.0]])


def test_voxelwise_stats_zero_std_safe():
    betas = np.zeros((10, 3))
    mean, std = voxelwise_stats(betas)
    np.testing.assert_array_equal(std, 1.0)


def test_groups_from_atlas_hemispheres_and_offsets():
    lh = np.array([0, 1, 1, 2, 0])
    rh = np.array([2, 0, 1])
    groups = groups_from_atlas(lh, rh)
    # LH labels 1,2 then RH labels 1,2
    assert len(groups) == 4
    np.testing.assert_array_equal(groups[0], [1, 2])       # LH label 1
    np.testing.assert_array_equal(groups[1], [3])          # LH label 2
    np.testing.assert_array_equal(groups[2], [7])          # RH label 1 (+5)
    np.testing.assert_array_equal(groups[3], [5])          # RH label 2 (+5)


def test_groups_from_atlas_absent_label_keeps_positions():
    """Group index i must always mean label i+1: a label absent from the
    atlas yields an EMPTY group at its position (the reference's
    np.where over the fixed 1..180 range), never an index shift that
    would silently misapply index-keyed config like groups_to_remove."""
    lh = np.array([0, 1, 1, 3, 0])   # label 2 absent
    rh = np.array([3, 0, 1])         # label 2 absent
    groups = groups_from_atlas(lh, rh)
    assert len(groups) == 6          # LH 1..3 then RH 1..3
    np.testing.assert_array_equal(groups[0], [1, 2])   # LH label 1
    assert groups[1].size == 0                         # LH label 2: empty
    np.testing.assert_array_equal(groups[2], [3])      # LH label 3
    np.testing.assert_array_equal(groups[3], [7])      # RH label 1 (+5)
    assert groups[4].size == 0
    np.testing.assert_array_equal(groups[5], [5])


def test_visual_cortex_mask():
    lh = np.array([0, 1, 4])
    rh = np.array([4, 2])
    idx = visual_cortex_mask(lh, rh, visual_parcels=[4])
    np.testing.assert_array_equal(idx, [2, 3])


def test_select_groups():
    gs = [np.array([0]), np.array([1]), np.array([2])]
    out = select_groups(gs, remove=[1])
    assert len(out) == 2
    np.testing.assert_array_equal(out[1], [2])


@pytest.mark.parametrize("use_jax", [False, True])
def test_pca_reconstructs_low_rank(use_jax):
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((3, 40))
    coefs = rng.standard_normal((100, 3))
    x = coefs @ basis + 0.6
    model = fit_pca(x, n_components=3, use_jax=use_jax, seed=1)
    z = model.transform(x)
    rec = model.inverse_transform(z)
    assert np.abs(rec - x).max() < 1e-2
    assert model.components.shape == (3, 40)
    # components orthonormal
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(3), atol=1e-4
    )


def test_groups_from_atlas_n_labels_pins_blocks(caplog):
    import logging

    from masters_thesis_tpu.data.preprocess.glasser import groups_from_atlas

    lh = np.array([1, 2, 2, 3])
    rh = np.array([1, 1, 0, 0])   # RH max 1 < LH max 3
    with caplog.at_level(logging.WARNING):
        groups = groups_from_atlas(lh, rh)
    assert "different label ranges" in caplog.text
    assert len(groups) == 3 + 1   # per-hemi max sizing (legacy default)

    pinned = groups_from_atlas(lh, rh, n_labels=3)
    assert len(pinned) == 6       # 3 LH + 3 RH, empty groups preserved
    assert pinned[3].tolist() == [4, 5]   # RH label 1 at index n_labels+0
    assert pinned[4].size == 0            # absent RH label 2 -> empty


def test_write_pack_empty_iterable_raises(tmp_path):
    from masters_thesis_tpu.data.pack import open_pack, write_pack

    with pytest.raises(ValueError, match="empty rows iterable"):
        write_pack(str(tmp_path / "p"), None, iter([]))
    # the ndarray form still writes a valid zero-row pack
    write_pack(str(tmp_path / "p2"), [], np.zeros((0, 7), np.float32))
    store = open_pack(str(tmp_path / "p2"))
    assert len(store) == 0


def test_merge_by_name_walks_frozendict():
    import flax.core
    import jax.numpy as jnp

    from masters_thesis_tpu.train.checkpoint import merge_by_name

    tpl = flax.core.freeze({"layer": {"kernel": jnp.zeros((2, 2))}})
    src = {"layer": {"kernel": np.ones((2, 2), np.float32)}}
    merged, report = merge_by_name(tpl, src)
    assert report["loaded"] == ["layer/kernel"]
    np.testing.assert_array_equal(np.asarray(merged["layer"]["kernel"]), 1.0)
