"""Packed-store row gather: layout round-trip, fallback parity, interpret-
mode kernel correctness, and the scanned train step over a packed store."""

import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.ops.gather import (
    _pallas_gather,
    gather_rows,
    pack_rows,
)


def test_pack_rows_pads_to_lanes():
    data = np.arange(5 * 300, dtype=np.float32).reshape(5, 300)
    packed = pack_rows(data)
    assert packed.shape == (5, 3, 128)  # 300 -> 384 = 3*128
    flat = np.asarray(packed).reshape(5, 384)
    np.testing.assert_array_equal(flat[:, :300], data)
    np.testing.assert_array_equal(flat[:, 300:], 0)


def test_gather_rows_2d_matches_take():
    data = np.random.default_rng(0).standard_normal((7, 40)).astype(np.float32)
    idx = jnp.asarray([3, 0, 6, 3])
    got = gather_rows(jnp.asarray(data), idx)
    np.testing.assert_array_equal(np.asarray(got), data[[3, 0, 6, 3]])


def test_gather_rows_packed_fallback_slices_width():
    data = np.random.default_rng(1).standard_normal((9, 300)).astype(np.float32)
    packed = pack_rows(data)
    idx = jnp.asarray([8, 1, 1, 4])
    got = gather_rows(packed, idx, width=300)
    assert got.shape == (4, 300)
    np.testing.assert_allclose(np.asarray(got), data[[8, 1, 1, 4]], rtol=0)
    # width=None keeps the padded tail (zeros)
    full = gather_rows(packed, idx)
    assert full.shape == (4, 384)
    np.testing.assert_array_equal(np.asarray(full)[:, 300:], 0)


def test_pallas_gather_kernel_interpret_mode():
    data = np.random.default_rng(2).standard_normal((6, 256)).astype(np.float32)
    packed = pack_rows(data)
    idx = jnp.asarray([5, 5, 0, 2], jnp.int32)
    rows = _pallas_gather(packed, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rows).reshape(4, 256), data[[5, 5, 0, 2]])


def test_scanned_steps_match_over_packed_store():
    """The scanned trainer's trajectory is identical whether the store is 2D
    or packed (the CPU fallback exercises the same slice/width plumbing the
    TPU Pallas path uses)."""
    import jax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_scanned_train_steps

    cfg = Config(batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8, top_k=40)
    n_voxels, n_keys, K = 200, 12, 3  # 200 pads to 256 -> real padded tail
    groups = [np.arange(i * 25, (i + 1) * 25) for i in range(8)]
    layout = GroupLayout(groups, n_voxels)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    rng = np.random.default_rng(3)
    store2d = jnp.asarray(rng.standard_normal((n_keys, n_voxels)), jnp.float32)
    packed = pack_rows(np.asarray(store2d))
    idx = jnp.asarray(rng.integers(0, n_keys, (K, cfg.batch_size)), jnp.int32)
    toks = jnp.asarray(
        rng.integers(1, 40, (K, cfg.batch_size, cfg.max_length)), jnp.int32)
    tgts = jnp.asarray(
        rng.integers(0, 40, (K, cfg.batch_size, cfg.max_length)), jnp.int32)

    params, bstats, prng = init_model(model, cfg, store2d[: cfg.batch_size],
                                      toks[0])
    tx = make_optimizer(cfg)

    def fresh():
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TrainState.create(params=copy(params), batch_stats=copy(bstats),
                                 tx=tx, rng=jnp.copy(prng))

    rules = lc_nic_l2_rules(cfg)
    s_plain = make_scanned_train_steps(model, cfg, rules)
    s_packed = make_scanned_train_steps(model, cfg, rules,
                                        store_width=n_voxels)
    _, m1 = s_plain(fresh(), store2d, idx, toks, tgts)
    _, m2 = s_packed(fresh(), packed, idx, toks, tgts)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["grad_norm"]),
                               np.asarray(m2["grad_norm"]), rtol=1e-5)


def test_store_pack_lanes_and_device_gather():
    from masters_thesis_tpu.data.store import ArrayStore

    data = np.random.default_rng(4).standard_normal((6, 200)).astype(np.float32)
    store = ArrayStore(data, list(range(10, 16)), device_resident=True,
                       pack_lanes=True)
    assert store.packed and store.row_shape == (200,)
    assert store.device_array().shape == (6, 2, 128)
    got = store.device_gather(np.asarray([2, 5]))
    np.testing.assert_allclose(np.asarray(got), data[[2, 5]], rtol=0)


def test_scanned_steps_pregathered_store_parity():
    """Permuted store + pregathered encoder produces the exact trajectory of
    the raw store + gathering encoder (the production TPU fast path's
    numerics, validated on the CPU mesh)."""
    import jax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_scanned_train_steps

    cfg = Config(batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8, top_k=40)
    n_voxels, n_keys, K = 180, 10, 3
    groups = [np.arange(i * 20, (i + 1) * 20) for i in range(9)]
    layout = GroupLayout(groups, n_voxels)
    mk = lambda pg: LcNIC(
        layout=layout, units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length, pregathered=pg)
    model, model_pg = mk(False), mk(True)

    rng = np.random.default_rng(5)
    store2d = jnp.asarray(rng.standard_normal((n_keys, n_voxels)), jnp.float32)
    permuted = layout.permute_rows(np.asarray(store2d))
    packed = pack_rows(permuted)
    idx = jnp.asarray(rng.integers(0, n_keys, (K, cfg.batch_size)), jnp.int32)
    toks = jnp.asarray(
        rng.integers(1, 40, (K, cfg.batch_size, cfg.max_length)), jnp.int32)
    tgts = jnp.asarray(
        rng.integers(0, 40, (K, cfg.batch_size, cfg.max_length)), jnp.int32)

    params, bstats, prng = init_model(model, cfg, store2d[: cfg.batch_size],
                                      toks[0])
    tx = make_optimizer(cfg)

    def fresh():
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TrainState.create(params=copy(params), batch_stats=copy(bstats),
                                 tx=tx, rng=jnp.copy(prng))

    rules = lc_nic_l2_rules(cfg)
    s_raw = make_scanned_train_steps(model, cfg, rules)
    s_pg = make_scanned_train_steps(model_pg, cfg, rules,
                                    store_width=permuted.shape[1])
    _, m1 = s_raw(fresh(), store2d, idx, toks, tgts)
    _, m2 = s_pg(fresh(), packed, idx, toks, tgts)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["accuracy"]),
                               np.asarray(m2["accuracy"]), rtol=1e-6)


def test_gather_rows_3d_feature_store_not_misrouted():
    """A conv-feature store with 128 channels is shape-identical to the
    packed layout — explicit packed=False must route it through jnp.take
    and preserve the (B, P, C) row shape."""
    feats = np.random.default_rng(6).standard_normal((5, 4, 128)).astype(
        np.float32)
    idx = jnp.asarray([4, 0, 2])
    got = gather_rows(jnp.asarray(feats), idx, packed=False)
    assert got.shape == (3, 4, 128)
    np.testing.assert_array_equal(np.asarray(got), feats[[4, 0, 2]])


def test_store_pack_lanes_ignored_for_3d_features():
    """pack_lanes on a (N, P, C) feature store is a no-op (packing is a 2D
    betas-layout concept); device_gather returns full feature rows."""
    from masters_thesis_tpu.data.store import ArrayStore

    feats = np.random.default_rng(7).standard_normal((6, 4, 128)).astype(
        np.float32)
    store = ArrayStore(feats, list(range(6)), device_resident=True,
                       pack_lanes=True)
    assert not store.packed
    assert store.row_shape == (4, 128)
    got = store.device_gather(np.asarray([1, 5]))
    np.testing.assert_array_equal(np.asarray(got), feats[[1, 5]])
