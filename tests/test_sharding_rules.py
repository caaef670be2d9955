import numpy as np
from jax.sharding import PartitionSpec as P

from masters_thesis_tpu.parallel.sharding import param_pspec


class _Leaf:
    def __init__(self, shape):
        self.shape = shape


def test_encoder_kernels_shard_voxel_axis():
    spec = param_pspec(["encoder", "kernel_0"], _Leaf((10, 256, 32)), 2)
    assert spec == P(None, "model", None)
    # non-divisible padded axis -> replicated
    spec = param_pspec(["encoder", "kernel_0"], _Leaf((10, 255, 32)), 2)
    assert spec == P()


def test_rank2_encoder_kernels_shard_input_axis():
    # FullyConnected (N, D) / PatchDense (C, D) / ConcatLocallyDense embed
    # (G*D, E): rank-2 encoder kernels shard their contraction axis — the
    # old rule emitted a rank-3 spec that crashed device_put for every
    # non-LocallyDense encoder
    assert param_pspec(["encoder", "fc", "kernel"], _Leaf((512, 64)), 2) == P(
        "model", None
    )
    assert param_pspec(["encoder", "proj", "kernel"], _Leaf((2048, 512)), 4) == P(
        "model", None
    )
    # non-divisible input axis -> replicated
    assert param_pspec(["encoder", "fc", "kernel"], _Leaf((511, 64)), 2) == P()
    # rank-1 encoder params never match the kernel rules
    assert param_pspec(["encoder", "fc", "kernel_scale"], _Leaf((64,)), 2) == P()


def test_shard_params_all_encoder_families():
    """shard_params must place every model family's TrainState onto a
    ('data','model') mesh — fc/concat/img/cnn_rnn encoders have rank-2
    kernels that used to get a rank-3 spec and crash."""
    import jax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.experiment import build_model
    from masters_thesis_tpu.parallel.mesh import make_mesh
    from masters_thesis_tpu.parallel.sharding import shard_params
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model

    mesh = make_mesh(data=4, model=2)
    n_voxels = 256
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=8, seed=0)
    rng = np.random.default_rng(0)
    for name in ("fc_nic", "concat_lc_nic", "deep_lc_nic", "img_nic",
                 "cnn_rnn"):
        cfg = Config(model=name, batch_size=8, max_length=5, top_k=63,
                     units=16, attn_units=8, group_size=4, embedding_text=8,
                     embedding_features=16)
        model, _, _ = build_model(cfg, groups, n_voxels)
        if name in ("img_nic", "cnn_rnn"):
            x = np.asarray(
                rng.standard_normal((cfg.batch_size, 4, 32)), np.float32)
        else:
            x = np.asarray(
                rng.standard_normal((cfg.batch_size, n_voxels)), np.float32)
        toks = np.asarray(
            rng.integers(1, cfg.vocab_size, (cfg.batch_size, cfg.max_length)),
            np.int32)
        params, bstats, prng = init_model(model, cfg, x, toks)
        state = TrainState.create(params=params, batch_stats=bstats,
                                  tx=make_optimizer(cfg), rng=prng)
        sharded = shard_params(state, mesh)  # crashed before the rank guard
        assert all(
            leaf.sharding.mesh.shape == mesh.shape
            for leaf in jax.tree_util.tree_leaves(sharded.params)
        ), name


def test_embedding_and_head_shard_vocab():
    assert param_pspec(["embedding"], _Leaf((5000, 512)), 4) == P("model", None)
    assert param_pspec(["embedding"], _Leaf((5001, 512)), 4) == P()
    assert param_pspec(["dense_out", "kernel"], _Leaf((256, 5120)), 4) == P(
        None, "model"
    )


def test_small_params_replicated():
    assert param_pspec(["lstm", "kernel"], _Leaf((544, 2048)), 4) == P()
    assert param_pspec(["attention", "W1", "kernel"], _Leaf((32, 32)), 4) == P()


def test_resume_from_checkpoint(tmp_path):
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_training

    cfg = Config(run="resume_t", model="lc_nic", epochs=2, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path))
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    assert bundle["manager"].latest_epoch() == 0
    # resume continues at epoch 1 with the restored step counter
    run_path2, logs2, bundle2 = run_training(
        cfg, epochs=2, smoke_keys=12, resume=True
    )
    assert bundle2["manager"].latest_epoch() == 1
    assert int(bundle2["state"].step) > int(bundle["state"].step)


def test_sharded_scanned_steps_match_unsharded():
    """K scanned steps over the ('data','model') mesh with a voxel-sharded
    store reproduce the single-device trajectory (GSPMD numerics)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.parallel.mesh import make_mesh
    from masters_thesis_tpu.parallel.sharding import (
        make_sharded_scanned_train_steps,
        shard_params,
    )
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_scanned_train_steps

    mesh = make_mesh(data=4, model=2)
    cfg = Config(batch_size=8, max_length=5, top_k=63, units=16, attn_units=8,
                 group_size=4, embedding_text=8, dropout_features=0.0,
                 dropout_text=0.0, dropout_attn=0.0, dropout_lstm=0.0,
                 dropout_out=0.0)
    n_voxels, K = 256, 3
    groups = [np.arange(i * 32, (i + 1) * 32) for i in range(8)]
    model = LcNIC(layout=GroupLayout(groups, n_voxels), units=cfg.units,
                  group_size=cfg.group_size, embedding_text=cfg.embedding_text,
                  attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
                  max_length=cfg.max_length)
    rng = np.random.default_rng(0)
    store = jnp.asarray(rng.standard_normal((32, n_voxels)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 32, (K, cfg.batch_size)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                    (K, cfg.batch_size, cfg.max_length)),
                       jnp.int32)
    tgts = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                    (K, cfg.batch_size, cfg.max_length)),
                       jnp.int32)
    params, bstats, prng = init_model(model, cfg, store[: cfg.batch_size],
                                      toks[0])
    tx = make_optimizer(cfg)

    def fresh():
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TrainState.create(params=copy(params), batch_stats=copy(bstats),
                                 tx=tx, rng=jnp.copy(prng))

    rules = lc_nic_l2_rules(cfg)
    _, m_ref = make_scanned_train_steps(model, cfg, rules)(
        fresh(), store, idx, toks, tgts)

    state = shard_params(fresh(), mesh)
    sstep = make_sharded_scanned_train_steps(model, cfg, rules, mesh, state)
    from jax.sharding import PartitionSpec as PS

    store_s = jax.device_put(store, NamedSharding(mesh, PS(None, "model")))
    kb = NamedSharding(mesh, PS(None, "data"))
    _, m_sh = sstep(state, store_s,
                    jax.device_put(idx, kb), jax.device_put(toks, kb),
                    jax.device_put(tgts, kb))
    np.testing.assert_allclose(np.asarray(m_ref["loss"]),
                               np.asarray(m_sh["loss"]), rtol=2e-5, atol=1e-6)
