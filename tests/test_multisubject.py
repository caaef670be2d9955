import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.multisubject import Ms2NIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_train_step


def test_ms2_nic_trains_and_modes_share_params():
    cfg = Config(top_k=30, batch_size=8, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8)
    ga = GroupLayout(synthetic_groups(96, 3, seed=0), 96)
    gb = GroupLayout(synthetic_groups(96, 3, seed=1), 96)
    model = Ms2NIC(
        ga, gb, units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )
    rng = np.random.default_rng(0)
    betas = rng.standard_normal((8, 96)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (8, 5)).astype(np.int32)
    target = np.concatenate([tokens[:, 1:], np.zeros((8, 1), np.int32)], axis=1)

    params, bstats, prng = init_model(model, cfg, betas, tokens)
    # both per-subject encoders exist
    assert "encoder_a" in params["encoder"]
    assert "encoder_b" in params["encoder"]

    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=prng)
    step = make_train_step(model, cfg, lc_nic_l2_rules(cfg), donate=False)
    losses = []
    for _ in range(8):
        state, m = step(
            state, jnp.asarray(betas), jnp.asarray(tokens), jnp.asarray(target)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # eval-mode models (single-subject) reuse the same params
    model_a = Ms2NIC(
        ga, gb, units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length, mode="a",
    )
    feats = model_a.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(betas), False, method="encode",
    )
    assert feats.shape == (8, 3, cfg.group_size)


def test_split_mode_uses_different_encoders():
    cfg = Config(top_k=20, batch_size=4, max_length=4, units=8, attn_units=4,
                 group_size=4, embedding_text=8)
    ga = GroupLayout(synthetic_groups(64, 2, seed=0), 64)
    gb = GroupLayout(synthetic_groups(64, 2, seed=1), 64)
    model = Ms2NIC(ga, gb, units=cfg.units, group_size=cfg.group_size,
                   embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                   vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    rng = np.random.default_rng(0)
    betas = rng.standard_normal((4, 64)).astype(np.float32)
    tokens = np.zeros((4, 4), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    variables = {"params": params, "batch_stats": bstats}
    # same rows through split mode: halves go through different encoders
    same = np.tile(betas[:1], (4, 1))
    feats = model.apply(variables, jnp.asarray(same), False, method="encode")
    assert not np.allclose(np.asarray(feats[0]), np.asarray(feats[2]))
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feats[1]), atol=1e-6)


def test_ms2_nic_sharded_train_step_over_mesh():
    """Multi-subject training under the ('data','model') mesh: the two-encoder
    split-batch model compiles and steps with tp/dp shardings (SURVEY §2.7)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from masters_thesis_tpu.parallel.mesh import make_mesh
    from masters_thesis_tpu.parallel.sharding import (
        batch_sharding,
        make_sharded_train_step,
        shard_params,
    )

    cfg = Config(top_k=30, batch_size=8, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8)
    ga = GroupLayout(synthetic_groups(96, 3, seed=0), 96)
    gb = GroupLayout(synthetic_groups(96, 3, seed=1), 96)
    model = Ms2NIC(
        ga, gb, units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )
    rng = np.random.default_rng(0)
    betas = rng.standard_normal((8, 96)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (8, 5)).astype(np.int32)
    target = np.concatenate([tokens[:, 1:], np.zeros((8, 1), np.int32)], axis=1)

    params, bstats, prng = init_model(model, cfg, betas, tokens)
    state = TrainState.create(params=params, batch_stats=bstats,
                              tx=make_optimizer(cfg), rng=prng)

    mesh = make_mesh(data=4, model=2)
    state = shard_params(state, mesh)
    step = make_sharded_train_step(model, cfg, lc_nic_l2_rules(cfg), mesh, state)
    b_sh = batch_sharding(mesh, with_voxel_axis=True)
    b = jax.device_put(jnp.asarray(betas), b_sh["betas"])
    t = jax.device_put(jnp.asarray(tokens), b_sh["tokens"])
    g = jax.device_put(jnp.asarray(target), b_sh["target"])
    losses = []
    for _ in range(3):
        state, m = step(state, b, t, g)
        losses.append(float(m["loss"]))
    # dropout rng differs per step, so losses fluctuate on a fixed batch —
    # the meaningful check is parity with the unsharded trajectory below
    assert np.isfinite(losses).all()

    # unsharded reference trajectory matches (GSPMD is numerics-preserving
    # up to reduction order)
    params2, bstats2, prng2 = init_model(model, cfg, betas, tokens)
    s2 = TrainState.create(params=params2, batch_stats=bstats2,
                           tx=make_optimizer(cfg), rng=prng2)
    pstep = make_train_step(model, cfg, lc_nic_l2_rules(cfg), donate=False)
    for _ in range(3):
        s2, m2 = pstep(s2, jnp.asarray(betas), jnp.asarray(tokens),
                       jnp.asarray(target))
    np.testing.assert_allclose(losses[-1], float(m2["loss"]), rtol=2e-4)
