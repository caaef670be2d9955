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


def test_pipeline_subject_split_batch_layout():
    """subject_split batches are [A-half ; B-half] — the ms2_NIC generator
    contract (data_generator_multisub.py:90-102). A uniformly shuffled batch
    would silently train each per-subject encoder on mixed rows."""
    import numpy as np

    from masters_thesis_tpu.data.pairs import EncodedPairs
    from masters_thesis_tpu.data.pipeline import BatchPipeline

    n = 40
    subjects = np.arange(n, dtype=np.int32) % 2
    pairs = EncodedPairs(
        keys=np.arange(n, dtype=np.int64),
        tokens=np.ones((n, 5), np.int32),
        subjects=subjects,
    )
    pipe = BatchPipeline(pairs, None, batch_size=8, seed=0,
                         subject_split=True, prefetch=0)
    n_batches = 0
    for batch in pipe.epoch():
        subs = subjects[batch["keys"]]
        assert (subs[:4] == subs[0]).all() and (subs[4:] == subs[4]).all()
        assert subs[0] != subs[4]  # the two halves are different subjects
        n_batches += 1
    assert n_batches == pipe.steps_per_epoch == 5  # 20 per subject / 4


def test_pipeline_subject_split_validations():
    import numpy as np
    import pytest

    from masters_thesis_tpu.data.pairs import EncodedPairs
    from masters_thesis_tpu.data.pipeline import BatchPipeline

    one_subject = EncodedPairs(
        keys=np.arange(8, dtype=np.int64),
        tokens=np.ones((8, 5), np.int32),
        subjects=np.zeros(8, np.int32),
    )
    with pytest.raises(ValueError, match="2 subject ids"):
        BatchPipeline(one_subject, None, 4, subject_split=True)
    two = EncodedPairs(
        keys=np.arange(8, dtype=np.int64),
        tokens=np.ones((8, 5), np.int32),
        subjects=np.arange(8, dtype=np.int32) % 2,
    )
    with pytest.raises(ValueError, match="even batch"):
        BatchPipeline(two, None, 3, subject_split=True)


def test_split_checkpoint_restores_into_subject_mode():
    """A per-subject eval model's init tree must carry BOTH encoders so
    split-trained params restore into it."""
    import jax
    import numpy as np

    layout = GroupLayout([np.arange(i * 8, (i + 1) * 8) for i in range(4)], 32)
    kwargs = dict(units=16, group_size=8, embedding_text=16, attn_units=8,
                  vocab_size=30, max_length=4)
    split = Ms2NIC(layout, layout, mode="split", **kwargs)
    mode_a = Ms2NIC(layout, layout, mode="a", **kwargs)
    x = np.zeros((2, 32), np.float32)
    toks = np.zeros((2, 4), np.int32)
    a0 = np.zeros((2, 16), np.float32)
    vs = split.init(jax.random.PRNGKey(0), x, toks, a0, a0, False)
    va = mode_a.init(jax.random.PRNGKey(0), x, toks, a0, a0, False)
    paths = lambda t: set(jax.tree_util.tree_map_with_path(
        lambda p, _: None, t) and
        [jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(t)[0]])
    assert paths(vs["params"]) == paths(va["params"])
    # split-trained params apply cleanly in mode 'a'
    out, _ = mode_a.apply(vs, x, toks, a0, a0, False,
                          mutable=["batch_stats"])
