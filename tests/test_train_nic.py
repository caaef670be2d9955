import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.pairs import encode_pairs
from masters_thesis_tpu.data.pipeline import BatchPipeline
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules, l2_loss
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Config(
        run="test", top_k=60, batch_size=8, max_length=8, units=32,
        attn_units=8, group_size=4, embedding_text=16, epochs=1,
    )
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=24, n_voxels=256, n_groups=6, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, n_voxels=256)
    model = LcNIC(
        layout=layout,
        units=cfg.units,
        group_size=cfg.group_size,
        embedding_text=cfg.embedding_text,
        attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size,
        max_length=cfg.max_length,
    )
    enc = encode_pairs(pairs["train"], tok, max_len=cfg.max_length)
    pipe = BatchPipeline(enc, store, batch_size=cfg.batch_size, seed=0, prefetch=0)
    batch = next(iter(pipe.epoch()))
    params, batch_stats, rng = init_model(
        model, cfg, batch["betas"], batch["tokens"]
    )
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx, rng=rng)
    return cfg, model, state, pipe


def test_forward_shapes(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    batch = next(iter(pipe.epoch()))
    a0 = jnp.zeros((cfg.batch_size, cfg.units))
    logits, alphas = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["betas"]),
        jnp.asarray(batch["tokens"]),
        a0,
        a0,
        training=False,
    )
    assert logits.shape == (cfg.batch_size, cfg.max_length, cfg.vocab_size)
    assert alphas.shape == (cfg.batch_size, cfg.max_length, 6)
    np.testing.assert_allclose(np.asarray(alphas.sum(-1)), 1.0, rtol=1e-4)


def test_train_step_reduces_loss(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    rules = lc_nic_l2_rules(cfg)
    step = make_train_step(model, cfg, rules, donate=False)
    batch = next(iter(pipe.epoch()))
    betas, tokens, target = (
        jnp.asarray(batch["betas"]),
        jnp.asarray(batch["tokens"]),
        jnp.asarray(batch["target"]),
    )
    losses = []
    for _ in range(15):
        state, metrics = step(state, betas, tokens, target)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert int(state.step) == 15


def test_batch_stats_update(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    rules = lc_nic_l2_rules(cfg)
    step = make_train_step(model, cfg, rules, donate=False)
    batch = next(iter(pipe.epoch()))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    state2, _ = step(
        state,
        jnp.asarray(batch["betas"]),
        jnp.asarray(batch["tokens"]),
        jnp.asarray(batch["target"]),
    )
    after = jax.tree_util.tree_leaves(state2.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_eval_step_runs(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    rules = lc_nic_l2_rules(cfg)
    estep = make_eval_step(model, cfg, rules)
    batch = next(iter(pipe.epoch()))
    metrics = estep(
        state,
        jnp.asarray(batch["betas"]),
        jnp.asarray(batch["tokens"]),
        jnp.asarray(batch["target"]),
    )
    for k in ("loss", "L2", "accuracy", "attention"):
        assert np.isfinite(float(metrics[k]))


def test_l2_rules_cover_expected_leaves(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    rules = lc_nic_l2_rules(cfg)
    val = float(l2_loss(state.params, rules))
    assert val > 0
    # embedding and attention V must NOT be regularised
    p = state.params
    only_v = {"attention": {"V": p["attention"]["V"]}}
    assert float(l2_loss(only_v, rules)) == 0.0
    only_emb = {"embedding": p["embedding"]}
    assert float(l2_loss(only_emb, rules)) == 0.0


def test_sam_step_runs(tiny_setup):
    cfg, model, state, pipe = tiny_setup
    import dataclasses

    sam_cfg = dataclasses.replace(cfg, sam_rho=0.05)
    rules = lc_nic_l2_rules(sam_cfg)
    step = make_train_step(model, sam_cfg, rules, donate=False)
    batch = next(iter(pipe.epoch()))
    state2, metrics = step(
        state,
        jnp.asarray(batch["betas"]),
        jnp.asarray(batch["tokens"]),
        jnp.asarray(batch["target"]),
    )
    assert np.isfinite(float(metrics["loss"]))
