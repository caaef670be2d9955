"""Parity for the fused train-side sequence step (ops/fused_seq.py):
forward AND gradients must match jax.grad of the production nn.scan model
(eval-mode numerics) for both backends — the custom VJP restructures the
backward (stacked weight-grad einsums, no in-loop accumulators), so any
algebra slip shows up here as a gradient mismatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_seq import make_fused_forward_loss
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import caption_loss
from masters_thesis_tpu.train.state import init_model


def _setup(seed=0):
    cfg = Config(batch_size=6, max_length=7, top_k=200, units=24,
                 attn_units=8, group_size=4, embedding_text=16)
    n_voxels, n_groups = 192, 6
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=n_groups, seed=0)
    model = LcNIC(
        layout=GroupLayout(groups, n_voxels=n_voxels),
        units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
        # eval-mode comparison: dropout rates irrelevant (training=False)
    )
    rng = np.random.default_rng(seed)
    betas = jnp.asarray(rng.standard_normal((6, n_voxels)), jnp.float32)
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (6, cfg.max_length)), jnp.int32)
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((6, 1), jnp.int32)], axis=1)
    params, batch_stats, _ = init_model(model, cfg, betas, tokens)
    return model, cfg, params, batch_stats, betas, tokens, target


def _reference_loss(model, cfg, batch_stats):
    def fn(params, betas, tokens, target):
        a0 = jnp.zeros((betas.shape[0], cfg.units), betas.dtype)
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            betas, tokens, a0, a0, training=False)
        return caption_loss(logits, target)
    return fn


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fused_seq_matches_scan_forward_and_grads(backend):
    model, cfg, params, batch_stats, betas, tokens, target = _setup()
    ref = _reference_loss(model, cfg, batch_stats)
    raw = make_fused_forward_loss(model, cfg, backend=backend,
                                  batch_tile=4)
    fused = lambda p, b, tk, tg: raw(p, b, tk, tg, batch_stats=batch_stats)

    l_ref = float(ref(params, betas, tokens, target))
    l_fused = float(fused(params, betas, tokens, target))
    assert abs(l_ref - l_fused) < 1e-5, (l_ref, l_fused)

    g_ref = jax.grad(ref)(params, betas, tokens, target)
    g_fused = jax.grad(fused)(params, betas, tokens, target)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = {tuple(str(k) for k in p): v
                  for p, v in jax.tree_util.tree_leaves_with_path(g_fused)}
    checked = 0
    for path, ref_leaf in flat_ref:
        key = tuple(str(k) for k in path)
        got = flat_fused[key]
        scale = max(1.0, float(jnp.max(jnp.abs(ref_leaf))))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_leaf), atol=2e-5 * scale,
            err_msg=str(key))
        checked += 1
    # every param got a gradient through the fused path: encoder (via
    # d_features/d_pre), attention W1 (via d_pre), W2/V, LSTM, embedding
    # (via d_emb), head
    assert checked == len(flat_fused) and checked >= 10


def test_fused_seq_grad_wrt_inputs_matches():
    """d_loss/d_betas closes through the custom VJP's d_features + d_pre
    into the encoder — the path a trainer's encoder gradients ride."""
    model, cfg, params, batch_stats, betas, tokens, target = _setup(seed=3)
    ref = _reference_loss(model, cfg, batch_stats)
    raw = make_fused_forward_loss(model, cfg, backend="xla")
    fused = lambda p, b, tk, tg: raw(p, b, tk, tg, batch_stats=batch_stats)
    db_ref = jax.grad(ref, argnums=1)(params, betas, tokens, target)
    db_fused = jax.grad(fused, argnums=1)(params, betas, tokens, target)
    np.testing.assert_allclose(
        np.asarray(db_fused), np.asarray(db_ref), atol=1e-6)


def test_fused_train_step_matches_production_no_dropout():
    """cfg.tpu.fused_seq routes train.steps through the custom VJP; with
    every dropout rate at 0 the optimisation trajectory must match the
    autodiff-scan trainer step for step."""
    import dataclasses

    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState
    from masters_thesis_tpu.train.steps import make_train_step

    cfg = Config(batch_size=6, max_length=7, top_k=200, units=24,
                 attn_units=8, group_size=4, embedding_text=16,
                 dropout_features=0.0, dropout_text=0.0, dropout_attn=0.0,
                 dropout_lstm=0.0, dropout_out=0.0)
    n_voxels, n_groups = 192, 6
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=n_groups, seed=0)
    model = LcNIC(
        layout=GroupLayout(groups, n_voxels=n_voxels),
        units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
        dropout_features=0.0, dropout_text=0.0, dropout_attn=0.0,
        dropout_lstm=0.0, dropout_out=0.0, dropout_input=0.0)
    rng = np.random.default_rng(0)
    betas = jnp.asarray(rng.standard_normal((6, n_voxels)), jnp.float32)
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (6, cfg.max_length)), jnp.int32)
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((6, 1), jnp.int32)], axis=1)
    params, bstats, prng = init_model(model, cfg, betas, tokens)
    rules = lc_nic_l2_rules(cfg)

    def run(cfg_run):
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        st = TrainState.create(params=copy(params), batch_stats=copy(bstats),
                               tx=make_optimizer(cfg_run), rng=jnp.copy(prng))
        step = make_train_step(model, cfg_run, rules, donate=False)
        out = []
        for _ in range(3):
            st, m = step(st, betas, tokens, target)
            out.append(float(m["loss"]))
        return out, st

    cfg_fused = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, fused_seq=True))
    losses_ref, st_ref = run(cfg)
    losses_fused, st_fused = run(cfg_fused)
    np.testing.assert_allclose(losses_fused, losses_ref, atol=2e-5)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(st_ref.params),
        jax.tree_util.tree_leaves_with_path(st_fused.params),
    ):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=5e-5, err_msg=str(p1))


def test_fused_train_step_dropout_deterministic_and_active():
    """With dropout on, the fused step is deterministic given the state rng
    and actually drops (loss differs from the dropout-off forward); masks
    regenerated in the backward keep grads consistent (finite, nonzero)."""
    import dataclasses

    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.ops.fused_seq import make_train_forward_loss

    cfg = Config(batch_size=5, max_length=6, top_k=150, units=16,
                 attn_units=8, group_size=4, embedding_text=12)
    n_voxels = 128
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=4, seed=1)
    model = LcNIC(
        layout=GroupLayout(groups, n_voxels=n_voxels),
        units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
        dropout_attn=0.5, dropout_text=0.3, dropout_lstm=0.3,
        dropout_out=0.3)
    rng = np.random.default_rng(2)
    betas = jnp.asarray(rng.standard_normal((5, n_voxels)), jnp.float32)
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (5, cfg.max_length)), jnp.int32)
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((5, 1), jnp.int32)], axis=1)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    fwd = make_train_forward_loss(model, cfg, lc_nic_l2_rules(cfg))

    k = jax.random.PRNGKey(7)
    t1, _ = fwd(params, bstats, k, betas, tokens, target)
    t2, _ = fwd(params, bstats, k, betas, tokens, target)
    t3, _ = fwd(params, bstats, jax.random.PRNGKey(8), betas, tokens, target)
    assert float(t1) == float(t2)          # deterministic in the key
    assert float(t1) != float(t3)          # masks actually vary

    grads = jax.grad(
        lambda p: fwd(p, bstats, k, betas, tokens, target)[0])(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
