import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_train_step


def test_bf16_config_runs_and_keeps_fp32_masters():
    """On CPU the bf16 request falls back to fp32 (no BF16 dot support);
    the step must still run and keep fp32 master params either way. The
    true bf16 path is exercised on real TPU by bench.py --bf16."""
    cfg = Config(top_k=30, batch_size=4, max_length=5, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    cfg.tpu.compute_dtype = "bfloat16"
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    rng = np.random.default_rng(0)
    betas = rng.standard_normal((4, 64)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (4, 5)).astype(np.int32)
    target = np.concatenate([tokens[:, 1:], np.zeros((4, 1), np.int32)], 1)
    params, bstats, prng = init_model(model, cfg, betas, tokens)
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=prng)
    step = make_train_step(model, cfg, lc_nic_l2_rules(cfg), donate=False)
    losses = []
    for _ in range(20):
        state, m = step(state, jnp.asarray(betas), jnp.asarray(tokens),
                        jnp.asarray(target))
        losses.append(float(m["loss"]))
    # dropout makes per-step loss noisy; require a clear downward trend
    assert min(losses[-5:]) < losses[0]
    assert all(np.isfinite(losses))
    # master params and BN stats stay fp32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32
