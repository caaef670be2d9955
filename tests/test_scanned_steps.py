import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import (
    make_gathered_train_step,
    make_scanned_train_steps,
)


def test_scanned_steps_match_sequential_gathered():
    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8, dropout_features=0.0,
                 dropout_text=0.0, dropout_lstm=0.0, dropout_attn=0.0,
                 dropout_out=0.0)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=12, n_voxels=64, n_groups=3, top_k=cfg.top_k,
        device_resident=True,
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length,
                  dropout_features=0.0, dropout_text=0.0, dropout_attn=0.0,
                  dropout_lstm=0.0, dropout_out=0.0)
    rng = np.random.default_rng(0)
    K, B = 3, cfg.batch_size
    idx = rng.integers(0, 12, (K, B)).astype(np.int32)
    tokens = rng.integers(1, cfg.vocab_size, (K, B, 5)).astype(np.int32)
    target = np.concatenate(
        [tokens[:, :, 1:], np.zeros((K, B, 1), np.int32)], axis=2
    )

    data = store.device_array()
    betas0 = np.asarray(data)[idx[0]]
    params, bstats, prng = init_model(model, cfg, betas0, tokens[0])
    tx = make_optimizer(cfg)

    import jax

    def fresh_state():
        # deep-copy everything: the donating steps delete their input buffers
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TrainState.create(
            params=copy(params), batch_stats=copy(bstats), tx=tx,
            rng=jnp.copy(prng),
        )

    # sequential gathered steps
    s1 = fresh_state()
    gstep = make_gathered_train_step(model, cfg, lc_nic_l2_rules(cfg))
    seq_losses = []
    for k in range(K):
        s1, m = gstep(s1, data, jnp.asarray(idx[k]), jnp.asarray(tokens[k]),
                      jnp.asarray(target[k]))
        seq_losses.append(float(m["loss"]))

    # one scanned call
    s2 = fresh_state()
    sstep = make_scanned_train_steps(model, cfg, lc_nic_l2_rules(cfg))
    s2, metrics = sstep(s2, data, jnp.asarray(idx), jnp.asarray(tokens),
                        jnp.asarray(target))
    scan_losses = np.asarray(metrics["loss"])

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=2e-4, atol=2e-5)
    assert int(s2.step) == K
    # final params agree
    a = np.asarray(s1.params["lstm"]["kernel"])
    b = np.asarray(s2.params["lstm"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_scanned_steps_sam_matches_per_step():
    """SAM in the scanned body produces the same trajectory as the
    per-dispatch SAM step."""
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
    from masters_thesis_tpu.train.steps import (
        make_scanned_train_steps,
        make_train_step,
    )

    # dropout/clipnorm off: Adam on near-zero grads amplifies fp32
    # reassociation noise between the scan and straight-line programs;
    # this test isolates the SAM two-pass logic itself
    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8, sam_rho=0.05, clipnorm=0.0,
                 dropout_input=0.0, dropout_features=0.0, dropout_text=0.0,
                 dropout_lstm=0.0, dropout_attn=0.0, dropout_out=0.0)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=16, n_voxels=64, n_groups=4, top_k=cfg.top_k,
        device_resident=True)
    model = LcNIC(layout=GroupLayout(groups, 64), units=cfg.units,
                  group_size=cfg.group_size, embedding_text=cfg.embedding_text,
                  attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
                  max_length=cfg.max_length)
    data = store.device_array()
    rng = np.random.default_rng(0)
    K, B = 3, cfg.batch_size
    idx = jnp.asarray(rng.integers(0, 16, (K, B)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (K, B, cfg.max_length)),
                       jnp.int32)
    tgts = jnp.concatenate([toks[..., 1:],
                            jnp.zeros((K, B, 1), jnp.int32)], axis=-1)

    params, bstats, prng = init_model(
        model, cfg, np.asarray(data)[np.asarray(idx[0])], np.asarray(toks[0]))
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    s1 = TrainState.create(params=copy(params), batch_stats=copy(bstats),
                           tx=tx, rng=jnp.copy(prng))
    sstep = make_scanned_train_steps(model, cfg, rules)
    s1, m1 = sstep(s1, data, idx, toks, tgts)

    s2 = TrainState.create(params=copy(params), batch_stats=copy(bstats),
                           tx=tx, rng=jnp.copy(prng))
    pstep = make_train_step(model, cfg, rules, donate=False)
    for k in range(K):
        betas = jnp.take(data, idx[k], axis=0)
        s2, m2 = pstep(s2, betas, toks[k], tgts[k])

    np.testing.assert_allclose(
        np.asarray(m1["loss"])[-1], np.asarray(m2["loss"]), rtol=1e-5)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        # atol 2e-5: params whose analytic gradient is exactly zero (the
        # attention V bias — softmax shift invariance) receive Adam updates
        # of sign(roundoff)*lr, which legitimately differ between the scan
        # and straight-line programs; a real SAM logic divergence would show
        # up at ~lr*steps = 3e-4 across many elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tables_scanned_matches_stacked_scanned():
    """The from-tables scanned trainer (device-resident token/target/store-id
    tables + (K,B) pair permutation) is bit-identical to the stacked-batch
    scanned trainer on the batches the permutation selects — the production
    trainer ships only the permutation per epoch."""
    import jax

    from masters_thesis_tpu.train.steps import (
        make_scanned_train_steps_from_tables,
    )

    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=12, n_voxels=64, n_groups=3, top_k=cfg.top_k,
        device_resident=True,
    )
    model = LcNIC(layout=GroupLayout(groups, 64), units=cfg.units,
                  group_size=cfg.group_size, embedding_text=cfg.embedding_text,
                  attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
                  max_length=cfg.max_length)
    rng = np.random.default_rng(7)
    N, T = 20, cfg.max_length
    store_idx = rng.integers(0, 12, N).astype(np.int32)
    tokens = rng.integers(1, cfg.vocab_size, (N, T)).astype(np.int32)
    target = np.concatenate(
        [tokens[:, 1:], np.zeros((N, 1), np.int32)], axis=1)
    K, B = 3, cfg.batch_size
    pair_idx = rng.permutation(N)[: K * B].reshape(K, B).astype(np.int32)

    data = store.device_array()
    params, bstats, prng = init_model(
        model, cfg, np.asarray(data)[store_idx[pair_idx[0]]],
        tokens[pair_idx[0]])
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    s1 = TrainState.create(params=copy(params), batch_stats=copy(bstats),
                           tx=tx, rng=jnp.copy(prng))
    stacked = make_scanned_train_steps(model, cfg, rules)
    s1, m1 = stacked(
        s1, data,
        jnp.asarray(store_idx[pair_idx]),
        jnp.asarray(tokens[pair_idx]),
        jnp.asarray(target[pair_idx]),
    )

    s2 = TrainState.create(params=copy(params), batch_stats=copy(bstats),
                           tx=tx, rng=jnp.copy(prng))
    tabled = make_scanned_train_steps_from_tables(model, cfg, rules)
    s2, m2 = tabled(
        s2, data, jnp.asarray(store_idx), jnp.asarray(tokens),
        jnp.asarray(target), jnp.asarray(pair_idx),
    )

    np.testing.assert_array_equal(np.asarray(m1["loss"]),
                                  np.asarray(m2["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
