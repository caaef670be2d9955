import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.common import leaky_relu
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasGRUCell, KerasLSTMCell
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.data.synthetic import synthetic_groups


def test_group_layout_buckets_cover_all_groups():
    groups = synthetic_groups(n_voxels=1000, n_groups=10, seed=1)
    layout = GroupLayout(groups, n_voxels=1000)
    assert layout.n_groups == 10
    covered = sorted(
        g for b in layout.buckets for g in b.group_ids.tolist()
    )
    assert covered == list(range(10))
    # every real index appears exactly once; padding points at n_voxels
    all_idx = np.concatenate([b.indices.reshape(-1) for b in layout.buckets])
    real = all_idx[all_idx < 1000]
    assert sorted(real.tolist()) == list(range(1000))


def test_locally_dense_matches_naive_per_group():
    """Bucketed einsum == per-group ragged matmul (reference layers.py:43-52)."""
    n_voxels, n_groups, out_dim, bs = 300, 5, 8, 4
    groups = synthetic_groups(n_voxels, n_groups, seed=3)
    layout = GroupLayout(groups, n_voxels)
    model = LocallyDense(layout=layout, out_dim=out_dim, dropout=0.0, use_bn=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((bs, n_voxels)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    out = model.apply(variables, x, training=False)
    assert out.shape == (bs, n_groups, out_dim)

    # naive recomputation from the same padded kernels
    params = variables["params"]
    expected = np.zeros((bs, n_groups, out_dim), np.float32)
    for b, bucket in enumerate(layout.buckets):
        w = np.asarray(params[f"kernel_{b}"])
        bias = np.asarray(params[f"bias_{b}"])
        for row, gid in enumerate(bucket.group_ids):
            g = np.asarray(groups[gid])
            xg = np.asarray(x)[:, g]
            y = xg @ w[row, : len(g)] + bias[row]
            expected[:, gid] = np.where(y >= 0, y, 0.2 * y)
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)


def test_locally_dense_padded_weights_zero_and_zero_grad():
    groups = [np.arange(0, 100), np.arange(100, 230)]
    layout = GroupLayout(groups, 230)
    model = LocallyDense(layout=layout, out_dim=4, dropout=0.0, use_bn=False)
    x = jnp.ones((2, 230))
    variables = model.init(jax.random.PRNGKey(1), x, training=False)
    for b, bucket in enumerate(layout.buckets):
        w = np.asarray(variables["params"][f"kernel_{b}"])
        for row in range(w.shape[0]):
            assert np.all(w[row, bucket.sizes[row]:] == 0.0)

    def loss(p):
        return model.apply({"params": p}, x, training=False).sum()

    grads = jax.grad(loss)(variables["params"])
    for b, bucket in enumerate(layout.buckets):
        g = np.asarray(grads[f"kernel_{b}"])
        for row in range(g.shape[0]):
            assert np.all(g[row, bucket.sizes[row]:] == 0.0)


def test_lstm_cell_semantics():
    """Check i|f|c|o packing and unit forget bias against a hand computation."""
    cell = KerasLSTMCell(units=3)
    x = jnp.ones((2, 4))
    h = jnp.zeros((2, 3))
    c = jnp.zeros((2, 3))
    variables = cell.init(jax.random.PRNGKey(0), (h, c), x)
    p = variables["params"]
    assert p["kernel"].shape == (4, 12)
    assert p["recurrent_kernel"].shape == (3, 12)
    b = np.asarray(p["bias"])
    np.testing.assert_array_equal(b[3:6], 1.0)  # forget slice
    assert np.all(b[:3] == 0) and np.all(b[6:] == 0)

    (h1, c1), out = cell.apply(variables, (h, c), x)
    k, r, bias = np.asarray(p["kernel"]), np.asarray(p["recurrent_kernel"]), b
    z = np.asarray(x) @ k + np.asarray(h) @ r + bias
    i_, f_, g_, o_ = np.split(z, 4, axis=-1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    c_ref = sig(f_) * 0 + sig(i_) * np.tanh(g_)
    h_ref = sig(o_) * np.tanh(c_ref)
    np.testing.assert_allclose(h1, h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c1, c_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out, h_ref, rtol=1e-5, atol=1e-6)


def test_gru_cell_shapes():
    cell = KerasGRUCell(units=5)
    x = jnp.ones((2, 7))
    h = jnp.zeros((2, 5))
    variables = cell.init(jax.random.PRNGKey(0), h, x)
    h1, out = cell.apply(variables, h, x)
    assert h1.shape == (2, 5)
    np.testing.assert_allclose(h1, out)


def test_attention_weights_sum_to_one_and_context():
    attn = BahdanauAttention(units=6, dropout=0.0)
    hidden = jnp.asarray(np.random.default_rng(0).standard_normal((3, 8)), jnp.float32)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal((3, 11, 4)), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), hidden, feats)
    ctx, alpha = attn.apply(variables, hidden, feats)
    assert ctx.shape == (3, 4)
    assert alpha.shape == (3, 11, 1)
    np.testing.assert_allclose(alpha.sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        ctx, (alpha * feats).sum(axis=1), rtol=1e-5, atol=1e-6
    )


def test_leaky_relu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(leaky_relu(x), [-0.2, 0.0, 2.0])


def test_cosine_decay_schedule_in_optimizer():
    """ThinkAndTell SGD+CosineDecay parity: the LR follows a cosine curve
    (optionally after linear warmup), observable in parameter updates."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.train.optim import make_optimizer

    # Adam update magnitude ~= lr for a constant gradient, so the cosine
    # curve is directly observable (SGD momentum would confound it)
    cfg = Config(optimizer="Adam", alpha=0.1, clipnorm=0.0)
    cfg.cosine_decay_steps = 10
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    lrs = []
    for _ in range(12):
        updates, state = tx.update(grads, state, params)
        lrs.append(-float(np.asarray(updates["w"])[0]))
        params = optax.apply_updates(params, updates)
    assert abs(lrs[0] - 0.1) < 1e-2
    assert lrs[5] < lrs[1] < lrs[0] + 1e-9
    assert lrs[10] < 1e-3  # fully decayed at decay_steps
    # warmup + cosine composition ramps from 0 first
    cfg2 = Config(optimizer="Adam", alpha=0.1, clipnorm=0.0, warmup_steps=5)
    cfg2.cosine_decay_steps = 10
    tx2 = make_optimizer(cfg2)
    s2 = tx2.init({"w": jnp.ones(3)})
    u2, s2 = tx2.update({"w": jnp.ones(3)}, s2, {"w": jnp.ones(3)})
    assert abs(float(np.asarray(u2["w"])[0])) < 0.05  # warming up from 0


def test_deep_locally_dense_per_region_init_scale():
    """The (G, D, D) deep kernels are a batch of independent per-region
    Dense layers: init must see fan_in = D (std ~ sqrt(2/D)), not D*G —
    plain he_normal folded G into the receptive field, landing ~sqrt(G)x
    too small vs the reference's per-region Dense(he_normal) stacks
    (deep_layers.py)."""
    from masters_thesis_tpu.models.encoders import DeepLocallyDense

    n_voxels, G, D = 512, 64, 32
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=G, seed=0)
    enc = DeepLocallyDense(
        layout=GroupLayout(groups, n_voxels), out_dim=D, depth=2, name="enc"
    )
    x = jnp.zeros((2, n_voxels), jnp.float32)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, training=False,
    )
    w = np.asarray(variables["params"]["kernel1"])
    assert w.shape == (G, D, D)
    expected = np.sqrt(2.0 / D)
    assert abs(float(w.std()) - expected) < 0.15 * expected, float(w.std())


def test_nic_remat_matches_baseline_step():
    """cfg.tpu.remat=True (jax.checkpoint on the decoder timestep) changes
    memory, not numerics: one train step produces identical loss and
    params with and without it."""
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_train_step

    cfg = Config(batch_size=4, max_length=6, top_k=40, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    n_voxels = 64
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=4, seed=0)
    layout = GroupLayout(groups, n_voxels)
    kw = dict(units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    base = LcNIC(layout=layout, **kw)
    rematted = LcNIC(layout=layout, remat=True, **kw)

    rng = np.random.default_rng(0)
    betas = jnp.asarray(rng.standard_normal((4, n_voxels)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, cfg.max_length)),
                         jnp.int32)
    target = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, cfg.max_length)),
                         jnp.int32)
    params, bstats, prng = init_model(base, cfg, betas, tokens)
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)

    def run(model):
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState.create(params=copy(params),
                                  batch_stats=copy(bstats), tx=tx,
                                  rng=jnp.copy(prng))
        step = make_train_step(model, cfg, rules, donate=False)
        return step(state, betas, tokens, target)

    s0, m0 = run(base)
    s1, m1 = run(rematted)
    np.testing.assert_allclose(np.asarray(m0["loss"]), np.asarray(m1["loss"]),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        s0.params, s1.params,
    )
