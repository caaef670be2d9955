"""Parity against the ACTUAL TF/Keras ops the reference ran on, where TF is
available offline: tokenizer, LSTM/GRU cell numerics with transplanted
weights, the caption-loss recipe, and the Adam + per-tensor-clipnorm
optimizer chain. These pin the 'Keras-exact semantics' claims to the real
implementation rather than to a re-derivation."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from masters_thesis_tpu.data.tokenizer import KERAS_FILTERS, Tokenizer  # noqa: E402


CORPUS = [
    "<start> A man, riding; a red Bicycle! <end>",
    "<start> the cat the cat THE cat sat <end>",
    "<start> ties ties break break by first-seen order <end>",
    "<start> punctuation... stripped? (yes) [ok] <end>",
    "<start> a man and a dog <end>",
]


def test_tokenizer_matches_keras_exactly():
    """word_index, id assignment, num_words/oov mapping — all identical to
    tf.keras.preprocessing.text.Tokenizer (load_avg_betas.py:141-192)."""
    ours = Tokenizer(num_words=12, oov_token="<unk>")
    ours.fit_on_texts(CORPUS)
    theirs = tf.keras.preprocessing.text.Tokenizer(
        num_words=12, oov_token="<unk>", filters=KERAS_FILTERS
    )
    theirs.fit_on_texts(CORPUS)

    assert ours.word_index == theirs.word_index
    assert ours.texts_to_sequences(CORPUS) == theirs.texts_to_sequences(CORPUS)
    # out-of-vocab words at transform time hit the oov id in both
    probe = ["a zebra rides the unknown contraption"]
    assert ours.texts_to_sequences(probe) == theirs.texts_to_sequences(probe)


def test_lstm_cell_matches_keras_with_transplanted_weights():
    """KerasLSTMCell == tf.keras.layers.LSTMCell stepwise (same weights):
    the decoder cell the flagship steps 15x (lc_NIC.py:244-263)."""
    import jax

    from masters_thesis_tpu.models.lstm import KerasLSTMCell

    U, F, B, T = 16, 8, 4, 5
    rng = np.random.default_rng(0)
    cell = KerasLSTMCell(units=U)
    h0 = jnp.zeros((B, U)); c0 = jnp.zeros((B, U))
    x0 = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), (h0, c0), x0)["params"]

    tf_cell = tf.keras.layers.LSTMCell(U)
    tf_cell.build((B, F))
    tf_cell.set_weights([
        np.asarray(params["kernel"]),
        np.asarray(params["recurrent_kernel"]),
        np.asarray(params["bias"]),
    ])

    h, c = h0, c0
    th = tf.zeros((B, U)); tc = tf.zeros((B, U))
    for t in range(T):
        x = rng.standard_normal((B, F)).astype(np.float32)
        (h, c), _ = cell.apply({"params": params}, (h, c), jnp.asarray(x))
        _, (th, tc) = tf_cell(tf.constant(x), [th, tc])
        np.testing.assert_allclose(np.asarray(h), th.numpy(), atol=2e-6)
        np.testing.assert_allclose(np.asarray(c), tc.numpy(), atol=2e-6)


def test_gru_cell_matches_keras_reset_after():
    """KerasGRUCell == tf.keras.layers.GRUCell(reset_after=True), the
    CNN_RNN decoder cell (CNN_RNN/model.py:67-115)."""
    import jax

    from masters_thesis_tpu.models.lstm import KerasGRUCell

    U, F, B, T = 12, 6, 3, 5
    rng = np.random.default_rng(1)
    cell = KerasGRUCell(units=U)
    h0 = jnp.zeros((B, U))
    x0 = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), h0, x0)["params"]

    tf_cell = tf.keras.layers.GRUCell(U, reset_after=True)
    tf_cell.build((B, F))
    tf_cell.set_weights([
        np.asarray(params["kernel"]),
        np.asarray(params["recurrent_kernel"]),
        np.asarray(params["bias"]),
    ])

    h = h0
    th = tf.zeros((B, U))
    for t in range(T):
        x = rng.standard_normal((B, F)).astype(np.float32)
        h, _ = cell.apply({"params": params}, h, jnp.asarray(x))
        th, _ = tf_cell(tf.constant(x), [th])
        np.testing.assert_allclose(np.asarray(h), th.numpy(), atol=2e-6)


def test_caption_loss_matches_keras_cce_recipe():
    """caption_loss == the reference's CategoricalCrossentropy(reduction=
    'none') on softmax outputs + reduce_mean recipe (lc_NIC.py:370-375,
    462-466)."""
    from masters_thesis_tpu.train.losses import caption_loss

    B, T, V = 4, 6, 20
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 3
    targets = rng.integers(0, V, (B, T)).astype(np.int32)

    ours = float(caption_loss(jnp.asarray(logits), jnp.asarray(targets)))

    cce = tf.keras.losses.CategoricalCrossentropy(
        from_logits=False, reduction="none"
    )
    probs = tf.nn.softmax(tf.constant(logits), axis=-1)
    onehot = tf.one_hot(tf.constant(targets), V)
    per_elem = cce(onehot, probs)              # (B, T)
    theirs = float(tf.reduce_mean(per_elem))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_adam_clipnorm_chain_matches_keras():
    """make_optimizer's clipnorm->Adam chain vs tf.keras Adam(clipnorm=...)
    at the reference hyperparameters (main.py:96-104), several steps, grads
    above and below the clip threshold."""
    import optax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.train.optim import make_optimizer

    cfg = Config()
    cfg.alpha = 1e-4
    cfg.beta_1, cfg.beta_2, cfg.epsilon = 0.9, 0.98, 1e-8
    cfg.clipnorm = 0.1
    cfg.optimizer = "adam"

    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    b0 = rng.standard_normal((3,)).astype(np.float32)

    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = tx.init(params)

    tw = tf.Variable(w0)
    tb = tf.Variable(b0)
    opt = tf.keras.optimizers.Adam(
        learning_rate=1e-4, beta_1=0.9, beta_2=0.98, epsilon=1e-8,
        clipnorm=0.1,
    )

    for step in range(5):
        # step 0/2/4: large grads (clip engages); 1/3: tiny grads (no clip)
        scale = 10.0 if step % 2 == 0 else 1e-3
        gw = (rng.standard_normal((5, 3)) * scale).astype(np.float32)
        gb = (rng.standard_normal((3,)) * scale).astype(np.float32)
        updates, state = tx.update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params
        )
        params = optax.apply_updates(params, updates)
        opt.apply_gradients([(tf.constant(gw), tw), (tf.constant(gb), tb)])
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.numpy(), atol=3e-7,
            err_msg=f"step {step}")
        np.testing.assert_allclose(
            np.asarray(params["b"]), tb.numpy(), atol=3e-7,
            err_msg=f"step {step}")
