"""Parity against the ACTUAL TF/Keras ops the reference ran on, where TF is
available offline: tokenizer, LSTM/GRU cell numerics with transplanted
weights, the caption-loss recipe, and the Adam + per-tensor-clipnorm
optimizer chain. These pin the 'Keras-exact semantics' claims to the real
implementation rather than to a re-derivation."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
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


def _convert_and_load(keras_model, convert_fn, flax_model, x, tmp_path):
    import jax

    import numpy as np

    from masters_thesis_tpu.models import backbones

    flat = convert_fn(keras_model)
    path = str(tmp_path / "w.npz")
    np.savez(path, **flat)
    try:
        variables = flax_model.init(jax.random.PRNGKey(0), x[:1], False)
    except TypeError:  # no train flag (VGG16 has no BatchNorm)
        variables = flax_model.init(jax.random.PRNGKey(0), x[:1])
    variables = backbones.load_npz_variables(dict(variables), path)
    # every converted array must have landed somewhere (no silent drops)
    import flax as flaxlib

    pflat = flaxlib.traverse_util.flatten_dict(variables["params"], sep="/")
    sflat = flaxlib.traverse_util.flatten_dict(
        variables.get("batch_stats", {}), sep="/")
    for k in flat:
        if k.startswith("stats/"):
            assert k[len("stats/"):] in sflat, f"unmapped stat {k}"
        else:
            assert k in pflat, f"unmapped param {k}"
    return variables


def test_vgg16_graph_matches_keras(tmp_path):
    """Full-graph parity: random keras VGG16 weights transplanted through
    the converter reproduce keras's fc2/conv5/logits exactly
    (CNN/feature_extractor.py's model, run natively)."""
    from masters_thesis_tpu.models.backbones import VGG16
    from scripts.convert_keras_backbone import convert_vgg16

    keras_model = tf.keras.applications.VGG16(weights=None)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    variables = _convert_and_load(
        keras_model, convert_vgg16, VGG16(include_top=True), x, tmp_path)
    ours = VGG16(include_top=True).apply(variables, jnp.asarray(x))

    # keras's predictions layer applies softmax; ours emits raw logits
    theirs_probs = keras_model(tf.constant(x), training=False).numpy()
    ours_probs = np.asarray(jax.nn.softmax(ours["logits"], axis=-1))
    np.testing.assert_allclose(ours_probs, theirs_probs, atol=1e-5)

    fc2 = tf.keras.Model(keras_model.input,
                         keras_model.get_layer("fc2").output)
    # keras applies relu inside the fc2 layer
    np.testing.assert_allclose(
        np.asarray(ours["fc2"]),
        fc2(tf.constant(x), training=False).numpy(), atol=1e-4)
    conv5 = tf.keras.Model(keras_model.input,
                           keras_model.get_layer("block5_conv3").output)
    np.testing.assert_allclose(
        np.asarray(ours["conv5"]).reshape(2, 14, 14, 512),
        conv5(tf.constant(x), training=False).numpy(), atol=1e-4)


def test_inception_v3_graph_matches_keras(tmp_path):
    """Full-graph parity for the CNN_RNN feature extractor: the by-order
    converted keras InceptionV3 reproduces the (64, 2048) patches and
    logits through all 94 ConvBN layers, reductions, and mixed blocks."""
    from masters_thesis_tpu.models.inception import InceptionV3
    from scripts.convert_keras_backbone import convert_inception_v3

    keras_model = tf.keras.applications.InceptionV3(weights=None)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32)

    variables = _convert_and_load(
        keras_model, convert_inception_v3, InceptionV3(include_top=True),
        x, tmp_path)
    ours = InceptionV3(include_top=True).apply(variables, jnp.asarray(x))

    mixed10 = tf.keras.Model(keras_model.input,
                             keras_model.get_layer("mixed10").output)
    theirs_patches = mixed10(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(
        np.asarray(ours["patches"]).reshape(2, 8, 8, 2048),
        theirs_patches, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(ours["logits"], axis=-1)),
        keras_model(tf.constant(x), training=False).numpy(), atol=1e-5)


def test_efficientnet_b0_graph_matches_keras(tmp_path):
    """Full-graph parity for the ENB* extractor family (B0 is the smallest;
    the converter mapping is variant-independent). Keras bakes the
    rescale+normalize preprocessing into the model, so it gets raw [0,255]
    pixels while the flax graph gets preprocess()'d input."""
    from masters_thesis_tpu.models.efficientnet import efficientnet, preprocess
    from scripts.convert_keras_backbone import convert_efficientnet

    keras_model = tf.keras.applications.EfficientNetB0(weights=None)
    rng = np.random.default_rng(2)
    raw = rng.uniform(0, 255, (2, 224, 224, 3)).astype(np.float32)
    x = preprocess(raw)

    model, _res = efficientnet("b0", include_top=True)
    variables = _convert_and_load(
        keras_model, convert_efficientnet, model, x, tmp_path)
    ours = model.apply(variables, jnp.asarray(x))
    theirs = keras_model(tf.constant(raw), training=False).numpy()
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(ours["logits"], axis=-1)), theirs,
        atol=1e-5)


def test_resnet_torch_state_dict_mapping(tmp_path):
    """convert_resnet_state_dict maps every torchvision resnet50 key into
    the flax v1.5 tree with the right transposes (numerics not comparable
    here — torchvision isn't in the image — but every leaf must land)."""
    import functools

    import jax

    from masters_thesis_tpu.models import backbones
    from masters_thesis_tpu.models.resnet import resnet
    from scripts.convert_keras_backbone import convert_resnet_state_dict

    m = resnet("resnet50", include_top=True)
    shapes = jax.eval_shape(
        functools.partial(m.init, train=False), jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32))

    import flax as flaxlib

    pflat = flaxlib.traverse_util.flatten_dict(shapes["params"], sep="/")
    sflat = flaxlib.traverse_util.flatten_dict(shapes["batch_stats"], sep="/")

    # fabricate a torchvision-shaped state_dict from our tree (inverse maps)
    state = {}
    for k, v in pflat.items():
        parts = k.split("/")
        if parts[-1] == "kernel" and parts[-2] == "conv":
            h, w, i, o = v.shape
            tk = {"stem": "conv1"}.get(parts[0], None)
            if tk is None:
                s, b = parts[0].removeprefix("layer").split("_")
                inner = parts[1]
                tk = (f"layer{s}.{b}.downsample.0" if inner == "downsample"
                      else f"layer{s}.{b}.{inner}")
            state[f"{tk}.weight"] = np.zeros((o, i, h, w), np.float32)
        elif parts[-2] == "bn":
            s0 = parts[0]
            tk = ("bn1" if s0 == "stem" else None)
            if tk is None:
                s, b = s0.removeprefix("layer").split("_")
                inner = parts[1]
                tk = (f"layer{s}.{b}.downsample.1" if inner == "downsample"
                      else f"layer{s}.{b}.bn{inner.removeprefix('conv')}")
            name = {"scale": "weight", "bias": "bias"}[parts[-1]]
            state[f"{tk}.{name}"] = np.zeros(v.shape, np.float32)
            state[f"{tk}.running_mean"] = np.zeros(v.shape, np.float32)
            state[f"{tk}.running_var"] = np.ones(v.shape, np.float32)
        elif parts[0] == "predictions":
            if parts[-1] == "kernel":
                state["fc.weight"] = np.zeros(
                    (v.shape[1], v.shape[0]), np.float32)
            else:
                state["fc.bias"] = np.zeros(v.shape, np.float32)

    flat = convert_resnet_state_dict(state)
    path = str(tmp_path / "rn.npz")
    np.savez(path, **flat)
    for k in flat:
        if k.startswith("stats/"):
            assert k[len("stats/"):] in sflat, f"unmapped stat {k}"
            assert flat[k].shape == sflat[k[len("stats/"):]].shape, k
        else:
            assert k in pflat, f"unmapped param {k}"
            assert flat[k].shape == pflat[k].shape, k
    # full coverage: every param/stat leaf received a value
    assert len(flat) == len(pflat) + len(sflat)


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
