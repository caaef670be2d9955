"""Whole-decode fused kernel: token/alpha parity vs the XLA greedy decoder
(interpret mode on the CPU mesh; fp32 weights so numerics are exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.decode.greedy import make_greedy_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_decode import make_whole_fused_greedy_decoder
from masters_thesis_tpu.ops.group_layout import GroupLayout


def _build(b=6, n_voxels=48, groups=None, units=16, vocab=40, max_len=5,
           attn=8, gsize=4):
    groups = groups or [np.arange(i * 8, (i + 1) * 8) for i in range(6)]
    layout = GroupLayout(groups, n_voxels)
    model = LcNIC(layout=layout, units=units, group_size=gsize,
                  embedding_text=12, attn_units=attn, vocab_size=vocab,
                  max_length=max_len)
    betas = jax.random.normal(jax.random.PRNGKey(0), (b, n_voxels))
    tokens = jnp.zeros((b, max_len), jnp.int32)
    a0 = jnp.zeros((b, units))
    variables = model.init(jax.random.PRNGKey(1), betas, tokens, a0, a0)
    return model, variables, betas, units, max_len


@pytest.mark.parametrize("batch_tile", [8, 3])
def test_fused_whole_decode_matches_xla(batch_tile):
    model, variables, betas, units, max_len = _build()
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len,
                                            batch_tile=batch_tile)
    words_ref, _, alphas_ref = ref(variables, betas, 1)
    words, alphas = fused(variables, betas, 1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
    np.testing.assert_allclose(np.asarray(alphas), np.asarray(alphas_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_whole_decode_vocab_padding_never_wins():
    # vocab 40 pads to 128; if the -1e30 pad bias were missing, argmax could
    # land in [40, 128) — assert all ids in range
    model, variables, betas, units, max_len = _build(vocab=40)
    fused = make_whole_fused_greedy_decoder(model, units, max_len)
    words, _ = fused(variables, betas, 1)
    assert int(np.max(np.asarray(words))) < 40


def test_fused_whole_decode_ragged_regions():
    # 5 groups (odd region count exercises the region-pad mask)
    groups = [np.arange(i * 8, (i + 1) * 8) for i in range(5)]
    model, variables, betas, units, max_len = _build(
        b=4, n_voxels=40, groups=groups)
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len)
    words_ref, _, alphas_ref = ref(variables, betas, 1)
    words, alphas = fused(variables, betas, 1)
    assert alphas.shape == alphas_ref.shape  # (B, T, 5) — pad stripped
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
    np.testing.assert_allclose(np.asarray(alphas), np.asarray(alphas_ref),
                               rtol=1e-5, atol=1e-6)


def test_captioner_fused_path_matches_xla():
    """Captioner with use_fused=True produces the same captions as the XLA
    greedy decoder (interpret-mode kernel on the CPU mesh)."""
    from masters_thesis_tpu.data.tokenizer import Tokenizer
    from masters_thesis_tpu.serve import Captioner

    model, variables, betas, units, max_len = _build(b=4)
    tok = Tokenizer(num_words=38)
    tok.fit_on_texts(["<start> a b c <end>"] * 3)
    tok.install_pad()

    mk = lambda fused: Captioner(
        model, variables, tok, units, max_len, batch_size=4, use_fused=fused)
    ids_fused = mk(True).caption_ids(np.asarray(betas), decoder="greedy")
    ids_xla = mk(False).caption_ids(np.asarray(betas), decoder="greedy")
    np.testing.assert_array_equal(ids_fused, ids_xla)


# -------------------------------------------------- round-5 family coverage
# (VERDICT r4 item 8: the kernel's family asserts lifted with real support)


def test_fused_whole_decode_learned_init_state():
    """learned_init_state: h0/c0 = MLP(mean(features)) enter the kernel as
    inputs; tokens must match the XLA decoder exactly."""
    model, variables, betas, units, max_len = _build()
    import dataclasses

    model = dataclasses.replace(model, learned_init_state=True)
    tokens = jnp.zeros((betas.shape[0], max_len), jnp.int32)
    a0 = jnp.zeros((betas.shape[0], units))
    variables = model.init(jax.random.PRNGKey(2), betas, tokens, a0, a0)
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len)
    words_ref, _, alphas_ref = ref(variables, betas, 1)
    words, alphas = fused(variables, betas, 1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
    np.testing.assert_allclose(np.asarray(alphas), np.asarray(alphas_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_whole_decode_frozen_glove_table():
    """GloveNIC(trainable=False): the embedding is a module constant, not
    params['embedding'] — the kernel overlays it."""
    import dataclasses

    model, variables, betas, units, max_len = _build()
    rng = np.random.default_rng(5)
    table = rng.standard_normal((40, 12)).astype(np.float32)
    model = dataclasses.replace(
        model, pretrained_embedding=table, embedding_trainable=False)
    tokens = jnp.zeros((betas.shape[0], max_len), jnp.int32)
    a0 = jnp.zeros((betas.shape[0], units))
    variables = model.init(jax.random.PRNGKey(3), betas, tokens, a0, a0)
    assert "embedding" not in variables["params"]
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len)
    words_ref, _, _ = ref(variables, betas, 1)
    words, _ = fused(variables, betas, 1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))


@pytest.mark.parametrize("zero_state", [True, False])
def test_fused_whole_decode_gru_families(zero_state):
    """GRU cell variant (CnnRnn family), incl. the reference's zero-state
    recurrence quirk (CNN_RNN/model.py:103) — reset_after gates, separate
    input/recurrent biases, linear attention/head activations."""
    import dataclasses

    model, _, betas, units, max_len = _build()
    model = dataclasses.replace(
        model, cell_type="gru", gru_zero_state=zero_state,
        head_activation="linear", attn_inner_activation="linear")
    tokens = jnp.zeros((betas.shape[0], max_len), jnp.int32)
    a0 = jnp.zeros((betas.shape[0], units))
    variables = model.init(jax.random.PRNGKey(4), betas, tokens, a0, a0)
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len,
                                            batch_tile=3)
    words_ref, _, alphas_ref = ref(variables, betas, 1)
    words, alphas = fused(variables, betas, 1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
    np.testing.assert_allclose(np.asarray(alphas), np.asarray(alphas_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_whole_decode_frozen_glove_with_padded_vocab():
    """Round-5 review regression: a frozen pretrained table is stored RAW
    at (true_vocab, E); with tpu.vocab_pad_multiple the model's vocab axis
    is wider, and the kernel's overlay must pad the table to vocab_size or
    every downstream pad width disagrees (shape error at trace time)."""
    import dataclasses

    model, _, betas, units, max_len = _build(vocab=48)
    rng = np.random.default_rng(9)
    true_vocab = 40  # table built at the tokenizer's true vocab
    table = rng.standard_normal((true_vocab, 12)).astype(np.float32)
    model = dataclasses.replace(
        model, vocab_size=48, true_vocab=true_vocab,
        pretrained_embedding=table, embedding_trainable=False)
    tokens = jnp.zeros((betas.shape[0], max_len), jnp.int32)
    a0 = jnp.zeros((betas.shape[0], units))
    variables = model.init(jax.random.PRNGKey(6), betas, tokens, a0, a0)
    assert "embedding" not in variables["params"]
    ref = make_greedy_decoder(model, units, max_len)
    fused = make_whole_fused_greedy_decoder(model, units, max_len)
    words_ref, _, _ = ref(variables, betas, 1)
    words, _ = fused(variables, betas, 1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
    assert int(np.max(np.asarray(words))) < true_vocab
