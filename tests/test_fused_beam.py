"""Whole-beam fused kernel: token/score/attention parity vs the XLA beam
decoder (interpret mode on the CPU mesh; fp32 weights so numerics are exact).

The XLA reference (decode/beam.py) itself follows the reference's beam search
(soloist/Modified-Show-And-Tell-Keras/evaluate.py:103-189)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.decode.beam import make_beam_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_beam import make_whole_fused_beam_decoder
from masters_thesis_tpu.ops.group_layout import GroupLayout


def _build(b=6, n_voxels=48, groups=None, units=16, vocab=40, max_len=7,
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


# end ids chosen so beams actually finish (8 and 31 are emitted by this
# fixture's random weights) and so the never-finishing path is also covered
@pytest.mark.parametrize("beam_width,end_id", [(3, 8), (5, 8), (5, 31),
                                               (2, 2)])
def test_fused_beam_matches_xla(beam_width, end_id):
    model, variables, betas, units, max_len = _build()
    ref = make_beam_decoder(model, units, max_len, beam_width=beam_width)
    fused = make_whole_fused_beam_decoder(
        model, units, max_len, beam_width=beam_width, batch_tile=4)
    wr, sr, ar, _, nr = ref(variables, betas, 1, end_id)
    wf, sf, af, _, nf = fused(variables, betas, 1, end_id)
    np.testing.assert_array_equal(np.asarray(wf), np.asarray(wr))
    np.testing.assert_allclose(np.asarray(nf), np.asarray(nr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(af), np.asarray(ar),
                               rtol=1e-5, atol=1e-6)


def test_fused_beam_vocab_padding_never_wins():
    # vocab 40 pads to 128; the -1e30 pad head bias must keep padded ids out
    # of every top-W selection
    model, variables, betas, units, max_len = _build(vocab=40)
    fused = make_whole_fused_beam_decoder(model, units, max_len, beam_width=5)
    wf, _, _, _, _ = fused(variables, betas, 1, 2)
    assert int(np.max(np.asarray(wf))) < 40


def test_fused_beam_ragged_regions():
    # 5 groups (odd region count exercises the region-pad mask in attention)
    groups = [np.arange(i * 8, (i + 1) * 8) for i in range(5)]
    model, variables, betas, units, max_len = _build(
        b=4, n_voxels=40, groups=groups)
    ref = make_beam_decoder(model, units, max_len, beam_width=3)
    fused = make_whole_fused_beam_decoder(model, units, max_len, beam_width=3)
    wr, _, ar, _, _ = ref(variables, betas, 1, 8)
    wf, _, af, _, _ = fused(variables, betas, 1, 8)
    assert af.shape == ar.shape  # (B, T, 5) — region pad stripped
    np.testing.assert_array_equal(np.asarray(wf), np.asarray(wr))
    np.testing.assert_allclose(np.asarray(af), np.asarray(ar),
                               rtol=1e-5, atol=1e-6)


def test_captioner_fused_beam_matches_xla():
    """Captioner with use_fused=True serves beam captions identical to the
    XLA beam decoder (interpret-mode kernel on the CPU mesh)."""
    from masters_thesis_tpu.data.tokenizer import Tokenizer
    from masters_thesis_tpu.serve import Captioner

    model, variables, betas, units, max_len = _build(b=4)
    tok = Tokenizer(num_words=38)
    tok.fit_on_texts(["<start> a b c <end>"] * 3)
    tok.install_pad()

    mk = lambda fused: Captioner(
        model, variables, tok, units, max_len, batch_size=4, use_fused=fused)
    ids_fused = mk(True).caption_ids(np.asarray(betas), decoder="beam")
    ids_xla = mk(False).caption_ids(np.asarray(betas), decoder="beam")
    np.testing.assert_array_equal(ids_fused, ids_xla)


def test_fused_beam_rejects_unsupported_models():
    from masters_thesis_tpu.models.nic import LcNIC

    groups = [np.arange(i * 8, (i + 1) * 8) for i in range(6)]
    layout = GroupLayout(groups, 48)
    gru = LcNIC(layout=layout, units=16, group_size=4, embedding_text=12,
                attn_units=8, vocab_size=40, max_length=5, cell_type="gru")
    with pytest.raises(AssertionError):
        make_whole_fused_beam_decoder(gru, 16, 5)
