"""Batched beam search, fully vectorised and jitted.

Semantics follow the reference's only complete beam search
(soloist/Modified-Show-And-Tell-Keras/evaluate.py:103-189): accumulate
log-probabilities, expand the top-``beam_width`` candidates per step, treat a
beam as finished once it emits ``<end>``, and rank hypotheses by
length-normalised score ``score / len^alpha`` with alpha = 0.7.

Redesign for TPU: instead of the reference's dynamic frontier lists and
shrinking beam (host Python per step, one image at a time), the beam is a
fixed (B, W) lattice scanned for ``max_len`` steps — finished beams are frozen
by forcing a zero-cost ``<pad>`` continuation — so the whole search is one XLA
program batched over the eval set. Token histories are carried with the beams
(re-gathered on every reorder), avoiding host-side back-pointer chasing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


NEG_INF = -1.0e9


def make_scanned_beam_decoder(model, units: int, max_length: int,
                              beam_width: int = 5):
    """Serving-throughput beam variant: K stacked batches per device call
    (see greedy.make_scanned_greedy_decoder). Returns words (K, B, T)."""
    inner = make_beam_decoder(model, units, max_length, beam_width=beam_width)

    def decode(variables, betas, start_id, end_id):
        def body(_, b):
            words, _, _, _, _ = inner(variables, b, start_id, end_id)
            return 0, words
        _, out = jax.lax.scan(body, 0, betas)
        return out

    return jax.jit(decode)


def make_beam_decoder(
    model,
    units: int,
    max_length: int,
    beam_width: int = 5,
    alpha: float = 0.7,
    pad_id: int = 0,
):
    W = beam_width

    def decode(variables, betas, start_id, end_id):
        features = model.apply(variables, betas, False, method="encode")
        B = features.shape[0]

        feat_t = jnp.repeat(features, W, axis=0)  # (B*W, R, D)
        h, c = model.apply(variables, feat_t, method="init_carry")
        tok = jnp.full((B * W,), start_id, jnp.int32)
        # all beams start identical: only beam 0 live at t=0
        scores = jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (W - 1), features.dtype), (B, 1)
        )
        finished = jnp.zeros((B, W), bool)
        lengths = jnp.zeros((B, W), jnp.int32)
        hist = jnp.full((B, W, max_length), pad_id, jnp.int32)
        # attention width from the step signature (trace-only, no FLOPs);
        # attention-free models emit (B, 1) placeholders
        R = jax.eval_shape(
            lambda h_, c_, f_, t_: model.apply(
                variables, h_, c_, f_, t_, method="decode_step"
            )[3],
            h, c, feat_t, tok,
        ).shape[-1]
        # per-step attention, carried and reordered with the beams so the
        # winning hypothesis keeps ITS OWN attention trail (the reference
        # eval saves real attention maps, AttemptFour/eval.py:181-190)
        ahist = jnp.zeros((B, W, max_length, R), features.dtype)

        def scan_step(carry, t):
            h, c, tok, scores, finished, lengths, hist, ahist = carry
            # NOTE: named attn, not alpha — the length-norm exponent in the
            # enclosing scope is also called alpha
            h2, c2, logits, attn = model.apply(
                variables, h, c, feat_t, tok, method="decode_step"
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            V = logp.shape[-1]
            logp = logp.reshape(B, W, V)
            # finished beams may only emit <pad>, at zero cost
            pad_row = jnp.full((V,), NEG_INF, logp.dtype).at[pad_id].set(0.0)
            logp = jnp.where(finished[..., None], pad_row[None, None, :], logp)

            cand = scores[..., None] + logp                   # (B, W, V)
            top_scores, top_idx = jax.lax.top_k(cand.reshape(B, W * V), W)
            beam_src = top_idx // V                           # (B, W)
            new_tok = (top_idx % V).astype(jnp.int32)

            def pick(x):  # reorder per-beam state along chosen sources
                x = x.reshape(B, W, -1)
                return jnp.take_along_axis(x, beam_src[..., None], axis=1)

            h3 = pick(h2).reshape(B * W, units)
            c3 = pick(c2).reshape(B * W, units)
            fin_src = jnp.take_along_axis(finished, beam_src, axis=1)
            len_src = jnp.take_along_axis(lengths, beam_src, axis=1)
            is_end = new_tok == end_id
            new_finished = fin_src | is_end
            # route length counts emitted non-<end> tokens (evaluate.py:164)
            new_lengths = len_src + (~fin_src & ~is_end).astype(jnp.int32)
            hist = jnp.take_along_axis(hist, beam_src[..., None], axis=1)
            hist = hist.at[:, :, t].set(jnp.where(fin_src, pad_id, new_tok))
            # attn was computed for the PRE-reorder beams: select the source
            # beams' attention, zero it once a beam has finished
            attn_b = jnp.take_along_axis(
                attn.reshape(B, W, R), beam_src[..., None], axis=1
            )
            ahist = jnp.take_along_axis(
                ahist, beam_src[..., None, None], axis=1
            )
            ahist = ahist.at[:, :, t, :].set(
                jnp.where(fin_src[..., None], 0.0, attn_b)
            )
            return (
                h3, c3, new_tok.reshape(-1), top_scores, new_finished,
                new_lengths, hist, ahist,
            ), None

        carry = (h, c, tok, scores, finished, lengths, hist, ahist)
        (_, _, _, scores, finished, lengths, hist, ahist), _ = jax.lax.scan(
            scan_step, carry, jnp.arange(max_length)
        )

        # length-normalised ranking: score / len^alpha (evaluate.py:164,186)
        norm = scores / jnp.power(
            jnp.maximum(lengths, 1).astype(scores.dtype), alpha
        )
        best = jnp.argmax(norm, axis=1)
        best_tokens = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0, :]
        best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
        best_alphas = jnp.take_along_axis(
            ahist, best[:, None, None, None], axis=1
        )[:, 0]                                                # (B, T, R)
        return best_tokens, best_scores, best_alphas, hist, norm

    return jax.jit(decode)
