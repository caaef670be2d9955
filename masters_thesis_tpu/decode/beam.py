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

Reference-exact frontier semantics (round-4 head-to-head vs the soloist
source algorithm, scripts/reference_headtohead_beam.py):

- **Shrinking frontier.** Once a route emits ``<end>`` the reference stores
  it in ``res`` forever and the live beam narrows (``beam_width -= 1``,
  evaluate.py:167); a finished hypothesis can never be displaced by live
  candidates. The lattice reproduces that by boosting each frozen beam's
  zero-cost ``<pad>`` continuation with a rank-only bonus before ``top_k``
  (subtracted from the selected score afterwards), so frozen beams always
  keep their slot and the live expansion fills exactly the remaining
  ``W - n_finished`` slots — the shrinking frontier, without dynamic shapes.
- **Seed step is unchecked.** The reference's first step seeds the routes
  with the top-W tokens *without* testing for ``<end>`` (evaluate.py:114-127);
  an ``<end>`` seed continues decoding as an ordinary token. The lattice
  matches: ``is_end`` only engages for ``t > 0``.
- **First-iteration finish is discarded.** A route whose very first loop
  expansion is ``<end>`` (our ``t == 1``) is recorded with score ``-inf``
  (evaluate.py:163-166) — kept in the lattice as a frozen ``dead-end`` beam
  whose final normalised score is forced to ``NEG_INF``.
- **Length counting** (evaluate.py:164,186): ``len(route)`` counts emitted
  non-``<end>`` tokens including the seed; the terminal ``<end>``'s log-prob
  IS in the raw score but ``<end>`` is not in the route/length.
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
        deadend = jnp.zeros((B, W), bool)  # finished on first loop iteration
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

        # rank-only bonus that pins finished beams' frozen <pad> continuation
        # above every live candidate in top_k (shrinking frontier,
        # evaluate.py:167); must dominate |NEG_INF| so no live or dead-slot
        # candidate (>= NEG_INF + min logp) can outrank a frozen beam
        BONUS = -2.0 * NEG_INF

        def scan_step(carry, t):
            h, c, tok, scores, finished, deadend, lengths, hist, ahist = carry
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
            # selection keys: frozen beams' <pad> entry boosted so finished
            # hypotheses always keep their slot (reference stores them in
            # `res` forever); true scores recovered after selection
            bonus_row = jnp.zeros((V,), cand.dtype).at[pad_id].set(BONUS)
            keys = cand + finished[..., None] * bonus_row[None, None, :]
            _, top_idx = jax.lax.top_k(keys.reshape(B, W * V), W)
            # exact scores come from cand, NOT keys - BONUS: float32 ulp at
            # |BONUS| ~ 2e9 is 256, which would wipe out the real log-probs
            top_scores = jnp.take_along_axis(
                cand.reshape(B, W * V), top_idx, axis=1
            )
            beam_src = top_idx // V                           # (B, W)
            new_tok = (top_idx % V).astype(jnp.int32)

            def pick(x):  # reorder per-beam state along chosen sources
                x = x.reshape(B, W, -1)
                return jnp.take_along_axis(x, beam_src[..., None], axis=1)

            h3 = pick(h2).reshape(B * W, units)
            c3 = pick(c2).reshape(B * W, units)
            fin_src = jnp.take_along_axis(finished, beam_src, axis=1)
            dead_src = jnp.take_along_axis(deadend, beam_src, axis=1)
            len_src = jnp.take_along_axis(lengths, beam_src, axis=1)
            # the reference's seed step never tests for <end>
            # (evaluate.py:114-127): an <end> seed continues as a normal token
            is_end = (new_tok == end_id) & (t > 0)
            new_finished = fin_src | is_end
            # a first-loop-iteration finish is recorded with score -inf
            # (evaluate.py:163-166): seed + immediate <end> at our t == 1
            new_deadend = dead_src | (is_end & ~fin_src & (t == 1))
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
                new_deadend, new_lengths, hist, ahist,
            ), None

        carry = (h, c, tok, scores, finished, deadend, lengths, hist, ahist)
        (_, _, _, scores, finished, deadend, lengths, hist, ahist), _ = (
            jax.lax.scan(scan_step, carry, jnp.arange(max_length))
        )

        # length-normalised ranking: score / len^alpha (evaluate.py:164,186);
        # dead-end beams (finished on the first loop iteration) rank -inf
        norm = scores / jnp.power(
            jnp.maximum(lengths, 1).astype(scores.dtype), alpha
        )
        norm = jnp.where(deadend, NEG_INF, norm)
        best = jnp.argmax(norm, axis=1)
        best_tokens = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0, :]
        best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
        best_alphas = jnp.take_along_axis(
            ahist, best[:, None, None, None], axis=1
        )[:, 0]                                                # (B, T, R)
        return best_tokens, best_scores, best_alphas, hist, norm

    return jax.jit(decode)
