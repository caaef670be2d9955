"""Greedy caption decoding as one jitted ``lax.scan``.

Reference: ``greedy_predict_attention`` (AttemptFour/Model/lc_NIC.py:577-638)
— an eager Python loop doing attention → LSTM → softmax → argmax → re-embed
per step, with host round-trips for ``np.argmax``. Here the whole decode
(encode + max_len steps) is a single compiled program batched over captions;
like the reference it always runs ``max_len`` steps (it does not stop at
``<end>`` — downstream eval truncates).

Returns the same artefacts the reference saves from eval.py:147-193: token
ids, raw per-step logits, and attention scores per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def make_greedy_decoder(model, units: int, max_length: int):
    def decode(variables, betas, start_id):
        features = model.apply(variables, betas, False, method="encode")
        bs = betas.shape[0]
        h, c = model.apply(variables, features, method="init_carry")
        tok = jnp.full((bs,), start_id, jnp.int32)

        def step(carry, _):
            h, c, tok = carry
            h, c, logits, alpha = model.apply(
                variables, h, c, features, tok, method="decode_step"
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (h, c, nxt), (nxt, logits, alpha)

        _, (words, logits, alphas) = jax.lax.scan(
            step, (h, c, tok), None, length=max_length
        )
        # scan stacks on axis 0 (time); emit batch-major like the reference
        return (
            jnp.moveaxis(words, 0, 1),    # (B, T)
            jnp.moveaxis(logits, 0, 1),   # (B, T, V)
            jnp.moveaxis(alphas, 0, 1),   # (B, T, R)
        )

    return jax.jit(decode, static_argnames=())


def make_scanned_greedy_decoder(model, units: int, max_length: int,
                                return_logits: bool = False):
    """Serving-throughput variant: decode K stacked batches in ONE device
    call (``lax.scan`` over the batch stack). Per-call dispatch overhead —
    dominant on tunneled/remote TPUs — is amortised across K·B captions.
    ``decode(variables, betas (K, B, D), start_id) -> words (K, B, T)``
    (plus logits when requested — off by default to keep the transfer
    small: (K, B, T, V) is large)."""
    inner = make_greedy_decoder(model, units, max_length)

    def decode(variables, betas, start_id):
        def body(_, b):
            words, logits, _ = inner(variables, b, start_id)
            return 0, (words, logits) if return_logits else words
        _, out = jax.lax.scan(body, 0, betas)
        return out

    return jax.jit(decode)
