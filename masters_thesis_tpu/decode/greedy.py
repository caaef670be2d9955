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
