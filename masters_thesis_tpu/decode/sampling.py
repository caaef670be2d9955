"""Stochastic (categorical) decoding.

Reference: ``sample_choice`` (lc_NIC.py:571-575) and the stochastic decode in
CNN_RNN/train.py:343-369 (``tf.random.categorical`` on log-probs each step).
Adds temperature and optional top-k restriction (nucleus-style truncation is
what the reference's ``select_nucleus2`` gestured at, lc_NIC.py:694-710).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def make_sampling_decoder(
    model, units: int, max_length: int, temperature: float = 1.0, top_k: int = 0
):
    if temperature <= 0:
        # logits/0 -> inf -> NaN inside categorical: silently garbage.
        # "temperature 0" means greedy — point users at that decoder.
        raise ValueError(
            f"sampling temperature must be > 0, got {temperature} "
            "(for deterministic decoding use the greedy decoder)"
        )
    vocab = getattr(model, "vocab_size", None)
    if top_k < 0 or (vocab and top_k > vocab):
        # a static [:, -top_k] past the vocab edge would IndexError deep
        # inside the jitted scan with an unactionable trace
        raise ValueError(
            f"sampling top_k must be in [0, vocab={vocab}], got {top_k} "
            "(0 samples the full vocabulary)"
        )
    def decode(variables, betas, start_id, rng):
        features = model.apply(variables, betas, False, method="encode")
        bs = betas.shape[0]
        h, c = model.apply(variables, features, method="init_carry")
        tok = jnp.full((bs,), start_id, jnp.int32)

        def step(carry, key):
            h, c, tok = carry
            h, c, logits, _ = model.apply(
                variables, h, c, features, tok, method="decode_step"
            )
            logits = logits / temperature
            if top_k > 0:
                kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            nxt = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
            return (h, c, nxt), nxt

        keys = jax.random.split(rng, max_length)
        _, words = jax.lax.scan(step, (h, c, tok), keys)
        return jnp.moveaxis(words, 0, 1)  # (B, T)

    return jax.jit(decode)
