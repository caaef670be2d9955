"""Keras-parity building blocks: initializers, activations, BatchNorm defaults.

The reference relies on Keras defaults whose values differ from flax's; they
matter for seed-fixed parity, so they are pinned here once:

- Dense default kernel init: glorot_uniform; bias zeros
- LSTM: kernel glorot_uniform, recurrent orthogonal, unit forget bias
- BatchNormalization: momentum 0.99, epsilon 1e-3 (flax default is 1e-5)
- LeakyReLU(0.2) used throughout lc_NIC (lc_NIC.py:87,98,142)
- Embedding init RandomUniform(-0.08, 0.08) (lc_NIC.py:108)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import initializers as jinit

glorot_uniform = jinit.glorot_uniform()
glorot_normal = jinit.glorot_normal()
he_normal = jinit.he_normal()
orthogonal = jinit.orthogonal()
zeros = jinit.zeros
uniform_008 = jinit.uniform(scale=0.16)  # shifted below to [-0.08, 0.08]


def embedding_init(key, shape, dtype=jnp.float32):
    """RandomUniform(-0.08, 0.08)."""
    return uniform_008(key, shape, dtype) - 0.08


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


# ---- vocab padding (tensor-parallel meshes; cfg.tpu.vocab_pad_multiple) ----
#
# The reference vocab is top_k+1 = 5001 (AttemptFour/main.py:44), which
# divides no power-of-two mesh axis, so the embedding rows and head columns
# could never shard. Models built with vocab_size rounded up carry
# ``true_vocab`` = the real vocabulary; the padded tail is zero-initialised
# and its logits are masked to -1e9 as the LAST op of the head, so
# exp(pad - max) underflows to exactly 0.0 in fp32: softmax/loss/decode
# numerics and the padded weights' gradients (exactly zero -> Adam update
# exactly zero -> stay zero) match the unpadded model bit-for-bit.

VOCAB_PAD_NEG = -1e9


def pad_zero_rows(init, true_rows: int):
    """Wrap an initializer: rows >= true_rows come out exactly zero."""
    def f(key, shape, dtype=jnp.float32):
        w = init(key, shape, dtype)
        if true_rows and true_rows < shape[0]:
            w = w.at[true_rows:].set(0)
        return w
    return f


def pad_zero_cols(init, true_cols: int):
    """Wrap an initializer: last-axis cols >= true_cols come out zero."""
    def f(key, shape, dtype=jnp.float32):
        w = init(key, shape, dtype)
        if true_cols and true_cols < shape[-1]:
            w = w.at[..., true_cols:].set(0)
        return w
    return f


def mask_padded_vocab(logits, true_vocab: int):
    """-1e9 on padded vocab slots (no-op when true_vocab covers the axis).

    Must be the final head op: masking BEFORE an activation (ThinkAndTell's
    relu head) would zero the mask and let pad slots into the softmax."""
    V = logits.shape[-1]
    if not true_vocab or true_vocab >= V:
        return logits
    pad = jnp.arange(V) >= true_vocab
    return jnp.where(pad, jnp.asarray(VOCAB_PAD_NEG, logits.dtype), logits)


BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3
