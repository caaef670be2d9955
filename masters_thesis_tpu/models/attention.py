"""Bahdanau attention over brain regions (or image patches).

Parity with the reference (AttemptFour/Model/attention.py:25-44):

    e     = V( dropout( tanh(act(W1 @ features) + act(W2 @ hidden)) ) )
    alpha = softmax(e, axis=regions)                             # (B, R, 1)
    ctx   = sum(alpha * features, regions)

where ``act`` is an INNER activation applied inside W1/W2: every AttemptFour
model constructs the attention with ``activation=LeakyReLU(0.2)`` forwarded
into the two Dense layers via **kwargs (lc_NIC.py:95-102, img_NIC.py:92-99,
ms_NIC/ms2_NIC/glove_NIC/tmp_lc_NIC alike) — verified head-to-head against
the reference source (scripts/reference_headtohead.py, which caught this).
The CNN_RNN attention is the plain textbook form (CNN_RNN/model.py:38-61):
``inner_activation='linear'``. W1/W2 use he_normal + L2(attn_reg) in the
flagship config; V is a default Dense(1) (glorot_uniform, no regulariser).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from masters_thesis_tpu.models.common import he_normal, leaky_relu


class BahdanauAttention(nn.Module):
    units: int
    dropout: float = 0.0
    inner_activation: str = "leaky_relu"  # leaky_relu(0.2) | linear

    @nn.compact
    def __call__(self, hidden, features, training: bool = False):
        """hidden: (B, U) LSTM state; features: (B, R, D).

        Returns (context (B, D), weights (B, R, 1)).
        """
        assert features.ndim == 3, (
            f"attention needs (B, regions, D) features, got {features.shape}"
        )
        assert hidden.ndim == 2 and hidden.shape[0] == features.shape[0]
        # the LSTM carry rides fp32; under a bf16 compute config a raw fp32
        # hidden would promote W2, the scores, and the CONTEXT to fp32 — and
        # the fp32 context then drags the downstream cell input matmul off
        # the bf16 MXU path too. Compute in the features' dtype.
        hidden = hidden.astype(features.dtype)
        w1 = nn.Dense(self.units, kernel_init=he_normal, name="W1")
        w2 = nn.Dense(self.units, kernel_init=he_normal, name="W2")
        v = nn.Dense(1, name="V")

        act = (
            (lambda x: leaky_relu(x, 0.2))
            if self.inner_activation == "leaky_relu"
            else (lambda x: x)
        )
        scores = jnp.tanh(
            act(w1(features)) + act(w2(hidden))[:, None, :]
        )  # (B, R, A)
        scores = nn.Dropout(self.dropout, deterministic=not training)(scores)
        e = v(scores)                                             # (B, R, 1)
        alpha = nn.softmax(e, axis=1)
        context = jnp.sum(alpha * features, axis=1)               # (B, D)
        return context, alpha
