"""Bahdanau attention over brain regions (or image patches).

Parity with the reference (AttemptFour/Model/attention.py:25-44):

    e     = V( dropout( tanh(W1 @ features + W2 @ hidden) ) )   # (B, R, 1)
    alpha = softmax(e, axis=regions)
    ctx   = sum(alpha * features, regions)

W1/W2 use he_normal + L2(attn_reg) in the flagship config (lc_NIC.py:95-102);
V is a default Dense(1) (glorot_uniform, no regulariser).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from masters_thesis_tpu.models.common import he_normal


class BahdanauAttention(nn.Module):
    units: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, hidden, features, training: bool = False):
        """hidden: (B, U) LSTM state; features: (B, R, D).

        Returns (context (B, D), weights (B, R, 1)).
        """
        assert features.ndim == 3, (
            f"attention needs (B, regions, D) features, got {features.shape}"
        )
        assert hidden.ndim == 2 and hidden.shape[0] == features.shape[0]
        w1 = nn.Dense(self.units, kernel_init=he_normal, name="W1")
        w2 = nn.Dense(self.units, kernel_init=he_normal, name="W2")
        v = nn.Dense(1, name="V")

        scores = jnp.tanh(w1(features) + w2(hidden)[:, None, :])  # (B, R, A)
        scores = nn.Dropout(self.dropout, deterministic=not training)(scores)
        e = v(scores)                                             # (B, R, 1)
        alpha = nn.softmax(e, axis=1)
        context = jnp.sum(alpha * features, axis=1)               # (B, D)
        return context, alpha
