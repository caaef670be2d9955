"""LcNIC — the flagship brain-to-caption model.

TPU-native rebuild of the reference ``lc_NIC.NIC``
(AttemptFour/Model/lc_NIC.py:42-263):

  betas (B, 327k) --LocallyDense--> features (B, R, 32)
  for t < max_len:   context_t = BahdanauAttention(h_t, features)
                     h_{t+1}, c_{t+1} = LSTM([context_t ; emb(word_t)])
  logits = Dense(vocab) (LeakyReLU Dense(256) (h_seq))

Differences from the reference by design:
- the model returns LOGITS; softmax lives in the loss/decoder (numerically
  safer, mathematically identical to the reference's softmax + CCE);
- the whole forward (including the 15-step loop and greedy decode) runs under
  ``jax.jit`` — the reference runs eagerly (main.py:134);
- attention weights are returned as (B, T, R) instead of a Python list.

The per-step ``decode_step`` shares every submodule with the training forward,
so the greedy/beam decode loops (decode/) reuse exactly the trained weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.common import (
    embedding_init,
    glorot_normal,
    leaky_relu,
)
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasLSTMCell
from masters_thesis_tpu.ops.group_layout import GroupLayout


class LcNIC(nn.Module):
    layout: GroupLayout
    units: int = 512
    group_size: int = 32          # per-region embedding dim
    embedding_text: int = 512
    attn_units: int = 32
    vocab_size: int = 5001
    max_length: int = 15
    dropout_input: float = 0.0
    dropout_features: float = 0.2
    dropout_text: float = 0.2
    dropout_attn: float = 0.2
    dropout_lstm: float = 0.2
    dropout_out: float = 0.2

    def setup(self):
        self.encoder = LocallyDense(
            layout=self.layout,
            out_dim=self.group_size,
            dropout=self.dropout_features,
            name="encoder",
        )
        self.attention = BahdanauAttention(
            self.attn_units, dropout=self.dropout_attn, name="attention"
        )
        self.cell = KerasLSTMCell(self.units, name="lstm")
        self.embedding = self.param(
            "embedding", embedding_init, (self.vocab_size, self.embedding_text)
        )
        self.dense_inter = nn.Dense(
            256, kernel_init=glorot_normal, name="dense_inter"
        )
        self.dense_out = nn.Dense(
            self.vocab_size, kernel_init=glorot_normal, name="dense_out"
        )
        self.drop_input = nn.Dropout(self.dropout_input)
        self.drop_text = nn.Dropout(self.dropout_text)
        self.drop_lstm = nn.Dropout(self.dropout_lstm)
        self.drop_out = nn.Dropout(self.dropout_out)

    # ---- pieces ----
    def encode(self, betas, training: bool = False):
        x = self.drop_input(betas, deterministic=not training)
        return self.encoder(x, training=training)  # (B, R, D)

    def embed(self, tokens):
        return jnp.take(self.embedding, tokens, axis=0)

    def head(self, h, training: bool = False):
        """LSTM output -> vocab logits (dense_inter + dense_out)."""
        x = leaky_relu(self.dense_inter(h))
        x = self.drop_out(x, deterministic=not training)
        return self.dense_out(x)

    # ---- training forward (teacher forcing; lc_NIC.call_attention) ----
    def __call__(self, betas, tokens, a0, c0, training: bool = False):
        """Returns (logits (B, T, V), attn (B, T, R))."""
        features = self.encode(betas, training)
        emb = jnp.take(self.embedding, tokens, axis=0)  # (B, T, E)
        emb = self.drop_text(emb, deterministic=not training)

        h, c = a0, c0
        hs, alphas = [], []
        for t in range(self.max_length):
            context, alpha = self.attention(h, features, training=training)
            x = jnp.concatenate([context, emb[:, t, :]], axis=-1)
            (h, c), _ = self.cell((h, c), x)
            hs.append(self.drop_lstm(h, deterministic=not training))
            alphas.append(alpha[..., 0])

        hseq = jnp.stack(hs, axis=1)                    # (B, T, U)
        logits = self.head(hseq, training=training)     # (B, T, V)
        return logits, jnp.stack(alphas, axis=1)        # (B, T, R)

    # ---- single decode step (shared by greedy / beam / sampling) ----
    def decode_step(self, h, c, features, token):
        """One inference step (no dropout). token: (B,) int32.

        Returns (h', c', logits (B, V), alpha (B, R)).
        """
        context, alpha = self.attention(h, features, training=False)
        emb = jnp.take(self.embedding, token, axis=0)
        x = jnp.concatenate([context, emb], axis=-1)
        (h, c), _ = self.cell((h, c), x)
        logits = self.head(h, training=False)
        return h, c, logits, alpha[..., 0]
