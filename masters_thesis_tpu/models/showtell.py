"""ShowTell — the Vinyals Show-and-Tell family (no attention).

Covers four reference generations with one module (SURVEY.md §2.2-2.5):

- ThinkAndTell (ThinkAndTell/model.py): Dense-tanh encoder over betas
  (full / visual-cortex-masked / PCA-5000), LSTM decoder primed with the
  feature vector as the first input, masked SCCE loss, relu vocab head.
- ShowAndTell (ShowAndTell/model.py:10-75): same on VGG16 fc features.
- soloist Modified-Show-And-Tell (soloist/.../NIC.py:29-113): the Keras-
  functional original.
- guse_NIC (AttemptFour/Model/guse_NIC.py:90-130): decoder conditioned on a
  512-d GUSE sentence embedding instead of brain data (upper-bound probe) —
  use ``input_dense=False`` to feed the GUSE vector through the same priming
  path.

Forward (Vinyals): x = [encode(input) ; emb(w_0..w_{T-1})] -> LSTM -> head,
so logits[:, t] predicts target[:, t] (feature slot predicts the first word).

Call signature matches the NIC family ((inputs, tokens, a0, c0, training) ->
(logits, attn)) so the same train/eval steps work; ``attn`` is a zero
placeholder. ``init_carry``/``decode_step`` implement the shared decode API
(the feature priming step happens inside ``init_carry``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from masters_thesis_tpu.models.common import (
    glorot_uniform,
    mask_padded_vocab,
    pad_zero_cols,
    pad_zero_rows,
)
from masters_thesis_tpu.models.lstm import KerasLSTMCell


class ShowTell(nn.Module):
    units: int = 512
    embed_dim: int = 512             # feature-embedding width
    embedding_text: int = 512
    vocab_size: int = 5001
    true_vocab: int = 0              # >0: vocab axis padded for TP sharding
    #                                  (see models/nic.py / common.py)
    max_length: int = 15
    input_dense: bool = True         # False: inputs are already embed_dim wide
    encoder_activation: str = "tanh"  # ThinkAndTell Encoder (model.py:23);
    #   "relu" for ShowAndTell (ShowAndTell/model.py:19 — round-4
    #   head-to-head fix: relu, not tanh, on that family's feature prime)
    head_activation: str = "linear"  # 'relu' for exact ThinkAndTell parity
    head_inter: bool = False         # ShowAndTell's linear fc1 (see setup)
    align: str = "next"              # which T of the T+1 LSTM outputs carry
    #   the loss. "next" (ShowAndTell/model.py:154: i = 1..T-1): drop the
    #   feat slot; logits[:, t] predicts SHIFTED target w_{t+1}. "self"
    #   (ThinkAndTell/model.py:271: i = 0..T-1): drop the LAST slot;
    #   logits[:, t] predicts UNSHIFTED target w_t — includes the
    #   reference's feat-slot-predicts-<start> term (round-4 head-to-head).
    dropout: float = 0.2

    def setup(self):
        # the feature prime and word embeddings share the LSTM input slot,
        # so their widths must match (reference: both 512)
        assert self.embed_dim == self.embedding_text, (
            f"embed_dim ({self.embed_dim}) must equal embedding_text "
            f"({self.embedding_text}) — both feed the same LSTM input"
        )
        if self.input_dense:
            self.fc_embedding = nn.Dense(
                self.embed_dim, kernel_init=glorot_uniform, name="fc_embedding"
            )
        tv = self.true_vocab or self.vocab_size
        self.embedding = self.param(
            "embedding",
            # Keras Embedding 'uniform'; pad rows zero for TP vocab padding
            pad_zero_rows(nn.initializers.uniform(scale=0.05), tv),
            (self.vocab_size, self.embedding_text),
        )
        self.cell = KerasLSTMCell(self.units, name="lstm")
        if self.head_inter:
            # ShowAndTell's linear fc1 Dense(units) between the LSTM and
            # the vocab head (ShowAndTell/model.py:37,60-63) — round-4
            # head-to-head fix; ThinkAndTell comments fc1 out
            # (model.py:77,105-109), so it stays off for that family
            self.fc1 = nn.Dense(
                self.units, kernel_init=glorot_uniform, name="fc1"
            )
        self.fc_vocab = nn.Dense(
            self.vocab_size, kernel_init=pad_zero_cols(glorot_uniform, tv),
            name="fc_vocab"
        )
        self.drop = nn.Dropout(self.dropout)

    # ---- pieces ----
    def encode(self, x, training: bool = False):
        if self.input_dense:
            y = self.fc_embedding(x)
            if self.encoder_activation == "tanh":
                y = jnp.tanh(y)
            elif self.encoder_activation == "relu":
                y = nn.relu(y)
            y = self.drop(y, deterministic=not training)
        else:
            y = x
        return y  # (B, E)

    def head(self, h, training: bool = False):
        x = self.drop(h, deterministic=not training)
        if self.head_inter:
            x = self.fc1(x)
        logits = self.fc_vocab(x)
        if self.head_activation == "relu":
            logits = nn.relu(logits)
        # mask AFTER the activation: relu(-1e9) would be 0 and pad slots
        # would each add exp(0) to the softmax denominator
        return mask_padded_vocab(logits, self.true_vocab)

    # ---- training forward ----
    def __call__(self, inputs, tokens, a0, c0, training: bool = False):
        feat = self.encode(inputs, training)                 # (B, E)
        emb = jnp.take(self.embedding, tokens, axis=0)       # (B, T, E)

        # Vinyals alignment (ShowAndTell/model.py:145-179): the LSTM runs
        # T+1 steps over [feat ; emb(tokens[0..T-1])]; the feat slot's
        # output is NOT supervised, and the state that has consumed
        # [feat, tok_0..tok_t] predicts target[t] = tokens[t+1] — the same
        # state->next-word contract the greedy/beam decoders use
        # (init_carry primes with feat, then each decode_step's logits are
        # the next word). One nn.scan, O(1) compile in max_length.
        xs = jnp.concatenate([feat[:, None, :], emb], axis=1)  # (B, T+1, E)

        a0 = a0.astype(jnp.float32)
        c0 = c0.astype(jnp.float32)

        def step(mod, carry, x_t):
            carry, out = mod.cell(carry, x_t)
            # dtype-stable carry for nn.scan under mixed precision
            carry = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), carry)
            return carry, out

        scan = nn.scan(
            step, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        _, hseq = scan(self, (a0, c0), xs)                   # (B, T+1, U)
        kept = hseq[:, :-1] if self.align == "self" else hseq[:, 1:]
        logits = self.head(kept, training=training)          # (B, T, V)
        bs = inputs.shape[0]
        attn = jnp.zeros((bs, self.max_length, 1), logits.dtype)
        return logits, attn

    # ---- decode API (shared with NIC decoders) ----
    def init_carry(self, features):
        """Prime the LSTM with the encoded feature (zero start state)."""
        bs = features.shape[0]
        z = jnp.zeros((bs, self.units), features.dtype)
        (h, c), _ = self.cell((z, z), features)
        return h, c

    def decode_step(self, h, c, features, token):
        """(features unused after priming — kept for API parity)."""
        emb = jnp.take(self.embedding, token, axis=0)
        (h, c), out = self.cell((h, c), emb)
        logits = self.head(out, training=False)
        bs = token.shape[0]
        return h, c, logits, jnp.zeros((bs, 1), logits.dtype)


def showtell_l2_rules(cfg) -> list[tuple[tuple[str, ...], float]]:
    """ThinkAndTell regularises the encoder kernel+bias and both LSTM kernels
    (model.py:18-26, 62-63) with one coefficient (lstm_reg slot reused)."""
    c = cfg.lstm_reg
    return [
        (("fc_embedding", "kernel"), cfg.input_reg),
        (("fc_embedding", "bias"), cfg.input_reg),
        (("lstm", "kernel"), c),
        (("lstm", "recurrent_kernel"), c),
    ]


def GuseNIC(units: int = 512, vocab_size: int = 5001, max_length: int = 15,
            **kw) -> ShowTell:
    """GUSE-conditioned caption decoder (guse_NIC.py): the 512-d sentence
    embedding is fed straight into the priming slot."""
    kw.setdefault("embedding_text", 512)
    return ShowTell(
        units=units,
        vocab_size=vocab_size,
        max_length=max_length,
        input_dense=False,
        embed_dim=512,
        **kw,
    )
