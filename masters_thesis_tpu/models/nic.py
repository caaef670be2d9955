"""NIC — the attention caption-decoder family (flagship: LcNIC).

One TPU-native core covers three reference models that share the
attention → recurrent-cell → head loop:

- ``lc_NIC`` (AttemptFour/Model/lc_NIC.py:42-263): LocallyDense brain encoder,
  LSTM(512), LeakyReLU Dense(256) + Dense(vocab) head       -> ``LcNIC(...)``
- ``img_NIC`` (AttemptFour/Model/img_NIC.py): VGG16 conv patches through a
  per-patch projection, same decoder                        -> ``ImgNIC(...)``
- ``CNN_RNN`` (CNN_RNN/model.py:23-115): InceptionV3 patches, GRU decoder,
  relu Dense(units) + Dense(vocab) head                     -> ``CnnRnnNIC(...)``

Forward:
  features = encoder(x)                                  # (B, R, D)
  for t < max_len:  ctx_t  = BahdanauAttention(h_t, features)
                    h_t+1  = Cell([ctx_t ; emb(word_t)])
  logits = head(h_seq)

Differences from the reference by design: logits out (softmax fused into the
loss), the whole loop jit-compiled (reference runs eagerly, main.py:134), and
attention weights returned as a dense (B, T, R) array. ``decode_step`` shares
all submodules with the training forward so greedy/beam/sampling decoding
reuses the trained weights exactly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.common import (
    embedding_init,
    glorot_normal,
    leaky_relu,
    mask_padded_vocab,
    pad_zero_cols,
    pad_zero_rows,
)
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasGRUCell, KerasLSTMCell
from masters_thesis_tpu.ops.group_layout import GroupLayout


class NIC(nn.Module):
    encoder: nn.Module
    units: int = 512
    embedding_text: int = 512
    attn_units: int = 32
    vocab_size: int = 5001
    true_vocab: int = 0              # >0 and < vocab_size: the vocab axis was
    #                                  padded (cfg.tpu.vocab_pad_multiple) so
    #                                  TP meshes can shard embedding/dense_out
    #                                  — pad rows/cols zero-init, pad logits
    #                                  masked to -1e9 (models/common.py);
    #                                  numerics match unpadded exactly
    max_length: int = 15
    cell_type: str = "lstm"          # lstm | gru
    gru_zero_state: bool = False     # CNN_RNN quirk (round-4 head-to-head):
    #                                  the reference decoder calls
    #                                  self.gru(x) WITHOUT initial_state
    #                                  (CNN_RNN/model.py:103), so the GRU
    #                                  recurrence restarts from zeros every
    #                                  timestep — the previous state feeds
    #                                  ONLY the attention query. True
    #                                  replicates that exactly.
    head_dim: int = 256              # dense_inter width (CNN_RNN: units)
    head_activation: str = "leaky_relu"  # leaky_relu | linear (CNN_RNN fc1
    #                                      has NO activation, model.py:77)
    attn_inner_activation: str = "leaky_relu"  # every AttemptFour model
    #                                  passes LeakyReLU(0.2) INTO the
    #                                  attention W1/W2 Dense layers
    #                                  (lc_NIC.py:95-102); CNN_RNN's plain
    #                                  attention is 'linear'
    pretrained_embedding: Any = None  # (V, E) array — glove_NIC.py variant
    embedding_trainable: bool = True
    learned_init_state: bool = False  # Xu et al. h0,c0 = MLP(mean(features))
    #                                   (lc_NIC.learn_init_state :169-173,
    #                                    tmp_lc_NIC.py:191)
    dropout_input: float = 0.0
    dropout_text: float = 0.2
    dropout_attn: float = 0.2
    dropout_lstm: float = 0.2
    dropout_out: float = 0.2
    remat: bool = False  # cfg.tpu.remat: jax.checkpoint each scan timestep —
    #                      the backward pass recomputes the attention+cell
    #                      step instead of storing T sets of activations
    #                      (trade FLOPs for HBM at large batch/units)

    def setup(self):
        self.attention = BahdanauAttention(
            self.attn_units, dropout=self.dropout_attn,
            inner_activation=self.attn_inner_activation, name="attention"
        )
        if self.cell_type == "lstm":
            self.cell = KerasLSTMCell(self.units, name="lstm")
        else:
            self.cell = KerasGRUCell(self.units, name="gru")
        tv = self.true_vocab or self.vocab_size
        if self.pretrained_embedding is not None:
            table = jnp.asarray(self.pretrained_embedding)
            # tables are built at the tokenizer's TRUE vocab; pad rows here
            assert table.shape == (tv, self.embedding_text)
            if tv < self.vocab_size:
                table = jnp.pad(table, ((0, self.vocab_size - tv), (0, 0)))
            if self.embedding_trainable:
                self.embedding = self.param(
                    "embedding", lambda key, shape: table, table.shape
                )
            else:
                self.embedding = table
        else:
            self.embedding = self.param(
                "embedding", pad_zero_rows(embedding_init, tv),
                (self.vocab_size, self.embedding_text),
            )
        if self.learned_init_state:
            self.hidden_init = nn.Dense(self.units, name="hidden_init")
            self.carry_init = nn.Dense(self.units, name="carry_init")
        self.dense_inter = nn.Dense(
            self.head_dim, kernel_init=glorot_normal, name="dense_inter"
        )
        self.dense_out = nn.Dense(
            self.vocab_size, kernel_init=pad_zero_cols(glorot_normal, tv),
            name="dense_out"
        )
        self.drop_input = nn.Dropout(self.dropout_input)
        self.drop_text = nn.Dropout(self.dropout_text)
        self.drop_lstm = nn.Dropout(self.dropout_lstm)
        self.drop_out = nn.Dropout(self.dropout_out)

    # ---- pieces ----
    def _carry(self, h, c):
        return (h, c) if self.cell_type == "lstm" else h

    def encode(self, x, training: bool = False):
        x = self.drop_input(x, deterministic=not training)
        return self.encoder(x, training=training)  # (B, R, D)

    def embed(self, tokens):
        return jnp.take(self.embedding, tokens, axis=0)

    def head(self, h, training: bool = False):
        x = self.dense_inter(h)
        if self.head_activation == "leaky_relu":
            x = leaky_relu(x)
        elif self.head_activation == "relu":
            x = nn.relu(x)
        # 'linear': CNN_RNN's fc1 is a plain Dense (model.py:77-78)
        x = self.drop_out(x, deterministic=not training)
        return mask_padded_vocab(self.dense_out(x), self.true_vocab)

    # ---- training forward (teacher forcing; lc_NIC.call_attention) ----
    def __call__(self, inputs, tokens, a0, c0, training: bool = False):
        """Returns (logits (B, T, V), attn (B, T, R)).

        The T timesteps run under ``nn.scan`` (params broadcast, dropout rngs
        split per step) so compiled-program size and compile time are O(1) in
        ``max_length`` — the reference unrolls the loop in Python per call
        (lc_NIC.py:244-256) and we previously mirrored that under jit, which
        made XLA programs (and compiles) scale with T. Eval-mode numerics are
        identical to the unrolled loop; training-mode dropout masks differ
        only in which independent mask each step draws.
        """
        features = self.encode(inputs, training)
        emb = self.embed(tokens)  # (B, T, E)
        emb = self.drop_text(emb, deterministic=not training)

        if self.learned_init_state:
            a0, c0 = self.init_carry(features)
        # recurrent state rides in fp32 regardless of compute dtype: the
        # cell's matmuls accumulate in fp32 anyway (bf16 inputs come from the
        # weights), and nn.scan requires a dtype-stable carry
        a0 = a0.astype(jnp.float32)
        c0 = c0.astype(jnp.float32)
        carry = self._carry(a0, c0)

        def step(mod, carry, emb_t):
            h = carry[0] if mod.cell_type == "lstm" else carry
            context, alpha = mod.attention(h, features, training=training)
            x = jnp.concatenate([context, emb_t], axis=-1)
            cell_in = (jnp.zeros_like(carry)
                       if mod.gru_zero_state and mod.cell_type == "gru"
                       else carry)
            carry, out = mod.cell(cell_in, x)
            carry = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), carry)
            out = mod.drop_lstm(out, deterministic=not training)
            return carry, (out, alpha[..., 0])

        # remat: recompute each step in the backward pass instead of storing
        # every timestep's attention/cell activations (prevent_cse is safe to
        # drop inside scan — the loop body is compiled once)
        body = nn.remat(step, prevent_cse=False) if self.remat else step
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, (hseq, alphas) = scan(self, carry, emb)      # (B, T, U), (B, T, R)
        logits = self.head(hseq, training=training)     # (B, T, V)
        return logits, alphas

    # ---- single decode step (shared by greedy / beam / sampling) ----
    def init_carry(self, features):
        """Initial state: zeros (reference a0/c0) or MLP(mean(features))
        when learned_init_state is on."""
        if self.learned_init_state:
            mean = features.mean(axis=1)
            return self.hidden_init(mean), self.carry_init(mean)
        bs = features.shape[0]
        z = jnp.zeros((bs, self.units), features.dtype)
        return z, z

    def decode_step(self, h, c, features, token):
        """One inference step (no dropout). token: (B,) int32.

        Returns (h', c', logits (B, V), alpha (B, R)). For GRU cells ``c`` is
        carried unchanged (ignored).
        """
        context, alpha = self.attention(h, features, training=False)
        emb = self.embed(token)
        x = jnp.concatenate([context, emb], axis=-1)
        if self.cell_type == "lstm":
            (h, c), _ = self.cell((h, c), x)
        else:
            h, _ = self.cell(
                jnp.zeros_like(h) if self.gru_zero_state else h, x)
        logits = self.head(h, training=False)
        return h, c, logits, alpha[..., 0]


# ---- factories for the three reference configurations ----

def LcNIC(
    layout: GroupLayout,
    units: int = 512,
    group_size: int = 32,
    embedding_text: int = 512,
    attn_units: int = 32,
    vocab_size: int = 5001,
    max_length: int = 15,
    dropout_input: float = 0.0,
    dropout_features: float = 0.2,
    dropout_text: float = 0.2,
    dropout_attn: float = 0.2,
    dropout_lstm: float = 0.2,
    dropout_out: float = 0.2,
    pregathered: bool = False,
    **kw: Any,
) -> NIC:
    """Flagship brain-decoder (lc_NIC.py configuration). Extra kwargs pass
    through to NIC (e.g. pretrained_embedding for the glove_NIC variant,
    learned_init_state for the tmp_lc_NIC init-from-features variant).

    ``pregathered=True`` expects inputs already in the grouped padded layout
    (GroupLayout.permute_rows) — the training fast path where the HBM store
    is permuted once at upload so the encoder skips its 84 MB/step gather.
    Same param tree either way (checkpoints interchange freely)."""
    return NIC(
        encoder=LocallyDense(
            layout=layout, out_dim=group_size, dropout=dropout_features,
            pregathered=pregathered, name="encoder",
        ),
        units=units,
        embedding_text=embedding_text,
        attn_units=attn_units,
        vocab_size=vocab_size,
        max_length=max_length,
        dropout_input=dropout_input,
        dropout_text=dropout_text,
        dropout_attn=dropout_attn,
        dropout_lstm=dropout_lstm,
        dropout_out=dropout_out,
        **kw,
    )


def GloveNIC(layout: GroupLayout, embedding_table, trainable: bool = True,
             **kw: Any) -> NIC:
    """lc_NIC with pretrained text embeddings (glove_NIC.py variant):
    pass a (vocab, embedding_text) GloVe table built offline."""
    return LcNIC(
        layout,
        pretrained_embedding=embedding_table,
        embedding_trainable=trainable,
        embedding_text=int(embedding_table.shape[1]),
        **kw,
    )


def ImgNIC(
    embed_dim: int = 32,
    units: int = 512,
    attn_units: int = 32,
    vocab_size: int = 5001,
    max_length: int = 15,
    embedding_text: int = 512,
    dropout_features: float = 0.2,
    **kw: Any,
) -> NIC:
    """Show-Attend-Tell on conv-feature patches (img_NIC.py path): a
    SEPARATE Dense per patch projecting each 512-d conv column to
    ``embed_dim`` (= config group_size 32, config_img.yaml:59) with
    LeakyReLU + BatchNorm over the stack (img_localDense.py:20-38) —
    round-4 head-to-head fix; previously a shared projection to 512."""
    from masters_thesis_tpu.models.encoders import PatchDense

    return NIC(
        encoder=PatchDense(
            out_dim=embed_dim, dropout=dropout_features,
            activation="leaky_relu", per_patch=True, use_bn=True,
            name="encoder",
        ),
        units=units,
        embedding_text=embedding_text,
        attn_units=attn_units,
        vocab_size=vocab_size,
        max_length=max_length,
        **kw,
    )


def CnnRnnNIC(
    embed_dim: int = 256,
    units: int = 512,
    vocab_size: int = 5001,
    max_length: int = 15,
    **kw: Any,
) -> NIC:
    """The CNN_RNN GRU captioner (CNN_RNN/model.py): relu patch encoder,
    GRU cell, plain (no-activation, no-dropout) textbook attention
    (model.py:38-61), a linear fc1 Dense(units) head (model.py:77-78), and
    the zero-initial-state GRU recurrence (model.py:103 — see
    NIC.gru_zero_state)."""
    from masters_thesis_tpu.models.encoders import PatchDense

    kw.setdefault("dropout_attn", 0.0)
    kw.setdefault("gru_zero_state", True)
    return NIC(
        encoder=PatchDense(out_dim=embed_dim, activation="relu", name="encoder"),
        units=units,
        embedding_text=embed_dim,
        attn_units=units,
        vocab_size=vocab_size,
        max_length=max_length,
        cell_type="gru",
        head_dim=units,
        head_activation="linear",
        attn_inner_activation="linear",
        **kw,
    )
