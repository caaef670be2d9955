"""Multi-subject training (2 subjects).

Reference has two flavours (SURVEY.md §2.1):

- ``ms_NIC`` / ``main_ms_single_enc.py``: ONE shared LocallyDense encoder,
  each batch half subject-1 / half subject-2, loss = mean(cce_A, cce_B)
  (ms_NIC.py:162-310). With equal halves that loss equals the plain batch
  mean, so the shared-encoder variant is exactly the flagship ``LcNIC``
  trained on a mixed-subject pipeline (data_generator_multisub.py:90-102) —
  use ``LcNIC`` + ``BatchPipeline`` with a two-subject pair list.

- ``ms2_NIC`` / ``main_ms.py``: TWO per-subject encoders (``dense_in_a`` /
  ``dense_in_b``, ms2_NIC.py:88-103) with shared attention/LSTM/head; the
  batch is split in half deterministically (:177-205). Implemented here as a
  ``DualSubjectEncoder`` so the whole NIC core (train step, decoders,
  sharding) is reused unchanged.

``mode``: 'split' for the training batch layout ([A-half ; B-half]); 'a'/'b'
to run every row through one subject's encoder (per-subject eval, as
eval.py does one subject at a time). Parameters are shared across modes by
module naming (encoder_a / encoder_b).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.nic import NIC
from masters_thesis_tpu.ops.group_layout import GroupLayout


class DualSubjectEncoder(nn.Module):
    layout_a: GroupLayout
    layout_b: GroupLayout
    out_dim: int = 32
    dropout: float = 0.2
    mode: str = "split"  # split | a | b

    def setup(self):
        self.encoder_a = LocallyDense(
            layout=self.layout_a, out_dim=self.out_dim, dropout=self.dropout,
            name="encoder_a",
        )
        self.encoder_b = LocallyDense(
            layout=self.layout_b, out_dim=self.out_dim, dropout=self.dropout,
            name="encoder_b",
        )

    def __call__(self, x, training: bool = False):
        if self.mode in ("a", "b"):
            if self.is_initializing():
                # materialize BOTH encoders' params regardless of mode so a
                # split-trained checkpoint restores into a per-subject eval
                # model (the target tree must carry encoder_a AND encoder_b)
                _ = self.encoder_a(x, training=False)
                _ = self.encoder_b(x, training=False)
            enc = self.encoder_a if self.mode == "a" else self.encoder_b
            return enc(x, training=training)
        bs = x.shape[0]
        assert bs % 2 == 0, "split mode needs an even batch (A-half; B-half)"
        half = bs // 2
        fa = self.encoder_a(x[:half], training=training)
        fb = self.encoder_b(x[half:], training=training)
        return jnp.concatenate([fa, fb], axis=0)


def Ms2NIC(
    layout_a: GroupLayout,
    layout_b: GroupLayout,
    units: int = 512,
    group_size: int = 32,
    embedding_text: int = 512,
    attn_units: int = 32,
    vocab_size: int = 5001,
    max_length: int = 15,
    dropout_features: float = 0.2,
    mode: str = "split",
    **kw,
) -> NIC:
    """Two-encoder multi-subject NIC (ms2_NIC configuration)."""
    return NIC(
        encoder=DualSubjectEncoder(
            layout_a=layout_a, layout_b=layout_b, out_dim=group_size,
            dropout=dropout_features, mode=mode, name="encoder",
        ),
        units=units,
        embedding_text=embedding_text,
        attn_units=attn_units,
        vocab_size=vocab_size,
        max_length=max_length,
        **kw,
    )
