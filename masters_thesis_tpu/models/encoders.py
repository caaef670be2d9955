"""Feature encoders for the NIC family (besides LocallyDense).

- PatchDense: per-patch projection of CNN conv features — the reference's
  ``img_localDense`` (AttemptFour/Model/img_localDense.py) and CNN_Encoder
  (CNN_RNN/model.py:23-36): a single Dense applied to the last dim of
  (B, patches, C).
- FullyConnectedEncoder: one Dense + BN + dropout over the full flat input
  (AttemptFour/Model/fullyConnected.py:6-27); emits (B, 1, D) so it can feed
  the same attention interface.
- DeepLocallyDense: depth-n per-region stacks with BN between layers
  (AttemptFour/Model/deep_layers.py:6-75), built on the bucketed layout.
- ConcatLocallyDense: per-group linear projections concatenated flat, then a
  LeakyReLU(0.2) Dense(embed_dim) bottleneck
  (AttemptFour/Model/localDense.py:44-63, the "concat method"); emits
  (B, 1, embed_dim) — one fused region, used without spatial attention.
"""

from __future__ import annotations

import flax.linen as nn
import jax.nn.initializers as jinit
import jax.numpy as jnp

from masters_thesis_tpu.models.common import (
    BN_EPSILON,
    BN_MOMENTUM,
    he_normal,
    leaky_relu,
)
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.ops.group_layout import GroupLayout


class PatchDense(nn.Module):
    """(B, P, C) -> (B, P, D) patch projection, two reference flavours:

    - shared (``per_patch=False``): ONE Dense over the channel dim — the
      CNN_RNN CNN_Encoder (CNN_RNN/model.py:23-36).
    - per-patch (``per_patch=True``): a SEPARATE Dense per patch + BatchNorm
      over the stacked output + dropout — img_localDense.LocallyDense
      (AttemptFour/Model/img_localDense.py:20-38 builds n_features distinct
      Dense layers and applies BN after stacking). Implemented as one
      (P, C, D) einsum so the P independent matmuls batch onto the MXU.
    """

    out_dim: int
    dropout: float = 0.0
    activation: str = "relu"  # CNN_RNN uses relu (model.py:33); img uses leaky
    per_patch: bool = False
    use_bn: bool = False      # img_localDense.py:24: BN after the stack

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.per_patch:
            # per-patch kernels: init must see fan_in = C per patch
            # (batch_axis=0), like the reference's P separate
            # Dense(he_normal) layers
            w = self.param(
                "kernel",
                jinit.variance_scaling(
                    2.0, "fan_in", "truncated_normal",
                    in_axis=-2, out_axis=-1, batch_axis=0,
                ),
                (x.shape[1], x.shape[2], self.out_dim),
            )
            b = self.param(
                "bias", nn.initializers.zeros, (x.shape[1], self.out_dim)
            )
            y = jnp.einsum("bpc,pcd->bpd", x, w,
                           preferred_element_type=jnp.float32) + b
            y = y.astype(x.dtype)
        else:
            y = nn.Dense(self.out_dim, kernel_init=he_normal, name="proj")(x)
        y = leaky_relu(y) if self.activation == "leaky_relu" else nn.relu(y)
        if self.use_bn:
            y = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="bn",
            )(y)
        return nn.Dropout(self.dropout, deterministic=not training)(y)


class FullyConnectedEncoder(nn.Module):
    """(B, N) -> (B, 1, D): Dense + BN + dropout on the whole input."""

    out_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = nn.Dense(self.out_dim, kernel_init=he_normal, name="fc")(x)
        y = leaky_relu(y)
        y = nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            name="bn",
        )(y)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return y[:, None, :]


class ConcatLocallyDense(nn.Module):
    """(B, N) -> (B, 1, embed_dim): per-group Dense (linear, as the reference
    configures it: localDense.py call site in lc_NIC.py:71-80 passes
    activation=None), outputs concatenated to (B, G*D), dropout, then
    Dense(embed_dim) with LeakyReLU(0.2) (localDense.py:36-39, 58-63)."""

    layout: GroupLayout
    out_dim: int = 32        # per-group width (reference output_groups entry)
    embed_dim: int = 512
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = LocallyDense(
            layout=self.layout,
            out_dim=self.out_dim,
            dropout=0.0,
            use_bn=False,
            activation="linear",
            name="groups",
        )(x, training=training)                       # (B, G, D)
        y = y.reshape(y.shape[0], -1)                 # concat: (B, G*D)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        y = nn.Dense(self.embed_dim, kernel_init=he_normal, name="embed")(y)
        y = leaky_relu(y)
        return y[:, None, :]


class DeepLocallyDense(nn.Module):
    """Stacked per-region projections: LocallyDense -> (BN, per-region Dense)^n."""

    layout: GroupLayout
    out_dim: int = 32
    depth: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = LocallyDense(
            layout=self.layout,
            out_dim=self.out_dim,
            dropout=0.0,
            use_bn=False,
            name="block0",
        )(x, training=training)
        for d in range(1, self.depth):
            y = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name=f"bn{d}",
            )(y)
            # per-region Dense: einsum over (B, G, D) with (G, D, D).
            # The leading G axis is a batch of independent Dense layers, so
            # the init must see fan_in = D per region (batch_axis=0) — plain
            # he_normal folds G into the receptive field and lands ~sqrt(G)x
            # too small (std 0.013 vs the reference per-region Dense's 0.25,
            # deep_layers.py builds G separate Dense(he_normal) layers).
            w = self.param(
                f"kernel{d}",
                jinit.variance_scaling(
                    2.0, "fan_in", "truncated_normal",
                    in_axis=-2, out_axis=-1, batch_axis=0,
                ),
                (y.shape[1], self.out_dim, self.out_dim),
            )
            b = self.param(
                f"bias{d}", nn.initializers.zeros, (y.shape[1], self.out_dim)
            )
            y = leaky_relu(
                jnp.einsum("bgd,gde->bge", y, w,
                           preferred_element_type=jnp.float32) + b
            )
        return nn.Dropout(self.dropout, deterministic=not training)(y)
