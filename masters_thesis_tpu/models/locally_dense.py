"""LocallyDense brain encoder: Glasser-region block-dense projection.

TPU-native re-design of the reference encoder
(AttemptFour/Model/layers.py:6-53): instead of 345 separate Dense layers
applied in a Python loop, groups are bucketed into a few padded batched
matmuls (see ops/group_layout.py). Per-group semantics are identical:

    out_g = LeakyReLU(0.2)( x[idx_g] @ W_g + b_g )        # he_normal W_g
    out   = BatchNorm(stack(out_g))                        # (B, G, D)
    out   = Dropout(out)

He-normal init uses the TRUE group fan-in (not the padded width) and padding
slots are zero-initialised; since padded input lanes are always 0, their
gradient is 0 and they stay 0 — so padding never leaks into the forward pass
or the L2 regulariser.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.models.common import BN_EPSILON, BN_MOMENTUM, leaky_relu
from masters_thesis_tpu.ops.group_layout import GroupLayout


def _bucket_kernel_init(sizes: np.ndarray, padded: int, out_dim: int):
    """he_normal per group with fan_in = true group size; padded rows zero.

    Vectorised over the whole bucket (one RNG draw for (G, P, D)) — a
    per-group Python loop makes model init pathologically slow at 360 groups.
    """

    def init(key, shape, dtype=jnp.float32):
        g, p, d = shape
        assert (g, p, d) == (len(sizes), padded, out_dim)
        # Keras/jax truncated-normal std correction
        w = jax.random.truncated_normal(key, -2.0, 2.0, (g, p, d), dtype)
        w = w / 0.87962566103423978
        std = jnp.sqrt(2.0 / jnp.asarray(sizes, dtype))[:, None, None]
        mask = jnp.arange(p)[None, :, None] < jnp.asarray(sizes)[:, None, None]
        return jnp.where(mask, w * std, 0.0)

    return init


class LocallyDense(nn.Module):
    """Bucketed block-dense encoder.

    Attributes:
      layout: static GroupLayout (built offline from the Glasser atlas or
              synthetic groups).
      out_dim: per-group output width (``group_size`` in config, 32).
      dropout: dropout rate applied after BatchNorm (dropout_features).
      use_bn: BatchNorm toggle (reference always on, layers.py:40).
    """

    layout: GroupLayout
    out_dim: int = 32
    dropout: float = 0.2
    use_bn: bool = True
    negative_slope: float = 0.2
    activation: str = "leaky_relu"  # 'linear' for the concat variant
    #                                 (localDense.py: activation=None)
    pregathered: bool = False   # input already in grouped layout
    #                             (GroupLayout.permute_rows — no hot-path gather)

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.pregathered:
            # >= : packed HBM stores carry a lane-padding tail beyond
            # padded_total; the per-bucket segment slices below never touch
            # it, so no up-front width slice (an 85 MB/step copy) is needed
            assert x.shape[-1] >= self.layout.padded_total, (
                f"pregathered input must be >= {self.layout.padded_total} wide"
            )
        else:
            # x: (B, N) -> pad a zero column for the padding gather slot
            xpad = jnp.pad(x, ((0, 0), (0, 1)))
        offsets = self.layout.bucket_offsets

        outs = []
        for b, bucket in enumerate(self.layout.buckets):
            gb, pb = len(bucket.group_ids), bucket.padded
            if self.pregathered:
                xg = x[:, offsets[b] : offsets[b] + gb * pb].reshape(-1, gb, pb)
            else:
                idx = jnp.asarray(bucket.indices)          # (G_b, P_b) static
                xg = xpad[:, idx]                          # (B, G_b, P_b)
            w = self.param(
                f"kernel_{b}",
                _bucket_kernel_init(bucket.sizes, bucket.padded, self.out_dim),
                (gb, pb, self.out_dim),
            )
            bias = self.param(
                f"bias_{b}", nn.initializers.zeros, (gb, self.out_dim),
            )
            y = jnp.einsum(
                "bgp,gpd->bgd", xg, w, preferred_element_type=jnp.float32
            ) + bias
            if self.activation == "leaky_relu":
                y = leaky_relu(y, self.negative_slope)
            outs.append(y)

        out = jnp.concatenate(outs, axis=1)                 # (B, ΣG_b, D)
        out = jnp.take(out, jnp.asarray(self.layout.unpermute), axis=1)

        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="input_bn",
            )(out)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out  # (B, G, D)
