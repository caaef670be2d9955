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


BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3
