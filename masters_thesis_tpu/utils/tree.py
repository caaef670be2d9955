"""Pytree helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def tree_l2_sum(params, weights=None) -> jnp.ndarray:
    """sum_i w_i * sum(p_i**2) — Keras L2 regulariser semantics
    (reg * sum(square(w)), no factor 1/2)."""
    leaves = jax.tree_util.tree_leaves(params)
    if weights is None:
        return sum(jnp.sum(jnp.square(p)) for p in leaves)
    wleaves = jax.tree_util.tree_leaves(weights)
    return sum(w * jnp.sum(jnp.square(p)) for p, w in zip(leaves, wleaves))
