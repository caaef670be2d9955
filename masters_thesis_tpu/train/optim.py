"""Optimizers with Keras-compatible semantics.

Reference setup (AttemptFour/main.py:96-104): Adam(lr=1e-4, beta_1=0.9,
beta_2=0.98, epsilon=1e-8, clipnorm=0.1). Keras ``clipnorm`` clips each
gradient TENSOR by its own norm (not the global norm) before the Adam update —
replicated here as a per-leaf optax transform. SGD variant: momentum 0.9,
non-Nesterov (main.py:101-102).

Also provides NFNet-style adaptive gradient clipping (reference
Model/agc.py:20-38, optional at lc_NIC.py:388) and a linear warmup schedule
(Callbacks/WarmupScheduler.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm applied leaf-wise (Keras clipnorm semantics)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.linalg.norm(g.reshape(-1))
            scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-12), 1.0)
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _unitwise_norm(x):
    """NFNet unitwise norm (Model/agc.py:6-18): whole tensor for <=1-D,
    per-output-unit (axis 0) for 2/3-D linear kernels, per-filter
    (axes 0,1,2) for 4-D HWIO conv kernels."""
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(jnp.square(x)))
    axis = (0,) if x.ndim in (2, 3) else (0, 1, 2)
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))


def adaptive_grad_clip(clip_factor: float, eps: float = 1e-3) -> optax.GradientTransformation:
    """NFNet-style AGC with UNITWISE norms (Model/agc.py:20-38): each output
    unit's gradient is clipped by its own ||w_unit||/||g_unit|| ratio — a
    per-tensor norm would let one exploding unit drag down (or hide behind)
    every other unit's update."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None, "AGC needs params"

        def clip(g, w):
            p_norm = _unitwise_norm(w)
            max_norm = jnp.maximum(p_norm, eps) * clip_factor
            g_norm = _unitwise_norm(g)
            clipped = g * (max_norm / jnp.maximum(g_norm, 1e-6))
            return jnp.where(g_norm < max_norm, g, clipped)

        return jax.tree_util.tree_map(clip, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup then constant (WarmupScheduler.py semantics)."""
    if warmup_steps <= 0:
        return optax.constant_schedule(base_lr)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup_steps),
            optax.constant_schedule(base_lr),
        ],
        [warmup_steps],
    )


def make_optimizer(cfg, schedule=None) -> optax.GradientTransformation:
    """Build the configured optimizer chain (AGC -> clipnorm -> Adam/SGD)."""
    if schedule is not None:
        lr = schedule
    elif getattr(cfg, "cosine_decay_steps", 0):
        # SGD + CosineDecay is the ThinkAndTell recipe
        # (ThinkAndTell/train.py:247-264); composes with linear warmup
        decay = optax.cosine_decay_schedule(cfg.alpha, cfg.cosine_decay_steps)
        if getattr(cfg, "warmup_steps", 0):
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, cfg.alpha, cfg.warmup_steps),
                 decay],
                [cfg.warmup_steps],
            )
        else:
            lr = decay
    elif getattr(cfg, "warmup_steps", 0):
        lr = warmup_schedule(cfg.alpha, cfg.warmup_steps)
    else:
        lr = cfg.alpha
    chain = []
    # reference order: AGC runs on the RAW tape gradients (lc_NIC.py:388),
    # then Keras clipnorm applies inside optimizer.apply_gradients — AGC
    # must see unclipped norms
    if getattr(cfg, "agc_clip", 0):
        chain.append(adaptive_grad_clip(cfg.agc_clip))
    if getattr(cfg, "clipnorm", 0):
        chain.append(clip_by_per_tensor_norm(cfg.clipnorm))
    name = cfg.optimizer.lower()
    if name == "adam":
        chain.append(
            optax.adam(lr, b1=cfg.beta_1, b2=cfg.beta_2, eps=cfg.epsilon)
        )
    elif name == "sgd":
        chain.append(optax.sgd(lr, momentum=0.9, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return optax.chain(*chain)
