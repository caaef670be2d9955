"""Loss composition matching the reference train step.

Reference (AttemptFour/Model/lc_NIC.py:328-408):
  total = mean-over-time per-timestep CCE            (:370-375)
        + sum of Keras L2 activity losses            (:379)
        (+ attention sum-to-one MSE, disabled        (:364-367, :384))

The CCE there is CategoricalCrossentropy(from_logits=False, reduction='none')
on softmax outputs with one-hot targets, averaged over batch per timestep and
then over timesteps — i.e. an UNMASKED mean over (B, T) including <pad>
positions. We compute it from logits with log_softmax (identical math,
numerically stable) and take target ids instead of one-hots (the one-hot lives
implicitly in ``take_along_axis``).

Gradient-scale note (round-1 advisor finding, checked and found incorrect):
the reference does NOT backprop an unreduced per-sample loss vector. Its
``NIC.loss_function`` applies ``tf.reduce_mean`` over the batch before the
per-timestep accumulation (lc_NIC.py:462-466: ``loss_ = self.compiled_loss(
real, pred); return tf.reduce_mean(loss_)``), so ``tape.gradient`` sees a
scalar batch-MEAN loss — exactly what ``caption_loss`` computes here. The
Keras ``clipnorm=0.1`` therefore engages at the same gradient magnitudes in
both frameworks; no scale correction is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def caption_loss(logits, target_ids, mask=None):
    """Mean cross-entropy over (B, T). ``mask`` (B, T) enables the masked-SCCE
    variant used by the older generations (ThinkAndTell/model.py:319-334)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]
    if mask is None:
        return nll.mean()
    mask = mask.astype(nll.dtype)
    # reference masked variant: per-timestep mean over full batch, averaged
    # over T (zeros where masked) — NOT divided by the mask count
    return (nll * mask).mean()


def accuracy(logits, target_ids, mask=None):
    """Categorical accuracy (lc_NIC.py:469-486): argmax match rate."""
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == target_ids).astype(jnp.float32)
    if mask is None:
        return hit.mean()
    mask = mask.astype(hit.dtype)
    return (hit * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def attention_loss(alphas):
    """Doubly-stochastic attention regulariser: MSE(sum_t alpha_t, 1)
    (lc_NIC.py:364-367; off by default as in the reference)."""
    total = jnp.sum(alphas, axis=1)  # (B, R)
    return jnp.mean(jnp.square(total - 1.0))


# ---- L2 regularisation ----

def lc_nic_l2_rules(cfg) -> list[tuple[tuple[str, ...], float]]:
    """Which kernels carry which L2 coefficient in the flagship model
    (lc_NIC.py:84-159: encoder kernels → input_reg; attention W1/W2 →
    attn_reg; LSTM input kernel → lstm_reg; both output Dense kernels →
    output_reg; V / embedding / biases / BN unregularised)."""
    return [
        (("encoder", "kernel"), cfg.input_reg),
        (("attention", "W1", "kernel"), cfg.attn_reg),
        (("attention", "W2", "kernel"), cfg.attn_reg),
        (("lstm", "kernel"), cfg.lstm_reg),
        (("dense_inter", "kernel"), cfg.output_reg),
        (("dense_out", "kernel"), cfg.output_reg),
    ]


def _path_names(path) -> tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)


def _matches(names: tuple[str, ...], pattern: tuple[str, ...]) -> bool:
    """Ordered subsequence match with prefix tolerance on the leaf name
    (so ("encoder","kernel") matches encoder/kernel_0, kernel_1, ...)."""
    i = 0
    for pat in pattern:
        while i < len(names) and not names[i].startswith(pat):
            i += 1
        if i == len(names):
            return False
        i += 1
    return True


def l2_loss(params, rules) -> jnp.ndarray:
    """Keras-style L2: sum_i coeff_i * sum(w_i**2) over matching leaves."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for path, leaf in leaves:
        names = _path_names(path)
        for pattern, coeff in rules:
            if coeff and _matches(names, pattern):
                total = total + coeff * jnp.sum(jnp.square(leaf))
                break
    return total
