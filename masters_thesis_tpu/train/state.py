"""Train state: params + batch stats + optimizer state + RNG, as one pytree."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx, rng, step=0) -> "TrainState":
        return cls(
            step=step,
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=rng,
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def init_model(model, cfg, sample_betas, sample_tokens, seed: int | None = None):
    """Initialise variables with the reference's build-call pattern
    (main.py:147: one forward pass on a real batch)."""
    seed = cfg.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    pkey, dkey, rng = jax.random.split(root, 3)
    import jax.numpy as jnp

    a0 = jnp.zeros((sample_betas.shape[0], cfg.units), jnp.float32)
    variables = model.init(
        {"params": pkey, "dropout": dkey},
        jnp.asarray(sample_betas),
        jnp.asarray(sample_tokens),
        a0,
        a0,
        training=False,
    )
    return variables["params"], variables.get("batch_stats", {}), rng
