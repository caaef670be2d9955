"""Multi-chip dry run: shard the FULL training step over an n-device
('data','model') mesh and run ONE optimisation step on tiny shapes — the
driver-checkable proof that the tp/dp shardings compile and execute without
real chips (virtual CPU devices via xla_force_host_platform_device_count).
"""

from __future__ import annotations

import numpy as np


def dryrun_multichip(n_devices: int) -> None:
    """Shard the full training step over an n-device mesh; run one step."""
    import os

    import jax

    # Some images pin JAX_PLATFORMS to a single remote TPU via sitecustomize;
    # multi-chip dry runs need N virtual CPU devices instead. Decide from the
    # env BEFORE touching any backend-initialising jax API (jax.devices()
    # would lock the platform in).
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())} "
        f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})"
    )

    import jax.numpy as jnp

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.parallel.mesh import make_mesh
    from masters_thesis_tpu.parallel.sharding import (
        batch_sharding,
        make_sharded_train_step,
        shard_params,
    )
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model

    model_axis = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(data=n_devices // model_axis, model=model_axis)

    cfg = Config(
        batch_size=2 * (n_devices // model_axis),
        max_length=6,
        top_k=64,
        units=16,
        attn_units=8,
        group_size=4,
        embedding_text=8,
    )
    n_voxels, n_groups = 512, 8
    groups = synthetic_groups(n_voxels=n_voxels, n_groups=n_groups, seed=0)
    model = LcNIC(
        layout=GroupLayout(groups, n_voxels=n_voxels),
        units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )

    rng = np.random.default_rng(0)
    betas = jnp.asarray(
        rng.standard_normal((cfg.batch_size, n_voxels)), jnp.float32
    )
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (cfg.batch_size, cfg.max_length)),
        jnp.int32,
    )
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((cfg.batch_size, 1), jnp.int32)], axis=1
    )

    params, batch_stats, prng = init_model(model, cfg, betas, tokens)
    tx = make_optimizer(cfg)
    state = TrainState.create(
        params=params, batch_stats=batch_stats, tx=tx, rng=prng
    )
    state = shard_params(state, mesh)

    rules = lc_nic_l2_rules(cfg)
    step = make_sharded_train_step(model, cfg, rules, mesh, state)

    b_sh = batch_sharding(mesh, with_voxel_axis=True)
    betas = jax.device_put(betas, b_sh["betas"])
    tokens = jax.device_put(tokens, b_sh["tokens"])
    target = jax.device_put(target, b_sh["target"])

    state, metrics = step(state, betas, tokens, target)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(
        f"dryrun_multichip({n_devices}): "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"loss={loss:.4f} ok"
    )
