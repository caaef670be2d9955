"""Multi-chip dry run: shard the FULL training step over an n-device
('data','model') mesh and run ONE optimisation step on tiny shapes — the
driver-checkable proof that the tp/dp shardings compile and execute without
real chips (virtual CPU devices via xla_force_host_platform_device_count).

Order-independence: the calling process may already have initialised the jax
backend on a single remote TPU (this image's sitecustomize pins
``JAX_PLATFORMS=axon`` at interpreter start). Once a backend is live its
platform and device count are locked, so ``dryrun_multichip`` detects that
state and re-execs the dry run in a child interpreter that steers itself to
an n-device virtual CPU mesh *before* any backend use — the same recipe as
``tests/conftest.py``.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np

_FORCE_FLAG = "--xla_force_host_platform_device_count"

# Child program: set XLA_FLAGS before importing jax (the flag is read at
# backend init), then pin the platform via jax.config (env vars alone are
# too late when sitecustomize pre-set JAX_PLATFORMS).
_CHILD_CODE = """\
import os, sys
n = int(sys.argv[1])
flag = "--xla_force_host_platform_device_count"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if not f.startswith(flag)]
os.environ["XLA_FLAGS"] = " ".join(flags + [flag + "=" + str(n)])
import jax
jax.config.update("jax_platforms", "cpu")
from masters_thesis_tpu.parallel.dryrun import _dryrun_impl
_dryrun_impl(n)
"""


def _backend_state():
    """(initialized, platform, n_devices) without initialising a backend.

    Uses jax's internal backend cache; if that private surface moves, we
    conservatively report "initialized, unknown" so callers take the always-
    safe subprocess path rather than risk asserting on a locked backend.
    """
    import jax

    try:
        from jax._src import xla_bridge

        if not xla_bridge._backends:  # nothing initialised yet
            return False, None, 0
    except Exception:
        return True, None, -1
    return True, jax.default_backend(), len(jax.devices())


def _force_count_in_flags(flags: str) -> int:
    m = re.search(re.escape(_FORCE_FLAG) + r"=(\d+)", flags)
    return int(m.group(1)) if m else 0


def dryrun_multichip(n_devices: int) -> None:
    """Shard the full training step over an n-device mesh; run one step.

    Runs inline when this process can provide >= n CPU devices; otherwise
    re-execs in a subprocess with a clean n-device virtual CPU config and
    propagates its output / failure.
    """
    initialized, platform, have = _backend_state()

    if initialized and platform == "cpu" and have >= n_devices:
        _dryrun_impl(n_devices)
        return

    if not initialized:
        # Run inline only when the environment is ALREADY steered to an
        # n-device CPU backend (test/driver harnesses export JAX_PLATFORMS
        # and the force-count flag before launch). Anything else goes to the
        # subprocess: mutating XLA_FLAGS / jax_platforms here would pin the
        # CALLER's process to a CPU backend for its whole lifetime — a
        # library user dry-running early would silently lose the TPU for
        # all subsequent training in the same interpreter.
        env_platform = os.environ.get("JAX_PLATFORMS", "").split(",")[0]
        if (
            env_platform == "cpu"
            and _force_count_in_flags(os.environ.get("XLA_FLAGS", ""))
            >= n_devices
        ):
            import jax

            if (
                jax.default_backend() == "cpu"
                and len(jax.devices()) >= n_devices
            ):
                _dryrun_impl(n_devices)
                return
            # fall through: something else grabbed the backend first

    _reexec_dryrun(n_devices)


def _reexec_dryrun(n_devices: int) -> None:
    """Run the dry run in a child interpreter pinned to an n-device CPU mesh."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child re-pins via jax.config
    # Additive PYTHONPATH: keep any site hooks, make the package importable.
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD_CODE, str(n_devices)],
        env=env,
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.stdout:
        sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        if proc.stderr:
            sys.stderr.write(proc.stderr)
        raise RuntimeError(
            f"dryrun_multichip subprocess failed (rc={proc.returncode})"
        )


def _dryrun_impl(n_devices: int) -> None:
    """The actual dry run; requires >= n_devices already visible."""
    import jax

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())} "
        f"(set XLA_FLAGS={_FORCE_FLAG}={n_devices})"
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

    # top_k=63 -> vocab 64, divisible by the model axis so the embedding and
    # dense_out vocab shardings actually engage in the dry run (not just the
    # encoder's voxel axis).
    cfg = Config(
        batch_size=2 * (n_devices // model_axis),
        max_length=6,
        top_k=63,
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

    # the production multi-step path: K scanned steps per call over a mesh-
    # sharded HBM store (store voxel axis over 'model', batch over 'data')
    from jax.sharding import NamedSharding, PartitionSpec as P

    from masters_thesis_tpu.parallel.sharding import (
        make_sharded_scanned_train_steps,
    )

    K = 2
    store = jnp.asarray(
        rng.standard_normal((4 * cfg.batch_size, n_voxels)), jnp.float32
    )
    store = jax.device_put(store, NamedSharding(mesh, P(None, "model")))
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, store.shape[0], (K, cfg.batch_size)),
                    jnp.int32),
        NamedSharding(mesh, P(None, "data")))
    toks = jax.device_put(
        jnp.broadcast_to(tokens, (K,) + tokens.shape),
        NamedSharding(mesh, P(None, "data")))
    tgts = jax.device_put(
        jnp.broadcast_to(target, (K,) + target.shape),
        NamedSharding(mesh, P(None, "data")))
    sstep = make_sharded_scanned_train_steps(model, cfg, rules, mesh, state)
    state, smetrics = sstep(state, store, idx, toks, tgts)
    sloss = float(np.asarray(smetrics["loss"])[-1])
    assert np.isfinite(sloss), f"non-finite scanned loss {sloss}"

    # DP serving over the same mesh (serve.Captioner(mesh=...)): batch axis
    # sharded over 'data', params replicated, greedy + beam decode execute
    from masters_thesis_tpu.data.tokenizer import Tokenizer
    from masters_thesis_tpu.serve import Captioner

    tok = Tokenizer(num_words=cfg.vocab_size - 1)
    tok.fit_on_texts(["<start> a b c <end>"] * 2)
    tok.install_pad()
    cap = Captioner.from_components(
        model, state.params, state.batch_stats, tok, cfg.units,
        cfg.max_length, batch_size=cfg.batch_size, mesh=mesh,
    )
    serve_in = np.asarray(betas)[: cfg.batch_size]
    ids_greedy = cap.caption_ids(serve_in)
    ids_beam = cap.caption_ids(serve_in, decoder="beam")
    assert ids_greedy.shape == (cfg.batch_size, cfg.max_length)
    assert ids_beam.shape == (cfg.batch_size, cfg.max_length)

    realized = _realized_shardings(state)
    print(
        f"dryrun_multichip({n_devices}): "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"loss={loss:.4f} scanned_k{K}_loss={sloss:.4f} "
        f"serve=greedy+beam@data={mesh.shape['data']} "
        f"shardings={realized} ok"
    )


def _realized_shardings(state) -> str:
    """Summarise how many param tensors actually got a model-axis shard
    (vs silently replicated) so mesh/shape mismatches are visible in the
    dry-run output (VERDICT r1 weak #7)."""
    import jax

    sharded, replicated = 0, 0
    for leaf in jax.tree_util.tree_leaves(state.params):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and any(p is not None for p in spec):
            sharded += 1
        else:
            replicated += 1
    return f"{sharded} sharded / {replicated} replicated params"
