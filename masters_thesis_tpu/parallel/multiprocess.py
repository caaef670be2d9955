"""Real multi-PROCESS distributed drive (round 4).

Everything multi-device before this module ran in ONE process on a virtual
mesh; the four lines of ``maybe_distributed_init`` (mesh.py) and the
per-host input assembly ``global_batch_from_host_local`` (sharding.py:221)
had never crossed an OS process boundary. This module launches N real
processes — ``jax.distributed.initialize`` over a local coordinator, K
virtual CPU devices per process, XLA collectives over the Gloo transport —
and trains the SAME sharded step the single-process path uses, each process
feeding only its host-local slice of every batch. The parent (or the test)
then asserts the multi-process loss trajectory and final parameter norm
match the single-process run of the identical program.

This is the TPU-native counterpart of SURVEY.md §2.7's "communication
backend" row: the reference has no distributed execution at all; here the
multi-host path is the production train step + GSPMD shardings, with
``jax.distributed`` as the only process-level bootstrap (no hand-written
comm layer — collectives are inserted by XLA exactly as on a TPU pod).

Entry points:
  run_multiprocess_drive(n_processes, devices_per_process, steps)
      parent-side launcher; returns the drive report dict.
  single_process_reference(...)
      the same program in-process (requires >= n_processes*K devices).
  python -m masters_thesis_tpu.parallel.multiprocess --child ...
      child-side main (used by the launcher; not for direct use).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np

# drive dimensions: mesh (data=NK/2, model=2); every dim divides the mesh
DRIVE = dict(
    n_voxels=256, n_groups=8, batch=8, steps=6, top_k=63,
    units=16, attn_units=8, group_size=4, embedding_text=8, max_length=6,
)


def _drive_batches(cfg, n_voxels: int, steps: int, seed: int = 7):
    """Deterministic global batches, identical in every process."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        betas = rng.standard_normal(
            (cfg.batch_size, n_voxels)).astype(np.float32)
        tokens = rng.integers(
            1, cfg.vocab_size, (cfg.batch_size, cfg.max_length)
        ).astype(np.int32)
        target = np.concatenate(
            [tokens[:, 1:], np.zeros((cfg.batch_size, 1), np.int32)], axis=1)
        out.append({"betas": betas, "tokens": tokens, "target": target})
    return out


def _drive_model(cfg, n_voxels: int, n_groups: int):
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout

    groups = synthetic_groups(n_voxels=n_voxels, n_groups=n_groups, seed=0)
    return LcNIC(
        layout=GroupLayout(groups, n_voxels=n_voxels),
        units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )


def _drive_once(mesh, local_slice=None) -> dict:
    """Run the drive on an existing mesh.

    ``local_slice``: (row0, row1) of each global batch this process feeds
    through ``global_batch_from_host_local``; None = single process feeds
    everything (the function degrades to a sharded device_put there, so the
    SAME input path runs in both configurations).
    """
    import jax
    import jax.numpy as jnp

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.parallel.sharding import (
        global_batch_from_host_local,
        make_sharded_train_step,
        shard_params,
    )
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model

    d = DRIVE
    cfg = Config(
        batch_size=d["batch"], max_length=d["max_length"], top_k=d["top_k"],
        units=d["units"], attn_units=d["attn_units"],
        group_size=d["group_size"], embedding_text=d["embedding_text"],
    )
    model = _drive_model(cfg, d["n_voxels"], d["n_groups"])
    batches = _drive_batches(cfg, d["n_voxels"], d["steps"])

    # identical seeded init in every process (single-controller SPMD style:
    # same program, same seeds -> same initial params everywhere)
    b0 = batches[0]
    params, bstats, rng = init_model(
        model, cfg, jnp.asarray(b0["betas"]), jnp.asarray(b0["tokens"]))
    state = TrainState.create(
        params=params, batch_stats=bstats, tx=make_optimizer(cfg), rng=rng)
    state = shard_params(state, mesh)
    step = make_sharded_train_step(
        model, cfg, lc_nic_l2_rules(cfg), mesh, state)

    losses = []
    for b in batches:
        local = (
            {k: v[local_slice[0]: local_slice[1]] for k, v in b.items()}
            if local_slice is not None else b
        )
        # explicit global batch size: uneven hosts feed different-sized
        # local slices, from which jax cannot infer the global axis
        g = global_batch_from_host_local(local, mesh, with_voxel_axis=True,
                                         global_rows=cfg.batch_size)
        state, metrics = step(state, g["betas"], g["tokens"], g["target"])
        losses.append(
            float(np.asarray(metrics["loss"].addressable_data(0))))

    # final parameter norm: a single replicated scalar summarising the full
    # trained state (computed on-mesh; every process reads its local copy)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def pnorm(params):
        return jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(params)))

    norm = jax.jit(
        pnorm, out_shardings=NamedSharding(mesh, P()))(state.params)

    # phase 2: the production K-steps-per-call SCANNED trainer over a
    # mesh-sharded HBM store (store voxel axis over 'model'), driven across
    # the same process topology — the training path flagship runs actually
    # use (tpu.scan_steps), not just the per-step one
    from masters_thesis_tpu.parallel.sharding import (
        make_sharded_scanned_train_steps,
    )

    K = 3
    srng = np.random.default_rng(11)
    store_h = srng.standard_normal(
        (4 * cfg.batch_size, d["n_voxels"])).astype(np.float32)
    idx_h = srng.integers(
        0, store_h.shape[0], (K, cfg.batch_size)).astype(np.int32)
    ktok_h = srng.integers(
        1, cfg.vocab_size, (K, cfg.batch_size, cfg.max_length)
    ).astype(np.int32)
    ktgt_h = np.concatenate(
        [ktok_h[:, :, 1:],
         np.zeros((K, cfg.batch_size, 1), np.int32)], axis=2)
    # the store's sharded axis ('model') does not span processes, so a
    # plain device_put from the (identical) host copy works everywhere;
    # the batch axis DOES span processes — each host contributes its rows
    store_g = jax.device_put(
        jnp.asarray(store_h), NamedSharding(mesh, P(None, "model")))
    kb = NamedSharding(mesh, P(None, "data"))
    if local_slice is None:
        idx_g = jax.device_put(jnp.asarray(idx_h), kb)
        ktok_g = jax.device_put(jnp.asarray(ktok_h), kb)
        ktgt_g = jax.device_put(jnp.asarray(ktgt_h), kb)
    else:
        lo, hi = local_slice
        # explicit global shapes (uneven-host rule, see above)
        idx_g = jax.make_array_from_process_local_data(
            kb, idx_h[:, lo:hi], idx_h.shape)
        ktok_g = jax.make_array_from_process_local_data(
            kb, ktok_h[:, lo:hi], ktok_h.shape)
        ktgt_g = jax.make_array_from_process_local_data(
            kb, ktgt_h[:, lo:hi], ktgt_h.shape)
    sstep = make_sharded_scanned_train_steps(
        model, cfg, lc_nic_l2_rules(cfg), mesh, state)
    state, smetrics = sstep(state, store_g, idx_g, ktok_g, ktgt_g)
    scanned_losses = [
        float(x) for x in
        np.asarray(smetrics["loss"].addressable_data(0)).reshape(-1)
    ]
    snorm = jax.jit(
        pnorm, out_shardings=NamedSharding(mesh, P()))(state.params)
    return {
        "losses": losses,
        "param_norm": float(np.asarray(norm.addressable_data(0))),
        "scanned_losses": scanned_losses,
        "scanned_param_norm": float(np.asarray(snorm.addressable_data(0))),
    }


def _host_batch_slice(mesh, batch: int) -> tuple[int, int]:
    """(row0, row1) of a size-``batch`` global batch this process owns —
    mesh-ownership slicing shared with the product path (one
    implementation: MeshInputPlacer computes owned data rows from the mesh,
    so uneven hosts feed proportional slices)."""
    from masters_thesis_tpu.parallel.sharding import MeshInputPlacer

    placer = MeshInputPlacer(mesh)
    assert batch % placer.data_size == 0, (
        f"batch {batch} not divisible by data axis {placer.data_size}")
    per = batch // placer.data_size
    lo, hi = placer._owned
    return lo * per, hi * per


def _child_main(argv) -> None:
    """Runs inside each spawned process (env prepared by the launcher)."""
    from masters_thesis_tpu.parallel.mesh import (
        make_mesh,
        maybe_distributed_init,
    )

    maybe_distributed_init()
    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    mesh = make_mesh(model=2)
    report = _drive_once(
        mesh, local_slice=_host_batch_slice(mesh, DRIVE["batch"]))
    report.update(
        process_index=pid, process_count=nproc,
        n_global_devices=len(jax.devices()),
        n_local_devices=len(jax.local_devices()),
    )
    if pid == 0:
        print("MPDRIVE " + json.dumps(report), flush=True)


def single_process_reference() -> dict:
    """The identical program on an in-process mesh (>= 2 devices)."""
    from masters_thesis_tpu.parallel.mesh import make_mesh

    return _drive_once(make_mesh(model=2))


def run_multiprocess_drive(
    n_processes: int = 2, devices_per_process: int = 4,
    timeout: int = 900, attempts: int = 3,
) -> dict:
    """Launch the drive across real OS processes; return process 0's report.

    The children import THIS module, so the trained program is byte-identical
    to ``single_process_reference``'s — only the process topology differs.

    Free-port discovery (bind/close/hand the number to the children) is a
    TOCTOU race: another process can claim the port during child startup
    (seconds of interpreter + jax import before the coordinator binds).
    An attempt whose failure LOOKS like that race (bind/connect errors in
    the child stderr) is retried on a fresh port up to ``attempts`` times;
    any other failure — a deterministic child crash, a missing report —
    raises immediately so a real regression is not re-run 3x and
    mislabelled as flake. Hangs stay bound by ``timeout`` per attempt and
    are never retried.
    """
    return _retry_port_races(
        lambda: _run_multiprocess_drive_once(
            n_processes, devices_per_process, timeout),
        attempts, "multiprocess drive")


def _retry_port_races(fn, attempts: int, what: str):
    last_err: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except NoReportError:
            # children ran to completion without a report — a harness
            # regression, not a race; surface on the first attempt
            raise
        except ChildrenFailed as e:
            # per-child classification: ALL failed children must look
            # race-like (a deterministic coordinator-child crash makes the
            # PEERS print 'failed to connect' — not a race)
            if not (e.child_errors
                    and all(_looks_like_port_race(c)
                            for c in e.child_errors)):
                raise
            last_err = e
        except RuntimeError as e:
            if not _looks_like_port_race(str(e)):
                raise
            last_err = e
    raise RuntimeError(
        f"{what} failed after {attempts} attempts") from last_err


class NoReportError(RuntimeError):
    """Children exited 0 but no report line was found — a harness
    regression, never a port race (excluded from retry: the child stdout
    embedded in the message can contain words like 'coordinator' from jax
    logging, which the race heuristic must not match on)."""


class ChildrenFailed(RuntimeError):
    """One or more children exited nonzero; carries each child's stderr
    separately so the race heuristic can classify PER CHILD — when the
    coordinator child dies deterministically, the PEERS' stderr contains
    'failed to connect', and an aggregate string match would relabel the
    regression as a race. Race iff EVERY failed child looks race-like."""

    def __init__(self, message: str, child_errors=()):
        super().__init__(message)
        self.child_errors = list(child_errors)


# Round-5 tightened markers (ADVICE r4): only phrases specific to the
# bind/connect phase. Bare "unavailable"/"deadline"/"coordinator" matched
# any deterministic distributed-init crash whose traceback mentioned the
# coordinator and re-ran real regressions 3x before surfacing them.
_PORT_RACE_MARKERS = (
    "address already in use", "failed to bind", "bind failed",
    "connection refused", "failed to connect",
)
# grpc's wrapped errors ("UNAVAILABLE: ...", "deadline exceeded") count
# only when the same text also mentions the connect/bind phase
_PORT_RACE_WEAK = ("unavailable", "deadline exceeded")
_PORT_RACE_CONTEXT = ("bind", "connect", "coordinator_address")


def _looks_like_port_race(err_text: str) -> bool:
    t = err_text.lower()
    if any(m in t for m in _PORT_RACE_MARKERS):
        return True
    return any(m in t for m in _PORT_RACE_WEAK) and any(
        c in t for c in _PORT_RACE_CONTEXT)


def _launch_children(child_code: str, n_processes: int,
                     devices_per_process, timeout: int,
                     child_args=(), report_tag: str = "MPDRIVE") -> dict:
    """Spawn N coordinated child interpreters; return the tagged JSON
    report from whichever child printed one (process 0 by convention).

    ``devices_per_process`` may be an int (uniform hosts) or a per-process
    list (uneven hosts — e.g. [4, 2] gives process 0 four virtual devices
    and process 1 two, so per-host batch slices are unequal)."""
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    if isinstance(devices_per_process, int):
        devices_per_process = [devices_per_process] * n_processes
    assert len(devices_per_process) == n_processes

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    base = dict(os.environ)
    base.pop("JAX_PLATFORMS", None)  # children pin cpu themselves
    base["PYTHONPATH"] = repo_root + os.pathsep + base.get("PYTHONPATH", "")
    base_flags = [f for f in base.get("XLA_FLAGS", "").split()
                  if not f.startswith("--xla_force_host_platform_device_count")]

    procs = []
    for pid in range(n_processes):
        env = dict(base)
        env["XLA_FLAGS"] = " ".join(
            base_flags + [f"--xla_force_host_platform_device_count="
                          f"{devices_per_process[pid]}"])
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_processes)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", child_code, *map(str, child_args)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    import time as _time

    deadline = _time.monotonic() + timeout
    outs = []
    failed = []
    for pid, p in enumerate(procs):
        try:
            # ONE shared deadline: sequential reaping with the full timeout
            # each would bound a hung drive by n*timeout, not timeout
            out, err = p.communicate(
                timeout=max(1.0, deadline - _time.monotonic()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            for q in procs:  # reap the killed children (no zombies/fds)
                try:
                    q.communicate(timeout=10)
                except Exception:
                    pass
            raise
        outs.append(out)
        if p.returncode != 0:
            failed.append((pid, p.returncode, err[-2000:]))
    if failed:
        raise ChildrenFailed(
            f"multiprocess drive failed: {failed}",
            child_errors=[err for _, _, err in failed])
    for out in outs:
        for line in out.splitlines():
            if line.startswith(report_tag + " "):
                report = json.loads(line[len(report_tag) + 1:])
                report["n_processes"] = n_processes
                report["devices_per_process"] = devices_per_process
                return report
    raise NoReportError(f"no {report_tag} report in child output: {outs}")


def _run_multiprocess_drive_once(
    n_processes: int, devices_per_process, timeout: int,
) -> dict:
    child_code = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from masters_thesis_tpu.parallel.multiprocess import _child_main\n"
        "_child_main(sys.argv[1:])\n"
    )
    return _launch_children(
        child_code, n_processes, devices_per_process, timeout)


# ------------------------------------------------------- product-path drive
# Round 5: the drives above exercise the sharded STEP functions; these drive
# the actual production entry — experiment.run_training with tpu.mesh_* set —
# across OS processes: Trainer, callbacks, sharded orbax checkpointing,
# scanned train + scanned val, per-host input slices. The parent (or the
# test) compares the per-epoch loss trajectory and final parameter norm
# against the IDENTICAL single-process run, and restores the multi-process-
# written sharded checkpoint on a different topology.


def train_drive_config(run_root: str, mesh_model: int = 2,
                       scan_steps: int = 2, mesh_data: int = 0):
    """Tiny flagship-family config for the product-path drive; every axis
    divides a (data, model=2) mesh and the structured-synthetic data makes
    the loss genuinely decrease."""
    from masters_thesis_tpu.config import (
        Config,
        DatasetConfig,
        InputConfig,
        TPUConfig,
    )

    # mesh_model=0: the UNSHARDED single-device trainer on the same config
    # (cross-topology restore / trajectory anchor). mesh_data=0 (default)
    # spans all devices; an explicit value pins the data axis (the in-
    # process anchor for uneven-host drives, whose data axis is smaller
    # than all-devices/model).
    tpu = (TPUConfig(mesh_data=mesh_data, mesh_model=mesh_model,
                     scan_steps=scan_steps, use_pallas=False,
                     prefetch_depth=0)
           if mesh_model else
           TPUConfig(scan_steps=scan_steps, use_pallas=False,
                     prefetch_depth=0))
    return Config(
        run="mpdrive", log=run_root, epochs=2, batch_size=8, max_length=6,
        top_k=63, units=16, attn_units=8, group_size=4, embedding_text=8,
        seed=3, input=InputConfig(full=256),
        dataset=DatasetConfig(synthetic="structured"),
        tpu=tpu,
    )


TRAIN_DRIVE_SMOKE_KEYS = 24


def _training_report(run_path: str, bundle, logs) -> dict:
    """Per-epoch trajectory + a replicated final-param norm."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def pnorm(params):
        return jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(params)))

    state = bundle["state"]
    # pin the scalar REPLICATED: every process must be able to read it
    # locally (an unconstrained placement may land it on one host only —
    # the same rule as make_sharded_eval_step's metric outputs)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    leaf_sh = getattr(leaf, "sharding", None)
    if isinstance(leaf_sh, NamedSharding):
        norm = jax.jit(
            pnorm, out_shardings=NamedSharding(leaf_sh.mesh, P()),
        )(state.params)
    else:
        norm = jax.jit(pnorm)(state.params)
    report = {
        "run_path": run_path,
        "final_loss": float(logs.get("loss", float("nan"))),
        "final_val_loss": float(logs.get("val_loss", float("nan"))),
        "param_norm": float(np.asarray(norm.addressable_data(0))),
        "latest_epoch": bundle["manager"].latest_epoch(),
    }
    metrics_path = os.path.join(run_path, "metrics.jsonl")
    if os.path.exists(metrics_path):
        rows = [json.loads(l) for l in open(metrics_path) if l.strip()]
        report["epoch_losses"] = [
            r["loss"] for r in rows if r.get("kind") == "epoch"]
        report["epoch_val_losses"] = [
            r["val_loss"] for r in rows
            if r.get("kind") == "epoch" and "val_loss" in r]
    return report


def run_training_inprocess(run_root: str, mesh_model: int = 2,
                           epochs: int = 2, scan_steps: int = 2,
                           resume: bool = False, mesh_data: int = 0) -> dict:
    """The drive's run_training call, shared verbatim by the in-process
    reference and the spawned children so the trained program is identical."""
    from masters_thesis_tpu.experiment import run_training

    cfg = train_drive_config(run_root, mesh_model, scan_steps, mesh_data)
    run_path, logs, bundle = run_training(
        cfg, epochs=epochs, smoke_keys=TRAIN_DRIVE_SMOKE_KEYS, resume=resume)
    return _training_report(run_path, bundle, logs)


def _train_child_main(argv) -> None:
    from masters_thesis_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init()
    import jax

    run_root, mesh_model, epochs, scan_steps, resume = (
        argv[0], int(argv[1]), int(argv[2]), int(argv[3]), argv[4] == "1")
    report = run_training_inprocess(
        run_root, mesh_model=mesh_model, epochs=epochs,
        scan_steps=scan_steps, resume=resume)
    report.update(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        n_global_devices=len(jax.devices()),
        n_local_devices=len(jax.local_devices()),
    )
    if jax.process_index() == 0:
        print("MPTRAIN " + json.dumps(report), flush=True)


def run_multiprocess_training(
    run_root: str, n_processes: int = 2, devices_per_process=4,
    mesh_model: int = 2, epochs: int = 2, scan_steps: int = 2,
    resume: bool = False, timeout: int = 900, attempts: int = 3,
) -> dict:
    """Launch run_training across real OS processes; returns process 0's
    report. ``devices_per_process`` may be a list for uneven hosts."""
    child_code = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from masters_thesis_tpu.parallel.multiprocess import "
        "_train_child_main\n"
        "_train_child_main(sys.argv[1:])\n"
    )
    return _retry_port_races(
        lambda: _launch_children(
            child_code, n_processes, devices_per_process, timeout,
            child_args=(run_root, mesh_model, epochs, scan_steps,
                        "1" if resume else "0"),
            report_tag="MPTRAIN"),
        attempts, "multiprocess training drive")


def _cli_train_child_main(argv) -> None:
    """`mtt train --processes P` child: the user's config through the
    production run_training, distributed-bootstrapped."""
    from masters_thesis_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init()
    import jax

    from masters_thesis_tpu.config import load_config
    from masters_thesis_tpu.experiment import run_training

    config_path, epochs_s, smoke_keys_s, resume_s = argv[:4]
    cfg = load_config(config_path)
    if cfg.tpu.mesh_data == 1 and cfg.tpu.mesh_model == 1:
        # a 1x1 mesh would train P independent unsharded copies; default
        # the distributed launch to data-parallel over every global device
        cfg.tpu.mesh_data = 0
    run_path, logs, bundle = run_training(
        cfg,
        epochs=None if epochs_s == "none" else int(epochs_s),
        smoke_keys=int(smoke_keys_s),
        resume=resume_s == "1",
    )
    if jax.process_index() == 0:
        report = _training_report(run_path, bundle, logs)
        report.update(process_count=jax.process_count(),
                      n_global_devices=len(jax.devices()))
        print("MPTRAIN " + json.dumps(report), flush=True)


def launch_cli_train(config_path: str, n_processes: int = 2,
                     devices_per_process=4, epochs: int | None = None,
                     smoke_keys: int = 48, resume: bool = False,
                     timeout: int = 3600, attempts: int = 3) -> dict:
    """The `mtt train --processes P` launcher: P coordinated children run
    the production run_training on the user's config."""
    child_code = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from masters_thesis_tpu.parallel.multiprocess import "
        "_cli_train_child_main\n"
        "_cli_train_child_main(sys.argv[1:])\n"
    )
    return _retry_port_races(
        lambda: _launch_children(
            child_code, n_processes, devices_per_process, timeout,
            child_args=(os.path.abspath(config_path),
                        "none" if epochs is None else epochs,
                        smoke_keys, "1" if resume else "0"),
            report_tag="MPTRAIN"),
        attempts, "mtt train --processes")


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child_main(sys.argv)
    else:
        rep = run_multiprocess_drive()
        print(json.dumps(rep))
