"""Checkpoint manager: best-by-val-loss + latest, with resume.

Mirrors the reference's three mechanisms (SURVEY.md §5): Keras ModelCheckpoint
h5 best+latest (main.py:167-190), tf.train.CheckpointManager with max_to_keep
and epoch-parse resume (CNN_RNN/train.py:272-287), and warm-start partial
loading (main.py:150-163). Implemented on orbax StandardCheckpointer over the
TrainState pytree.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

_MANAGER_SEQ = 0  # barrier-key namespace per manager (see __init__)


class CheckpointManager:
    """Single- and multi-process. In multi-process runs (jax.distributed
    initialised; the distributed-training product path) every process calls
    ``save``/``restore`` COLLECTIVELY on its addressable shards of the
    sharded TrainState: orbax assembles/distributes the global arrays, the
    primary process alone mutates meta.json / prunes old epochs, and
    barriers keep directory surgery ordered against the collective I/O.
    Checkpoints are topology-independent — a state saved from N processes
    restores on any mesh whose template supplies the new shardings (orbax
    stores global arrays, not per-host shards)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._primary = jax.process_index() == 0
        self._multiproc = jax.process_count() > 1
        if self._multiproc:
            # orbax's default barrier rides jax's sync_global_devices, whose
            # value-equality allgather assumes UNIFORM devices per process
            # and crashes on uneven hosts; the distributed-client KV barrier
            # has no such assumption (and is cheaper — no device collective)
            try:
                from absl import flags as _flags

                flag = _flags.FLAGS[
                    "experimental_orbax_use_distributed_barrier"]
                flag.parse("true")
            except Exception:  # pragma: no cover — older orbax layouts
                pass
        # async save: ocp stages device arrays to host inside save() (safe
        # against the train step's donated buffers), then serializes in a
        # background thread — the next epoch trains while the previous
        # checkpoint writes. Meta/prune bookkeeping is deferred until the
        # write commits (_finalize_pending), so a crash mid-write can only
        # lose the in-flight epoch, never corrupt meta.json.
        try:
            self._ckpt = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        except Exception as exc:  # older orbax: fall back to synchronous saves
            import logging

            logging.getLogger("masters_thesis_tpu").warning(
                "async checkpointer unavailable (%r); epoch saves will "
                "block synchronously", exc,
            )
            self._ckpt = ocp.StandardCheckpointer()
        self._pending: tuple[int, float | None] | None = None
        # unique barrier keys: coordination-service barrier ids are one-shot
        # per PROCESS lifetime, so both the per-manager save sequence AND a
        # per-manager namespace (module counter — SPMD programs construct
        # managers in the same order on every process, e.g. consecutive
        # run_training calls in one interpreter) go into the key
        self._save_seq = 0
        global _MANAGER_SEQ
        _MANAGER_SEQ += 1
        self._barrier_ns = _MANAGER_SEQ
        self._meta_path = os.path.join(self.directory, "meta.json")
        self.meta = self._load_meta()

    def _load_meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"best_val_loss": None, "best_epoch": None, "epochs": []}

    def _save_meta(self) -> None:
        # atomic: meta.json must never be observable half-written (a
        # truncated file would brick resume AND serving at startup)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, self._meta_path)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"ep{epoch:03d}")

    def _barrier(self, tag: str) -> None:
        if self._multiproc:
            # distributed-client KV barrier, not sync_global_devices: the
            # latter's allgather assumes uniform devices per process
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(
                f"mtt-ckpt-{tag}", 120_000)

    # ---- save ----
    def save(self, state, epoch: int, val_loss: float | None = None) -> None:
        """Start an (async) epoch-checkpoint save; best/latest/prune
        bookkeeping for it happens once the write commits. Collective in
        multi-process runs — every process must call it with its shards."""
        self._finalize_pending()
        target = {"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state,
                  "step": np.asarray(state.step),
                  "rng": np.asarray(state.rng)}
        path = self._epoch_dir(epoch)
        # the primary alone decides-and-clears a stale dir; the barrier is
        # UNCONDITIONAL and uniquely keyed so every process reaches the same
        # barrier regardless of what it observed on the filesystem (a
        # per-process exists() check is a TOCTOU against the rmtree: a slow
        # peer checking after the delete would skip the barrier and deadlock
        # the primary) and re-saves of the same epoch can't reuse a
        # one-shot barrier id
        if self._primary and os.path.exists(path):
            shutil.rmtree(path)
        self._save_seq += 1
        self._barrier(f"m{self._barrier_ns}-rm{epoch}-{self._save_seq}")
        self._ckpt.save(path, target)
        self._pending = (epoch, val_loss)

    def _finalize_pending(self) -> None:
        """Block until the in-flight save commits, then apply its
        best/latest/prune bookkeeping."""
        if self._pending is None:
            return
        self._ckpt.wait_until_finished()
        epoch, val_loss = self._pending
        self._pending = None
        if epoch not in self.meta["epochs"]:
            self.meta["epochs"].append(epoch)
        self.meta["latest"] = epoch
        if val_loss is not None and (
            self.meta["best_val_loss"] is None
            or val_loss < self.meta["best_val_loss"]
        ):
            self.meta["best_val_loss"] = float(val_loss)
            self.meta["best_epoch"] = epoch
        # prune: keep best + last max_to_keep. Every process tracks the
        # meta in memory (latest/best must agree for collective restores);
        # only the primary touches the filesystem.
        keep = set(self.meta["epochs"][-self.max_to_keep :])
        if self.meta["best_epoch"] is not None:
            keep.add(self.meta["best_epoch"])
        for e in list(self.meta["epochs"]):
            if (e not in keep and self._primary
                    and os.path.exists(self._epoch_dir(e))):
                shutil.rmtree(self._epoch_dir(e))
        self.meta["epochs"] = [e for e in self.meta["epochs"] if e in keep]
        if self._primary:
            self._save_meta()

    def close(self) -> None:
        """Flush the in-flight save (train end / error / interrupt)."""
        self._finalize_pending()

    # ---- restore ----
    def latest_epoch(self) -> int | None:
        self._finalize_pending()
        return self.meta.get("latest")

    def best_epoch(self) -> int | None:
        self._finalize_pending()
        return self.meta.get("best_epoch")

    def restore(self, state, epoch: int | None = None, best: bool = False):
        """Restore into a template TrainState; returns (state, epoch)."""
        self._finalize_pending()
        if epoch is None:
            epoch = self.best_epoch() if best else self.latest_epoch()
        if epoch is None:
            return state, None
        template = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        restored = self._ckpt.restore(self._epoch_dir(epoch), template)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=int(np.asarray(restored["step"])),
            rng=jax.numpy.asarray(restored["rng"]),
        )
        return state, epoch

    def restore_params_only(self, params, epoch: int | None = None,
                            best: bool = True):
        """Warm-start path (cf. load_weights(by_name=True) eval.py:140)."""
        self._finalize_pending()
        if epoch is None:
            epoch = self.best_epoch() if best else self.latest_epoch()
        if epoch is None:
            return params, None
        full = self._ckpt.restore(self._epoch_dir(epoch))
        return full["params"], epoch


def merge_by_name(template, source) -> tuple[dict, dict]:
    """Keras ``load_weights(by_name=True, skip_mismatch=True)`` semantics
    (main.py:150-163's partial LSTM preloading): copy every leaf whose
    '/'-joined path exists in ``source`` with a matching shape; keep the
    template's init elsewhere. Returns (merged, report)."""
    report = {"loaded": [], "skipped_shape": [], "missing": []}

    from collections.abc import Mapping

    def walk(tpl, src, prefix):
        # Mapping, not dict: flax FrozenDict (older flax returns it from
        # Module.init) must walk too — a dict-only check would silently
        # no-op the whole merge and warm starts would load ZERO weights
        if not isinstance(tpl, Mapping):
            return tpl
        out = {}
        for k, v in tpl.items():
            p = f"{prefix}/{k}" if prefix else k
            s = src.get(k) if isinstance(src, Mapping) else None
            if isinstance(v, Mapping):
                out[k] = walk(v, s if isinstance(s, Mapping) else {}, p)
            elif s is not None and not isinstance(s, Mapping):
                if np.shape(s) == np.shape(v):
                    out[k] = jax.numpy.asarray(s)
                    report["loaded"].append(p)
                else:
                    out[k] = v
                    report["skipped_shape"].append(
                        f"{p}: {np.shape(s)} vs {np.shape(v)}")
            else:
                out[k] = v
                report["missing"].append(p)
        return out

    return walk(template, source, ""), report


def warm_start_from_run(params, run_dir: str) -> tuple[dict, dict]:
    """Preload matching weights from another run's best checkpoint
    (cfg.warm_start). Shape mismatches and absent names keep their fresh
    init — the reference's skip_mismatch warm starts. A run dir with NO
    checkpoints (typo'd path, never-trained run) raises instead of
    silently training from scratch while claiming a warm start (and the
    manager's makedirs would otherwise create the typo'd tree on disk)."""
    model_dir = os.path.join(run_dir, "model")
    if not os.path.isdir(model_dir):
        raise FileNotFoundError(
            f"warm_start run dir {run_dir!r} has no model/ checkpoint "
            "directory — check the path")
    mgr = CheckpointManager(model_dir)
    source, epoch = mgr.restore_params_only(None, best=True)
    if epoch is None:
        source, epoch = mgr.restore_params_only(None, best=False)
    if epoch is None:
        raise FileNotFoundError(
            f"warm_start run dir {run_dir!r} contains no saved checkpoint "
            "epochs — nothing to warm-start from")
    merged, report = merge_by_name(params, source)
    report["source_epoch"] = epoch
    return merged, report
