"""Trainer: epoch loop with callbacks, metrics, checkpointing, resume.

The reference drives training either via Keras ``model.fit`` or a hand-rolled
epoch loop over callbacks (AttemptFour/main.py:269-363). This Trainer is the
framework's single train orchestrator: device-resident or host-resident beta
stores, jitted steps, KeyboardInterrupt-safe partial-save (main.py:365-372),
and per-epoch validation.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.utils.timing import StepTimer

logger = logging.getLogger(__name__)


def _mean_metrics(all_metrics: list[dict]) -> dict:
    if not all_metrics:
        return {}
    keys = all_metrics[0].keys()
    return {k: float(np.mean([float(m[k]) for m in all_metrics])) for k in keys}


class Trainer:
    def __init__(
        self,
        cfg,
        train_step,
        eval_step,
        state,
        train_pipe,
        val_pipe=None,
        callbacks=(),
        store=None,
        metric_logger=None,
        input_placer=None,
    ):
        self.cfg = cfg
        self.train_step = train_step
        self.eval_step = eval_step
        self.state = state
        self.train_pipe = train_pipe
        self.val_pipe = val_pipe
        self.callbacks = list(callbacks)
        self.store = store
        self.metric_logger = metric_logger
        # mesh-mode input placement (parallel.sharding.MeshInputPlacer):
        # batches go onto the ('data','model') mesh — and in multi-process
        # runs each host feeds only its slice of every (identical, seed-
        # deterministic) global batch. None = single-device jnp.asarray.
        self.input_placer = input_placer
        self.stop_training = False
        self.timer = StepTimer(warmup=2)
        self.scanned_step = None  # set via use_scanned_steps()
        self._scan_from_tables = False
        self._scan_tables = None
        self.scanned_eval = None  # set via use_scanned_eval()
        self._val_scan_args = None
        # host-side step counter: advances by exactly 1 (per-step) or K
        # (scanned) per device call, so batch bookkeeping never has to read
        # state.step (which would block on the in-flight device call and
        # serialize the next chunk behind this one's compute)
        self._host_step = int(state.step)
        self._epoch = 0
        # per-epoch train-phase throughput history (run_meta records the
        # median — single-epoch numbers are noisy under host-link jitter)
        self.epoch_steps_per_sec: list[float] = []

    def use_scanned_steps(self, scanned_step, tables: bool = False) -> None:
        """Enable K-steps-per-device-call training (see
        train.steps.make_scanned_train_steps); requires a device-resident
        store. Activated when cfg.tpu.scan_steps > 0.

        ``tables=True`` expects the from-tables signature
        (make_scanned_train_steps_from_tables): the pipeline's token/target/
        store-index tables are uploaded ONCE and each flush ships only the
        (K, B) pair permutation."""
        self.scanned_step = scanned_step
        self._scan_from_tables = tables
        self._scan_tables = None

    def use_scanned_eval(self, scanned_eval) -> None:
        """Enable the one-call validation pass (see
        train.steps.make_scanned_eval_steps_from_tables); requires a
        device-resident store shared with the val pipeline."""
        self.scanned_eval = scanned_eval

    def _run_epoch_scanned(self, scan_k: int, epoch: int | None = None
                           ) -> list[dict]:
        assert self.store is not None and self.store.device_resident
        data = self.store.device_array()
        if getattr(self, "_scan_from_tables", False) and self._scan_tables is None:
            p = self.train_pipe
            tabs = (p.store_idx.astype(np.int32), p.pairs.tokens, p.targets)
            self._scan_tables = (
                self.input_placer.tables(*tabs)
                if self.input_placer is not None
                else tuple(jnp.asarray(t) for t in tabs)
            )
        train_metrics = []
        chunk: list[dict] = []
        pending: list[tuple[int, int, dict]] = []  # (k, last_step, metrics)

        def flush(chunk):
            k = len(chunk)
            if getattr(self, "_scan_from_tables", False):
                # tables live on device: the chunk is (K, B) int32 pair ids
                sel = np.stack([np.asarray(b["sel"]) for b in chunk])
                sel = (self.input_placer.sel(sel)
                       if self.input_placer is not None
                       else jnp.asarray(sel))
                self.state, metrics = self.scanned_step(
                    self.state, data, *self._scan_tables, sel
                )
                for _ in range(k):
                    self.timer.tick()
                self._host_step += k
                pending.append((k, self._host_step, metrics))
                return
            # stack on host, one transfer per array: stacking jnp.asarray
            # pieces issued 3K tiny host->device copies plus device concats
            # per call — the very per-dispatch overhead the scanned trainer
            # amortises (worst on tunneled runtimes)
            idx = np.stack([np.asarray(b["idx"]) for b in chunk])
            tok = np.stack([np.asarray(b["tokens"]) for b in chunk])
            tgt = np.stack([np.asarray(b["target"]) for b in chunk])
            if self.input_placer is not None:
                idx, tok, tgt = self.input_placer.scan_batch(idx, tok, tgt)
            else:
                idx, tok, tgt = (jnp.asarray(a) for a in (idx, tok, tgt))
            self.state, metrics = self.scanned_step(
                self.state, data, idx, tok, tgt
            )
            for _ in range(k):
                self.timer.tick()
            # keep metrics ON DEVICE: fetching (or reading state.step) here
            # would block on the device call, serializing the next chunk's
            # host->device copies behind this chunk's compute (dominant on
            # tunneled TPUs) — the host counter advances by exactly k
            self._host_step += k
            pending.append((k, self._host_step, metrics))

        try:
            for batch in self.train_pipe.epoch(epoch):
                chunk.append(batch)
                if len(chunk) == scan_k:
                    flush(chunk)
                    chunk = []
                    self._check_preempted()

            if chunk:
                # ragged tail: run singly through the per-step path, with the
                # same timer/callback bookkeeping as full chunks (metrics stay
                # on device; k=1 entries are un-stacked scalars)
                for batch in chunk:
                    betas, tokens, target = self._batch_arrays(batch)
                    self.state, metrics = self.train_step(
                        self.state, betas, tokens, target
                    )
                    self.timer.tick()
                    self._host_step += 1
                    pending.append((1, self._host_step, metrics))
        finally:
            # one deferred fetch for the whole epoch, then fire batch
            # callbacks in order (values identical; delivery batched at
            # epoch end). Runs on preemption/interrupt/error too — the
            # completed steps' rows must reach BatchLoss & co before the
            # partial-save path fires, or the whole partial epoch's metrics
            # silently vanish from the CSVs.
            for k, last_step, metrics in pending:
                host = jax.device_get(metrics)
                for i in range(k):
                    m = (host
                         if k == 1 and np.ndim(next(iter(host.values()))) == 0
                         else {key: val[i] for key, val in host.items()})
                    train_metrics.append(m)
                    for cb in self.callbacks:
                        cb.on_batch_end(self, last_step - k + i + 1, m)
        return train_metrics

    def _batch_arrays(self, batch):
        if self.input_placer is not None:
            if "betas" in batch:
                betas = np.asarray(batch["betas"])
            elif getattr(self.input_placer, "host_store", None) is not None:
                # host copy of the store stashed by run_training's mesh
                # path: per-step batches (incl. the scanned trainer's ragged
                # tail) gather rows on host — eager device gathers on a
                # process-spanning store would not run multi-process
                betas = self.input_placer.host_store[np.asarray(batch["idx"])]
            else:
                # single-process mesh without a host copy: device gather,
                # fetched and re-placed (rare — ragged-tail batches only)
                betas = np.asarray(self.store.device_gather(batch["idx"]))
            return self.input_placer.batch(
                betas, np.asarray(batch["tokens"]), np.asarray(batch["target"]))
        if "betas" in batch:
            betas = jnp.asarray(batch["betas"])
        else:
            betas = self.store.device_gather(batch["idx"])
        return betas, jnp.asarray(batch["tokens"]), jnp.asarray(batch["target"])

    def fit(self, epochs: int | None = None, start_epoch: int = 0) -> dict:
        epochs = epochs if epochs is not None else self.cfg.epochs
        self._target_epochs = epochs  # Checkpointing's final-epoch guarantee
        for cb in self.callbacks:
            cb.on_train_begin(self)
        logs: dict = {}
        # preemption safety: managed TPU runtimes deliver SIGTERM before
        # reclaiming the slice — route it through the same partial-save
        # path as Ctrl-C so the run resumes from the interrupted state
        # (new TPU surface; the reference only handles KeyboardInterrupt).
        # The handler only SETS A FLAG; the raise happens at the next safe
        # point (between batches / after an epoch), so the interrupt can
        # never land inside an in-flight checkpoint save's blocking stage
        # and orphan the very save preemption is supposed to leave behind.
        # Signal handlers only install from the main thread (tune workers
        # run trainers in spawned processes, which qualify).
        import signal
        import threading

        prev_term = None
        installed = False
        self._preempted = False
        if threading.current_thread() is threading.main_thread():
            def _on_term(signum, frame):
                self._preempted = True

            prev_term = signal.signal(signal.SIGTERM, _on_term)
            installed = True
        try:
            for epoch in range(start_epoch, epochs):
                self._epoch = epoch
                logs = self._run_epoch(epoch)
                for cb in self.callbacks:
                    cb.on_epoch_end(self, epoch, logs)
                self._check_preempted()
                if self.stop_training:
                    logger.info("early stopping at epoch %d", epoch)
                    break
        except KeyboardInterrupt:
            # partial-save semantics (main.py:365-372): persist the
            # interrupted state so progress since the last epoch-end
            # checkpoint isn't lost
            logger.warning(
                "KeyboardInterrupt — saving partial state and stopping"
            )
            for cb in self.callbacks:
                cb.on_interrupt(self, self._epoch)
        except Exception as exc:
            # traceback to error.log + failure notification, then re-raise
            # (CNN_RNN/train.py:520-545 semantics)
            for cb in self.callbacks:
                cb.on_error(self, exc)
            raise
        finally:
            if installed:
                # a None previous disposition (C-level handler) cannot be
                # re-installed from Python; SIG_DFL is the best effort
                signal.signal(
                    signal.SIGTERM,
                    prev_term if prev_term is not None else signal.SIG_DFL,
                )
            for cb in self.callbacks:
                cb.on_train_end(self)
        return logs

    def _check_preempted(self) -> None:
        """Raise at a safe point if SIGTERM arrived since the last check."""
        if getattr(self, "_preempted", False):
            self._preempted = False
            raise KeyboardInterrupt("SIGTERM (preemption)")

    def _run_validation(self) -> dict:
        """One validation pass -> mean metrics. With a scanned eval and a
        device-resident store shared with the val pipe, the WHOLE pass is one
        device call over the (cached) unshuffled pair permutation; otherwise
        the per-batch loop."""
        p = self.val_pipe
        if (self.scanned_eval is not None
                and self.store is not None and self.store.device_resident
                and p.store is self.store and p.steps_per_epoch > 0
                and not p.shuffle
                # ceil-batched pipes (EvalPipeline pads its ragged tail)
                # have fewer pairs than steps*bs: the reshape below would
                # fail, and padded rows must not be averaged unmasked
                and len(p.pairs) >= p.steps_per_epoch * p.batch_size):
            if self._val_scan_args is None:
                order = p._order()
                n = p.steps_per_epoch * p.batch_size
                sel = order[:n].reshape(
                    p.steps_per_epoch, p.batch_size).astype(np.int32)
                tabs = (p.store_idx.astype(np.int32), p.pairs.tokens,
                        p.targets)
                if self.input_placer is not None:
                    self._val_scan_args = (
                        *self.input_placer.tables(*tabs),
                        self.input_placer.sel(sel),
                    )
                else:
                    self._val_scan_args = (
                        *(jnp.asarray(t) for t in tabs),
                        jnp.asarray(sel),
                    )
            stacked = jax.device_get(self.scanned_eval(
                self.state, self.store.device_array(), *self._val_scan_args))
            self._check_preempted()
            return {k: float(np.mean(v)) for k, v in stacked.items()}
        val_metrics = []
        for batch in p.epoch():
            betas, tokens, target = self._batch_arrays(batch)
            val_metrics.append(
                self.eval_step(self.state, betas, tokens, target)
            )
            # preemption during validation must not defer the partial
            # save past the SIGTERM grace window
            self._check_preempted()
        return _mean_metrics(jax.device_get(val_metrics))

    def _run_epoch(self, epoch: int) -> dict:
        t0 = time.perf_counter()
        scan_k = getattr(getattr(self.cfg, "tpu", None), "scan_steps", 0)
        if scan_k > 0 and self.scanned_step is not None:
            train_metrics = self._run_epoch_scanned(scan_k, epoch)
        else:
            from masters_thesis_tpu.data.pipeline import device_prefetch

            # mesh runs: the placer IS the placement mechanism — a default-
            # device prefetch would device_put each batch, only for
            # _batch_arrays to pull it back to host and re-place it on the
            # mesh (three transfers where one suffices)
            depth = (0 if self.input_placer is not None else
                     getattr(getattr(self.cfg, "tpu", None),
                             "prefetch_depth", 0))
            train_metrics = []
            for batch in device_prefetch(self.train_pipe.epoch(epoch), depth):
                betas, tokens, target = self._batch_arrays(batch)
                self.state, metrics = self.train_step(
                    self.state, betas, tokens, target
                )
                self.timer.tick()
                train_metrics.append(metrics)
                self._host_step += 1
                for cb in self.callbacks:
                    cb.on_batch_end(self, self._host_step, metrics)
                self._check_preempted()

        logs = _mean_metrics(
            [{k: v for k, v in m.items()} for m in jax.device_get(train_metrics)]
        )
        # the device_get above forces every queued train step to finish, so
        # this clock closes the TRAIN PHASE exactly: steps_per_sec is the
        # integrated trainer's throughput (pipeline + host stacking +
        # dispatch + compute), not polluted by the val pass / epoch-end
        # callbacks the old cross-tick timer attributed to train intervals
        # (dispatch is async on tunneled runtimes, so per-tick deltas never
        # measured compute anyway). Epoch 0 includes compile.
        t_train = time.perf_counter() - t0
        n_train = len(train_metrics)
        if self.val_pipe is not None:
            vlogs = self._run_validation()
            logs.update({f"val_{k}": v for k, v in vlogs.items()})

        logs["epoch_time"] = time.perf_counter() - t0
        logs["steps_per_sec"] = (n_train / t_train if n_train and t_train > 0
                                 else self.timer.steps_per_sec)
        self.epoch_steps_per_sec.append(logs["steps_per_sec"])
        if self.metric_logger is not None:
            self.metric_logger.log("epoch", epoch=epoch, **logs)
        logger.info(
            "epoch %d: loss=%.4f val_loss=%s (%.1fs, %.2f steps/s)",
            epoch,
            logs.get("loss", float("nan")),
            f"{logs['val_loss']:.4f}" if "val_loss" in logs else "n/a",
            logs["epoch_time"],
            logs["steps_per_sec"],
        )
        return logs
