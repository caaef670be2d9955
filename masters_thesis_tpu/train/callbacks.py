"""Training callbacks: loss history CSV, batch CSV, epoch-end caption preview.

Reference observability (AttemptFour/Callbacks/): LossHistory writes per-epoch
train/val metrics to loss_history.csv plus modelsummary.txt (EpochLoss.py:12-52),
BatchLoss streams per-batch CSV (BatchLoss.py:8-48), Predict renders epoch-end
greedy captions (Predict.py:6-59), WarmupScheduler ramps the LR
(WarmupScheduler.py:4-36).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from masters_thesis_tpu.utils.logging import CSVLogger

logger = logging.getLogger("masters_thesis_tpu")


class Callback:
    def on_train_begin(self, trainer):
        pass

    def on_epoch_end(self, trainer, epoch: int, logs: dict):
        pass

    def on_batch_end(self, trainer, step: int, logs: dict):
        pass

    def on_train_end(self, trainer):
        pass

    def on_error(self, trainer, exc: BaseException):
        pass

    def on_interrupt(self, trainer, epoch: int):
        """KeyboardInterrupt mid-epoch — persist what should survive
        (main.py:365-372 partial-save semantics)."""
        pass


class ErrorLog(Callback):
    """On an unhandled training exception: dump the traceback to
    <run>/error.log and push a failure notification
    (CNN_RNN/train.py:527-531 + the Tensorbot err_var push :46)."""

    def __init__(self, run_path: str, notifier=None):
        self.path = os.path.join(run_path, "error.log")
        self.notifier = notifier

    def on_error(self, trainer, exc):
        import traceback

        with open(self.path, "a") as f:
            f.write(traceback.format_exc())
        if self.notifier is not None:
            try:
                self.notifier.send(f"training failed: {exc!r}")
            except Exception:
                pass  # a dead notifier must never mask the real error


class LossHistory(Callback):
    """Per-epoch CSV (loss_history.csv) — EpochLoss.LossHistory equivalent."""

    FIELDS = ["epoch", "loss", "accuracy", "L2", "val_loss", "val_accuracy"]

    def __init__(self, run_path: str):
        self.csv = CSVLogger(os.path.join(run_path, "loss_history.csv"), self.FIELDS)

    def on_epoch_end(self, trainer, epoch, logs):
        row = {"epoch": epoch}
        row.update({k: f"{float(v):.6f}" for k, v in logs.items() if k in self.FIELDS})
        self.csv.write(row)


class BatchLoss(Callback):
    """Per-batch CSV — BatchLoss equivalent (grad_norm column plays the role
    of the reference's df_grads.csv dump, main.py:359-361)."""

    FIELDS = ["step", "loss", "accuracy", "L2", "grad_norm"]

    def __init__(self, run_path: str, every: int = 1):
        self.csv = CSVLogger(
            os.path.join(run_path, "batch_training_log.csv"), self.FIELDS
        )
        self.every = every
        self._pending: list = []

    def on_batch_end(self, trainer, step, logs):
        # metrics may still live on device (the per-step path hands them
        # over un-fetched): float()-ing here would block the host on every
        # step's device call — buffer and format at epoch end instead
        # (identical CSV; the scanned path already defers delivery)
        if step % self.every == 0:
            self._pending.append(
                (step, {k: v for k, v in logs.items() if k in self.FIELDS}))

    def _flush(self):
        for step, logs in self._pending:
            row = {"step": step}
            row.update({k: f"{float(v):.6f}" for k, v in logs.items()})
            self.csv.write(row)
        self._pending.clear()

    def on_epoch_end(self, trainer, epoch, logs):
        self._flush()

    def on_train_end(self, trainer):
        # runs in the trainer's finally: no rows are lost on error/interrupt
        self._flush()


def _preview_betas(trainer, batch):
    """Device betas for a stored preview batch: host rows when the pipeline
    staged them, device gather by index for HBM-resident stores (one shared
    helper — the same branch used to live in three callbacks)."""
    import jax.numpy as jnp

    if "betas" in batch:
        return jnp.asarray(batch["betas"])
    return trainer.store.device_gather(batch["idx"])


class PredictPreview(Callback):
    """Epoch-end greedy captions on a fixed validation batch (Predict.py)."""

    def __init__(self, run_path: str, decoder, batch, tokenizer, every: int = 1):
        self.path = os.path.join(run_path, "caption_previews.txt")
        self.decoder = decoder
        self.batch = batch
        self.tokenizer = tokenizer
        self.every = every

    def on_epoch_end(self, trainer, epoch, logs):
        if epoch % self.every:
            return
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        betas = _preview_betas(trainer, self.batch)
        words, _, _ = self.decoder(variables, betas, self.tokenizer.start_id)
        texts = self.tokenizer.sequences_to_texts(list(words))
        with open(self.path, "a") as f:
            f.write(f"=== epoch {epoch} ===\n")
            for t in texts[:8]:
                f.write(t + "\n")


class CaptionMetrics(Callback):
    """Decoded caption metrics on the val split DURING training (round 4).

    The reference runs its train -> eval.py -> metric_suit.py loop once,
    after training (AttemptFour/main.py:269-281); this callback closes that
    loop every ``every`` epochs (and on the final epoch): greedy-decode one
    row per val key with the CURRENT params, score corpus BLEU-1/BLEU-4 +
    CIDEr against the per-key references, log to metrics.jsonl
    (kind="caption_metrics") and keep the curve in ``history`` for
    run_meta.json — the convergence evidence that caption quality, not just
    loss, improves.
    """

    def __init__(self, decoder, pipe, tokenizer, refs_by_key,
                 every: int = 5):
        self.decoder = decoder
        self.pipe = pipe          # EvalPipeline over unique-key val pairs
        self.tokenizer = tokenizer
        self.refs = refs_by_key   # key -> [plain reference texts]
        self.every = max(1, every)
        self.history: list = []

    def on_epoch_end(self, trainer, epoch, logs):
        last = (getattr(trainer, "_target_epochs", 0) or 0) - 1
        if epoch % self.every and epoch != last:
            return
        from masters_thesis_tpu.evalsuite.bleu import corpus_bleu
        from masters_thesis_tpu.evalsuite.cider import CiderScorer
        from masters_thesis_tpu.evalsuite.tokens import ids_to_caption

        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        texts, keys = [], []
        for batch in self.pipe.epoch():
            betas = _preview_betas(trainer, batch)
            words, _, _ = self.decoder(
                variables, betas, self.tokenizer.start_id)
            valid = batch["valid"]
            for row in np.asarray(words)[valid]:
                texts.append(ids_to_caption(row, self.tokenizer))
            keys.extend(int(k) for k in batch["keys"][valid])
        refs = [[r.split() for r in self.refs[k]] for k in keys]
        hyps = [t.split() for t in texts]
        bleu = corpus_bleu(refs, hyps, max_n=4)
        cider, _ = CiderScorer().compute(refs, hyps)
        row = {
            "epoch": epoch,
            "val_bleu1": round(float(bleu[0]), 5),
            "val_bleu4": round(float(bleu[3]), 5),
            "val_cider": round(float(cider), 5),
            "n_captions": len(texts),
        }
        self.history.append(row)
        logs.update({k: v for k, v in row.items()
                     if k.startswith("val_")})
        if trainer.metric_logger is not None:
            trainer.metric_logger.log("caption_metrics", **row)
        logger.info(
            "caption_metrics epoch %d: BLEU-4=%.4f CIDEr=%.4f (%d captions)",
            epoch, row["val_bleu4"], row["val_cider"], len(texts))


def load_stimulus_images(images_path: str, keys, max_images: int = 4):
    """Best-effort load of stimulus pictures ``KID{key}.(png|jpg|jpeg|npy)``
    for a preview batch (soloist TensorBoardCaption.py:38 loads a pics dir).

    Returns a list aligned with ``keys[:max_images]`` — ``None`` where no
    file exists — or ``None`` when the dir is unset/missing or nothing was
    found (the preview then renders text-only banners)."""
    import os

    if not images_path or not os.path.isdir(images_path):
        return None
    out, found = [], False
    for key in list(keys)[:max_images]:
        img = None
        for ext in ("png", "jpg", "jpeg", "npy"):
            p = os.path.join(images_path, f"KID{int(key)}.{ext}")
            if not os.path.exists(p):
                continue
            try:
                if ext == "npy":
                    import numpy as _np

                    img = _np.load(p)
                else:
                    from PIL import Image

                    img = Image.open(p).convert("RGB")
                    import numpy as _np

                    img = _np.asarray(img)
                found = True
                break
            except Exception:
                # unreadable file -> try the key's next format (a corrupt
                # .png used to mask a perfectly loadable .npy)
                img = None
        out.append(img)
    return out if found else None


class CaptionImagePreview(Callback):
    """Epoch-end captions rendered onto their stimulus images as TensorBoard
    image summaries (soloist TensorBoardCaption.py:49-99). ``images`` aligns
    with the preview batch rows; None entries render a text-only banner
    (betas models have no stimulus pixels at train time)."""

    def __init__(self, logdir: str, decoder, batch, tokenizer,
                 images=None, every: int = 1, max_images: int = 4):
        from masters_thesis_tpu.utils.tensorboard import EventWriter

        self.writer = EventWriter(logdir, filename_suffix=".captions")
        self.decoder = decoder
        self.batch = batch
        self.tokenizer = tokenizer
        self.images = images
        self.every = every
        self.max_images = max_images

    def on_epoch_end(self, trainer, epoch, logs):
        if epoch % self.every:
            return
        from masters_thesis_tpu.utils.tensorboard import render_caption_image

        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        betas = _preview_betas(trainer, self.batch)
        words, _, _ = self.decoder(variables, betas, self.tokenizer.start_id)
        texts = self.tokenizer.sequences_to_texts(list(words))
        for i, text in enumerate(texts[: self.max_images]):
            img = None if self.images is None else self.images[i]
            png, h, w = render_caption_image(img, text)
            self.writer.image(f"captions/sample_{i}", png, h, w, epoch)

    def on_train_end(self, trainer):
        self.writer.close()


class Checkpointing(Callback):
    """Epoch-end checkpoint saves. Saves are ASYNC (the write overlaps the
    next epoch's training — CheckpointManager stages to host inside save);
    train end / error / interrupt flush the in-flight write."""

    def __init__(self, manager, every: int = 1):
        self.manager = manager
        self._saved_step = None
        # cadence (cfg.tpu.ckpt_every): save every N epochs plus the run's
        # final epoch. With N>1, best-by-val-loss is tracked among SAVED
        # epochs only (Keras save_freq semantics) — an improvement save on
        # every epoch would defeat the knob exactly when training descends
        # monotonically, the common case the contention relief targets.
        self.every = max(1, int(every))
        self._last_val = None

    def on_train_begin(self, trainer):
        # seed the saved-step watermark so the train-end safety net also
        # covers an early stop BEFORE the first cadence save (with
        # _saved_step=None it would end a ckpt_every>1 run checkpoint-less)
        self._saved_step = int(trainer.state.step)

    def on_epoch_end(self, trainer, epoch, logs):
        # remember the epoch's val loss even when the cadence skips, so a
        # train-end safety save still participates in best-by-val-loss
        self._last_val = logs.get("val_loss")
        target = getattr(trainer, "_target_epochs", None)
        is_last = target is not None and epoch >= target - 1
        if not ((epoch + 1) % self.every == 0 or is_last
                or trainer.stop_training):
            return
        self.manager.save(trainer.state, epoch,
                          val_loss=logs.get("val_loss"))
        self._saved_step = int(trainer.state.step)

    def on_interrupt(self, trainer, epoch):
        # save the partial epoch's state as the latest checkpoint so an
        # interrupted run can resume (the reference dumps partial batch data
        # in its finally block, main.py:365-372) — unless no step has run
        # since the last save (preemption right after an epoch-end save):
        # re-saving would rmtree the just-committed checkpoint and burn the
        # preemption grace window rewriting identical state
        if self._saved_step != int(trainer.state.step):
            self.manager.save(trainer.state, epoch, val_loss=None)
            self._saved_step = int(trainer.state.step)
        self.manager.close()

    def on_train_end(self, trainer):
        # cadence safety net: an early-stop callback ordered AFTER this one
        # can set stop_training in the same on_epoch_end where the cadence
        # already skipped — never end training with unsaved steps. Not on
        # the error path (on_error ran): a crash keeps the reference's
        # no-save-on-failure semantics.
        if (not getattr(self, "_errored", False)
                and self._saved_step is not None
                and self._saved_step != int(trainer.state.step)):
            self.manager.save(trainer.state, getattr(trainer, "_epoch", 0),
                              val_loss=self._last_val)
            self._saved_step = int(trainer.state.step)
        self.manager.close()

    def on_error(self, trainer, exc):
        # commit whatever save was in flight before the process unwinds;
        # never let a failing background write mask the training exception
        # (or starve later callbacks' on_error)
        self._errored = True
        try:
            self.manager.close()
        except Exception:
            import logging

            logging.getLogger("masters_thesis_tpu").exception(
                "checkpoint flush failed during error teardown"
            )


class StepProfiling(Callback):
    """Wall-time stats over a step window -> <run>/profile.json
    (profile_batch semantics, main.py:210). In scanned mode batch callbacks
    arrive at epoch end, so the window measures per-dispatch stepping."""

    def __init__(self, run_path: str, n_steps: int, start_step: int = 10):
        from masters_thesis_tpu.utils.profiling import StepProfiler

        self.path = os.path.join(run_path, "profile.json")
        self.profiler = StepProfiler(start_step, start_step + n_steps)

    def on_batch_end(self, trainer, step, logs):
        self.profiler.maybe_tick(step)

    def on_train_end(self, trainer):
        import json

        stats = self.profiler.summary()
        if stats:
            with open(self.path, "w") as f:
                json.dump(stats, f, indent=1)


class TraceCapture(Callback):
    """JAX profiler (XPlane) trace of the first epoch -> <run>/trace/
    (viewable in TensorBoard's profile tab / Perfetto — the deep-dive half
    of the reference's profile_batch plan, SURVEY §5 tracing; enabled via
    ``tpu.profile_trace``)."""

    def __init__(self, run_path: str):
        self.logdir = os.path.join(run_path, "trace")
        self._active = False

    def on_train_begin(self, trainer):
        import jax

        jax.profiler.start_trace(self.logdir)
        self._active = True

    def _stop(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    def on_epoch_end(self, trainer, epoch, logs):
        self._stop()  # first epoch only: traces grow fast

    def on_train_end(self, trainer):
        self._stop()  # safety net for 0-epoch/interrupted runs


class GradStats(Callback):
    """Per-parameter gradient norms/means/maxes -> df_grads.csv
    (main.py:359-361's gradient dump, but per-epoch rather than a single
    train-end snapshot)."""

    def __init__(self, run_path: str, stats_fn, batch, every: int = 1):
        self.path = os.path.join(run_path, "df_grads.csv")
        self.stats_fn = stats_fn
        self.batch = batch
        self.every = every

    def on_epoch_end(self, trainer, epoch, logs):
        if epoch % self.every:
            return
        import jax.numpy as jnp

        betas = _preview_betas(trainer, self.batch)
        stats = self.stats_fn(
            trainer.state, betas, jnp.asarray(self.batch["tokens"]),
            jnp.asarray(self.batch["target"]),
        )
        import csv as _csv

        # header only when the file doesn't exist: per-process state would
        # append a duplicate header mid-CSV on every resumed run
        write_header = not os.path.exists(self.path)
        with open(self.path, "a", newline="") as f:
            w = _csv.writer(f)
            if write_header:
                w.writerow(["epoch", "param", "grad_norm", "grad_mean_abs",
                            "grad_max_abs"])
            for name, (norm, mean_abs, max_abs) in sorted(stats.items()):
                w.writerow([epoch, name, f"{norm:.6e}", f"{mean_abs:.6e}",
                            f"{max_abs:.6e}"])


class TensorBoardScalars(Callback):
    """Per-batch/epoch scalar summaries (main.py:202-211 update_freq='batch')
    via the dependency-free event writer (utils/tensorboard.py)."""

    def __init__(self, logdir: str, batch_every: int = 10):
        from masters_thesis_tpu.utils.tensorboard import EventWriter

        self.writer = EventWriter(logdir)
        self.batch_every = batch_every
        self._pending: list = []

    def on_batch_end(self, trainer, step, logs):
        if step % self.batch_every == 0:
            # buffer device values; float() here blocks the host on the
            # in-flight step in the per-step path — the exact stall
            # BatchLoss's epoch-end buffering exists to avoid
            self._pending.append((step, {
                k: logs[k] for k in ("loss", "accuracy", "L2", "grad_norm")
                if k in logs
            }))

    def _flush(self):
        for step, vals in self._pending:
            self.writer.scalars({k: float(v) for k, v in vals.items()},
                                step, prefix="batch/")
        self._pending = []

    def on_epoch_end(self, trainer, epoch, logs):
        self._flush()
        vals = {k: float(v) for k, v in logs.items()
                if isinstance(v, (int, float))}
        self.writer.scalars(vals, epoch, prefix="epoch/")

    def on_train_end(self, trainer):
        # trainer.fit's finally reaches here on error/interrupt too, so
        # buffered batch rows survive a partial epoch
        self._flush()
        self.writer.close()


class EarlyStopping(Callback):
    """EarlyStoppingByLossVal equivalent (soloist callbacks.py:5-77)."""

    def __init__(self, monitor: str = "val_loss", min_delta: float = 1e-3,
                 patience: int = 5):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.best = None
        self.bad = 0

    def on_epoch_end(self, trainer, epoch, logs):
        val = logs.get(self.monitor)
        if val is None:
            return
        val = float(val)
        if self.best is None or val < self.best - self.min_delta:
            self.best = val
            self.bad = 0
        else:
            self.bad += 1
            if self.bad >= self.patience:
                trainer.stop_training = True
