"""Async checkpointing: saves overlap training; meta/prune bookkeeping is
deferred until the write commits, and every read path flushes the in-flight
save first (so nothing observable changes vs the old synchronous saves)."""

import json
import os
from types import SimpleNamespace

import numpy as np

from masters_thesis_tpu.train.checkpoint import CheckpointManager


class _S(SimpleNamespace):
    def replace(self, **kw):
        d = vars(self).copy()
        d.update(kw)
        return _S(**d)


def _state(x: float):
    return _S(
        params={"dense": {"kernel": np.full((4, 4), x, np.float32)}},
        batch_stats={},
        opt_state={"m": np.zeros((4, 4), np.float32)},
        step=np.int32(int(x)),
        rng=np.zeros((2,), np.uint32),
    )


def test_async_save_visible_after_read(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(_state(1.0), epoch=0, val_loss=2.0)
    # read paths flush the pending write
    assert mgr.latest_epoch() == 0
    assert mgr.best_epoch() == 0
    restored = mgr._ckpt.restore(mgr._epoch_dir(0))
    assert restored["params"]["dense"]["kernel"][0, 0] == 1.0


def test_meta_deferred_until_commit(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(_state(1.0), epoch=0, val_loss=2.0)
    mgr.save(_state(2.0), epoch=1, val_loss=1.0)  # finalizes epoch 0 first
    # epoch 1 may still be in flight: meta on disk reflects only epoch 0
    with open(os.path.join(str(tmp_path), "meta.json")) as f:
        meta = json.load(f)
    assert meta["latest"] == 0
    mgr.close()
    with open(os.path.join(str(tmp_path), "meta.json")) as f:
        meta = json.load(f)
    assert meta["latest"] == 1
    assert meta["best_epoch"] == 1  # val 1.0 < 2.0


def test_prune_and_best_across_async_saves(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(_state(0.0), epoch=0, val_loss=0.5)  # stays: best
    for e in range(1, 5):
        mgr.save(_state(float(e)), epoch=e, val_loss=1.0 + e)
    mgr.close()
    kept = sorted(d for d in os.listdir(str(tmp_path)) if d.startswith("ep"))
    assert kept == ["ep000", "ep003", "ep004"]  # best + last 2
    assert mgr.best_epoch() == 0
    state, epoch = mgr.restore(_state(9.0), best=True)
    assert epoch == 0
    assert state.params["dense"]["kernel"][0, 0] == 0.0
