"""Seed-fixed reproducibility: the reference pins seed 42 everywhere
(config.yaml:24, main.py:54-55); here the same config must produce identical
parameters, identical training trajectories, and identical captions."""

import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.experiment import run_eval, run_training


def _train(tmp_path, tag):
    cfg = Config(run=f"det_{tag}", model="lc_nic", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path / tag), seed=42)
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    out = run_eval(bundle, run_path)
    return logs, bundle, out


def test_same_seed_same_everything(shared_run, tmp_path):
    # side 1 is the session-shared run: identical cfg numerics (run name and
    # log dir differ, which MUST NOT affect training) — so this now also
    # pins that run/dir naming never leaks into the trajectory
    run_path1, logs1, b1, _cfg = shared_run()
    out1 = run_eval(b1, run_path1)
    logs2, b2, out2 = _train(tmp_path, "b")
    assert logs1["loss"] == logs2["loss"]
    np.testing.assert_array_equal(out1["words"], out2["words"])
    assert out1["texts"] == out2["texts"]
    k1 = np.asarray(b1["state"].params["lstm"]["kernel"])
    k2 = np.asarray(b2["state"].params["lstm"]["kernel"])
    np.testing.assert_array_equal(k1, k2)


def test_different_seed_differs(shared_run, tmp_path):
    _rp, logs1, b1, _cfg = shared_run()
    cfg = Config(run="det_d", model="lc_nic", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path / "d"), seed=7)
    run_path, logs2, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    assert logs1["loss"] != logs2["loss"]
