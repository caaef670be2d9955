"""Head-to-head parity vs the ACTUAL reference source code.

Runs scripts/reference_headtohead.py in a subprocess (it imports the
reference's own lc_NIC/layers/attention modules under legacy Keras 2 and
needs TF_USE_LEGACY_KERAS set before any TF import — the pytest process has
already imported TF with Keras 3 elsewhere) and asserts the deviations:
teacher-forced logits, a 5-step Adam(clipnorm) trajectory, and greedy
captions with transplanted weights. This is BASELINE.md's parity definition
checked against the reference *implementation*, not a re-derivation.
"""

import json
import os
import subprocess
import sys

import pytest

REF = "/root/reference/AttemptFour/Model/lc_NIC.py"
SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "reference_headtohead.py",
)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not present")
def test_headtohead_vs_reference_source():
    env = dict(os.environ)
    env["TF_USE_LEGACY_KERAS"] = "1"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    proc = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])

    # (i) teacher-forced forward: probabilities + attention, eval mode
    assert report["fwd_probs_max_diff"] < 1e-6
    assert report["fwd_attn_max_diff"] < 1e-6
    # (ii) 5-step Adam+clipnorm trajectory: losses and final weights
    #      (incl. the training-mode BatchNorm moving stats)
    assert report["traj_loss_max_diff"] < 1e-5
    assert report["traj_l2_max_diff"] < 1e-5
    for key in ("traj_w_lstm_kernel", "traj_w_dense_out",
                "traj_w_embedding", "traj_w_encoder_g0",
                "traj_bn_moving_mean", "traj_bn_moving_var"):
        assert report[key] < 2e-4, (key, report[key])
    # (iii) greedy captions token-identical, fresh AND trained weights
    assert report["greedy_fresh_mismatches"] == 0
    assert report["greedy_trained_mismatches"] == 0
    assert report["greedy_fresh_mismatches_tokens"] > 0
