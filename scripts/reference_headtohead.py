"""Head-to-head numerical parity vs the ACTUAL reference implementation.

BASELINE.md's parity target is seed-fixed agreement with the reference
*code*, not with a re-derivation of its architecture. This script imports
the reference's own model modules — /root/reference/AttemptFour/Model/
{lc_NIC,layers,attention}.py — under legacy Keras 2 (tf_keras), builds the
reference ``NIC`` at a small shape, transplants OUR LcNIC parameters into
its Keras weights, and measures:

  1. teacher-forced forward parity (lc_NIC.call_attention :223-263):
     softmax logits + attention scores, inference mode
  2. a 5-step Adam(clipnorm) training trajectory (lc_NIC.train_step
     :328-408 + main.py:96-104 optimizer) on identical synthetic batches:
     per-step CCE/L2 losses and the final weights (incl. BatchNorm moving
     stats, exercising the training-mode BN path)
  3. greedy decode (lc_NIC.greedy_predict_attention :577-638): captions
     must be TOKEN-IDENTICAL, before and after the training steps

All dropout rates are 0 (dropout RNG streams can never agree across
frameworks); everything else — LocallyDense ragged groups, BatchNorm
train/eval behavior, LSTM gate math, loss composition CCE + tf.add_n(L2),
Adam(beta_2=.98, eps=1e-8, clipnorm=.1) — runs at the reference's exact
semantics.

Prints ONE JSON line of measured deviations; tests/test_reference_parity.py
runs this in a subprocess (TF_USE_LEGACY_KERAS=1 must be set before TF
imports, and the reference dir is appended to sys.path — neither belongs in
the pytest process) and asserts the thresholds.
"""

from __future__ import annotations

import json
import os
import sys
import types

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")   # reference is Keras-2 era
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # deterministic fp32 CPU
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_MODEL_DIR = "/root/reference/AttemptFour/Model"

# small shape — ragged groups exercise the bucketing/padding parity
N_VOXELS, GROUP_SIZES = 64, [5, 7, 9, 11, 3, 13]
D, UNITS, ATTN, VOCAB, T, E, B = 8, 16, 4, 23, 6, 12, 4
STEPS = 5


def _stub_tensorflow_addons():
    """lc_NIC.py imports two tensorflow_addons symbols (seq2seq,
    LayerNormLSTMCell) that the flagship path never touches; tfa is not in
    this image, so satisfy the imports with empty stand-ins."""
    tfa = types.ModuleType("tensorflow_addons")
    tfa.seq2seq = types.ModuleType("tensorflow_addons.seq2seq")
    rnn = types.ModuleType("tensorflow_addons.rnn")
    rnn.LayerNormLSTMCell = type("LayerNormLSTMCell", (), {})
    tfa.rnn = rnn
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.seq2seq"] = tfa.seq2seq
    sys.modules["tensorflow_addons.rnn"] = rnn


def build_reference_model(groups, betas, tokens, a0):
    import tensorflow as tf

    _stub_tensorflow_addons()
    sys.path.insert(0, REF_MODEL_DIR)
    import lc_NIC  # noqa: E402  (the reference's own source)

    ref = lc_NIC.NIC(
        (groups, [D] * len(groups)),
        UNITS, D, E, ATTN, VOCAB, T,
        # all six dropout rates off
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        # the reference config.yaml L2 coefficients
        0.01, 0.001, 3e-5, 1e-5,
    )
    optimizer = tf.keras.optimizers.Adam(
        learning_rate=1e-4, beta_1=0.9, beta_2=0.98, epsilon=1e-8,
        clipnorm=0.1,
    )
    loss_object = tf.keras.losses.CategoricalCrossentropy(
        from_logits=False, reduction="none"
    )
    ref.compile(optimizer, loss_object, run_eagerly=True)
    ref((betas, tokens, a0, a0), training=False)  # build (main.py:147)
    return ref


def transplant(ref, layout, params, batch_stats):
    """Copy our flax LcNIC parameters into the reference Keras weights."""
    import numpy as np

    enc = params["encoder"]
    for b, bucket in enumerate(layout.buckets):
        kern = np.asarray(enc[f"kernel_{b}"])
        bias = np.asarray(enc[f"bias_{b}"])
        for row, gid in enumerate(bucket.group_ids):
            size = int(bucket.sizes[row])
            ref.dense_in.dense_layers[int(gid)].set_weights(
                [kern[row, :size, :], bias[row]]
            )
    bn_p, bn_s = enc["input_bn"], batch_stats["encoder"]["input_bn"]
    ref.dense_in.bn.set_weights([
        np.asarray(bn_p["scale"]), np.asarray(bn_p["bias"]),
        np.asarray(bn_s["mean"]), np.asarray(bn_s["var"]),
    ])
    ref.embedding.set_weights([np.asarray(params["embedding"])])
    att = params["attention"]
    for name in ("W1", "W2", "V"):
        getattr(ref.attention, name).set_weights(
            [np.asarray(att[name]["kernel"]), np.asarray(att[name]["bias"])]
        )
    lstm = params["lstm"]
    ref.lstm.set_weights([
        np.asarray(lstm["kernel"]), np.asarray(lstm["recurrent_kernel"]),
        np.asarray(lstm["bias"]),
    ])
    for name in ("dense_inter", "dense_out"):
        getattr(ref, name).set_weights([
            np.asarray(params[name]["kernel"]),
            np.asarray(params[name]["bias"]),
        ])


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    import tensorflow as tf

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_train_step

    rng = np.random.default_rng(42)
    starts = [0]
    for s in GROUP_SIZES:
        starts.append(starts[-1] + s)
    groups = [
        np.arange(starts[i], starts[i] + s, dtype=np.int32)
        for i, s in enumerate(GROUP_SIZES)
    ]
    layout = GroupLayout(groups, n_voxels=N_VOXELS)

    cfg = Config()
    cfg.units, cfg.attn_units, cfg.group_size = UNITS, ATTN, D
    cfg.embedding_text, cfg.top_k, cfg.max_length = E, VOCAB - 1, T
    cfg.alpha, cfg.beta_1, cfg.beta_2, cfg.epsilon = 1e-4, 0.9, 0.98, 1e-8
    cfg.clipnorm, cfg.optimizer = 0.1, "Adam"
    cfg.input_reg, cfg.attn_reg = 0.01, 0.001
    cfg.lstm_reg, cfg.output_reg = 3e-5, 1e-5
    cfg.attn_loss, cfg.sam_rho, cfg.warmup_steps = False, 0.0, 0

    model = LcNIC(
        layout=layout, units=UNITS, group_size=D, embedding_text=E,
        attn_units=ATTN, vocab_size=VOCAB, max_length=T,
        dropout_input=0.0, dropout_features=0.0, dropout_text=0.0,
        dropout_attn=0.0, dropout_lstm=0.0, dropout_out=0.0,
    )

    betas0 = rng.standard_normal((B, N_VOXELS)).astype(np.float32)
    tokens0 = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    a0 = np.zeros((B, UNITS), np.float32)

    params, batch_stats, prng = init_model(model, cfg, betas0, tokens0)

    ref = build_reference_model(
        groups, tf.constant(betas0), tf.constant(tokens0), tf.constant(a0)
    )
    transplant(ref, layout, params, batch_stats)

    report = {}

    # ---- 1. teacher-forced forward, inference mode ----
    logits, alphas = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(betas0), jnp.asarray(tokens0),
        jnp.asarray(a0), jnp.asarray(a0), training=False,
    )
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    ref_probs, ref_attn = ref(
        (tf.constant(betas0), tf.constant(tokens0),
         tf.constant(a0), tf.constant(a0)),
        training=False,
    )
    # reference attention stack: (T, B, R, 1) -> (B, T, R)
    ref_alpha = np.transpose(ref_attn.numpy()[..., 0], (1, 0, 2))
    report["fwd_probs_max_diff"] = float(
        np.max(np.abs(probs - ref_probs.numpy())))
    report["fwd_attn_max_diff"] = float(
        np.max(np.abs(np.asarray(alphas) - ref_alpha)))

    # ---- 3a. greedy decode, fresh weights ----
    def greedy_both(params_, stats_, msg):
        decoder = make_greedy_decoder(model, UNITS, T)
        ours, _, _ = decoder(
            {"params": params_, "batch_stats": stats_},
            jnp.asarray(betas0), 3,
        )
        theirs, _, _, _ = ref.greedy_predict_attention(
            tf.constant(betas0), tf.constant(a0), tf.constant(a0),
            tf.constant(np.full((B,), 3, np.int32)), T, UNITS, None,
        )
        theirs = theirs[..., 0]  # (B, T, 1) -> (B, T)
        report[msg] = int(np.sum(np.asarray(ours) != theirs))
        report[msg + "_tokens"] = int(np.asarray(ours).size)

    greedy_both(params, batch_stats, "greedy_fresh_mismatches")

    # ---- 2. five-step Adam training trajectory ----
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    state = TrainState.create(
        params=params, batch_stats=batch_stats, tx=tx, rng=prng)
    step = make_train_step(model, cfg, rules, donate=False)

    loss_diffs, l2_diffs = [], []
    for i in range(STEPS):
        bi = rng.standard_normal((B, N_VOXELS)).astype(np.float32)
        ti = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
        tgt = np.concatenate(
            [ti[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        state, metrics = step(
            state, jnp.asarray(bi), jnp.asarray(ti), jnp.asarray(tgt))
        onehot = tf.one_hot(tf.constant(tgt), VOCAB)
        ref_metrics = ref.train_step(
            ((tf.constant(bi), tf.constant(ti),
              tf.constant(a0), tf.constant(a0)), onehot))
        loss_diffs.append(abs(
            float(metrics["loss"]) - float(ref_metrics["loss"])))
        l2_diffs.append(abs(
            float(metrics["L2"]) - float(ref_metrics["L2"])))
    report["traj_loss_max_diff"] = float(np.max(loss_diffs))
    report["traj_l2_max_diff"] = float(np.max(l2_diffs))

    # final-weight agreement (incl. BN moving stats — training-mode BN path)
    def wdiff(ours, theirs):
        return float(np.max(np.abs(np.asarray(ours) - theirs.numpy())))

    p = state.params
    report["traj_w_lstm_kernel"] = wdiff(
        p["lstm"]["kernel"], ref.lstm.weights[0])
    report["traj_w_dense_out"] = wdiff(
        p["dense_out"]["kernel"], ref.dense_out.weights[0])
    report["traj_w_embedding"] = wdiff(
        p["embedding"], ref.embedding.weights[0])
    bucket = layout.buckets[0]
    row, gid = 0, int(bucket.group_ids[0])
    size = int(bucket.sizes[row])
    report["traj_w_encoder_g0"] = wdiff(
        p["encoder"]["kernel_0"][row, :size, :],
        ref.dense_in.dense_layers[gid].weights[0])
    report["traj_bn_moving_mean"] = wdiff(
        state.batch_stats["encoder"]["input_bn"]["mean"],
        ref.dense_in.bn.weights[2])
    report["traj_bn_moving_var"] = wdiff(
        state.batch_stats["encoder"]["input_bn"]["var"],
        ref.dense_in.bn.weights[3])

    # ---- 3b. greedy decode after training (both sides stepped) ----
    greedy_both(state.params, state.batch_stats, "greedy_trained_mismatches")

    print(json.dumps(report))


if __name__ == "__main__":
    main()
