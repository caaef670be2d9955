"""Head-to-head parity vs the reference SOURCE for every non-flagship
model family (round-4; extends scripts/reference_headtohead.py, whose
lc_NIC transplant caught a real architecture bug in round 3).

One family per invocation (TF module-name collisions — CNN_RNN and
ShowAndTell both ship a top-level ``model.py``):

  python reference_headtohead_families.py --family ms2          # ms2_NIC.py
  python reference_headtohead_families.py --family img          # img_NIC.py
  python reference_headtohead_families.py --family cnn_rnn      # CNN_RNN/model.py
  python reference_headtohead_families.py --family showtell     # ShowAndTell/model.py
  python reference_headtohead_families.py --family thinkandtell # ThinkAndTell/model.py
  python reference_headtohead_families.py --family ms_dead      # ms_NIC.py defect proof

Each run builds the reference model from its own committed source under
legacy Keras 2, TRANSPLANTS our flax parameters into its weights, and
measures teacher-forced forward deviation, a multi-step optimizer
trajectory (losses + final weights), and — where the reference's decode
path is runnable — token-identical greedy decoding. Prints ONE JSON line;
tests/test_reference_parity.py asserts the thresholds per family.

Documented SOURCE DEFECTS verified empirically here (each recorded in the
report instead of silently patched over):

- ms_NIC.py cannot be constructed at all: ``layers.LocallyDense(groups...)``
  reads an undefined module global (ms_NIC.py:85), train_step uses
  undefined predictionA/B (:364) and call_attentionB a never-created
  ``dense_inB`` (:169). The EXECUTED shared-encoder path is
  main_ms_single_enc.py, which imports lc_NIC (line 11) — covered by the
  flagship head-to-head.
- img_NIC.py / ms2_NIC.py greedy unpack the attention call into two values
  while attention.py returns three (attention.py:44 vs img_NIC.py:461,
  ms2_NIC.py:568) — attention.py grew a third return after these callers
  were written. For img we verify the crash, then complete the source
  minimally (drop the extra return) and prove parity against that; ms2's
  greedy additionally reads a nonexistent ``self.dense_in`` (:555), so no
  completion short of rewriting it exists — recorded as dead.
- ShowAndTell/model.py:51-57 passes a length-T mask with length-T+1 inputs
  into the LSTM: the committed train path crashes (verified). The minimal
  completion — a True column for the prepended feature slot — is applied
  before the trajectory test.
- ThinkAndTell's SAM step (model.py:167-233) records its second forward
  on the tape BEFORE perturbing the weights (:210-225), so the "SAM"
  gradient is evaluated at the UNPERTURBED point: the step degenerates to
  plain SGD with a doubled forward. Proven here by weight comparison
  against a manually-driven plain step of the same objective.

Optimizer-scale notes: CNN_RNN and ShowAndTell backprop the SUM of
per-timestep masked means (CNN_RNN/train.py:336, ShowAndTell/model.py:161)
where our production steps use the mean over (B, T) — a constant T factor
that Adam absorbs up to epsilon placement. The trajectory tests here
scale-match (loss x T, Keras-default Adam eps=1e-7) so weight deviations
measure MODEL parity, not a documented normalisation choice. ThinkAndTell
(SGD+momentum+cosine, where scale DOES matter) is exact against our
production masked step; its harness optimizer mirrors Keras SGD semantics
(velocity accumulates lr-scaled gradients).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _stub_common():
    """Imports the reference modules pull in but never touch on this path."""
    tfa = _stub("tensorflow_addons")
    tfa.seq2seq = _stub("tensorflow_addons.seq2seq")
    tfa.rnn = _stub("tensorflow_addons.rnn",
                    LayerNormLSTMCell=type("LayerNormLSTMCell", (), {}))
    _stub("nsd_access", NSDAccess=type("NSDAccess", (), {}))
    _stub("utils")
    _stub("dataclass", Dataclass=type("Dataclass", (), {}))


def _jax_setup():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


# ---------------------------------------------------------------- helpers
def _set_dense(layer, tree):
    import numpy as np

    layer.set_weights([np.asarray(tree["kernel"]), np.asarray(tree["bias"])])


def _set_lstm(layer, tree):
    import numpy as np

    layer.set_weights([
        np.asarray(tree["kernel"]),
        np.asarray(tree["recurrent_kernel"]),
        np.asarray(tree["bias"]),
    ])


def _set_locally_dense(ref_ld, layout, enc_params, enc_stats):
    """Our bucketed LocallyDense params -> the reference's per-group Dense
    list + its input_bn (same transplant as the round-3 lc script)."""
    import numpy as np

    for b, bucket in enumerate(layout.buckets):
        kern = np.asarray(enc_params[f"kernel_{b}"])
        bias = np.asarray(enc_params[f"bias_{b}"])
        for row, gid in enumerate(bucket.group_ids):
            size = int(bucket.sizes[row])
            ref_ld.dense_layers[int(gid)].set_weights(
                [kern[row, :size, :], bias[row]])
    bn_p, bn_s = enc_params["input_bn"], enc_stats["input_bn"]
    ref_ld.bn.set_weights([
        np.asarray(bn_p["scale"]), np.asarray(bn_p["bias"]),
        np.asarray(bn_s["mean"]), np.asarray(bn_s["var"]),
    ])


def _set_attention(ref_attn, tree):
    for name in ("W1", "W2", "V"):
        _set_dense(getattr(ref_attn, name), tree[name])


def _maxdiff(a, b):
    import numpy as np

    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def keras_adam(lr=1e-3, b1=0.9, b2=0.999, eps=1e-7):
    """Keras-exact Adam: w -= lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps) —
    epsilon is added to sqrt(RAW v), not sqrt(v_hat) as optax.adam does;
    the placement difference is visible over a short trajectory whenever
    sqrt(v_hat) ~ eps (small-gradient leaves like GRU kernels)."""
    import jax
    import jax.numpy as jnp
    import optax

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": z(), "v": z(), "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        del params
        t = state["t"] + 1
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * g * g, state["v"], grads)
        alpha = lr * jnp.sqrt(1 - b2 ** t.astype(jnp.float32)) / (
            1 - b1 ** t.astype(jnp.float32))
        upd = jax.tree_util.tree_map(
            lambda mm, vv: -alpha * mm / (jnp.sqrt(vv) + eps), m, v)
        return upd, {"m": m, "v": v, "t": t}

    return optax.GradientTransformation(init, update)


def _ragged_groups(n_voxels, sizes):
    import numpy as np

    starts = [0]
    for s in sizes:
        starts.append(starts[-1] + s)
    return [np.arange(starts[i], starts[i] + s, dtype=np.int32)
            for i, s in enumerate(sizes)]


# ---------------------------------------------------------------- families
def family_ms_dead() -> dict:
    """Prove ms_NIC.py is unrunnable as committed (module-global NameError
    before any weight exists)."""
    _stub_common()
    sys.path.insert(0, os.path.join(REF, "AttemptFour"))
    import importlib

    import numpy as np

    ms = importlib.import_module("Model.ms_NIC")
    report = {}
    try:
        ms.NIC(([np.arange(4)], [8]), [8], 16, 8, 8, 4, 20, 6,
               0., 0., 0., 0., 0., 0.01, 0.001, 3e-5, 1e-5)
        report["ms_nic_construct_error"] = None
    except Exception as e:  # expected: NameError 'groups' (ms_NIC.py:85)
        report["ms_nic_construct_error"] = f"{type(e).__name__}: {e}"
    return report


def family_ms2() -> dict:
    """ms2_NIC: two per-subject LocallyDense encoders, shared
    attention/LSTM/head, split-batch step (ms2_NIC.py:88-103, 177-205,
    295-364). Loss = ((cceA + cceB)/2) + tf.add_n(L2); with equal halves
    the cce equals the full-batch mean our step computes."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    _stub_common()
    sys.path.insert(0, os.path.join(REF, "AttemptFour"))
    import importlib

    import tensorflow as tf

    ms2 = importlib.import_module("Model.ms2_NIC")

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.multisubject import Ms2NIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_train_step

    N_VOX, SIZES = 64, [5, 7, 9, 11, 3, 13]
    D, UNITS, ATTN, VOCAB, T, E, B = 8, 16, 4, 23, 6, 12, 8
    STEPS = 5
    rng = np.random.default_rng(7)
    groups = _ragged_groups(N_VOX, SIZES)
    layout = GroupLayout(groups, n_voxels=N_VOX)

    cfg = Config()
    cfg.units, cfg.attn_units, cfg.group_size = UNITS, ATTN, D
    cfg.embedding_text, cfg.top_k, cfg.max_length = E, VOCAB - 1, T
    cfg.alpha, cfg.beta_1, cfg.beta_2, cfg.epsilon = 1e-4, 0.9, 0.98, 1e-8
    cfg.clipnorm, cfg.optimizer = 0.1, "Adam"
    cfg.input_reg, cfg.attn_reg = 0.01, 0.001
    cfg.lstm_reg, cfg.output_reg = 3e-5, 1e-5
    cfg.attn_loss, cfg.sam_rho, cfg.warmup_steps = False, 0.0, 0

    model = Ms2NIC(
        layout, layout, units=UNITS, group_size=D, embedding_text=E,
        attn_units=ATTN, vocab_size=VOCAB, max_length=T,
        dropout_features=0.0, mode="split", dropout_input=0.0,
        dropout_text=0.0, dropout_attn=0.0, dropout_lstm=0.0,
        dropout_out=0.0,
    )

    betas0 = rng.standard_normal((B, N_VOX)).astype(np.float32)
    tokens0 = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    a0 = np.zeros((B, UNITS), np.float32)
    params, batch_stats, prng = init_model(model, cfg, betas0, tokens0)

    # reference model (main_ms.py:115-158 optimizer/loss/compile)
    ref = ms2.NIC(
        (groups, [D] * len(groups)), UNITS, D, E, ATTN, VOCAB, T,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        0.01, 0.001, 3e-5, 1e-5,
    )
    ref.compile(
        tf.keras.optimizers.Adam(learning_rate=1e-4, beta_1=0.9,
                                 beta_2=0.98, epsilon=1e-8, clipnorm=0.1),
        tf.keras.losses.CategoricalCrossentropy(from_logits=False,
                                                reduction="none"),
        run_eagerly=True,
    )
    ref((tf.constant(betas0), tf.constant(tokens0),
         tf.constant(a0), tf.constant(a0)), training=False)  # build

    def transplant(p, stats):
        _set_locally_dense(ref.dense_in_a, layout,
                           p["encoder"]["encoder_a"],
                           stats["encoder"]["encoder_a"])
        _set_locally_dense(ref.dense_in_b, layout,
                           p["encoder"]["encoder_b"],
                           stats["encoder"]["encoder_b"])
        _set_attention(ref.attention, p["attention"])
        ref.embedding.set_weights([np.asarray(p["embedding"])])
        _set_lstm(ref.lstm, p["lstm"])
        _set_dense(ref.dense_inter, p["dense_inter"])
        _set_dense(ref.dense_out, p["dense_out"])

    transplant(params, batch_stats)
    report = {}

    # forward (training mode on BOTH sides: ms2's call() hard-codes
    # training=True into its inner calls — ms2_NIC.py:191-203 — so the
    # reference NEVER runs its BatchNorm in inference mode; recorded as a
    # quirk rather than replicated in our eval path)
    pa, aa, pb, ab = ref((tf.constant(betas0), tf.constant(tokens0),
                          tf.constant(a0), tf.constant(a0)), training=True)
    (logits, alphas), _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(betas0), jnp.asarray(tokens0),
        jnp.asarray(a0), jnp.asarray(a0), training=True,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    ref_probs = np.concatenate([pa.numpy(), pb.numpy()], axis=0)
    report["fwd_probs_max_diff"] = _maxdiff(probs, ref_probs)
    # ref attention stacks: (T, B/2, R, 1) -> (B/2, T, R)
    ref_attn = np.concatenate(
        [np.transpose(aa.numpy()[..., 0], (1, 0, 2)),
         np.transpose(ab.numpy()[..., 0], (1, 0, 2))], axis=0)
    report["fwd_attn_max_diff"] = _maxdiff(np.asarray(alphas), ref_attn)

    # reset the BN pollution from the build + fwd calls, then trajectory
    transplant(params, batch_stats)
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    state = TrainState.create(params=params, batch_stats=batch_stats,
                              tx=tx, rng=prng)
    step = make_train_step(model, cfg, rules, donate=False)

    loss_diffs, l2_diffs = [], []
    for _ in range(STEPS):
        bi = rng.standard_normal((B, N_VOX)).astype(np.float32)
        ti = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
        tgt = np.concatenate([ti[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        state, m = step(state, jnp.asarray(bi), jnp.asarray(ti),
                        jnp.asarray(tgt))
        ref_m = ref.train_step((
            (tf.constant(bi), tf.constant(ti),
             tf.constant(a0), tf.constant(a0)),
            tf.one_hot(tf.constant(tgt), VOCAB)))
        loss_diffs.append(abs(float(m["loss"]) - float(ref_m["loss"])))
        l2_diffs.append(abs(float(m["L2"]) - float(ref_m["L2"])))
    report["traj_loss_max_diff"] = float(max(loss_diffs))
    report["traj_l2_max_diff"] = float(max(l2_diffs))

    p = state.params
    report["traj_w_lstm_kernel"] = _maxdiff(
        p["lstm"]["kernel"], ref.lstm.weights[0].numpy())
    report["traj_w_dense_out"] = _maxdiff(
        p["dense_out"]["kernel"], ref.dense_out.weights[0].numpy())
    report["traj_w_embedding"] = _maxdiff(
        p["embedding"], ref.embedding.weights[0].numpy())
    for tag, refenc in (("a", ref.dense_in_a), ("b", ref.dense_in_b)):
        bucket = layout.buckets[0]
        row, gid = 0, int(bucket.group_ids[0])
        size = int(bucket.sizes[row])
        report[f"traj_w_encoder_{tag}_g0"] = _maxdiff(
            p["encoder"][f"encoder_{tag}"]["kernel_0"][row, :size, :],
            refenc.dense_layers[gid].weights[0].numpy())
        report[f"traj_bn_{tag}_mean"] = _maxdiff(
            state.batch_stats["encoder"][f"encoder_{tag}"]["input_bn"]["mean"],
            refenc.bn.weights[2].numpy())

    # greedy is dead source: self.dense_in doesn't exist (ms2_NIC.py:555)
    # and the attention unpack is stale (:568)
    try:
        ref.greedy_predict_attention(
            tf.constant(betas0[: B // 2]), tf.constant(a0[: B // 2]),
            tf.constant(a0[: B // 2]),
            tf.constant(np.full((B // 2,), 3, np.int32)), T, UNITS, None)
        report["greedy_dead_error"] = None
    except Exception as e:
        report["greedy_dead_error"] = f"{type(e).__name__}: {e}"
    return report


def family_img() -> dict:
    """img_NIC: 196 per-patch Dense encoders + BN (img_localDense.py) into
    the lc decoder (img_NIC.py:38-201); Adam(1e-4, .9, .98, 1e-8, clipnorm)
    (main_images.py:84). Verifies the stale attention unpack crashes, then
    completes it minimally and proves fwd/trajectory/greedy parity."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    _stub_common()
    sys.path.insert(0, os.path.join(REF, "AttemptFour"))
    import importlib

    import tensorflow as tf

    att_mod = importlib.import_module("Model.attention")
    img_mod = importlib.import_module("Model.img_NIC")

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder
    from masters_thesis_tpu.models.nic import ImgNIC
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_train_step

    P, C, D, UNITS, ATTN, VOCAB, T, E, B = 196, 6, 4, 8, 4, 17, 5, 6, 2
    STEPS = 3
    rng = np.random.default_rng(11)

    cfg = Config()
    cfg.units, cfg.attn_units, cfg.group_size = UNITS, ATTN, D
    cfg.embedding_text, cfg.top_k, cfg.max_length = E, VOCAB - 1, T
    cfg.alpha, cfg.beta_1, cfg.beta_2, cfg.epsilon = 1e-4, 0.9, 0.98, 1e-8
    cfg.clipnorm, cfg.optimizer = 0.1, "Adam"
    cfg.input_reg, cfg.attn_reg = 0.01, 0.001
    cfg.lstm_reg, cfg.output_reg = 3e-5, 1e-5
    cfg.attn_loss, cfg.sam_rho, cfg.warmup_steps = False, 0.0, 0

    model = ImgNIC(
        embed_dim=D, units=UNITS, attn_units=ATTN, vocab_size=VOCAB,
        max_length=T, embedding_text=E, dropout_features=0.0,
        dropout_input=0.0, dropout_text=0.0, dropout_attn=0.0,
        dropout_lstm=0.0, dropout_out=0.0,
    )
    feats0 = rng.standard_normal((B, P, C)).astype(np.float32)
    tokens0 = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    a0 = np.zeros((B, UNITS), np.float32)
    params, batch_stats, prng = init_model(model, cfg, feats0, tokens0)

    report = {}

    def build_ref():
        return img_mod.NIC(D, UNITS, 512, E, ATTN, VOCAB, T,
                           0., 0., 0., 0., 0., 0.,
                           0.01, 0.001, 3e-5, 1e-5)

    # 1) the committed source crashes: call_attention unpacks the
    #    3-return attention into two names (img_NIC.py:183)
    try:
        broken = build_ref()
        broken((tf.constant(feats0), tf.constant(tokens0),
                tf.constant(a0), tf.constant(a0)), training=False)
        report["stale_attention_unpack_error"] = None
    except Exception as e:
        report["stale_attention_unpack_error"] = f"{type(e).__name__}"

    # 2) minimal completion: attention returns (context, weights) as every
    #    img_NIC call site expects (drop attention.py:44's third value)
    orig_call = att_mod.Attention.call

    def two_value_call(self, hidden, features, training=False):
        ctx, w, _ = orig_call(self, hidden, features, training=training)
        return ctx, w

    att_mod.Attention.call = two_value_call

    ref = build_ref()
    ref.compile(
        tf.keras.optimizers.Adam(learning_rate=1e-4, beta_1=0.9,
                                 beta_2=0.98, epsilon=1e-8, clipnorm=0.1),
        tf.keras.losses.CategoricalCrossentropy(from_logits=False,
                                                reduction="none"),
        run_eagerly=True,
    )
    ref((tf.constant(feats0), tf.constant(tokens0),
         tf.constant(a0), tf.constant(a0)), training=False)

    def transplant(p, stats):
        kern = np.asarray(p["encoder"]["kernel"])   # (P, C, D)
        bias = np.asarray(p["encoder"]["bias"])     # (P, D)
        for i, layer in enumerate(ref.dense_in.dense_layers):
            layer.set_weights([kern[i], bias[i]])
        bn_p = p["encoder"]["bn"]
        bn_s = stats["encoder"]["bn"]
        ref.dense_in.bn.set_weights([
            np.asarray(bn_p["scale"]), np.asarray(bn_p["bias"]),
            np.asarray(bn_s["mean"]), np.asarray(bn_s["var"]),
        ])
        _set_attention(ref.attention, p["attention"])
        ref.embedding.set_weights([np.asarray(p["embedding"])])
        _set_lstm(ref.lstm, p["lstm"])
        _set_dense(ref.dense_inter, p["dense_inter"])
        _set_dense(ref.dense_out, p["dense_out"])

    transplant(params, batch_stats)

    # forward, inference mode (img_NIC propagates training honestly)
    logits, alphas = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats0), jnp.asarray(tokens0),
        jnp.asarray(a0), jnp.asarray(a0), training=False,
    )
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    ref_probs, ref_attn = ref((tf.constant(feats0), tf.constant(tokens0),
                               tf.constant(a0), tf.constant(a0)),
                              training=False)
    report["fwd_probs_max_diff"] = _maxdiff(probs, ref_probs.numpy())
    report["fwd_attn_max_diff"] = _maxdiff(
        np.asarray(alphas),
        np.transpose(ref_attn.numpy()[..., 0], (1, 0, 2)))

    # greedy decode with fresh weights: token-identical
    decoder = make_greedy_decoder(model, UNITS, T)
    ours, _, _ = decoder({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(feats0), 3)
    theirs, _, _ = ref.greedy_predict_attention(
        tf.constant(feats0), tf.constant(a0), tf.constant(a0),
        tf.constant(np.full((B,), 3, np.int32)), T, UNITS, None)
    report["greedy_fresh_mismatches"] = int(
        np.sum(np.asarray(ours) != theirs[..., 0]))
    report["greedy_tokens"] = int(np.asarray(ours).size)

    # trajectory (BN training path included)
    transplant(params, batch_stats)
    state = TrainState.create(params=params, batch_stats=batch_stats,
                              tx=make_optimizer(cfg), rng=prng)
    step = make_train_step(model, cfg, lc_nic_l2_rules(cfg), donate=False)
    loss_diffs, l2_diffs = [], []
    for _ in range(STEPS):
        fi = rng.standard_normal((B, P, C)).astype(np.float32)
        ti = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
        tgt = np.concatenate([ti[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        state, m = step(state, jnp.asarray(fi), jnp.asarray(ti),
                        jnp.asarray(tgt))
        ref_m = ref.train_step((
            (tf.constant(fi), tf.constant(ti),
             tf.constant(a0), tf.constant(a0)),
            tf.one_hot(tf.constant(tgt), VOCAB)))
        loss_diffs.append(abs(float(m["loss"]) - float(ref_m["loss"])))
        l2_diffs.append(abs(float(m["L2"]) - float(ref_m["L2"])))
    report["traj_loss_max_diff"] = float(max(loss_diffs))
    report["traj_l2_max_diff"] = float(max(l2_diffs))
    report["traj_w_enc_p0"] = _maxdiff(
        state.params["encoder"]["kernel"][0],
        ref.dense_in.dense_layers[0].weights[0].numpy())
    report["traj_w_lstm_kernel"] = _maxdiff(
        state.params["lstm"]["kernel"], ref.lstm.weights[0].numpy())
    report["traj_w_dense_out"] = _maxdiff(
        state.params["dense_out"]["kernel"],
        ref.dense_out.weights[0].numpy())
    report["traj_bn_mean"] = _maxdiff(
        state.batch_stats["encoder"]["bn"]["mean"],
        ref.dense_in.bn.weights[2].numpy())

    # greedy after training (both sides stepped)
    ours2, _, _ = decoder(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(feats0), 3)
    theirs2, _, _ = ref.greedy_predict_attention(
        tf.constant(feats0), tf.constant(a0), tf.constant(a0),
        tf.constant(np.full((B,), 3, np.int32)), T, UNITS, None)
    report["greedy_trained_mismatches"] = int(
        np.sum(np.asarray(ours2) != theirs2[..., 0]))
    return report


def family_cnn_rnn() -> dict:
    """CNN_RNN: shared Dense+relu patch encoder, GRU decoder with the
    ZERO-initial-state recurrence (model.py:103 — the previous state feeds
    only attention), linear fc1, plain attention; Adam() on the SUMMED
    masked loss (train.py:253-341)."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np
    import optax

    _stub_common()
    sys.path.insert(0, os.path.join(REF, "CNN_RNN"))
    import importlib

    import tensorflow as tf

    cm = importlib.import_module("model")

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder
    from masters_thesis_tpu.models.nic import CnnRnnNIC
    from masters_thesis_tpu.train.losses import caption_loss, l2_loss
    from masters_thesis_tpu.train.state import TrainState, init_model

    P, C, D, UNITS, VOCAB, T, B = 5, 12, 8, 16, 23, 6, 4
    STEPS = 5
    rng = np.random.default_rng(13)

    cfg = Config()
    cfg.units, cfg.top_k, cfg.max_length = UNITS, VOCAB - 1, T
    cfg.sam_rho, cfg.attn_loss, cfg.warmup_steps = 0.0, False, 0

    model = CnnRnnNIC(
        embed_dim=D, units=UNITS, vocab_size=VOCAB, max_length=T,
        dropout_input=0.0, dropout_text=0.0, dropout_lstm=0.0,
        dropout_out=0.0,
    )
    feats0 = rng.standard_normal((B, P, C)).astype(np.float32)
    # tokens[0] is <start>=2 like the reference caption vectors; a zero
    # tail exercises the pad mask
    tokens0 = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
    tokens0[:, 0] = 2
    tokens0[:, -1] = 0
    params, batch_stats, prng = init_model(model, cfg, feats0, tokens0)

    enc = cm.CNN_Encoder(D)
    dec = cm.RNN_Decoder(D, UNITS, VOCAB)
    optimizer = tf.keras.optimizers.Adam()  # train.py:253 defaults
    loss_object = tf.keras.losses.SparseCategoricalCrossentropy(
        from_logits=True, reduction="none")

    def ref_loss_fn(real, pred):  # train.py:258-265
        mask = tf.math.logical_not(tf.math.equal(real, 0))
        loss_ = loss_object(real, pred)
        return tf.reduce_mean(loss_ * tf.cast(mask, loss_.dtype))

    # build
    enc(tf.constant(feats0))
    dec(tf.constant(tokens0[:, :1]), enc(tf.constant(feats0)),
        tf.zeros((B, UNITS)))

    def transplant(p):
        _set_dense(enc.fc, p["encoder"]["proj"])
        dec.embedding.set_weights([np.asarray(p["embedding"])])
        dec.gru.set_weights([
            np.asarray(p["gru"]["kernel"]),
            np.asarray(p["gru"]["recurrent_kernel"]),
            np.asarray(p["gru"]["bias"]),
        ])
        _set_attention(dec.attention, p["attention"])
        _set_dense(dec.fc1, p["dense_inter"])
        _set_dense(dec.fc2, p["dense_out"])

    transplant(params)
    report = {}

    def ref_teacher_forced(feats, tokens):
        """train.py:305-341 loop: logits per supervised step i=1..T-1."""
        features = enc(tf.constant(feats))
        hidden = tf.zeros((feats.shape[0], UNITS))
        dec_input = tf.expand_dims(tokens[:, 0], 1)
        preds = []
        for i in range(1, T):
            p_, hidden, _ = dec(tf.constant(dec_input), features, hidden)
            preds.append(p_.numpy())
            dec_input = tf.expand_dims(tokens[:, i], 1)
        return np.stack(preds, axis=1)  # (B, T-1, V)

    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats0), jnp.asarray(tokens0),
        jnp.zeros((B, UNITS)), jnp.zeros((B, UNITS)), training=False,
    )
    report["fwd_logits_max_diff"] = _maxdiff(
        np.asarray(logits)[:, : T - 1], ref_teacher_forced(feats0, tokens0))

    # greedy (argmax rollout driving the reference's own per-step decoder —
    # its evaluate() samples stochastically, train-time semantics identical)
    def ref_greedy(feats, start_id):
        features = enc(tf.constant(feats))
        hidden = tf.zeros((feats.shape[0], UNITS))
        dec_input = tf.fill((feats.shape[0], 1), start_id)
        words = []
        for _ in range(T):
            p_, hidden, _ = dec(dec_input, features, hidden)
            w = tf.argmax(p_, axis=-1, output_type=tf.int32)
            words.append(w.numpy())
            dec_input = tf.expand_dims(w, 1)
        return np.stack(words, axis=1)

    decoder = make_greedy_decoder(model, UNITS, T)
    ours, _, _ = decoder({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(feats0), 2)
    report["greedy_fresh_mismatches"] = int(
        np.sum(np.asarray(ours) != ref_greedy(feats0, 2)))
    report["greedy_tokens"] = int(np.asarray(ours).size)

    # trajectory: scale-matched step (module docstring) — loss = T x our
    # masked mean == the reference's summed objective; Keras-EXACT Adam
    tx = keras_adam(1e-3, 0.9, 0.999, 1e-7)
    state = TrainState.create(params=params, batch_stats=batch_stats,
                              tx=tx, rng=prng)

    @jax.jit
    def step(state, feats, tokens, target):
        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                feats, tokens, jnp.zeros((B, UNITS)),
                jnp.zeros((B, UNITS)), training=True,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
            )
            mask = target != 0
            return T * caption_loss(logits, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    loss_diffs = []
    for _ in range(STEPS):
        fi = rng.standard_normal((B, P, C)).astype(np.float32)
        ti = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
        ti[:, 0] = 2
        ti[:, -1] = 0
        tgt = np.concatenate([ti[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        state, loss = step(state, jnp.asarray(fi), jnp.asarray(ti),
                           jnp.asarray(tgt))

        # reference train_step (train.py:305-341), driven verbatim
        with tf.GradientTape() as tape:
            features = enc(tf.constant(fi))
            hidden = tf.zeros((B, UNITS))
            dec_input = tf.expand_dims(tf.constant(ti[:, 0]), 1)
            ref_loss = 0.0
            for i in range(1, T):
                p_, hidden, _ = dec(dec_input, features, hidden)
                ref_loss += ref_loss_fn(tf.constant(ti[:, i]), p_)
                dec_input = tf.expand_dims(tf.constant(ti[:, i]), 1)
        tvars = enc.trainable_variables + dec.trainable_variables
        grads = tape.gradient(ref_loss, tvars)
        optimizer.apply_gradients(zip(grads, tvars))
        loss_diffs.append(abs(float(loss) - float(ref_loss)))
    report["traj_loss_max_diff"] = float(max(loss_diffs))
    report["traj_w_gru_kernel"] = _maxdiff(
        state.params["gru"]["kernel"], dec.gru.weights[0].numpy())
    report["traj_w_fc2"] = _maxdiff(
        state.params["dense_out"]["kernel"], dec.fc2.weights[0].numpy())
    report["traj_w_embedding"] = _maxdiff(
        state.params["embedding"], dec.embedding.weights[0].numpy())
    report["traj_w_enc"] = _maxdiff(
        state.params["encoder"]["proj"]["kernel"], enc.fc.weights[0].numpy())

    # greedy after training
    ours2, _, _ = decoder(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(feats0), 2)
    report["greedy_trained_mismatches"] = int(
        np.sum(np.asarray(ours2) != ref_greedy(feats0, 2)))
    return report


def family_showtell() -> dict:
    """ShowAndTell: relu feature prime -> masked LSTM over [feat; emb] ->
    linear fc1 -> fc2; summed masked loss skipping i=0
    (ShowAndTell/model.py:125-164). The committed mask is length-T against
    T+1 inputs — crash verified, then minimally completed with a True
    column for the feature slot."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np
    import optax

    _stub_common()
    sys.path.insert(0, os.path.join(REF, "ShowAndTell"))
    import importlib

    import tensorflow as tf

    sat = importlib.import_module("model")

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.showtell import ShowTell
    from masters_thesis_tpu.train.losses import caption_loss
    from masters_thesis_tpu.train.state import TrainState, init_model

    F, E, UNITS, VOCAB, T, B = 10, 12, 16, 23, 6, 4
    STEPS = 5
    rng = np.random.default_rng(17)

    cfg = Config()
    cfg.units, cfg.top_k, cfg.max_length = UNITS, VOCAB - 1, T
    cfg.sam_rho, cfg.attn_loss, cfg.warmup_steps = 0.0, False, 0

    model = ShowTell(
        units=UNITS, embed_dim=E, embedding_text=E, vocab_size=VOCAB,
        max_length=T, encoder_activation="relu", head_activation="linear",
        head_inter=True, align="next", dropout=0.0,
    )
    feats0 = rng.standard_normal((B, F)).astype(np.float32)
    tokens0 = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
    tokens0[:, 0] = 2
    tokens0[:, -1] = 0
    params, batch_stats, prng = init_model(model, cfg, feats0, tokens0)

    enc = sat.Encoder(E)
    dec = sat.Decoder(E, UNITS, VOCAB)
    report = {}

    # 1) committed source crash: mask length T vs T+1 inputs
    try:
        dec((tf.constant(tokens0), enc(tf.constant(feats0))), training=True)
        report["mask_defect_error"] = None
    except Exception as e:
        report["mask_defect_error"] = f"{type(e).__name__}"

    # 2) minimal completion: the feature slot is always valid
    orig_call = sat.Decoder.call

    def fixed_call(self, data, training=False):
        words, features = data
        feat = tf.expand_dims(features, 1)
        x = self.embedding(words)
        mask = self.embedding.compute_mask(words)
        if training:
            x = tf.concat([feat, x], axis=1)
            mask = tf.concat(
                [tf.ones((tf.shape(words)[0], 1), tf.bool), mask], axis=1)
        output, hidden, carry = self.lstm(x, mask=mask)
        return self.fc2(self.fc1(output)), hidden, carry

    sat.Decoder.call = fixed_call

    tok_stub = types.SimpleNamespace(word_index={"<start>": 2})
    gen = sat.CaptionGenerator(enc, dec, tok_stub, T)
    gen.compile(
        tf.keras.optimizers.Adam(),
        tf.keras.losses.SparseCategoricalCrossentropy(
            from_logits=True, reduction="none"),
        run_eagerly=True,
    )
    # build WITHOUT stepping (train_step would advance the Keras Adam
    # state to t=1 before the transplant)
    dec((tf.constant(tokens0), enc(tf.constant(feats0))), training=True)

    def transplant(p):
        _set_dense(enc.fc, p["fc_embedding"])
        dec.embedding.set_weights([np.asarray(p["embedding"])])
        _set_lstm(dec.lstm, p["lstm"])
        _set_dense(dec.fc1, p["fc1"])
        _set_dense(dec.fc2, p["fc_vocab"])

    transplant(params)

    # forward parity on supervised positions (ref logits at masked pad
    # positions carry the Keras skip-semantics and are loss-invisible)
    ref_preds, _, _ = dec((tf.constant(tokens0), enc(tf.constant(feats0))),
                          training=True)
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats0), jnp.asarray(tokens0),
        jnp.zeros((B, UNITS)), jnp.zeros((B, UNITS)), training=False,
    )
    tgt0 = np.concatenate([tokens0[:, 1:], np.zeros((B, 1), np.int32)],
                          axis=1)
    sup = tgt0 != 0  # (B, T): our slot t <-> ref position t+1
    diff = np.abs(np.asarray(logits) - ref_preds.numpy()[:, 1:])
    report["fwd_logits_max_diff"] = float(np.max(diff[sup]))

    # greedy: prefix-recall rollout of the reference decoder (it has no
    # stepwise pred method) vs our primed decode_step chain
    def ref_greedy(feats, start_id):
        feat = enc(tf.constant(feats))
        prefix = np.full((feats.shape[0], 1), start_id, np.int32)
        words = []
        for _ in range(T):
            preds, _, _ = dec((tf.constant(prefix), feat), training=True)
            w = np.argmax(preds.numpy()[:, -1, :], axis=-1).astype(np.int32)
            words.append(w)
            prefix = np.concatenate([prefix, w[:, None]], axis=1)
        return np.stack(words, axis=1)

    from masters_thesis_tpu.decode.greedy import make_greedy_decoder

    decoder = make_greedy_decoder(model, UNITS, T)
    ours, _, _ = decoder({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(feats0), 2)
    report["greedy_fresh_mismatches"] = int(
        np.sum(np.asarray(ours) != ref_greedy(feats0, 2)))
    report["greedy_tokens"] = int(np.asarray(ours).size)

    # trajectory: scale-matched (loss x T == ref sum; Keras-EXACT Adam)
    tx = keras_adam(1e-3, 0.9, 0.999, 1e-7)
    state = TrainState.create(params=params, batch_stats=batch_stats,
                              tx=tx, rng=prng)

    @jax.jit
    def step(state, feats, tokens, target):
        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                feats, tokens, jnp.zeros((B, UNITS)),
                jnp.zeros((B, UNITS)), training=True,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
            )
            return T * caption_loss(logits, target, target != 0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    loss_diffs = []
    for _ in range(STEPS):
        fi = rng.standard_normal((B, F)).astype(np.float32)
        ti = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
        ti[:, 0] = 2
        ti[:, -1] = 0
        tgt = np.concatenate([ti[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        state, loss = step(state, jnp.asarray(fi), jnp.asarray(ti),
                           jnp.asarray(tgt))
        ref_m = gen.train_step((tf.constant(fi), tf.constant(ti)))
        loss_diffs.append(abs(float(loss) - float(ref_m["loss"])))
    report["traj_loss_max_diff"] = float(max(loss_diffs))
    report["traj_w_lstm_kernel"] = _maxdiff(
        state.params["lstm"]["kernel"], dec.lstm.weights[0].numpy())
    report["traj_w_fc2"] = _maxdiff(
        state.params["fc_vocab"]["kernel"], dec.fc2.weights[0].numpy())
    report["traj_w_embedding"] = _maxdiff(
        state.params["embedding"], dec.embedding.weights[0].numpy())
    report["traj_w_enc"] = _maxdiff(
        state.params["fc_embedding"]["kernel"], enc.fc.weights[0].numpy())

    ours2, _, _ = decoder(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(feats0), 2)
    report["greedy_trained_mismatches"] = int(
        np.sum(np.asarray(ours2) != ref_greedy(feats0, 2)))
    return report


def family_thinkandtell() -> dict:
    """ThinkAndTell: tanh encoder -> unmasked LSTM over [feat; emb] ->
    relu vocab head; XLA train_step supervising i=0..T-1 (model.py:241-290)
    with masked SCCE /T + L2, SGD(momentum .9, CosineDecay) — exact against
    our production masked step with align='self'. Also proves the SAM step
    (model.py:167-233) degenerates to the plain objective's step."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np
    import optax

    _stub_common()
    sys.path.insert(0, os.path.join(REF, "ThinkAndTell"))
    import importlib

    import tensorflow as tf

    tat = importlib.import_module("model")

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.models.showtell import ShowTell, showtell_l2_rules
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_train_step

    F, E, UNITS, VOCAB, T, B = 10, 12, 16, 23, 6, 4
    STEPS = 5
    L2_ENC, L2_LSTM = 0.01, 3e-5
    DECAY_STEPS = 1056 * 10
    rng = np.random.default_rng(19)

    cfg = Config()
    cfg.units, cfg.top_k, cfg.max_length = UNITS, VOCAB - 1, T
    cfg.sam_rho, cfg.attn_loss, cfg.warmup_steps = 0.0, False, 0
    cfg.input_reg, cfg.lstm_reg = L2_ENC, L2_LSTM

    model = ShowTell(
        units=UNITS, embed_dim=E, embedding_text=E, vocab_size=VOCAB,
        max_length=T, encoder_activation="tanh", head_activation="relu",
        align="self", dropout=0.0,
    )
    feats0 = rng.standard_normal((B, F)).astype(np.float32)
    tokens0 = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
    tokens0[:, 0] = 2
    tokens0[:, -1] = 0
    params, batch_stats, prng = init_model(model, cfg, feats0, tokens0)

    def build_ref():
        enc = tat.Encoder(E, L2_ENC, "glorot_uniform", 0.0)
        dec = tat.Decoder(E, UNITS, VOCAB, L2_LSTM, "glorot_uniform", 0.0)
        gen = tat.CaptionGenerator(enc, dec, None, T)
        lr = tf.keras.experimental.CosineDecay(
            initial_learning_rate=1.0, decay_steps=DECAY_STEPS,
            alpha=0.0001)  # train.py:253-255
        gen.compile(
            tf.keras.optimizers.SGD(learning_rate=lr, momentum=0.9,
                                    nesterov=False),
            tf.keras.losses.SparseCategoricalCrossentropy(
                from_logits=True, reduction="none"),
        )
        # build
        gen.test_step((tf.constant(feats0), None, tf.constant(tokens0)))
        return gen

    def transplant(gen, p):
        _set_dense(gen.encoder.fc, p["fc_embedding"])
        gen.decoder.embedding.set_weights([np.asarray(p["embedding"])])
        _set_lstm(gen.decoder.lstm, p["lstm"])
        _set_dense(gen.decoder.fc2, p["fc_vocab"])

    gen = build_ref()
    transplant(gen, params)
    report = {}

    # forward (all T positions comparable — no LSTM mask in this family)
    ref_preds, _, _ = gen.decoder(
        (tf.constant(tokens0), gen.encoder(tf.constant(feats0))),
        training=False)
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats0), jnp.asarray(tokens0),
        jnp.zeros((B, UNITS)), jnp.zeros((B, UNITS)), training=False,
    )
    report["fwd_logits_max_diff"] = _maxdiff(
        logits, ref_preds.numpy()[:, :T])
    # the family's eval (evaluate.py:267-287 simple_eval) scores the
    # teacher-forced per-position distribution; argmax over it must agree
    report["eval_argmax_mismatches"] = int(np.sum(
        np.argmax(np.asarray(logits), -1)
        != np.argmax(ref_preds.numpy()[:, :T], -1)))

    # trajectory: PRODUCTION masked step + Keras-exact SGD chain
    # (velocity accumulates lr-scaled grads: scale first, then trace)
    sched = optax.cosine_decay_schedule(1.0, DECAY_STEPS, alpha=0.0001)
    tx = optax.chain(
        optax.scale_by_schedule(sched),
        optax.trace(decay=0.9, nesterov=False),
        optax.scale(-1.0),
    )
    state = TrainState.create(params=params, batch_stats=batch_stats,
                              tx=tx, rng=prng)
    step = make_train_step(model, cfg, showtell_l2_rules(cfg),
                           masked=True, donate=False)
    loss_diffs, l2_diffs = [], []
    for _ in range(STEPS):
        fi = rng.standard_normal((B, F)).astype(np.float32)
        ti = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
        ti[:, 0] = 2
        ti[:, -1] = 0
        # align='self': UNSHIFTED targets (model.py:271)
        state, m = step(state, jnp.asarray(fi), jnp.asarray(ti),
                        jnp.asarray(ti))
        ref_m = gen.train_step((tf.constant(fi), None, tf.constant(ti)))
        loss_diffs.append(abs(float(m["loss"]) - float(ref_m["scce"])))
        l2_diffs.append(abs(float(m["L2"]) - float(ref_m["L2"])))
    report["traj_loss_max_diff"] = float(max(loss_diffs))
    report["traj_l2_max_diff"] = float(max(l2_diffs))
    report["traj_w_lstm_kernel"] = _maxdiff(
        state.params["lstm"]["kernel"], gen.decoder.lstm.weights[0].numpy())
    report["traj_w_fc2"] = _maxdiff(
        state.params["fc_vocab"]["kernel"],
        gen.decoder.fc2.weights[0].numpy())
    report["traj_w_embedding"] = _maxdiff(
        state.params["embedding"], gen.decoder.embedding.weights[0].numpy())
    report["traj_w_enc"] = _maxdiff(
        state.params["fc_embedding"]["kernel"],
        gen.encoder.fc.weights[0].numpy())

    # --- SAM degeneracy proof (module docstring) ---
    # two fresh reference models with identical transplanted weights; one
    # runs train_step_SAM, the other a manually-driven PLAIN step of the
    # same i=1.. objective; equal final weights == the perturbation never
    # reached the recorded tape.
    gen_sam = build_ref()
    transplant(gen_sam, params)
    gen_plain = build_ref()
    transplant(gen_plain, params)
    fi = rng.standard_normal((B, F)).astype(np.float32)
    ti = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
    ti[:, 0] = 2

    gen_sam.train_step_SAM((tf.constant(fi), None, tf.constant(ti)))

    with tf.GradientTape() as tape:
        features = gen_plain.encoder(tf.constant(fi), training=True)
        preds, _, _ = gen_plain.decoder(
            (tf.constant(ti), features), training=True)
        loss = 0.0
        for i in range(1, T):  # the SAM step's window (model.py:186)
            loss += gen_plain.loss_function(tf.constant(ti[:, i]),
                                            preds[:, i])
        scce = loss / T
        model_loss = 0.0
        if gen_plain.encoder.losses:
            model_loss += tf.add_n(gen_plain.encoder.losses)
        if gen_plain.decoder.losses:
            model_loss += tf.add_n(gen_plain.decoder.losses)
        total = scce + model_loss
    tvars = (gen_plain.encoder.trainable_variables
             + gen_plain.decoder.trainable_variables)
    grads = tape.gradient(total, tvars)
    gen_plain.optimizer.apply_gradients(zip(grads, tvars))

    report["sam_vs_plain_weight_max_diff"] = float(max(
        _maxdiff(a.numpy(), b.numpy()) for a, b in zip(
            gen_sam.encoder.trainable_variables
            + gen_sam.decoder.trainable_variables,
            tvars)))
    return report


FAMILIES = {
    "ms_dead": family_ms_dead,
    "ms2": family_ms2,
    "img": family_img,
    "cnn_rnn": family_cnn_rnn,
    "showtell": family_showtell,
    "thinkandtell": family_thinkandtell,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    args = ap.parse_args()
    report = FAMILIES[args.family]()
    report["family"] = args.family
    print(json.dumps(report))


if __name__ == "__main__":
    main()
