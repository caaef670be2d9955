"""Measured anchor for bench.py's baseline estimate.

bench.py divides the flagship throughput by an ESTIMATE (0.75 steps/s) of
the reference pipeline because the thesis repo publishes no numbers
(BASELINE.md). This script measures a faithful reproduction of that
pipeline's mechanics — eager TF/Keras (main.py:134 run_eagerly=True), the
345-layer LocallyDense Python loop (Model/layers.py:33-52), the 15-step
per-token attention+LSTM Python loop (Model/lc_NIC.py:244-256), CCE with
reduction='none' (main.py:107), Adam, and 64 fresh 1.25 MB .npy reads per
step (DataLoaders/data_generator_guse.py:148-154) — on THIS host's CPU.

It is written from the architecture, not translated from the reference
source. The reference ran on one GPU of a 3-GPU box; eager per-op overhead
and host I/O (not raw FLOPs) dominate that pipeline, so a CPU measurement
anchors the order of magnitude. Run and record in PERF.md:

  python scripts/reference_anchor.py [--steps 5] [--groups 64]

--groups scales the encoder down (cost is linear in group count; the full
345 takes a while on CPU); scaled runs print the measured number plus a
note — only a full-groups run yields the anchor figure.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np

N_VOXELS = 327_684
N_GROUPS_FULL = 345
GROUP_DIM = 32
UNITS = 512
VOCAB = 5001
MAX_LEN = 15
BATCH = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--groups", type=int, default=N_GROUPS_FULL)
    ap.add_argument("--store-keys", type=int, default=128)
    args = ap.parse_args()

    import tensorflow as tf

    tf.config.run_functions_eagerly(True)

    n_groups = args.groups
    rng = np.random.default_rng(0)
    # ragged voxel groups, reference-scale mean size (~950 vertices)
    idx = rng.permutation(N_VOXELS)
    bounds = np.sort(rng.choice(N_VOXELS, n_groups - 1, replace=False))
    group_idx = [tf.constant(g, tf.int32)
                 for g in np.split(idx, bounds)]

    # ---- per-step host I/O: 64 fresh .npy reads of (327684,) float32 ----
    tmp = tempfile.mkdtemp(prefix="anchor_betas_")
    for k in range(args.store_keys):
        np.save(os.path.join(tmp, f"KID{k}.npy"),
                rng.standard_normal(N_VOXELS).astype(np.float32))

    def read_batch(step: int) -> np.ndarray:
        keys = rng.integers(0, args.store_keys, BATCH)
        return np.stack([
            np.load(os.path.join(tmp, f"KID{k}.npy")) for k in keys])

    # ---- eager Keras model: LocallyDense -> attention -> LSTM loop ----
    layers = tf.keras.layers
    group_dense = [layers.Dense(GROUP_DIM, activation=None)
                   for _ in range(n_groups)]
    bn = layers.BatchNormalization()
    attn_w1 = layers.Dense(32)
    attn_w2 = layers.Dense(32)
    attn_v = layers.Dense(1)
    embedding = layers.Embedding(VOCAB, UNITS)
    lstm = layers.LSTMCell(UNITS)
    dense_inter = layers.Dense(256)
    dense_out = layers.Dense(VOCAB)
    opt = tf.keras.optimizers.Adam(1e-4)
    cce = tf.keras.losses.CategoricalCrossentropy(reduction="none")

    tokens = tf.constant(
        rng.integers(1, VOCAB, (BATCH, MAX_LEN)), tf.int32)
    target_oh = tf.one_hot(
        np.concatenate([tokens.numpy()[:, 1:],
                        np.zeros((BATCH, 1), np.int64)], axis=1), VOCAB)

    def step_fn(betas: np.ndarray) -> float:
        x = tf.constant(betas)
        with tf.GradientTape() as tape:
            feats = tf.stack(
                [group_dense[g](tf.gather(x, group_idx[g], axis=1))
                 for g in range(n_groups)], axis=1)      # (B, R, 32)
            feats = bn(feats, training=True)
            h = tf.zeros((BATCH, UNITS))
            c = tf.zeros((BATCH, UNITS))
            emb = embedding(tokens)                       # (B, T, U)
            losses = []
            for t in range(MAX_LEN):
                score = attn_v(tf.nn.tanh(
                    attn_w1(feats) + attn_w2(h)[:, None, :]))
                alpha = tf.nn.softmax(score, axis=1)
                context = tf.reduce_sum(alpha * feats, axis=1)
                inp = tf.concat([context, emb[:, t]], axis=-1)
                _, (h, c) = lstm(inp, [h, c])
                logits = dense_out(tf.nn.leaky_relu(dense_inter(h)))
                losses.append(cce(target_oh[:, t], tf.nn.softmax(logits)))
            loss_vec = tf.add_n(losses) / MAX_LEN
            loss = tf.reduce_mean(loss_vec)
        variables = tape.watched_variables()
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return float(loss)

    step_fn(read_batch(0))  # build
    t0 = time.perf_counter()
    for s in range(args.steps):
        io0 = time.perf_counter()
        betas = read_batch(s)
        io_s = time.perf_counter() - io0
        loss = step_fn(betas)
        print(f"step {s}: loss {loss:.4f} (io {io_s*1e3:.0f} ms)",
              flush=True)
    dt = (time.perf_counter() - t0) / args.steps
    sps = 1.0 / dt
    scale = n_groups / N_GROUPS_FULL
    print(f"groups={n_groups}: {dt:.2f} s/step = {sps:.3f} steps/s "
          f"(host CPU, eager)")
    if n_groups != N_GROUPS_FULL:
        # encoder cost is linear in groups; decoder/IO cost is fixed.
        # Report the measured number; extrapolation is indicative only.
        print(f"NOTE: encoder scaled by {scale:.2f} of the full 345 groups")


if __name__ == "__main__":
    main()
