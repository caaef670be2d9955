"""MFU ceiling probe: is the flagship's ~4.4% MFU the framework or the model?

bench.py measures the reference-contract flagship (batch 64, units 512,
15 sequential attention/LSTM/head segments) at ~318 steps/s = 8.6 TFLOP/s =
4.35% of a v5e's bf16 peak, and PERF.md's probe campaign diagnoses the gap
as latency-bound sequential small matmuls — a property of the reference's
model shape, not of this framework's program. This probe makes that claim
auditable by measuring, on the same chip through the same runtime:

1. ``matmul_ceiling`` — a chained dependent bf16 matmul (4096^3, the MXU's
   favourite food) dispatched exactly like our trainers (jit + lax loop):
   the compute ceiling this runtime can reach at all;
2. ``ladder`` — the cost of each structural feature of this model class at
   MXU-filling width ((3840,3200)x(3200,8192)-class matmuls): one big
   matmul fwd+bwd, then the same FLOPs as a 15-step sequential
   LSTM-shaped ``lax.scan`` fwd+bwd (the reverse-mode-over-recurrence
   cost no framework can restructure away);
3. ``scaled_nic_mfu`` — the UNMODIFIED production scanned trainer
   (train/steps.py::make_scanned_train_steps, Pallas DMA gather +
   pregathered store) on an MXU-friendly LcNIC: units 2048, group_size 128,
   head 2048, vocab 8192, text embedding 1024, batch 256 — same code path,
   same optimiser, same 15-step scan, just matmul shapes that fill the MXU.

Together these bound the flagship's 4.35% MFU from above: the runtime
reaches ~59% on a dependent matmul chain, the model CLASS (sequential
15-step recurrence + backward) caps near ~28% even at MXU-filling width,
the full production trainer at that width lands ~11%, and the reference's
contract shape ((64,544)x(544,2048)-class matmuls, ~1/8 of an MXU tile
wide) sits at 4.35% because its matmuls underfill the array — the PERF.md
latency-bound diagnosis, now with the framework-vs-model split measured.
FLOPs are counted with the same analytic model the bench artifact uses
(bench.flagship_flops_per_step). Measurement rules learned the hard way:
reduce results to scalars ON DEVICE (fetching a 32 MB array rides the
~16 MB/s tunnel and measures the link), and amortise enough FLOPs per
device call that the ~30 ms dispatch RTT is negligible (single 200-GFLOP
calls read 3-8 TF/s regardless of compute; an in-call grad loop must vary
its inputs per iteration or XLA's LICM hoists the whole body out).

Writes artifacts/mfu_ceiling.json and prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chip_peak_tflops, flagship_flops_per_step  # noqa: E402

N_VOXELS = 327_684
N_GROUPS = 360


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    dev = str(jax.devices()[0])
    peak = chip_peak_tflops(dev)
    out = {"device": dev, "chip_peak_bf16_tflops": peak}

    def emit(name, payload):
        out[name] = payload
        print(json.dumps({name: payload, "device": dev}), flush=True)

    # ---- 1. chained bf16 matmul ceiling --------------------------------
    N, K = 4096, 64
    key = jax.random.PRNGKey(0)
    # scale keeps the dependent chain's magnitudes bounded in bf16
    w = (jax.random.normal(key, (N, N), jnp.bfloat16) / np.float32(np.sqrt(N)))
    x = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(_, y):
            return (y @ w).astype(jnp.bfloat16)
        y = jax.lax.fori_loop(0, K, body, x)
        # reduce ON DEVICE: fetching the (4096,4096) result would ride the
        # ~16 MB/s tunnel (32 MB ≈ 2 s) and measure the link, not the MXU.
        # The scalar depends on every chained matmul, so nothing is DCE'd.
        return jnp.float32(y[0, 0])

    float(chain(x, w))  # compile + warm
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chain(x, w))
    dt = time.perf_counter() - t0
    flops = reps * K * 2 * N**3
    tf_s = flops / dt / 1e12
    emit("matmul_ceiling", {
        "shape": f"{N}x{N}x{N} bf16, {K}-deep dependent chain",
        "tflops_per_sec": round(tf_s, 1),
        "pct_of_peak": round(100 * tf_s / peak, 1) if peak else None,
    })

    # ---- 2. structural ladder at MXU-filling width ---------------------
    # one LSTM-gate-shaped matmul (concat(x, h) @ W, D=3200 -> 4U=8192) as
    # (a) a flat batched matmul fwd+bwd and (b) a 15-step sequential scan
    # fwd+bwd, identical FLOPs. R grad evaluations per device call (inputs
    # varied per iteration so LICM cannot hoist the body).
    B_L, K_L, U_L, T_L, R_L = 256, 8192, 2048, 15, 8
    D_L = 3200
    w_l = (jax.random.normal(jax.random.PRNGKey(2), (D_L, K_L), jnp.bfloat16)
           / np.float32(np.sqrt(D_L)))
    xs_l = jax.random.normal(
        jax.random.PRNGKey(3), (R_L, T_L, B_L, D_L - U_L), jnp.bfloat16)

    def scan_loss(w, xs):
        def body(h, x):
            z = jnp.concatenate([x, h], axis=-1) @ w
            h2 = jnp.tanh(z[:, :U_L]).astype(jnp.bfloat16)
            return h2, jnp.sum(jnp.square(jnp.float32(z)))
        h0 = jnp.zeros((B_L, U_L), jnp.bfloat16)
        _, outs = jax.lax.scan(body, h0, xs)
        return jnp.sum(outs)

    def flat_loss(w, xs):
        x2 = xs.reshape(T_L * B_L, D_L - U_L)
        x2 = jnp.concatenate(
            [x2, jnp.zeros((T_L * B_L, U_L), jnp.bfloat16)], axis=-1)
        return jnp.sum(jnp.square(jnp.float32(x2 @ w)))

    def looped_grad(loss_fn):
        def fn(w, xs_all):
            def body(acc, xs):
                g = jax.grad(loss_fn)(w, xs)
                return acc + jnp.sum(jnp.float32(g) ** 2), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs_all)
            return acc
        return jax.jit(fn)

    base = 2 * T_L * B_L * D_L * K_L  # fwd FLOPs of one iteration
    ladder = {}
    for name, fn in (("flat_matmul_bwd", looped_grad(flat_loss)),
                     ("scan15_bwd", looped_grad(scan_loss))):
        float(fn(w_l, xs_l))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(w_l, xs_l))
        dt = time.perf_counter() - t0
        tf_s = reps * 3 * base * R_L / dt / 1e12
        ladder[name] = {
            "tflops_per_sec": round(tf_s, 1),
            "pct_of_peak": round(100 * tf_s / peak, 1) if peak else None,
        }
    emit("ladder", ladder)

    # ---- 3. scaled LcNIC through the production scanned trainer --------
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.gather import LANES
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.losses import lc_nic_l2_rules
    from masters_thesis_tpu.train.optim import make_optimizer
    from masters_thesis_tpu.train.state import TrainState, init_model
    from masters_thesis_tpu.train.steps import make_scanned_train_steps

    cfg = Config()
    cfg.units = 2048
    cfg.attn_units = 256
    cfg.group_size = 128
    cfg.embedding_text = 1024
    cfg.top_k = 8191          # vocab 8192
    cfg.batch_size = int(os.environ.get("MTT_MFU_BATCH", "256"))
    HEAD = 2048
    cfg.tpu = dataclasses.replace(cfg.tpu, compute_dtype="bfloat16")
    B, K_SCAN = cfg.batch_size, 16

    groups = synthetic_groups(n_voxels=N_VOXELS, n_groups=N_GROUPS, seed=0)
    layout = GroupLayout(groups, n_voxels=N_VOXELS)

    def build(pregathered):
        return LcNIC(
            layout=layout, units=cfg.units, group_size=cfg.group_size,
            embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
            vocab_size=cfg.vocab_size, max_length=cfg.max_length,
            head_dim=HEAD, pregathered=pregathered,
        )

    n_store = 512  # 512 x 327k fp32 = 0.67 GB HBM
    store = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (n_store, N_VOXELS), jnp.float32))()
    rng = np.random.default_rng(0)
    betas = store[:B]
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)

    model = build(pregathered=False)
    params, batch_stats, prng = init_model(model, cfg, betas, tokens)
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx,
                              rng=prng)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        flat_idx = jnp.asarray(layout.flat_indices())

        @jax.jit
        def _prep(rows):
            padded = jnp.concatenate(
                [rows, jnp.zeros((rows.shape[0], 1), rows.dtype)], axis=1)
            perm = jnp.take(padded, flat_idx, axis=1)
            wdt = perm.shape[1]
            wp = -(-wdt // LANES) * LANES
            perm = jnp.pad(perm, ((0, 0), (0, wp - wdt)))
            return perm.reshape(rows.shape[0], wp // LANES, LANES)

        packed = _prep(store)
        store_width, train_model = None, build(pregathered=True)
    else:
        packed, store_width, train_model = store, N_VOXELS, model

    sstep = make_scanned_train_steps(train_model, cfg, rules,
                                     store_width=store_width)
    idx = jnp.asarray(rng.integers(0, n_store, (K_SCAN, B)), jnp.int32)
    toks = jnp.broadcast_to(tokens, (K_SCAN, B, cfg.max_length))
    tgts = jnp.broadcast_to(target, (K_SCAN, B, cfg.max_length))

    print("compiling scaled trainer...", file=sys.stderr, flush=True)
    state, metrics = sstep(state, packed, idx, toks, tgts)
    float(np.asarray(metrics["loss"])[-1])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = sstep(state, packed, idx, toks, tgts)
        float(np.asarray(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    steps_s = reps * K_SCAN / dt
    fl = flagship_flops_per_step(
        B, cfg.max_length, n_voxels=N_VOXELS, n_groups=N_GROUPS,
        group_size=cfg.group_size, units=cfg.units,
        attn_units=cfg.attn_units, emb_text=cfg.embedding_text,
        head_dim=HEAD, vocab=cfg.vocab_size)
    tf_s = steps_s * fl / 1e12
    emit("scaled_nic_mfu", {
        "config": {"units": cfg.units, "group_size": cfg.group_size,
                   "attn_units": cfg.attn_units, "head_dim": HEAD,
                   "vocab": cfg.vocab_size, "batch": B,
                   "emb_text": cfg.embedding_text,
                   "compute_dtype": "bfloat16"},
        "steps_per_sec": round(steps_s, 2),
        "samples_per_sec": round(steps_s * B, 1),
        "flops_per_step": fl,
        "tflops_per_sec": round(tf_s, 1),
        "mfu_pct": round(100 * tf_s / peak, 2) if peak else None,
    })

    # flagship comparison row straight from the bench accounting
    fl64 = flagship_flops_per_step(64)
    out["flagship_reference_row"] = {
        "steps_per_sec_bench_r4": 317.8,
        "flops_per_step": fl64,
        "mfu_pct": round(100 * 317.8 * fl64 / 1e12 / peak, 2) if peak else None,
    }

    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "mfu_ceiling.json")
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": art}), flush=True)


if __name__ == "__main__":
    main()
