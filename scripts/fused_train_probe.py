"""End-to-end adoption measurement for tpu.fused_seq (round 5): the FULL
production scanned trainer (store gather + encoder + decoder + Adam +
dropout ON — training-mode semantics) with the fused-sequence custom VJP
vs the autodiff scan, at the flagship contract and at MXU-filling dims.
Complements scripts/fused_seq_probe.py's decoder-only isolation rows.
Writes artifacts/fused_train_probe.json."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if jax.default_backend() == "tpu":
    jax.config.update("jax_default_prng_impl", "rbg")

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.gather import gather_rows, pack_rows
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_scanned_train_steps

K = int(os.environ.get("MTT_FTRAIN_K", "16"))
N = 327_684
N_STORE = 512
results = {}


def run_shape(tag, cfg, head_dim):
    groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
    layout = GroupLayout(groups, n_voxels=N)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text,
                  attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
                  max_length=cfg.max_length, head_dim=head_dim,
                  pregathered=True)
    rng = np.random.default_rng(0)
    store = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (N_STORE, N), jnp.float32))()
    flat_idx = jnp.asarray(layout.flat_indices())

    @jax.jit
    def _prep(rows):
        from masters_thesis_tpu.ops.gather import LANES
        padded = jnp.concatenate(
            [rows, jnp.zeros((rows.shape[0], 1), rows.dtype)], axis=1)
        perm = jnp.take(padded, flat_idx, axis=1)
        w = perm.shape[1]
        wp = -(-w // LANES) * LANES
        perm = jnp.pad(perm, ((0, 0), (0, wp - w)))
        return perm.reshape(rows.shape[0], wp // LANES, LANES)

    packed = _prep(store)
    B = cfg.batch_size
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    idx = jnp.asarray(rng.integers(0, N_STORE, (K, B)), jnp.int32)
    toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
    tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))
    betas0 = gather_rows(packed, idx[0])
    params, bstats, prng = init_model(model, cfg, betas0, tokens)

    for fused, dtype in ((False, "float32"), (True, "float32"),
                         (False, "bfloat16"), (True, "bfloat16")):
        c = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, fused_seq=fused,
                                         compute_dtype=dtype))
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState.create(
            params=copy(params), batch_stats=copy(bstats),
            tx=make_optimizer(c), rng=jnp.copy(prng))
        step = make_scanned_train_steps(model, c, lc_nic_l2_rules(c))
        name = (f"{tag}/{'fused_vjp' if fused else 'autodiff'}"
                + ("_bf16" if dtype == "bfloat16" else ""))
        try:
            state, m = step(state, packed, idx, toks, tgts)
            float(np.asarray(m["loss"])[-1])
        except Exception as exc:
            results[name] = {"error": str(exc).splitlines()[0][:160]}
            print(f"{name}: FAILED", flush=True)
            continue
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            state, m = step(state, packed, idx, toks, tgts)
            float(np.asarray(m["loss"])[-1])
        ms = (time.perf_counter() - t0) / (reps * K) * 1e3
        results[name] = {"ms_per_step": round(ms, 3),
                         "steps_per_sec": round(1e3 / ms, 1),
                         "loss": float(np.asarray(m["loss"])[-1])}
        print(f"{name:24s}: {ms:7.3f} ms/step "
              f"({1e3 / ms:6.1f} steps/s) loss="
              f"{results[name]['loss']:.4f}", flush=True)
        del state


flag = Config()
run_shape("flagship", flag, head_dim=256)

mxu = Config()
mxu.units = 2048
mxu.attn_units = 256
mxu.group_size = 128
mxu.embedding_text = 1024
mxu.top_k = 8191
mxu.batch_size = 256
run_shape("mxu", mxu, head_dim=2048)

os.makedirs("artifacts", exist_ok=True)
with open("artifacts/fused_train_probe.json", "w") as f:
    json.dump({"k_per_call": K, "results": results}, f, indent=1)
print(json.dumps(results, indent=1))
