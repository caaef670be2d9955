"""Batch scaling with the round-2 input path (pregathered store + Pallas
gather): the round-1 saturation at ~12k samples/s was gather-bound."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.ops.gather import pack_rows
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_scanned_train_steps

N = 327_684
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
rng = np.random.default_rng(0)
packed = pack_rows(layout.permute_rows(rng.standard_normal((1024, N)).astype(np.float32)))

for B in (64, 128, 256, 512):
    cfg = Config(batch_size=B)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length,
                  pregathered=True)
    K = max(8, 4096 // B)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
    target = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    from masters_thesis_tpu.ops.gather import gather_rows
    betas0 = gather_rows(packed, jnp.arange(B) % 1024)
    params, bstats, prng = init_model(model, cfg, betas0, tokens)
    st = TrainState.create(params=params, batch_stats=bstats,
                           tx=make_optimizer(cfg), rng=prng)
    step = make_scanned_train_steps(model, cfg, lc_nic_l2_rules(cfg))
    idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)
    toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
    tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))
    st, m = step(st, packed, idx, toks, tgts)
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter(); reps = 2
    for _ in range(reps):
        st, m = step(st, packed, idx, toks, tgts)
        float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0
    sps = K * reps / dt
    print(f"bs {B:4d}: {sps:7.1f} steps/s = {sps*B:9.0f} samples/s", flush=True)
