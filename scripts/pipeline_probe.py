"""Does deferred metric fetching pipeline host->device copies with compute
on the tunneled runtime? Blocking-per-call vs fetch-at-end, fresh host
arrays each call (the Trainer scanned pattern)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_scanned_train_steps

cfg = Config()
N, K, B = 327_684, 128, cfg.batch_size
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
model = LcNIC(layout=GroupLayout(groups, n_voxels=N), units=cfg.units,
              group_size=cfg.group_size, embedding_text=cfg.embedding_text,
              attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
              max_length=cfg.max_length)
rng = np.random.default_rng(0)
store = jnp.asarray(rng.standard_normal((1024, N)), jnp.float32)
row_tokens = rng.integers(1, cfg.vocab_size, (1024, cfg.max_length)).astype(np.int32)
params, bstats, prng = init_model(model, cfg, store[:B], jnp.asarray(row_tokens[:B]))
step = make_scanned_train_steps(model, cfg, lc_nic_l2_rules(cfg))

def run(tag, defer):
    st = TrainState.create(params=jax.tree_util.tree_map(jnp.copy, params),
                           batch_stats=jax.tree_util.tree_map(jnp.copy, bstats),
                           tx=make_optimizer(cfg), rng=jnp.copy(prng))
    # warm compile
    idx = rng.integers(0, 1024, (K, B)).astype(np.int32)
    toks = jnp.asarray(row_tokens[idx])
    tgts = jnp.concatenate([toks[..., 1:], jnp.zeros((K, B, 1), jnp.int32)], -1)
    st, m = step(st, store, jnp.asarray(idx), toks, tgts)
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter(); pending = []
    for _ in range(8):
        idx = rng.integers(0, 1024, (K, B)).astype(np.int32)
        toks = jnp.asarray(row_tokens[idx])
        tgts = jnp.concatenate([toks[..., 1:], jnp.zeros((K, B, 1), jnp.int32)], -1)
        st, m = step(st, store, jnp.asarray(idx), toks, tgts)
        if defer:
            pending.append(m)
        else:
            float(np.asarray(m["loss"])[-1])
    for m in pending:
        float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0
    print(f"{tag:18s}: {8*K/dt:7.1f} steps/s ({dt:.1f}s)", flush=True)

run("blocking per call", defer=False)
run("deferred fetch", defer=True)
