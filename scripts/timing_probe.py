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
from masters_thesis_tpu.train.steps import make_scanned_train_steps, make_train_step

cfg = Config()
N=327_684
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
B=64; K=32
store = jnp.asarray(rng.standard_normal((256, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, 15)), jnp.int32)
target = jnp.concatenate([tokens[:,1:], jnp.zeros((B,1), jnp.int32)], 1)
params, bstats, prng = init_model(model, cfg, store[:B], tokens)
tx = make_optimizer(cfg)
state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=prng)
rules = lc_nic_l2_rules(cfg)
sstep = make_scanned_train_steps(model, cfg, rules)
idx = jnp.asarray(rng.integers(0, 256, (K, B)), jnp.int32)
toks = jnp.broadcast_to(tokens, (K, B, 15))
tgts = jnp.broadcast_to(target, (K, B, 15))
state, m = sstep(state, store, idx, toks, tgts)
_ = float(np.asarray(m["loss"])[-1])   # force real completion
print("warm done", flush=True)
# measure with host materialization each call
t0 = time.perf_counter()
reps = 4
for _ in range(reps):
    state, m = sstep(state, store, idx, toks, tgts)
    last = float(np.asarray(m["loss"])[-1])
dt = time.perf_counter() - t0
print(f"scanned w/ transfer: {K*reps/dt:.1f} steps/s ({dt/reps*1000:.1f} ms per {K}-step call), last loss {last:.4f}", flush=True)
# measure with block_until_ready only
t0 = time.perf_counter()
for _ in range(reps):
    state, m = sstep(state, store, idx, toks, tgts)
jax.block_until_ready(m["loss"])
dt2 = time.perf_counter() - t0
print(f"scanned block_until_ready: {K*reps/dt2:.1f} steps/s", flush=True)
