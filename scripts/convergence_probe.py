"""Flagship-scale convergence on the real chip over the round-2 production
path (pregathered store + Pallas DMA gather): 40x128 scanned steps on a
fixed synthetic set; loss must fall steadily from init."""
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
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units,
              group_size=cfg.group_size, embedding_text=cfg.embedding_text,
              attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
              max_length=cfg.max_length, pregathered=True)
rng = np.random.default_rng(0)
from masters_thesis_tpu.ops.gather import pack_rows
store = pack_rows(layout.permute_rows(
    rng.standard_normal((1024, N)).astype(np.float32)))
# fixed caption per store row => learnable mapping
row_tokens = rng.integers(1, cfg.vocab_size, (1024, cfg.max_length)).astype(np.int32)
from masters_thesis_tpu.ops.gather import gather_rows
params, bstats, prng = init_model(model, cfg,
                                  gather_rows(store, jnp.arange(B)),
                                  jnp.asarray(row_tokens[:B]))
state = TrainState.create(params=params, batch_stats=bstats,
                          tx=make_optimizer(cfg), rng=prng)
step = make_scanned_train_steps(model, cfg, lc_nic_l2_rules(cfg))
t0 = time.perf_counter()
CALLS = 40
for call in range(CALLS):
    idx = rng.integers(0, 1024, (K, B)).astype(np.int32)
    toks = jnp.asarray(row_tokens[idx])            # (K, B, T)
    tgts = jnp.concatenate([toks[..., 1:],
                            jnp.zeros((K, B, 1), jnp.int32)], axis=-1)
    state, m = step(state, store, jnp.asarray(idx), toks, tgts)
    losses = np.asarray(m["loss"])
    print(f"steps {(call+1)*K:5d}: loss {losses[-1]:.4f} "
          f"acc {np.asarray(m['accuracy'])[-1]:.3f}", flush=True)
print(f"total {CALLS*K} steps in {time.perf_counter()-t0:.1f}s", flush=True)
