"""XLA cost analysis of the compiled scanned train step: flops and bytes
per executable, to bound speed-of-light for the flagship step."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
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
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
store = jnp.asarray(rng.standard_normal((1024, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
target = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
params, bstats, prng = init_model(model, cfg, store[:B], tokens)
st = TrainState.create(params=params, batch_stats=bstats,
                       tx=make_optimizer(cfg), rng=prng)
idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)
toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))

step = make_scanned_train_steps(model, cfg, lc_nic_l2_rules(cfg))
import inspect
fn = step.__wrapped__ if hasattr(step, "__wrapped__") else step
lowered = jax.jit(fn).lower(st, store, idx, toks, tgts) if not hasattr(step, "lower") else step.lower(st, store, idx, toks, tgts)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", 0.0)
bytes_acc = ca.get("bytes accessed", 0.0)
print(f"flops/call      : {flops:.3e}  -> {flops/K:.3e}/step")
print(f"bytes accessed  : {bytes_acc:.3e}  -> {bytes_acc/K/1e6:.1f} MB/step")
print(f"SoL compute     : {flops/K/98e12*1e3:.3f} ms/step @98TF fp32")
print(f"SoL memory      : {bytes_acc/K/819e9*1e3:.3f} ms/step @819GB/s")
for k in sorted(ca):
    if "utilization" not in k and "%" not in k:
        print(f"  {k}: {ca[k]:.3e}")
