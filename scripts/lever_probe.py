"""Levers on the real scanned train step: bf16 beta store, clipnorm, L2,
dropout. Each timed at K=128 with forced host transfer."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, numpy as np, jax, jax.numpy as jnp
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

base = Config()
N, K = 327_684, 128
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
rng = np.random.default_rng(0)
B = base.batch_size
store32 = jnp.asarray(rng.standard_normal((1024, N)), jnp.float32)
store16 = store32.astype(jnp.bfloat16)
tokens = jnp.asarray(rng.integers(1, base.vocab_size, (B, base.max_length)), jnp.int32)
target = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)

def run(tag, cfg, store):
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    params, bstats, prng = init_model(model, cfg, np.asarray(store32[:B]), tokens)
    tx = make_optimizer(cfg)
    rules = lc_nic_l2_rules(cfg)
    step = make_scanned_train_steps(model, cfg, rules)
    idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)
    toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
    tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))
    st = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=prng)
    st, m = step(st, store, idx, toks, tgts)
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter(); reps = 2
    for _ in range(reps):
        st, m = step(st, store, idx, toks, tgts)
        float(np.asarray(m["loss"])[-1])
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{tag:34s}: {dt:6.3f} ms/step = {1000/dt:6.1f} steps/s", flush=True)

run("baseline fp32", base, store32)

c = dataclasses.replace(base); run("store bf16", c, store16)

c = dataclasses.replace(base, clipnorm=0.0); run("clipnorm off", c, store32)

c = dataclasses.replace(base, input_reg=0.0, attn_reg=0.0, lstm_reg=0.0,
                        output_reg=0.0); run("L2 off", c, store32)

c = dataclasses.replace(base, dropout_input=0.0, dropout_features=0.0,
                        dropout_text=0.0, dropout_lstm=0.0, dropout_attn=0.0,
                        dropout_out=0.0); run("dropout off", c, store32)

c = dataclasses.replace(base, clipnorm=0.0, input_reg=0.0, attn_reg=0.0,
                        lstm_reg=0.0, output_reg=0.0, dropout_input=0.0,
                        dropout_features=0.0, dropout_text=0.0,
                        dropout_lstm=0.0, dropout_attn=0.0, dropout_out=0.0)
run("all off + store bf16", c, store16)
