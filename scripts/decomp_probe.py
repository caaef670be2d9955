"""Where does the ~7.3ms/step go? Time components of the flagship train step
in isolation on the chip (K-step scans, host transfer forced per call)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import optax
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N = 327_684
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
B, K = cfg.batch_size, 128
store = jnp.asarray(rng.standard_normal((1024, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
params, bstats, prng = init_model(model, cfg, store[:B], tokens)
a0 = jnp.zeros((B, cfg.units), jnp.float32)

def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name:30s}: {(time.perf_counter()-t0)/(reps*K)*1e3:7.3f} ms/step",
          flush=True)

idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)

@jax.jit
def gather_scan(store, idx):
    def body(c, i):
        return c + jnp.take(store, i, axis=0).sum(), None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("gather store->batch", gather_scan, store, idx)

@jax.jit
def enc_scan(params, store, idx):
    def loss(p, b):
        feats = model.apply({"params": p, "batch_stats": bstats}, b,
                            method=model.encode)
        return jnp.sum(feats ** 2) * 1e-6
    def body(c, i):
        b = jnp.take(store, i, axis=0)
        g = jax.grad(loss)(params, b)
        return c + jax.tree_util.tree_leaves(g["encoder"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("encoder fwd+bwd (+gather)", enc_scan, params, store, idx)

@jax.jit
def full_scan(params, store, idx, tokens):
    def loss(p, b):
        logits, _ = model.apply({"params": p, "batch_stats": bstats}, b,
                                tokens, a0, a0)
        oh = jax.nn.one_hot(tokens, cfg.vocab_size)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))
    def body(c, i):
        b = jnp.take(store, i, axis=0)
        g = jax.grad(loss)(params, b)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("full model fwd+bwd (+gather)", full_scan, params, store, idx, tokens)

tx = optax.adam(1e-4)
opt_state = tx.init(params)
@jax.jit
def opt_scan(params, opt_state):
    def body(c, _):
        p, o = c
        grads = jax.tree_util.tree_map(lambda x: x * 1e-8, p)
        u, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, u), o), None
    (p, o), _ = jax.lax.scan(body, (params, opt_state), None, length=K)
    return jax.tree_util.tree_leaves(p["encoder"])[0]
timed("adam update (full tree)", opt_scan, params, opt_state)
