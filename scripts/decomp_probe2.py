"""Round-2 decomposition: components of the ~3.8 ms pregathered train step
(Pallas gather + pregathered encoder), isolated on-chip."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.ops.gather import gather_rows, pack_rows
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N = 327_684
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length,
              pregathered=True)
rng = np.random.default_rng(0)
B, K = cfg.batch_size, 128
raw = rng.standard_normal((1024, N)).astype(np.float32)
packed = pack_rows(layout.permute_rows(raw))
del raw
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)
betas0 = gather_rows(packed, idx[0])
params, bstats, prng = init_model(model, cfg, betas0, tokens)
a0 = jnp.zeros((B, cfg.units), jnp.float32)

def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name:32s}: {(time.perf_counter()-t0)/(reps*K)*1e3:7.3f} ms/step",
          flush=True)

@jax.jit
def gather_scan(store, idx):
    def body(c, i):
        return c + gather_rows(store, i).sum(), None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("pallas gather store->batch", gather_scan, packed, idx)

@jax.jit
def enc_scan(params, store, idx):
    def loss(p, b):
        feats = model.apply({"params": p, "batch_stats": bstats}, b,
                            method=model.encode)
        return jnp.sum(feats ** 2) * 1e-6
    def body(c, i):
        b = gather_rows(store, i)
        g = jax.grad(loss)(params, b)
        return c + jax.tree_util.tree_leaves(g["encoder"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("encoder fwd+bwd (+gather)", enc_scan, params, packed, idx)

@jax.jit
def dec_scan(params, idx, tokens):
    feats0 = model.apply({"params": params, "batch_stats": bstats}, betas0,
                         method=model.encode)
    def loss(p, feats):
        # decoder-only: attention+LSTM+head over precomputed features
        emb = jnp.take(p["embedding"], tokens, axis=0)
        def step(carry, et):
            h, c = carry
            ctx, _ = model.apply({"params": p, "batch_stats": bstats},
                                 h, feats, False, method=model.attention)
            x = jnp.concatenate([ctx, et], axis=-1)
            (h, c), out = model.apply({"params": p, "batch_stats": bstats},
                                      (h, c), x, method=model.cell)
            return (h, c), out
        _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(emb, 1, 0))
        logits = model.apply({"params": p, "batch_stats": bstats},
                             jnp.moveaxis(hs, 0, 1), False, method=model.head)
        oh = jax.nn.one_hot(tokens, cfg.vocab_size)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))
    def body(c, i):
        g = jax.grad(loss)(params, feats0)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, idx)[0]
try:
    timed("decoder-only fwd+bwd", dec_scan, params, idx, tokens)
except Exception as e:
    print("decoder-only failed:", str(e)[:200], flush=True)

@jax.jit
def full_scan(params, store, idx, tokens):
    def loss(p, b):
        logits, _ = model.apply({"params": p, "batch_stats": bstats}, b,
                                tokens, a0, a0)
        oh = jax.nn.one_hot(tokens, cfg.vocab_size)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))
    def body(c, i):
        b = gather_rows(store, i)
        g = jax.grad(loss)(params, b)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, idx)[0]
timed("full model fwd+bwd (+gather)", full_scan, packed, idx, tokens)
