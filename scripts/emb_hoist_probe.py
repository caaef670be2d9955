"""Probe: hoist the embedding half of the LSTM input matmul out of the
decoder scan.

Teacher forcing knows all T token embeddings upfront, so
``z_emb[:, t] = emb_t @ kernel[D:, :]`` (the 512-of-544 input rows) can run
as ONE (B*T, E) x (E, 4U) MXU matmul outside the scan; the chain keeps only
the 32-wide context slice ``ctx @ kernel[:D, :]``. Unlike the rejected
W1@features hoist (PERF.md: 28% slower — broadcast input forced a
loop-carried cotangent accumulator), emb is a per-step stacked scan input,
so its cotangent is a regular stacked scan output and dW_emb batches over T
in the backward too.

Measures decoder-only fwd+bwd (attention+LSTM chain + head + loss) baseline
vs hoisted, same weights, K-step scan like decomp_probe2.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
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
B, K, T, U = cfg.batch_size, 128, cfg.max_length, cfg.units
D = cfg.group_size
betas0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
params, bstats, prng = init_model(model, cfg, betas0, tokens)
a0 = jnp.zeros((B, U), jnp.float32)
# per-iteration token batches: the grad must DEPEND on the scan index, or
# XLA's while-loop LICM can hoist the whole fwd+bwd out of the K-loop and
# the timing measures one grad + K adds
toks_k = jnp.asarray(rng.integers(1, cfg.vocab_size, (K, B, T)), jnp.int32)

feats_host = model.apply({"params": params, "batch_stats": bstats}, betas0,
                         method=model.encode)
feats_host = jax.block_until_ready(feats_host)


def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name:36s}: {(time.perf_counter()-t0)/(reps*K)*1e3:7.3f} ms/step",
          flush=True)


def ce(logits, t):
    oh = jax.nn.one_hot(t, cfg.vocab_size)
    return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))


def attn_apply(p, h, feats):
    return model.apply({"params": p, "batch_stats": bstats}, h, feats,
                       method=lambda m, h_, f_: m.attention(h_, f_,
                                                            training=False))


def cell_apply(p, carry, x):
    return model.apply({"params": p, "batch_stats": bstats}, carry, x,
                       method=lambda m, c_, x_: m.cell(c_, x_))


def head_apply(p, hs):
    return model.apply({"params": p, "batch_stats": bstats}, hs,
                       method=lambda m, h_: m.head(h_, training=False))


# ---------------- baseline: concat + full kernel matmul in the chain ------
@jax.jit
def base_scan(params, feats, toks):
    def loss(p, t):
        emb = jnp.take(p["embedding"], t, axis=0)
        def step(carry, et):
            h, c = carry
            ctx, _ = attn_apply(p, h, feats)
            x = jnp.concatenate([ctx, et], axis=-1)
            (h, c), out = cell_apply(p, (h, c), x)
            return (h, c), out
        _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(emb, 1, 0))
        logits = head_apply(p, jnp.moveaxis(hs, 0, 1))
        return ce(logits, t)
    def body(c, t):
        g = jax.grad(loss)(params, t)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, toks)[0]


# ---------------- hoisted: z_emb batched outside, ctx-slice inside --------
@jax.jit
def hoist_scan(params, feats, toks):
    def loss(p, t):
        lstm = p["lstm"]
        kernel, rec, bias = lstm["kernel"], lstm["recurrent_kernel"], lstm["bias"]
        k_ctx, k_emb = kernel[:D], kernel[D:]
        emb = jnp.take(p["embedding"], t, axis=0)               # (B, T, E)
        z_emb = emb @ k_emb + bias                               # (B, T, 4U)
        def step(carry, zt):
            h, c = carry
            ctx, _ = attn_apply(p, h, feats)
            z = ctx @ k_ctx + zt + h @ rec
            i, f, g_, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g_)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h
        _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(z_emb, 1, 0))
        logits = head_apply(p, jnp.moveaxis(hs, 0, 1))
        return ce(logits, t)
    def body(c, t):
        g = jax.grad(loss)(params, t)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, toks)[0]


# ---------------- chain-only (no head/loss) to size the pieces ------------
@jax.jit
def chain_scan(params, feats, toks):
    def loss(p, t):
        emb = jnp.take(p["embedding"], t, axis=0)
        def step(carry, et):
            h, c = carry
            ctx, _ = attn_apply(p, h, feats)
            x = jnp.concatenate([ctx, et], axis=-1)
            (h, c), out = cell_apply(p, (h, c), x)
            return (h, c), out
        _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(emb, 1, 0))
        return jnp.sum(hs ** 2) * 1e-3
    def body(c, t):
        g = jax.grad(loss)(params, t)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, toks)[0]


# parity check first (grad-sums over the same K token batches must agree)
v1 = float(base_scan(params, feats_host, toks_k))
v2 = float(hoist_scan(params, feats_host, toks_k))
print(f"parity: base={v1:.6f} hoist={v2:.6f} (grad sums should match ~1e-4)")

timed("decoder fwd+bwd baseline", base_scan, params, feats_host, toks_k)
timed("decoder fwd+bwd emb-hoisted", hoist_scan, params, feats_host, toks_k)
timed("chain-only fwd+bwd (no head)", chain_scan, params, feats_host, toks_k)
