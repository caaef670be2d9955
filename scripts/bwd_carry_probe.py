"""Probe: is the decoder backward dominated by the weight-grad accumulators
carried through the backward scan?

The 15-step chain's backward (autodiff of lax.scan) carries every weight
cotangent as loop state: dkernel (544,4*512) + drec (512,4*512) + attention
weight grads — ~9 MB read+written per timestep, ~270 MB of HBM traffic per
train step at B=64/T=15. The activations (h stack) are stacked outputs; only
the weight grads ride the carry.

Variants (all with per-iteration token batches so XLA LICM can't hoist the
grad out of the K-loop — see emb_hoist_probe.py's lesson):
  1. fwd only                       — chain cost with no backward
  2. grad wrt emb inputs only       — backward carries just (dh, dc): the
                                      "speed-of-light" backward if weight
                                      cotangent accumulation were free
  3. grad wrt params (baseline)     — what training actually runs

If (3) >> (2), a custom-VJP chain that stacks per-step dz cotangents and
batches the weight grads as post-scan matmuls (dW = X^T @ dZ) is the lever.
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
betas0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
params, bstats, prng = init_model(model, cfg, betas0, tokens)
a0 = jnp.zeros((B, U), jnp.float32)
toks_k = jnp.asarray(rng.integers(1, cfg.vocab_size, (K, B, T)), jnp.int32)

feats_host = jax.block_until_ready(
    model.apply({"params": params, "batch_stats": bstats}, betas0,
                method=model.encode))


def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name:40s}: {(time.perf_counter()-t0)/(reps*K)*1e3:7.3f} ms/step",
          flush=True)


def attn_apply(p, h, feats):
    return model.apply({"params": p, "batch_stats": bstats}, h, feats,
                       method=lambda m, h_, f_: m.attention(h_, f_,
                                                            training=False))


def cell_apply(p, carry, x):
    return model.apply({"params": p, "batch_stats": bstats}, carry, x,
                       method=lambda m, c_, x_: m.cell(c_, x_))


def chain_loss(p, emb, feats):
    def step(carry, et):
        h, c = carry
        ctx, _ = attn_apply(p, h, feats)
        x = jnp.concatenate([ctx, et], axis=-1)
        (h, c), out = cell_apply(p, (h, c), x)
        return (h, c), out
    _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(emb, 1, 0))
    return jnp.sum(hs ** 2) * 1e-3


def embed(p, t):
    return jnp.take(p["embedding"], t, axis=0)


@jax.jit
def fwd_only(params, feats, toks):
    def body(c, t):
        return c + chain_loss(params, embed(params, t), feats), None
    return jax.lax.scan(body, 0.0, toks)[0]


@jax.jit
def grad_inputs(params, feats, toks):
    def body(c, t):
        g = jax.grad(chain_loss, argnums=1)(params, embed(params, t), feats)
        return c + g.ravel()[0], None
    return jax.lax.scan(body, 0.0, toks)[0]


@jax.jit
def grad_params(params, feats, toks):
    def body(c, t):
        g = jax.grad(
            lambda p, t_: chain_loss(p, embed(p, t_), feats))(params, t)
        return c + jax.tree_util.tree_leaves(g["lstm"])[0].ravel()[0], None
    return jax.lax.scan(body, 0.0, toks)[0]


timed("chain fwd only", fwd_only, params, feats_host, toks_k)
timed("chain grad wrt emb inputs only", grad_inputs, params, feats_host, toks_k)
timed("chain grad wrt params (baseline)", grad_params, params, feats_host, toks_k)
